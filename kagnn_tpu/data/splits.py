"""Split-fixture loading — the Errica-et-al "fair comparison" protocol.

The 10-outer-fold JSON fixtures are copied verbatim from the reference
(`graph_classification/data_splits/*.json`, loaded at reference
graph_classification_utils.py:88-91): each fold is
{test: [ids], model_selection: [{train: [ids], validation: [ids]}]}.
"""
from __future__ import annotations

import json
import os

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures",
                           "data_splits")


def load_splits(dataset: str, split_dir: str | None = None) -> list[dict]:
    path = os.path.join(split_dir or FIXTURE_DIR, f"{dataset}_splits.json")
    with open(path, "rt") as f:
        for line in f:
            return json.loads(line)
    raise ValueError(f"empty splits file {path}")


def fold_indices(splits: list[dict], fold: int) -> tuple[list, list, list]:
    """(train, val, test) indices of one outer fold."""
    s = splits[fold]
    ms = s["model_selection"][0]
    return ms["train"], ms["validation"], s["test"]
