"""Single fixed-configuration node-classification run (no HPO).

Counterpart of reference node_classification_clean/run_model.py — which is
stale/broken there (undefined --heads, missing params keys; SURVEY.md §2.3).
This one works.

    python experiments/run_model.py --dataset Cora --architecture kan \
        --conv_type gcn --hidden_channels 64 --lr 1e-3
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kagnn_tpu.utils.platform import apply_platform_env

apply_platform_env()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="Cora")
    p.add_argument("--conv_type", default="gcn", choices=["gin", "gcn", "gat"])
    p.add_argument("--architecture", default="kan",
                   choices=["mlp", "kan", "fastkan"])
    p.add_argument("--hidden_channels", type=int, default=64)
    p.add_argument("--hidden_layers", type=int, default=2)
    p.add_argument("--grid_size", type=int, default=4)
    p.add_argument("--spline_order", type=int, default=3)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--patience", type=int, default=100)
    p.add_argument("--skip", type=int, default=1)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--max_splits", type=int, default=None)
    p.add_argument("--data_root", default="data")
    p.add_argument("--log_dir", default="logs")
    p.add_argument("--fused", action="store_true")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 mixed-precision compute")
    p.add_argument("--random_seed", type=int, default=0)
    p.add_argument("--update_grid", type=int, default=0,
                   help="refit KAN grids to live activations every N "
                        "epochs (reference KAN.forward(update_grid=True), "
                        "ekan.py:270-275); 0 = off")
    args = p.parse_args()

    from kagnn_tpu.train.experiments import run_node_experiment

    params = {k: getattr(args, k) for k in (
        "conv_type", "architecture", "hidden_channels", "hidden_layers",
        "grid_size", "spline_order", "lr", "dropout", "epochs", "patience",
        "skip", "heads", "fused", "bf16", "update_grid")}
    res = run_node_experiment(params, args.dataset, data_root=args.data_root,
                              log_dir=args.log_dir,
                              max_splits=args.max_splits,
                              seed=args.random_seed)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
