"""Checkpointing — Orbax save/restore of TrainState (params + buffers +
batch stats + optimizer state).

Replaces the reference's torch.save/load of state_dicts
(node_classification_clean/utils.py:163,181-187) and whole-model pickles
(optuna_graph_classification_kan.py:56), and adds what the reference lacks
(SURVEY.md §5): full resume (optimizer state + step included).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from kagnn_tpu.train.loops import TrainState


def save(path: str, state: TrainState) -> None:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def restore(path: str, template: TrainState) -> TrainState:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)


class BestValKeeper:
    """In-memory best-validation-state tracker with optional disk spill —
    the reference keeps best state on disk per epoch (utils.py:181-183);
    device-memory copies avoid that round trip."""

    def __init__(self, save_dir: Optional[str] = None, name: str = "best"):
        self.best_loss = float("inf")
        self.best_state: Optional[TrainState] = None
        self.save_dir = save_dir
        self.name = name

    def update(self, val_loss: float, state: TrainState) -> bool:
        if val_loss < self.best_loss:
            self.best_loss = val_loss
            self.best_state = jax.tree.map(lambda x: x, state)
            if self.save_dir:
                save(os.path.join(self.save_dir, self.name), state)
            return True
        return False
