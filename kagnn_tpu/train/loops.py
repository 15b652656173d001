"""Jitted training/eval steps and the experiment loop.

TPU-native counterpart of the reference's training utilities
(node_classification_clean/utils.py:125-211,
graph_classification/graph_classification_utils.py:45-72,
graph_regression/optuna_zinc.py:38-92): one compiled `train_step` per model
covering forward + loss + backward + optimizer, full-batch (node task) or
padded-minibatch (graph tasks), with best-val-state checkpointing done
in-memory (device arrays), not via disk round-trips.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Iterable, Optional

import flax
import jax
import jax.numpy as jnp
import optax

from kagnn_tpu.graphs.batch import GraphBatch
from kagnn_tpu.train import losses

Array = jax.Array


@flax.struct.dataclass
class TrainState:
    params: Any
    buffers: Any
    batch_stats: Any
    opt_state: Any
    step: Array

    def variables(self) -> dict:
        v = {"params": self.params}
        if self.buffers:
            v["buffers"] = self.buffers
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def create_train_state(model, rng, example: GraphBatch, tx: optax.GradientTransformation,
                       **apply_kw) -> tuple[TrainState, optax.GradientTransformation]:
    variables = model.init({"params": rng}, example, **apply_kw)
    params = variables["params"]
    state = TrainState(
        params=params,
        buffers=variables.get("buffers", {}),
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )
    return state, tx


class EarlyStopper:
    """Reference node_classification_clean/utils.py:68-86: returns
    (should_save, should_stop)."""

    def __init__(self, patience: int = 1, min_delta: float = 0.0):
        self.patience = patience
        self.min_delta = min_delta
        self.counter = 0
        self.min_validation_loss = float("inf")

    def early_stop(self, validation_loss: float) -> tuple[bool, bool]:
        should_save = False
        if validation_loss < self.min_validation_loss:
            self.min_validation_loss = validation_loss
            self.counter = 0
            should_save = True
        elif validation_loss >= self.min_validation_loss + self.min_delta:
            self.counter += 1
            if self.counter >= self.patience:
                return False, True
        return should_save, False


def _split_loss_fn(model, tx, loss_of_output: Callable,
                   donate: bool = False):
    """Build a jitted step: loss_of_output(output, batch) -> scalar.
    `donate=True` donates the TrainState (see make_node_steps)."""

    def step(state: TrainState, batch: GraphBatch, dropout_key) -> tuple[TrainState, Array]:
        def loss_fn(params):
            variables = {"params": params}
            if state.buffers:
                variables["buffers"] = state.buffers
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out, mut = model.apply(
                variables, batch, train=True, rngs={"dropout": dropout_key},
                mutable=["batch_stats"])
            return loss_of_output(out, batch), mut

        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=mut.get("batch_stats", state.batch_stats),
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, loss

    return jax.jit(step, **({"donate_argnums": (0,)} if donate else {}))


# ---------------------------------------------------------------- node task

def make_node_steps(model, tx, donate: bool = False):
    """Full-batch node classification: masked CE on a per-call mask
    (train/val/test masks live in batch-external arrays).

    `donate=True` donates the TrainState argument so XLA aliases the
    params/opt-state buffers in place (saves the pass-through copies and
    ~3x the param-tree footprint). Opt-in because a caller that touches
    the OLD state after the step (parity tests, ledger probes) would read
    deleted buffers."""

    def train_step(state, batch, mask, dropout_key):
        def loss_fn(params):
            variables = {"params": params, **(
                {"buffers": state.buffers} if state.buffers else {}), **(
                {"batch_stats": state.batch_stats} if state.batch_stats else {})}
            out, mut = model.apply(
                variables, batch, train=True, rngs={"dropout": dropout_key},
                mutable=["batch_stats"])
            return losses.masked_softmax_cross_entropy(out, batch.y, mask), mut

        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        return state.replace(
            params=optax.apply_updates(state.params, updates),
            batch_stats=mut.get("batch_stats", state.batch_stats),
            opt_state=new_opt, step=state.step + 1), loss

    def evaluate(state, batch):
        """Returns logits (one forward; caller slices masks)."""
        return model.apply(state.variables(), batch, train=False)

    jit_kw = {"donate_argnums": (0,)} if donate else {}
    return jax.jit(train_step, **jit_kw), jax.jit(evaluate)


def make_node_multi_step(model, tx, n_steps: int):
    """`n_steps` full-batch train steps fused into ONE executable via
    `lax.scan` — the idiomatic-XLA epoch loop for full-batch node training
    (the graph is identical every step, so there is no host work between
    steps; the reference's epoch loop, utils.py:162-179, re-dispatches
    per step only because eager torch must).

    One dispatch per `n_steps` amortizes the per-execution host/dispatch
    cost — ~0.1 ms on a directly-attached TPU host, tens of ms through a
    remote/tunneled runtime — and lets XLA overlap the tail of one step
    with the head of the next. Returns `multi(state, batch, mask, key) ->
    (state, losses[n_steps])`; fold the key per call for fresh dropout.
    """
    step_fn, _ = make_node_steps(model, tx)

    @jax.jit
    def multi(state, batch, mask, dropout_key):
        def body(carry, i):
            s, k = carry
            k = jax.random.fold_in(k, i)
            s2, loss = step_fn(s, batch, mask, k)
            return (s2, k), loss

        (state, _), ls = jax.lax.scan(
            body, (state, dropout_key), jnp.arange(n_steps, dtype=jnp.int32))
        return state, ls

    return multi


# --------------------------------------------------------------- graph task

def make_graph_cls_steps(model, tx, donate: bool = False):
    def loss_of_output(out, batch):
        return losses.masked_nll(out, batch.y.astype(jnp.int32), batch.graph_mask)

    train_step = _split_loss_fn(model, tx, loss_of_output, donate=donate)

    @jax.jit
    def evaluate(state, batch):
        out = model.apply(state.variables(), batch, train=False)
        nll_sum = losses.masked_nll(out, batch.y.astype(jnp.int32),
                                    batch.graph_mask) * jnp.maximum(
            batch.graph_mask.sum(), 1)
        correct = ((jnp.argmax(out, 1) == batch.y.astype(jnp.int32))
                   & batch.graph_mask).sum()
        return nll_sum, correct, batch.graph_mask.sum()

    return train_step, evaluate


def make_graph_reg_steps(model, tx, donate: bool = False):
    def loss_of_output(out, batch):
        return losses.masked_l1(out, batch.y, batch.graph_mask)

    train_step = _split_loss_fn(model, tx, loss_of_output, donate=donate)

    @jax.jit
    def evaluate(state, batch):
        out = model.apply(state.variables(), batch, train=False)
        l1_sum = losses.masked_l1(out, batch.y, batch.graph_mask) * jnp.maximum(
            batch.graph_mask.sum(), 1)
        return l1_sum, batch.graph_mask.sum()

    return train_step, evaluate


# ------------------------------------------------------------ epoch drivers

def train_graph_epochs(
    state: TrainState,
    train_step,
    evaluate,
    train_batches: Callable[[], Iterable[GraphBatch]],
    val_batches: Callable[[], Iterable[GraphBatch]],
    epochs: int,
    patience: int,
    key,
    test_batches: Optional[Callable[[], Iterable[GraphBatch]]] = None,
    classification: bool = True,
) -> dict:
    """Early-stopped epoch loop mirroring the reference's graph training
    protocol (best-val loss tracked; test metric recorded at best-val epoch,
    graph_classification/optuna_*.py:40-57)."""
    stopper = EarlyStopper(patience=patience)
    best_val = float("inf")
    best_test_metric = None
    best_state = state
    for epoch in range(epochs):
        for batch in train_batches():
            key, sub = jax.random.split(key)
            state, _ = train_step(state, batch, sub)
        # val loss
        tot, n = 0.0, 0.0
        correct = 0.0
        for batch in val_batches():
            if classification:
                s, c, m = evaluate(state, batch)
                correct += float(c)
            else:
                s, m = evaluate(state, batch)
            tot += float(s)
            n += float(m)
        val_loss = tot / max(n, 1.0)
        if val_loss < best_val:
            best_val = val_loss
            best_state = state
            if test_batches is not None:
                tt, tn, tc = 0.0, 0.0, 0.0
                for batch in test_batches():
                    if classification:
                        s, c, m = evaluate(state, batch)
                        tc += float(c)
                    else:
                        s, m = evaluate(state, batch)
                    tt += float(s)
                    tn += float(m)
                best_test_metric = (tc / max(tn, 1.0)) if classification else (
                    tt / max(tn, 1.0))
        _, stop = stopper.early_stop(val_loss)
        if stop:
            break
    return {
        "state": best_state,
        "best_val_loss": best_val,
        "test_metric": best_test_metric,
        "epochs_run": epoch + 1,
    }
