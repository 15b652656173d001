"""Experiment runners — the reference's L5/L6 protocol layer rebuilt on the
jitted loops.

Node classification: `run_node_experiment` == reference `run_experiment` +
`all_splits` + `train_total` (node_classification_clean/utils.py:162-236):
10 splits, Adam, best-val-loss state restore, early stopping, mean/std test
accuracy, append-style logging.

Graph classification: `graph_classification_protocol` == reference
`parameters_finder` (graph_classification_utils.py:93-159): per outer fold,
HPO on that fold's train/val, then 3 retrains reporting test accuracy.
"""
from __future__ import annotations

import json
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kagnn_tpu.data import DATASET_LAYERS, load_node_dataset
from kagnn_tpu.graphs import GraphBatch, batch_graphs, pad_spec_for, single_graph
from kagnn_tpu.models import NodeClassifier
from kagnn_tpu.train import losses
from kagnn_tpu.train.loops import (EarlyStopper, create_train_state,
                                   make_node_steps)


def _pad_mask(m: np.ndarray, n_pad: int) -> jnp.ndarray:
    return jnp.asarray(np.concatenate([m, np.zeros(n_pad - m.shape[0], bool)]))


def train_node_total(model, g: GraphBatch, params_cfg: dict,
                     train_mask, val_mask, test_mask, key) -> dict:
    """One split's training run with best-val restore (reference
    utils.py:162-193; the reference's stale-`out` post-reload eval bug is NOT
    replicated — metrics here come from the restored best state)."""
    tx = optax.adam(params_cfg["lr"])
    state, _ = create_train_state(model, key, g, tx)
    train_step, evaluate = make_node_steps(model, tx)
    stopper = EarlyStopper(patience=params_cfg.get("patience", 100))
    best_val = float("inf")
    best_state = state
    # in-training grid adaptation cadence (reference
    # KAN.forward(update_grid=True), ekan.py:270-275): every N epochs refit
    # every KANLinear's knots to the live activation distribution
    update_grid = int(params_cfg.get("update_grid", 0) or 0)
    adapt_model = model.clone(fused=False) if update_grid else None
    for epoch in range(params_cfg.get("epochs", 1000)):
        if update_grid and epoch > 0 and epoch % update_grid == 0:
            from kagnn_tpu.kan.adapt import adapt_model_grids

            variables = {"params": state.params, "buffers": state.buffers,
                         "batch_stats": state.batch_stats}
            new_vars = adapt_model_grids(adapt_model, variables, g,
                                         train=False)
            state = state.replace(params=new_vars["params"],
                                  buffers=new_vars["buffers"])
        key, sub = jax.random.split(key)
        state, _ = train_step(state, g, train_mask, sub)
        logits = evaluate(state, g)
        val_loss = float(losses.masked_softmax_cross_entropy(
            logits, g.y, val_mask))
        should_save, should_stop = stopper.early_stop(val_loss)
        if should_save and val_loss < best_val:
            best_val = val_loss
            best_state = state
        if should_stop:
            break
    logits = evaluate(best_state, g)
    return {
        "train_acc": float(losses.masked_accuracy(logits, g.y, train_mask)),
        "val_acc": float(losses.masked_accuracy(logits, g.y, val_mask)),
        "val_loss": best_val,
        "test_acc": float(losses.masked_accuracy(logits, g.y, test_mask)),
        "epochs_run": epoch + 1,
        "state": best_state,
    }


def train_node_sampled(model, d: dict, g: GraphBatch, params_cfg: dict,
                       train_mask, val_mask, test_mask, key,
                       fanouts, batch_size: int = 512) -> dict:
    """One split trained on GraphSAGE-style sampled mini-batches
    (data/sampling.NeighborSampler) with full-graph evaluation — the scaling
    lever the reference lacks for ogbn-arxiv (SURVEY.md §2.4 N9). Matches
    `train_node_total`'s contract."""
    from kagnn_tpu.data.sampling import NeighborSampler

    tx = optax.adam(params_cfg["lr"])
    sampler = NeighborSampler(d["senders"], d["receivers"],
                              int(d["n_node"]), fanouts=fanouts,
                              batch_size=min(batch_size,
                                             int(np.asarray(train_mask).sum())),
                              seed=params_cfg.get("seed", 0))
    train_nodes = np.flatnonzero(np.asarray(train_mask))
    b0 = next(sampler.epoch(train_nodes, d["nodes"], d["y"]))
    state, _ = create_train_state(model, key, b0, tx)
    train_step, evaluate = make_node_steps(model, tx)
    seed_mask = sampler.seed_mask()
    stopper = EarlyStopper(patience=params_cfg.get("patience", 100))
    best_val, best_state = float("inf"), state
    for epoch in range(params_cfg.get("epochs", 1000)):
        for b in sampler.epoch(train_nodes, d["nodes"], d["y"]):
            key, sub = jax.random.split(key)
            state, _ = train_step(state, b, seed_mask, sub)
        logits = evaluate(state, g)
        val_loss = float(losses.masked_softmax_cross_entropy(
            logits, g.y, val_mask))
        should_save, should_stop = stopper.early_stop(val_loss)
        if should_save and val_loss < best_val:
            best_val, best_state = val_loss, state
        if should_stop:
            break
    logits = evaluate(best_state, g)
    return {
        "train_acc": float(losses.masked_accuracy(logits, g.y, train_mask)),
        "val_acc": float(losses.masked_accuracy(logits, g.y, val_mask)),
        "val_loss": best_val,
        "test_acc": float(losses.masked_accuracy(logits, g.y, test_mask)),
        "epochs_run": epoch + 1,
        "state": best_state,
    }


def make_node_model(params: dict) -> NodeClassifier:
    """Reference `make_model` (utils.py:88-123)."""
    return NodeClassifier(
        conv_type=params["conv_type"],
        architecture=params["architecture"],
        mp_layers=params["mp_layers"],
        num_features=params["num_features"],
        hidden_channels=params["hidden_channels"],
        num_classes=params["num_classes"],
        skip=bool(params.get("skip", True)),
        grid_size=params.get("grid_size", 4) or 4,
        spline_order=params.get("spline_order", 3) or 3,
        hidden_layers=params.get("hidden_layers", 2) or 2,
        dropout=params.get("dropout", 0.0),
        heads=params.get("heads", 4),
        fused=params.get("fused", False),
        compute_dtype=jnp.bfloat16 if params.get("bf16") else None,
    )


def run_node_experiment(params: dict, dataset_name: str,
                        data_root: str = "data", log_dir: str = "logs",
                        max_splits: Optional[int] = None,
                        seed: int = 0) -> dict:
    """Reference `run_experiment` (utils.py:213-236): all splits, logging,
    returns mean val loss + test acc mean/std."""
    d = load_node_dataset(dataset_name, data_root)
    params = dict(params)
    params["mp_layers"] = params.get("mp_layers") or DATASET_LAYERS.get(
        dataset_name, 2)
    params["num_classes"] = d["num_classes"]
    params["num_features"] = d["nodes"].shape[1]

    reorder = params.get("reorder") or "none"
    if reorder != "none":
        # renumber nodes for gather locality (graphs/reorder.py); masks and
        # labels are permuted consistently so the protocol is unchanged
        from kagnn_tpu.graphs.reorder import (bfs_order, degree_order,
                                              reorder_graph)
        d = reorder_graph(d, {"rcm": bfs_order, "bfs": bfs_order,
                              "degree": degree_order}[reorder])

    g = single_graph(d["senders"], d["receivers"], nodes=d["nodes"], y=d["y"])
    model = make_node_model(params)
    sampling = params.get("sampling") or None

    n_splits = d["train_masks"].shape[0]
    if max_splits:
        n_splits = min(n_splits, max_splits)
    results = []
    key = jax.random.key(seed)
    for i in range(n_splits):
        key, sub = jax.random.split(key)
        masks = (_pad_mask(d["train_masks"][i], g.n_node_pad),
                 _pad_mask(d["val_masks"][i], g.n_node_pad),
                 _pad_mask(d["test_masks"][i], g.n_node_pad))
        if sampling:
            res = train_node_sampled(
                model, d, g, params, *masks, key=sub, fanouts=sampling,
                batch_size=params.get("sampling_batch", 512))
        else:
            res = train_node_total(model, g, params, *masks, sub)
        res.pop("state")
        results.append(res)

    test_accs = np.array([r["test_acc"] for r in results])
    val_losses = np.array([r["val_loss"] for r in results])
    summary = {
        "params": {k: v for k, v in params.items() if k != "state"},
        "val_loss_mean": float(val_losses.mean()),
        "test_acc_mean": float(test_accs.mean()),
        "test_acc_std": float(test_accs.std(ddof=1)) if len(test_accs) > 1 else 0.0,
        "test_accs": test_accs.tolist(),
    }
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        log_file = os.path.join(
            log_dir,
            f"{dataset_name}_{params['architecture']}_{params['conv_type']}")
        with open(log_file, "a") as f:
            f.write(json.dumps(summary) + "\n")
    return summary


# ------------------------------------------------------- graph-level tasks

def batch_loader(graphs: list[dict], spec, batch_size: int,
                 shuffle: bool = False, seed: int = 0,
                 postprocess: Optional[Callable] = None,
                 native: Optional[bool] = None, prefetch: int = 0):
    """Returns a callable yielding padded GraphBatches (static shapes).

    `native`: route batch assembly through the C++ assembler
    (data/native.py; bit-identical to `batch_graphs`, ~2x faster). None =
    auto (use it when the shared library builds), False = pure python,
    True = required. `prefetch`: keep N assembled batches in flight on a
    background thread incl. host->device transfer (train/prefetch.py) —
    the counterpart of PyG's DataLoader workers
    (reference graph_classification_utils.py:109-110)."""
    rng = np.random.default_rng(seed)
    assembler = None
    has_edge_feat = any(g.get("edges") is not None for g in graphs)
    if native or (native is None and not has_edge_feat):
        from kagnn_tpu.data.native import (NativeBatchAssembler,
                                           native_available)
        if native_available():
            assembler = NativeBatchAssembler(graphs, spec)
        elif native:
            raise RuntimeError("native batch assembler requested but the "
                               "shared library failed to build")

    def gen():
        order = rng.permutation(len(graphs)) if shuffle else np.arange(
            len(graphs))
        for i in range(0, len(order), batch_size):
            sel = order[i:i + batch_size]
            if assembler is not None:
                b = assembler.assemble(sel)
            else:
                b = batch_graphs([graphs[j] for j in sel], spec)
            if postprocess is not None:
                b = postprocess(b)
            yield b

    if prefetch > 0:
        from kagnn_tpu.train.prefetch import prefetch_to_device

        def it():
            return prefetch_to_device(gen(), size=prefetch)
    else:
        def it():
            return gen()

    return it


def graph_classification_protocol(
    dataset: str,
    trainer: Callable[[dict, int], tuple[float, int]],
    objective: Callable,
    log_file: str,
    n_outer_folds: int = 10,
    n_trials: int = 100,
    n_retrains: int = 3,
    seed: int = 12345,
    split_dir: Optional[str] = None,
) -> dict:
    """The Errica-protocol outer loop == reference `parameters_finder`
    (graph_classification_utils.py:93-159): per outer fold, an HPO study on
    that fold's train/val split, then `n_retrains` retrains with the best
    hyperparameters reporting test accuracy. `trainer(params, fold)` must
    return (test_acc, model_size); `objective(trial, fold)` returns val loss.
    """
    from kagnn_tpu.train.hpo import TPESampler, create_study

    fold_means, all_best, sizes = [], [], []
    for fold in range(n_outer_folds):
        study = create_study(direction="minimize",
                             sampler=TPESampler(seed=seed))
        study.optimize(lambda t: objective(t, fold), n_trials=n_trials)
        best = dict(study.best_params)
        accs = []
        size = 0
        for _ in range(n_retrains):
            acc, size = trainer(best, fold)
            accs.append(acc)
        all_best.append(best)
        sizes.append(size)
        fold_means.append(float(np.mean(accs)))
        if log_file:
            os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
            with open(log_file, "a") as f:
                f.write(f"SPLIT {fold}\n")
                f.write(f"Accuracies {fold_means}\n")
                f.write(f"Params {all_best}\n")
                f.write(f"Size {sizes}\n")
                f.write(f"Mean {np.mean(accs)}, Std {np.std(accs)}\n\n")
    result = {
        "dataset": dataset,
        "fold_accs": fold_means,
        "mean": float(np.mean(fold_means)),
        "std": float(np.std(fold_means, ddof=1)) if len(fold_means) > 1 else 0.0,
        "best_hyperparams": all_best,
    }
    if log_file:
        with open(log_file, "a") as f:
            f.write(f"FINAL Mean: {result['mean']}, Std: {result['std']}\n")
    return result
