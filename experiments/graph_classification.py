"""Graph-classification HPO driver (TU datasets, Errica protocol).

Unifies the reference's three near-identical drivers
(graph_classification/optuna_graph_classification_{kan,fastkan,mlp}.py) into
one CLI; search spaces per architecture match the reference exactly
(kan: lr 1e-4..1e-2 log, hidden_layers 1..4, hidden_dim 2..64, grid 2..16,
order 1..4, dropout 0..0.9; fastkan: grid 2..32; mlp: hidden_dim 2..512).

    python experiments/graph_classification.py --dataset MUTAG \
        --model_type GIN --architecture kan
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kagnn_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    p = argparse.ArgumentParser(description="KAGNN graph classification")
    p.add_argument("--dataset", default="MUTAG")
    p.add_argument("--batch-size", type=int, default=64, dest="batch_size")
    p.add_argument("--epochs", type=int, default=2000)
    p.add_argument("--patience", type=int, default=20)
    p.add_argument("--random_seed", type=int, default=12345)
    p.add_argument("--model_type", default="GIN", choices=["GIN", "GCN", "GAT"])
    p.add_argument("--architecture", default="kan", choices=["kan", "fastkan", "mlp"])
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--n_trials", type=int, default=100)
    p.add_argument("--n_outer_folds", type=int, default=10)
    p.add_argument("--data_root", default="datasets")
    p.add_argument("--fused", action="store_true")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 mixed-precision compute (f32 master weights)")
    p.add_argument("--loader", default="auto",
                   choices=["auto", "native", "python"],
                   help="batch assembly: C++ assembler (data/native.py) or "
                        "pure python")
    p.add_argument("--prefetch", type=int, default=2,
                   help="batches kept in flight on a background thread "
                        "(0 = synchronous)")
    args = p.parse_args()
    native = {"auto": None, "native": True, "python": False}[args.loader]

    from kagnn_tpu.data import fold_indices, load_graph_dataset, load_splits
    from kagnn_tpu.data.tu import LAYERS_PER_DATASET
    from kagnn_tpu.graphs import pad_spec_for
    from kagnn_tpu.models import GraphClassifier
    from kagnn_tpu.train.experiments import (batch_loader,
                                             graph_classification_protocol)
    from kagnn_tpu.train.loops import (create_train_state,
                                       make_graph_cls_steps,
                                       train_graph_epochs)

    graphs = load_graph_dataset(args.dataset, args.data_root)
    try:
        splits = load_splits(args.dataset)
    except FileNotFoundError:
        # fall back to random folds for synthetic stand-ins
        rng = np.random.default_rng(args.random_seed)
        idx = rng.permutation(len(graphs))
        k = len(graphs) // 10
        splits = []
        for f in range(10):
            test = idx[f * k:(f + 1) * k].tolist()
            rest = np.setdiff1d(idx, test)
            splits.append({"test": test, "model_selection": [{
                "train": rest[:int(0.9 * len(rest))].tolist(),
                "validation": rest[int(0.9 * len(rest)):].tolist()}]})

    spec = pad_spec_for(graphs, args.batch_size)
    num_features = graphs[0]["nodes"].shape[1]
    num_classes = int(max(int(g["y"][0]) for g in graphs)) + 1
    gnn_layers = LAYERS_PER_DATASET.get(args.dataset, 3)

    def intify(b):
        return b.replace(y=b.y.astype(jnp.int32))

    def build_and_train(params, fold, with_test):
        tr_idx, va_idx, te_idx = fold_indices(splits, fold)
        tr = [graphs[i] for i in tr_idx]
        va = [graphs[i] for i in va_idx]
        te = [graphs[i] for i in te_idx]
        model = GraphClassifier(
            conv_type=args.model_type.lower(),
            architecture=args.architecture,
            gnn_layers=gnn_layers, num_features=num_features,
            hidden_dim=params["hidden_dim"], num_classes=num_classes,
            hidden_layers=params.get("hidden_layers", 2),
            grid_size=params.get("grid_size", 4),
            spline_order=params.get("spline_order", 3),
            dropout=params["dropout"], heads=args.heads, fused=args.fused,
            compute_dtype=jnp.bfloat16 if args.bf16 else None)
        tx = optax.adam(params["lr"])
        example = intify(next(batch_loader(tr, spec, args.batch_size,
                                           native=native)()))
        state, _ = create_train_state(model, jax.random.key(args.random_seed),
                                      example, tx)
        train_step, evaluate = make_graph_cls_steps(model, tx)
        res = train_graph_epochs(
            state, train_step, evaluate,
            batch_loader(tr, spec, args.batch_size, shuffle=True,
                         seed=args.random_seed, postprocess=intify,
                         native=native, prefetch=args.prefetch),
            batch_loader(va, spec, args.batch_size, postprocess=intify,
                         native=native, prefetch=args.prefetch),
            epochs=args.epochs, patience=args.patience,
            key=jax.random.key(args.random_seed),
            test_batches=(batch_loader(te, spec, args.batch_size,
                                       postprocess=intify, native=native)
                          if with_test else None))
        n_params = sum(int(np.prod(np.shape(x)))
                       for x in jax.tree.leaves(state.params))
        return res, n_params

    def trainer(params, fold):
        res, n_params = build_and_train(params, fold, with_test=True)
        return res["test_metric"], n_params

    def objective(trial, fold):
        # search spaces per reference drivers :59-68
        params = {"lr": trial.suggest_float("lr", 1e-4, 1e-2, log=True),
                  "dropout": trial.suggest_float("dropout", 0.0, 0.9)}
        if args.architecture == "mlp":
            params["hidden_dim"] = trial.suggest_int("hidden_dim", 2, 512)
            params["hidden_layers"] = trial.suggest_int("hidden_layers", 1, 4)
        elif args.architecture == "fastkan":
            params["hidden_dim"] = trial.suggest_int("hidden_dim", 2, 64)
            params["hidden_layers"] = trial.suggest_int("hidden_layers", 1, 4)
            params["grid_size"] = trial.suggest_int("grid_size", 2, 32)
        else:
            params["hidden_dim"] = trial.suggest_int("hidden_dim", 2, 64)
            params["hidden_layers"] = trial.suggest_int("hidden_layers", 1, 4)
            params["grid_size"] = trial.suggest_int("grid_size", 2, 16)
            params["spline_order"] = trial.suggest_int("spline_order", 1, 4)
        res, _ = build_and_train(params, fold, with_test=False)
        return res["best_val_loss"]

    log_file = os.path.join(
        "logs", f"{args.architecture.upper()}_{args.dataset}_{args.model_type}")
    result = graph_classification_protocol(
        args.dataset, trainer, objective, log_file,
        n_outer_folds=args.n_outer_folds, n_trials=args.n_trials,
        seed=args.random_seed)
    print(result)


if __name__ == "__main__":
    main()
