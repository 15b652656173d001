"""Graph-regression HPO drivers (ZINC-subset and QM9).

Counterpart of reference graph_regression/optuna_zinc.py and optuna_qm9.py,
with the reference's debug-state defaults fixed (epochs default 1000 not 1,
n_trials default 100 not 2 — SURVEY.md §7 "bugs NOT to replicate").

ZINC: official subset splits, L1 loss, best-val-checkpointed test MAE.
QM9: first 12 targets z-score normalized, random 80/10/10 per seed.

    python experiments/graph_regression.py --dataset ZINC --gnn-type GIN \
        --model-type KAN
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
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="ZINC", choices=["ZINC", "QM9"])
    p.add_argument("--batch-size", type=int, default=256, dest="batch_size")
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--patience", type=int, default=20)
    p.add_argument("--random_seed", type=int, default=12345)
    p.add_argument("--gnn-type", default="GIN", choices=["GIN", "GCN"],
                   dest="gnn_type")
    p.add_argument("--model-type", default="MLP",
                   choices=["MLP", "KAN", "FASTKAN"], dest="model_type")
    p.add_argument("--num-gnn-layers", type=int, default=4,
                   dest="num_gnn_layers")
    p.add_argument("--n_trials", type=int, default=100)
    p.add_argument("--n_iterations", type=int, default=10)
    p.add_argument("--data_root", default="datasets")
    p.add_argument("--fused", action="store_true")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 mixed-precision compute (f32 master weights)")
    p.add_argument("--loader", default="auto",
                   choices=["auto", "native", "python"],
                   help="batch assembly: C++ assembler or pure python")
    p.add_argument("--prefetch", type=int, default=2,
                   help="batches kept in flight (0 = synchronous)")
    args = p.parse_args()
    native = {"auto": None, "native": True, "python": False}[args.loader]

    from kagnn_tpu.data import load_regression_dataset
    from kagnn_tpu.graphs import pad_spec_for
    from kagnn_tpu.models import GraphRegressor
    from kagnn_tpu.train.experiments import batch_loader
    from kagnn_tpu.train.hpo import TPESampler, create_study
    from kagnn_tpu.train.loops import (create_train_state,
                                       make_graph_reg_steps,
                                       train_graph_epochs)

    arch = args.model_type.lower()
    if args.dataset == "ZINC":
        train_g, val_g, test_g = load_regression_dataset("ZINC",
                                                         args.data_root)
        norm_stats = None
    else:
        all_g = load_regression_dataset("QM9", args.data_root)
        if isinstance(all_g, tuple):
            all_g = all_g[0] + all_g[1] + all_g[2]
        # reference optuna_qm9.py:144-150: first 12 targets, z-normalized
        ys = np.stack([g["y"][:12] for g in all_g])
        mean, std = ys.mean(0), ys.std(0)
        for g, y in zip(all_g, ys):
            g["y"] = ((y - mean) / std).astype(np.float32)
        rng = np.random.default_rng(args.random_seed)
        idx = rng.permutation(len(all_g))
        n = len(all_g)
        train_g = [all_g[i] for i in idx[:int(0.8 * n)]]
        val_g = [all_g[i] for i in idx[int(0.8 * n):int(0.9 * n)]]
        test_g = [all_g[i] for i in idx[int(0.9 * n):]]
        norm_stats = (mean, std)

    num_targets = 1 if args.dataset == "ZINC" else 12
    spec = pad_spec_for(train_g + val_g + test_g, args.batch_size)

    def train_with_params(params, with_test):
        model = GraphRegressor(
            conv_type=args.gnn_type.lower(), architecture=arch,
            gnn_layers=args.num_gnn_layers, num_node_features=1,
            num_edge_features=1, hidden_dim=params["hidden_dim"],
            num_targets=num_targets,
            hidden_layers=params.get("hidden_layers", 2),
            grid_size=params.get("grid_size", 4),
            spline_order=params.get("spline_order", 3),
            dropout=params["dropout"],
            ogb_encoders=args.dataset == "ZINC", fused=args.fused,
            compute_dtype=jnp.bfloat16 if args.bf16 else None)
        tx = optax.adam(params["lr"])
        example = next(batch_loader(train_g, spec, args.batch_size,
                                    native=native)())
        state, _ = create_train_state(model, jax.random.key(args.random_seed),
                                      example, tx)
        train_step, evaluate = make_graph_reg_steps(model, tx)
        res = train_graph_epochs(
            state, train_step, evaluate,
            batch_loader(train_g, spec, args.batch_size, shuffle=True,
                         seed=args.random_seed, native=native,
                         prefetch=args.prefetch),
            batch_loader(val_g, spec, args.batch_size, native=native,
                         prefetch=args.prefetch),
            epochs=args.epochs, patience=args.patience,
            key=jax.random.key(args.random_seed),
            test_batches=(batch_loader(test_g, spec, args.batch_size,
                                       native=native)
                          if with_test else None),
            classification=False)
        n_params = sum(int(np.prod(np.shape(x)))
                       for x in jax.tree.leaves(res["state"].params))
        return res, n_params

    def objective(trial):
        params = {"lr": trial.suggest_float("lr", 1e-4, 1e-2, log=True),
                  "hidden_layers": trial.suggest_int("hidden_layers", 1, 4),
                  "dropout": trial.suggest_float("dropout", 0.0, 0.9)}
        if arch == "mlp":
            params["hidden_dim"] = trial.suggest_int("hidden_dim", 2, 512)
        else:
            params["hidden_dim"] = trial.suggest_int("hidden_dim", 2, 64)
        if arch == "kan":
            params["grid_size"] = trial.suggest_int("grid_size", 2, 16)
            params["spline_order"] = trial.suggest_int("spline_order", 1, 4)
        elif arch == "fastkan":
            params["grid_size"] = trial.suggest_int("grid_size", 2, 32)
        res, _ = train_with_params(params, with_test=False)
        return res["best_val_loss"]

    os.makedirs("logs", exist_ok=True)
    log_file = os.path.join(
        "logs", f"{args.dataset}_{args.gnn_type}_{args.model_type}")
    test_maes = []
    for it in range(args.n_iterations):
        study = create_study(direction="minimize",
                             sampler=TPESampler(seed=args.random_seed + it))
        study.optimize(objective, n_trials=args.n_trials)
        best = dict(study.best_params)
        res, n_params = train_with_params(best, with_test=True)
        test_maes.append(res["test_metric"])
        with open(log_file, "a") as f:
            f.write(f"iter {it} best {best} test_mae {res['test_metric']} "
                    f"params {n_params}\n")
    summary = {"dataset": args.dataset,
               "test_mae_mean": float(np.mean(test_maes)),
               "test_mae_std": float(np.std(test_maes))}
    with open(log_file, "a") as f:
        f.write(f"FINAL {summary}\n")
    print(summary)


if __name__ == "__main__":
    main()
