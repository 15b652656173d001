"""Node-classification HPO driver.

Counterpart of reference node_classification_clean/one_experiment.py: an HPO
study over the same search space (lr log-uniform 1e-5..1e-2, dropout 0..0.9,
hidden width per architecture, grid size / spline order for the KAN variants,
GIN update-net depth), minimizing mean val loss across splits, followed by
3 repeated final evaluations of the best configuration.

    python experiments/node_classification.py --dataset Cora \
        --architecture kan --conv_type gcn --n_trials 100
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
    p = argparse.ArgumentParser(description="Node_classif")
    p.add_argument("--dataset", default="Cora")
    p.add_argument("--epochs", type=int, default=10000)
    p.add_argument("--patience", type=int, default=100)
    p.add_argument("--random_seed", type=int, default=12345)
    p.add_argument("--conv_type", default="gat", choices=["gin", "gcn", "gat"])
    p.add_argument("--architecture", default="mlp", choices=["mlp", "kan", "fastkan"])
    p.add_argument("--skip", type=int, default=1)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--n_trials", type=int, default=100)
    p.add_argument("--max_splits", type=int, default=None)
    p.add_argument("--data_root", default="data")
    p.add_argument("--log_dir", default="logs")
    p.add_argument("--fused", action="store_true",
                   help="use fused Pallas KAN kernels")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 mixed-precision compute")
    p.add_argument("--reorder", default="none",
                   choices=["none", "rcm", "degree"],
                   help="renumber nodes for gather locality "
                        "(graphs/reorder.py)")
    p.add_argument("--sampling", default=None,
                   help="comma-separated per-hop fanouts, e.g. 10,5 — train "
                        "on GraphSAGE-style sampled mini-batches instead of "
                        "full batch (for ogbn-arxiv scale)")
    p.add_argument("--sampling_batch", type=int, default=512,
                   help="seed-node batch size when --sampling is set")
    args = p.parse_args()
    fanouts = ([int(f) for f in args.sampling.split(",")]
               if args.sampling else None)

    from kagnn_tpu.train.experiments import run_node_experiment
    from kagnn_tpu.train.hpo import TPESampler, create_study

    def objective(trial):
        params = {
            "dataset": args.dataset,
            "conv_type": args.conv_type,
            "architecture": args.architecture,
            "patience": args.patience,
            "epochs": args.epochs,
            "skip": args.skip,
            "heads": args.heads,
            "fused": args.fused,
            "bf16": args.bf16,
            "reorder": args.reorder,
            "sampling": fanouts,
            "sampling_batch": args.sampling_batch,
            "hidden_layers": 0,
            "grid_size": 0,
            "spline_order": 0,
        }
        # search space per reference one_experiment.py:34-46
        params["lr"] = trial.suggest_float("lr", 1e-5, 1e-2, log=True)
        params["dropout"] = trial.suggest_float("dropout", 0, 0.9)
        if args.conv_type == "gin":
            params["hidden_layers"] = trial.suggest_int("hidden_layers", 1, 4)
        if args.architecture == "mlp":
            params["hidden_channels"] = trial.suggest_int(
                "hidden_channels", 1, 256)
        elif args.architecture == "fastkan":
            params["hidden_channels"] = trial.suggest_int(
                "hidden_channels", 2, 128)
            params["grid_size"] = trial.suggest_int("grid_size", 2, 32)
        elif args.architecture == "kan":
            params["hidden_channels"] = trial.suggest_int(
                "hidden_channels", 2, 128)
            params["grid_size"] = trial.suggest_int("grid_size", 1, 8)
            params["spline_order"] = trial.suggest_int("spline_order", 1, 3)
        res = run_node_experiment(params, args.dataset,
                                  data_root=args.data_root,
                                  log_dir=args.log_dir,
                                  max_splits=args.max_splits,
                                  seed=args.random_seed)
        trial.params_full = params
        return res["val_loss_mean"]

    study = create_study(direction="minimize",
                         sampler=TPESampler(seed=args.random_seed))
    study.optimize(objective, n_trials=args.n_trials)

    # 3 repeated final evaluations (reference one_experiment.py:68-77)
    best = study.best_params
    params = {
        "dataset": args.dataset, "conv_type": args.conv_type,
        "architecture": args.architecture, "patience": args.patience,
        "epochs": args.epochs, "skip": args.skip, "heads": args.heads,
        "fused": args.fused,
        "bf16": args.bf16, "reorder": args.reorder, "sampling": fanouts,
        "sampling_batch": args.sampling_batch,
        "hidden_layers": 0, "grid_size": 0, "spline_order": 0,
    }
    params.update(best)
    accs = []
    for rep in range(3):
        res = run_node_experiment(params, args.dataset,
                                  data_root=args.data_root,
                                  log_dir=args.log_dir,
                                  max_splits=args.max_splits,
                                  seed=args.random_seed + rep)
        accs.extend(res["test_accs"])
    import numpy as np

    os.makedirs(args.log_dir, exist_ok=True)
    out = {"mean": float(np.mean(accs)), "std": float(np.std(accs, ddof=1)),
           "best_params": best}
    with open(os.path.join(
            args.log_dir,
            f"{args.dataset}_{args.architecture}_{args.conv_type}_finished"),
            "a") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
