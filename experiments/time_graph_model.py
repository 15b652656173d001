"""Graph-classification timing sweep: time-to-converge + accuracy per config.

Counterpart of reference graph_classification/time_model.py:45-136 (broken
there: stale `from model import`, missing argparse keys — SURVEY.md §2.3);
this one runs. Sweeps hidden_dim x hidden_layers x grid x order, training
with early stopping on a fold of the dataset and reporting wall-clock and
test accuracy per configuration.

    KAGNN_PLATFORM=cpu python experiments/time_graph_model.py \
        --dataset MUTAG --architecture kan --epochs 50
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kagnn_tpu.utils.platform import apply_platform_env

apply_platform_env()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="MUTAG")
    p.add_argument("--architecture", default="kan",
                   choices=["kan", "fastkan", "mlp"])
    p.add_argument("--model_type", default="GIN", choices=["GIN", "GCN",
                                                           "GAT"])
    p.add_argument("--batch-size", type=int, default=32, dest="batch_size")
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--patience", type=int, default=20)
    p.add_argument("--hidden_dims", nargs="+", type=int, default=[16, 64])
    p.add_argument("--hidden_layers", nargs="+", type=int, default=[2])
    p.add_argument("--grids", nargs="+", type=int, default=[4])
    p.add_argument("--orders", nargs="+", type=int, default=[3])
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--random_seed", type=int, default=0)
    p.add_argument("--data_root", default="datasets")
    p.add_argument("--out", default="logs/graph_timing.jsonl")
    args = p.parse_args()

    import warnings

    warnings.simplefilter("ignore")
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from kagnn_tpu.data import load_graph_dataset
    from kagnn_tpu.data.tu import LAYERS_PER_DATASET
    from kagnn_tpu.graphs import pad_spec_for
    from kagnn_tpu.models import GraphClassifier
    from kagnn_tpu.train.experiments import batch_loader
    from kagnn_tpu.train.loops import (create_train_state,
                                       make_graph_cls_steps,
                                       train_graph_epochs)

    graphs = load_graph_dataset(args.dataset, args.data_root)
    rng = np.random.default_rng(args.random_seed)
    idx = rng.permutation(len(graphs))
    n = len(graphs)
    tr = [graphs[i] for i in idx[:int(0.8 * n)]]
    va = [graphs[i] for i in idx[int(0.8 * n):int(0.9 * n)]]
    te = [graphs[i] for i in idx[int(0.9 * n):]]
    spec = pad_spec_for(graphs, args.batch_size)
    num_features = graphs[0]["nodes"].shape[1]
    num_classes = int(max(int(g["y"][0]) for g in graphs)) + 1

    def intify(b):
        return b.replace(y=b.y.astype(jnp.int32))

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    for hd in args.hidden_dims:
        for hl in args.hidden_layers:
            for grid in (args.grids if args.architecture != "mlp" else [0]):
                for order in (args.orders if args.architecture == "kan"
                              else [0]):
                    model = GraphClassifier(
                        conv_type=args.model_type.lower(),
                        architecture=args.architecture,
                        gnn_layers=LAYERS_PER_DATASET.get(args.dataset, 3),
                        num_features=num_features, hidden_dim=hd,
                        num_classes=num_classes, hidden_layers=hl,
                        grid_size=grid or 4, spline_order=order or 3,
                        dropout=0.0)
                    tx = optax.adam(args.lr)
                    ex = intify(next(batch_loader(tr, spec,
                                                  args.batch_size)()))
                    state, _ = create_train_state(
                        model, jax.random.key(args.random_seed), ex, tx)
                    train_step, evaluate = make_graph_cls_steps(model, tx)
                    t0 = time.perf_counter()
                    res = train_graph_epochs(
                        state, train_step, evaluate,
                        batch_loader(tr, spec, args.batch_size, shuffle=True,
                                     seed=args.random_seed,
                                     postprocess=intify),
                        batch_loader(va, spec, args.batch_size,
                                     postprocess=intify),
                        epochs=args.epochs, patience=args.patience,
                        key=jax.random.key(args.random_seed),
                        test_batches=batch_loader(te, spec, args.batch_size,
                                                  postprocess=intify))
                    row = {"arch": args.architecture,
                           "model": args.model_type, "hidden": hd,
                           "hidden_layers": hl, "grid": grid, "order": order,
                           "seconds": round(time.perf_counter() - t0, 2),
                           "epochs_run": res["epochs_run"],
                           "test_acc": res["test_metric"]}
                    print(json.dumps(row), flush=True)
                    with open(args.out, "a") as f:
                        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
