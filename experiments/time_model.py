"""Timing harness — sec/epoch sweep over architectures x widths x grid sizes.

Counterpart of reference node_classification_clean/time_model.py:35-106
(20-epoch wall-clock average on ogbn-arxiv), with its bugs fixed (undefined
`sparse_diag`, GCN-only manual normalization) — here every conv type runs
through the same jitted train step. Falls back to an arxiv-scale synthetic
graph when the dataset is not on disk.

    python experiments/time_model.py --dataset ogbn-arxiv --conv gin \
        --architectures kan fastkan mlp --epochs 20
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

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="ogbn-arxiv")
    p.add_argument("--conv", default="gin", help="gin/gcn/gat")
    p.add_argument("--architectures", nargs="+",
                   default=["mlp", "kan", "fastkan"])
    p.add_argument("--hidden", nargs="+", type=int, default=[64])
    p.add_argument("--grids", nargs="+", type=int, default=[4])
    p.add_argument("--orders", nargs="+", type=int, default=[3])
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--data_root", default="data")
    p.add_argument("--fused", action="store_true")
    p.add_argument("--out", default="logs/timing.jsonl")
    args = p.parse_args()

    import warnings

    warnings.simplefilter("ignore")
    from kagnn_tpu.data import DATASET_LAYERS, load_node_dataset
    from kagnn_tpu.graphs import single_graph
    from kagnn_tpu.models import NodeClassifier
    from kagnn_tpu.train.loops import create_train_state, make_node_steps

    d = load_node_dataset(args.dataset, args.data_root)
    g = single_graph(d["senders"], d["receivers"], nodes=d["nodes"],
                     y=d["y"], edge_pad_multiple=1024)
    mask = jnp.asarray(np.concatenate(
        [d["train_masks"][0],
         np.zeros(g.n_node_pad - d["n_node"], bool)]))
    mp_layers = DATASET_LAYERS.get(args.dataset, 3)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    rows = []
    for arch in args.architectures:
        for hid in args.hidden:
            for grid in (args.grids if arch != "mlp" else [0]):
                for order in (args.orders if arch == "kan" else [0]):
                    model = NodeClassifier(
                        conv_type=args.conv, architecture=arch,
                        mp_layers=mp_layers,
                        num_features=d["nodes"].shape[1],
                        hidden_channels=hid,
                        num_classes=d["num_classes"], skip=False,
                        grid_size=grid or 4, spline_order=order or 3,
                        fused=args.fused)
                    tx = optax.adam(1e-3)
                    state, _ = create_train_state(
                        model, jax.random.key(0), g, tx)
                    step, _ = make_node_steps(model, tx)
                    key = jax.random.key(1)
                    state, loss = step(state, g, mask, key)  # compile
                    jax.block_until_ready(loss)
                    t0 = time.perf_counter()
                    for _ in range(args.epochs):
                        state, loss = step(state, g, mask, key)
                    jax.block_until_ready(loss)
                    sec = (time.perf_counter() - t0) / args.epochs
                    row = {"arch": arch, "conv": args.conv, "hidden": hid,
                           "grid": grid, "order": order,
                           "sec_per_epoch": round(sec, 5),
                           "edges_per_s": round(int(g.n_edge) / sec, 1)}
                    rows.append(row)
                    print(json.dumps(row), flush=True)
                    with open(args.out, "a") as f:
                        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
