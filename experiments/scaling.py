"""Edge-partition scaling harness — edges/s at 1..N devices (the
1-chip / 1-host / N-host scaling-efficiency deliverable of BASELINE.md).

On a single-chip box, run against virtual CPU devices to validate the
partitioned path end-to-end:

    KAGNN_PLATFORM=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python experiments/scaling.py --devices 1 2 4 8
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
    p.add_argument("--devices", nargs="+", type=int, default=[1, 2, 4, 8])
    p.add_argument("--n_nodes", type=int, default=20000)
    p.add_argument("--n_edges", type=int, default=200000)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--architecture", default="kan",
                   choices=["mlp", "kan", "fastkan"])
    p.add_argument("--conv", default="gin", choices=["gin", "gcn", "gat"])
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--fused", action="store_true")
    p.add_argument("--strategy", default="halo",
                   choices=["halo", "allreduce"],
                   help="halo: node shards + boundary-only all_to_all "
                        "(dist/halo.py); allreduce: replicated nodes + "
                        "full psum (dist/partition.py)")
    p.add_argument("--reorder", default="none",
                   choices=["none", "rcm", "degree"],
                   help="renumber nodes before partitioning (shrinks the "
                        "halo boundary)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from kagnn_tpu.data.synthetic import arxiv_scale_graph
    from kagnn_tpu.dist.halo import halo_scaling_report
    from kagnn_tpu.dist.partition import scaling_report
    from kagnn_tpu.graphs import single_graph
    from kagnn_tpu.models import NodeClassifier
    from kagnn_tpu.train.loops import create_train_state

    d = arxiv_scale_graph(n_nodes=args.n_nodes, n_edges=args.n_edges,
                          num_features=64, n_classes=10)
    if args.reorder != "none":
        from kagnn_tpu.graphs.reorder import (bfs_order, degree_order,
                                              reorder_graph)
        d = reorder_graph(d, {"rcm": bfs_order,
                              "degree": degree_order}[args.reorder])
    g = single_graph(d["senders"], d["receivers"], nodes=d["nodes"],
                     y=d["y"], edge_pad_multiple=1024)
    mask = jnp.asarray(np.arange(g.n_node_pad) < int(d["n_node"]))

    def model_fn():
        model = NodeClassifier(conv_type=args.conv,
                               architecture=args.architecture, mp_layers=3,
                               num_features=64,
                               hidden_channels=args.hidden, num_classes=10,
                               skip=False, fused=args.fused)
        tx = optax.adam(1e-3)
        state, _ = create_train_state(model, jax.random.key(0), g, tx)
        return model, state, g, mask, tx

    report = (halo_scaling_report if args.strategy == "halo"
              else scaling_report)
    rows = report(model_fn, n_devices_list=args.devices, iters=args.iters)
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
