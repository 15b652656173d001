"""Benchmark harness — prints ONE JSON line with the headline metric.

Metric: training-step throughput (edges/s/chip) of the flagship KAGIN node
model on an ogbn-arxiv-scale synthetic graph (same node/edge counts as the
reference's timing target, node_classification_clean/time_model.py:25-26,
:35-48 — 20-epoch wall-clock protocol, here timed over jitted full-graph
train steps).

vs_baseline compares the current best compute path against the naive unfused
XLA path measured in the same run (>= 1.0 means the fused/optimized path
wins; 1.0 in rounds where they coincide).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def build(hidden: int = 64, grid_size: int = 4, spline_order: int = 3,
          mp_layers: int = 3, fused: bool = False,
          n_nodes: int = 169_343, n_edges: int = 1_166_243,
          num_features: int = 128, n_classes: int = 40):
    from kagnn_tpu.data.synthetic import arxiv_scale_graph
    from kagnn_tpu.graphs import single_graph
    from kagnn_tpu.models import NodeClassifier
    from kagnn_tpu.train.loops import TrainState, make_node_steps

    d = arxiv_scale_graph(n_nodes=n_nodes, n_edges=n_edges,
                          num_features=num_features, n_classes=n_classes)
    g = single_graph(d["senders"], d["receivers"], nodes=d["nodes"],
                     y=d["y"], edge_pad_multiple=1024)
    model = NodeClassifier(conv_type="gin", architecture="kan",
                           mp_layers=mp_layers, num_features=num_features,
                           hidden_channels=hidden, num_classes=n_classes,
                           grid_size=grid_size, spline_order=spline_order,
                           skip=False, hidden_layers=2, dropout=0.0,
                           fused=fused)
    variables = model.init({"params": jax.random.key(0)}, g)
    tx = optax.adam(1e-3)
    state = TrainState(params=variables["params"],
                       buffers=variables.get("buffers", {}),
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))
    train_step, _ = make_node_steps(model, tx)
    mask = jnp.asarray(np.arange(g.n_node_pad) < int(d["n_node"]))
    return g, state, train_step, mask


def time_steps(g, state, train_step, mask, warmup: int = 3,
               iters: int = 10) -> float:
    key = jax.random.key(7)
    for _ in range(warmup):
        state, loss = train_step(state, g, mask, key)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = train_step(state, g, mask, key)
    jax.block_until_ready(loss)
    return (time.perf_counter() - t0) / iters


def main():
    g, state, step, mask = build(fused=False)
    sec_baseline = time_steps(g, state, step, mask)
    n_edges = int(g.n_edge)

    # current best path (fused Pallas kernels when available)
    best_sec = sec_baseline
    try:
        gf, sf, stepf, maskf = build(fused=True)
        sec_fused = time_steps(gf, sf, stepf, maskf)
        best_sec = min(best_sec, sec_fused)
    except Exception:
        pass

    edges_per_s = n_edges / best_sec
    print(json.dumps({
        "metric": "edges/s/chip (KAGIN train step, arxiv-scale)",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(sec_baseline / best_sec, 4),
        "detail": {
            "sec_per_step_best": round(best_sec, 5),
            "sec_per_step_unfused_xla": round(sec_baseline, 5),
            "n_edges": n_edges,
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
