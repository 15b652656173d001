"""Benchmark harness — prints ONE JSON line with the headline metric.

Metric: training-step throughput (edges/s/chip) of the flagship KAGIN node
model on an ogbn-arxiv-scale synthetic graph (same node/edge counts as the
reference's timing target, node_classification_clean/time_model.py:25-26,
:35-48 — the reference times 20-epoch wall clock; here jitted full-graph
train steps are timed directly).

vs_baseline compares the current best compute path against the naive unfused
XLA path measured in the same run (>= 1.0 means the fused/optimized path
wins; 1.0 in rounds where they coincide).

Model init runs on the host CPU backend (lstsq-based spline init would
otherwise remote-compile on the TPU tunnel); parameters are then transferred
once.
"""
from __future__ import annotations

import json
import os
import time

import jax

# persistent compilation cache: repeated bench runs (and the driver's) skip
# the multi-minute remote compiles when nothing changed
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/kagnn_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np
import optax


def build_graph(n_nodes=169_343, n_edges=1_166_243, num_features=128,
                n_classes=40):
    from kagnn_tpu.data.synthetic import arxiv_scale_graph
    from kagnn_tpu.graphs import single_graph

    d = arxiv_scale_graph(n_nodes=n_nodes, n_edges=n_edges,
                          num_features=num_features, n_classes=n_classes)
    g = single_graph(d["senders"], d["receivers"], nodes=d["nodes"],
                     y=d["y"], edge_pad_multiple=1024)
    mask = jnp.asarray(np.arange(g.n_node_pad) < int(d["n_node"]))
    return g, mask


def make_model(fused: bool, hidden=64, grid_size=4, spline_order=3,
               mp_layers=3, num_features=128, n_classes=40,
               compute_dtype=None):
    from kagnn_tpu.models import NodeClassifier

    return NodeClassifier(conv_type="gin", architecture="kan",
                          mp_layers=mp_layers, num_features=num_features,
                          hidden_channels=hidden, num_classes=n_classes,
                          grid_size=grid_size, spline_order=spline_order,
                          skip=False, hidden_layers=2, dropout=0.0,
                          fused=fused, compute_dtype=compute_dtype)


def init_state(model, g, tx, num_features=128):
    from kagnn_tpu.train.loops import TrainState
    from kagnn_tpu.graphs import single_graph

    # parameter shapes do not depend on graph size: init on a tiny dummy
    # graph, on the host CPU backend (avoids a remote lstsq compile)
    from kagnn_tpu.ops import segment

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu), segment.use_pallas_spmm(False):
        tiny = single_graph(np.array([0, 1]), np.array([1, 0]),
                            nodes=np.zeros((8, num_features), np.float32),
                            y=np.zeros(8, np.int32))
        variables = model.init({"params": jax.random.key(0)}, tiny)
    dev = jax.devices()[0]
    variables = jax.tree.map(lambda x: jax.device_put(x, dev), variables)
    return TrainState(params=variables["params"],
                      buffers=variables.get("buffers", {}),
                      batch_stats=variables.get("batch_stats", {}),
                      opt_state=tx.init(variables["params"]),
                      step=jnp.zeros((), jnp.int32))


def time_steps(train_step, state, g, mask, warmup=2, iters=10) -> float:
    key = jax.random.key(7)
    for _ in range(warmup):
        state, loss = train_step(state, g, mask, key)
    # block on the FULL updated state, not just the scalar loss: the tunnel
    # backend has been observed to report sub-ms "step times" when only a
    # scalar is fetched
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = train_step(state, g, mask, key)
    jax.block_until_ready(state)
    return (time.perf_counter() - t0) / iters


def main():
    from kagnn_tpu.train.loops import make_node_steps

    g, mask = build_graph()
    n_edges = int(g.n_edge)
    tx = optax.adam(1e-3)

    from kagnn_tpu.ops import segment

    model = make_model(fused=False)
    state = init_state(model, g, tx)
    step, _ = make_node_steps(model, tx)
    # baseline: plain XLA end to end (no Pallas kernels anywhere)
    with segment.use_pallas_spmm(False):
        sec_baseline = time_steps(step, state, g, mask)

    best_sec, best_path = sec_baseline, "xla"
    try:
        # best path: fused Pallas kernels + sorted-segment-sum SpMM with
        # bf16 mixed-precision compute (f32 master weights/BN/logits/loss)
        model_b = make_model(fused=True, compute_dtype=jnp.bfloat16)
        step_b, _ = make_node_steps(model_b, tx)
        sec_bf16 = time_steps(step_b, state, g, mask)
        if sec_bf16 < best_sec:
            best_sec, best_path = sec_bf16, "pallas-fused-bf16"
    except Exception:
        sec_bf16 = None
    sec_fused = None
    if os.environ.get("KAGNN_BENCH_F32_FUSED"):
        # optional third path (full-f32 fused) — one more multi-minute
        # remote compile, so off by default
        try:
            model_f = make_model(fused=True)
            step_f, _ = make_node_steps(model_f, tx)
            sec_fused = time_steps(step_f, state, g, mask)
            if sec_fused < best_sec:
                best_sec, best_path = sec_fused, "pallas-fused"
        except Exception:
            sec_fused = None

    print(json.dumps({
        "metric": "edges/s/chip (KAGIN train step, arxiv-scale)",
        "value": round(n_edges / best_sec, 1),
        "unit": "edges/s",
        "vs_baseline": round(sec_baseline / best_sec, 4),
        "detail": {
            "best_path": best_path,
            "sec_per_step_best": round(best_sec, 5),
            "sec_per_step_unfused_xla": round(sec_baseline, 5),
            "sec_per_step_fused": None if sec_fused is None else round(
                sec_fused, 5),
            "sec_per_step_fused_bf16": None if sec_bf16 is None else round(
                sec_bf16, 5),
            "n_edges": n_edges,
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
