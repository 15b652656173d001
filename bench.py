"""Benchmark harness — prints ONE JSON line with the headline metric.

Metric: training-step throughput (edges/s/chip) of the flagship KAGIN node
model on an ogbn-arxiv-scale synthetic graph (same node/edge counts as the
reference's timing target, node_classification_clean/time_model.py:25-26,
:35-48 — the reference times 20-epoch wall clock; here jitted full-graph
train steps are timed directly).

vs_baseline compares the current best compute path against the naive unfused
XLA path measured in the same way (>= 1.0 means the fused/optimized path
wins).

Measurement discipline (the TPU here is behind the axon tunnel relay, which
has two observed failure modes):
  * the relay CACHES responses to repeated identical executions and can
    replay them with the original timing — so every iteration perturbs the
    node features (on device) and every process perturbs the initial input
    with fresh OS entropy, making each execution unique;
  * a process that has compiled several executables can degrade to bogus
    (non-blocking or inflated) timings — so each compute path is measured
    first-thing in its own fresh subprocess (the persistent compilation
    cache keeps repeat compiles cheap).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _measure_path(path: str, warmup: int = 2, iters: int = 10) -> dict:
    """Runs inside a fresh subprocess: time one compute path."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/kagnn_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np
    import optax

    from kagnn_tpu.data.synthetic import arxiv_scale_graph
    from kagnn_tpu.graphs import single_graph
    from kagnn_tpu.models import NodeClassifier
    from kagnn_tpu.ops import segment
    from kagnn_tpu.train.loops import TrainState, make_node_steps

    d = arxiv_scale_graph(n_nodes=169_343, n_edges=1_166_243,
                          num_features=128, n_classes=40)
    g = single_graph(d["senders"], d["receivers"], nodes=d["nodes"],
                     y=d["y"], edge_pad_multiple=1024)
    mask = jnp.asarray(np.arange(g.n_node_pad) < int(d["n_node"]))

    kw = dict(conv_type="gin", architecture="kan", mp_layers=3,
              num_features=128, hidden_channels=64, num_classes=40,
              grid_size=4, spline_order=3, skip=False, hidden_layers=2,
              dropout=0.0)
    if path == "xla":
        model = NodeClassifier(fused=False, **kw)
    elif path == "pallas-fused":
        model = NodeClassifier(fused=True, **kw)
    else:  # pallas-fused-bf16
        model = NodeClassifier(fused=True, compute_dtype=jnp.bfloat16, **kw)

    # init on the host CPU backend (lstsq spline init would remote-compile),
    # with the unfused twin (same param tree; Pallas can't trace on CPU)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu), segment.use_pallas_spmm(False):
        tiny = single_graph(np.array([0, 1]), np.array([1, 0]),
                            nodes=np.zeros((8, 128), np.float32),
                            y=np.zeros(8, np.int32))
        variables = NodeClassifier(fused=False, **kw).init(
            {"params": jax.random.key(0)}, tiny)
    dev = jax.devices()[0]
    variables = jax.tree.map(lambda a: jax.device_put(a, dev), variables)
    tx = optax.adam(1e-3)
    state = TrainState(params=variables["params"],
                       buffers=variables.get("buffers", {}),
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))

    step_fn, _ = make_node_steps(model, tx)
    ctx = segment.use_pallas_spmm(False) if path == "xla" else _nullctx()

    # fresh-entropy perturbation: no process ever executes the same
    # (program, inputs) pair as any other process or iteration
    jitter = 1.0 + (int.from_bytes(os.urandom(4), "little") % 1000) * 1e-9
    nodes = g.nodes * jitter
    key = jax.random.key(7)
    with ctx:
        s = state
        for _ in range(warmup):
            nodes = nodes * (1.0 + 1e-6)
            s, loss = step_fn(s, g.replace(nodes=nodes), mask, key)
        # synchronize by FETCHING DATA, not block_until_ready: the tunnel
        # relay's readiness signal has been observed to return early, but a
        # host transfer of freshly-computed values cannot be faked
        float(loss)
        float(jax.tree_util.tree_leaves(s.params)[0].sum())
        t0 = time.perf_counter()
        losses = []
        for _ in range(iters):
            nodes = nodes * (1.0 + 1e-6)
            s, loss = step_fn(s, g.replace(nodes=nodes), mask, key)
            losses.append(loss)
        # the last loss + updated params transitively depend on every step
        last_loss = float(losses[-1])
        checksum = float(jax.tree_util.tree_leaves(s.params)[0].sum())
        sec = (time.perf_counter() - t0) / iters
    return {"sec_per_step": sec, "n_edges": int(g.n_edge),
            "backend": jax.default_backend(),
            "loss_finite": bool(np.isfinite(last_loss)),
            "checksum": checksum}


class _nullctx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _run_subprocess(path: str) -> dict:
    env = dict(os.environ, KAGNN_BENCH_PATH=path)
    r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                       env=env, capture_output=True, text=True,
                       timeout=3600)
    for line in reversed(r.stdout.splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"bench path {path} failed:\n{r.stderr[-3000:]}")


def main():
    path = os.environ.get("KAGNN_BENCH_PATH")
    if path:
        print(json.dumps(_measure_path(path)))
        return

    paths = ["xla", "pallas-fused-bf16"]
    if os.environ.get("KAGNN_BENCH_F32_FUSED"):
        paths.append("pallas-fused")
    results = {p: _run_subprocess(p) for p in paths}
    baseline = results["xla"]["sec_per_step"]
    best_path = min(results, key=lambda p: results[p]["sec_per_step"])
    best = results[best_path]["sec_per_step"]
    n_edges = results[best_path]["n_edges"]
    print(json.dumps({
        "metric": "edges/s/chip (KAGIN train step, arxiv-scale)",
        "value": round(n_edges / best, 1),
        "unit": "edges/s",
        "vs_baseline": round(baseline / best, 4),
        "detail": {
            "best_path": best_path,
            "sec_per_step_best": round(best, 5),
            "sec_per_step_unfused_xla": round(baseline, 5),
            **{f"sec_per_step_{p}": round(r["sec_per_step"], 5)
               for p, r in results.items()},
            "n_edges": n_edges,
            "backend": results[best_path]["backend"],
            "isolation": "one fresh subprocess per path, per-iteration "
                         "input perturbation (tunnel-relay cache defeat)",
        },
    }))


if __name__ == "__main__":
    main()
