"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline metric: training-step throughput (edges/s/chip) of the flagship
KAGIN node model on an ogbn-arxiv-scale synthetic graph (same node/edge
counts as the reference's timing target,
node_classification_clean/time_model.py:25-26, :35-48 — the reference times
20-epoch wall clock; here jitted full-graph train steps are timed directly).

vs_baseline compares the current best compute path against the naive unfused
XLA path measured in the same way (>= 1.0 means the fused/optimized path
wins).

Secondary rows (in "detail"): GCN/KAN and GAT/FastKAN node paths, the
RCM-reordered flagship, and the padded-minibatch graph-classification path
through the native C++ batch assembler + host prefetch — so regressions in
non-flagship paths stay visible (VERDICT round-1 item 7).

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


def _common_setup():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/kagnn_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


NODE_PATHS = {
    # name: (conv, arch, fused, bf16, reorder, force_xla_segment)
    "xla": ("gin", "kan", False, False, False, True),
    "pallas-fused": ("gin", "kan", True, False, False, False),
    "pallas-fused-bf16": ("gin", "kan", True, True, False, False),
    "kagin-bf16-reorder": ("gin", "kan", True, True, True, False),
    "gcn-kan-bf16": ("gcn", "kan", True, True, False, False),
    "gat-fastkan-bf16": ("gat", "fastkan", True, True, False, False),
    "gin-fastkan-bf16": ("gin", "fastkan", True, True, False, False),
}


def _measure_node_path(path: str, warmup: int = 2, iters: int = 10) -> dict:
    """Runs inside a fresh subprocess: time one full-graph train-step path."""
    _common_setup()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from kagnn_tpu.data.synthetic import arxiv_scale_graph
    from kagnn_tpu.graphs import single_graph
    from kagnn_tpu.models import NodeClassifier
    from kagnn_tpu.ops import segment
    from kagnn_tpu.train.loops import TrainState, make_node_steps

    conv, arch, fused, bf16, reorder, force_xla = NODE_PATHS[path]

    d = arxiv_scale_graph(n_nodes=169_343, n_edges=1_166_243,
                          num_features=128, n_classes=40)
    if reorder:
        from kagnn_tpu.graphs.reorder import bfs_order, reorder_graph
        d = reorder_graph(d, bfs_order)
    g = single_graph(d["senders"], d["receivers"], nodes=d["nodes"],
                     y=d["y"], edge_pad_multiple=1024)
    mask = jnp.asarray(np.arange(g.n_node_pad) < int(d["n_node"]))

    kw = dict(conv_type=conv, architecture=arch, mp_layers=3,
              num_features=128, hidden_channels=64, num_classes=40,
              grid_size=4, spline_order=3, skip=False, hidden_layers=2,
              heads=4, dropout=0.0)
    model = NodeClassifier(fused=fused,
                           compute_dtype=jnp.bfloat16 if bf16 else None, **kw)

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
    ctx = segment.use_pallas_spmm(False) if force_xla else _nullctx()

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


def _measure_graphcls(warmup: int = 1, iters: int = 5,
                      native=None, prefetch: int = 2) -> dict:
    """Padded-minibatch graph classification (KAGIN/kan) through the native
    C++ batch assembler + host prefetch — the reference's DataLoader path
    (graph_classification_utils.py:109-110) rebuilt TPU-side. `native` /
    `prefetch` select the loader variant so the assembler's win stays
    regression-guarded (VERDICT round-2 item 8)."""
    _common_setup()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from kagnn_tpu.data.synthetic import random_molecule_graphs
    from kagnn_tpu.graphs import pad_spec_for, single_graph
    from kagnn_tpu.models import GraphClassifier
    from kagnn_tpu.ops import segment
    from kagnn_tpu.train.experiments import batch_loader
    from kagnn_tpu.train.loops import TrainState, make_graph_cls_steps

    graphs = random_molecule_graphs(n_graphs=2048, min_nodes=10,
                                    max_nodes=40, seed=3)
    feats = [jax.nn.one_hot(g["nodes"][:, 0], 21) for g in graphs]
    for g, f in zip(graphs, feats):
        g["nodes"] = np.asarray(f, np.float32)
        g["edges"] = None
    spec = pad_spec_for(graphs, 256)

    model = GraphClassifier(conv_type="gin", architecture="kan",
                            gnn_layers=3, num_features=21, hidden_dim=64,
                            num_classes=2, hidden_layers=2, grid_size=4,
                            spline_order=3, compute_dtype=jnp.bfloat16)

    def intify(b):
        return b.replace(y=b.y.astype(jnp.int32))

    cpu = jax.local_devices(backend="cpu")[0]
    loader = batch_loader(graphs, spec, 256, shuffle=True, seed=0,
                          postprocess=intify, native=native,
                          prefetch=prefetch)
    example = next(batch_loader(graphs, spec, 256, postprocess=intify,
                                native=None)())
    with jax.default_device(cpu), segment.use_pallas_spmm(False):
        variables = GraphClassifier(
            conv_type="gin", architecture="kan", gnn_layers=3,
            num_features=21, hidden_dim=64, num_classes=2, hidden_layers=2,
            grid_size=4, spline_order=3).init(
            {"params": jax.random.key(0)}, example)
    dev = jax.devices()[0]
    variables = jax.tree.map(lambda a: jax.device_put(a, dev), variables)
    tx = optax.adam(1e-3)
    state = TrainState(params=variables["params"],
                       buffers=variables.get("buffers", {}),
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))
    train_step, _ = make_graph_cls_steps(model, tx)
    key = jax.random.key(5)

    n_graphs_epoch = (len(graphs) // 256) * 256
    s = state
    for _ in range(warmup):
        for b in loader():
            s, loss = train_step(s, b, key)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        for b in loader():
            s, loss = train_step(s, b, key)
    last = float(loss)
    float(jax.tree_util.tree_leaves(s.params)[0].sum())
    sec = (time.perf_counter() - t0) / iters
    import numpy as np
    return {"sec_per_epoch": sec, "graphs_per_s": n_graphs_epoch / sec,
            "backend": jax.default_backend(),
            "loss_finite": bool(np.isfinite(last))}


def _measure_assembly() -> dict:
    """HOST-side batch-assembly cost, native C++ assembler vs the numpy
    path, on the graphcls bench shapes — deterministic (no device, no
    tunnel). This, not the epoch rows, is the regression guard for the
    native assembler: the device epoch times through the axon tunnel swing
    by ~10 ms/batch run-to-run (host->device transfer noise), several times
    the 2-5 ms assembly cost they were meant to expose."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from kagnn_tpu.data.native import NativeBatchAssembler, native_available
    from kagnn_tpu.data.synthetic import random_molecule_graphs
    from kagnn_tpu.graphs import pad_spec_for
    from kagnn_tpu.graphs.batch import batch_graphs

    graphs = random_molecule_graphs(n_graphs=2048, min_nodes=10,
                                    max_nodes=40, seed=3)
    for g in graphs:
        g["nodes"] = np.asarray(jax.nn.one_hot(g["nodes"][:, 0], 21),
                                np.float32)
        g["edges"] = None
    spec = pad_spec_for(graphs, 256)
    rng = np.random.default_rng(0)
    sels = [rng.permutation(2048)[:256] for _ in range(20)]

    def best_of(fn, windows=5):
        best = float("inf")
        for _ in range(windows):
            t0 = time.perf_counter()
            for s in sels:
                fn(s)
            best = min(best, (time.perf_counter() - t0) / len(sels))
        return best * 1e3

    out = {"python_ms_per_batch": round(
        best_of(lambda s: batch_graphs([graphs[j] for j in s], spec)), 3)}
    if native_available():
        asm = NativeBatchAssembler(graphs, spec)
        out["native_ms_per_batch"] = round(
            best_of(lambda s: asm.assemble(s)), 3)
        out["native_speedup"] = round(
            out["python_ms_per_batch"] / out["native_ms_per_batch"], 2)
    return out


def _measure_halo_1dev(warmup: int = 2, iters: int = 10) -> dict:
    """Flagship KAGIN train step through the HALO partition machinery at
    n_shards=1 on the real chip — bounds the partition tax (all_to_all on a
    singleton mesh + extended-table bookkeeping) vs the unsharded
    pallas-fused-bf16 row (VERDICT round-2 item 7)."""
    _common_setup()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from kagnn_tpu.data.synthetic import arxiv_scale_graph
    from kagnn_tpu.dist.halo import build_halo_plan, make_halo_node_step
    from kagnn_tpu.dist.mesh import make_mesh
    from kagnn_tpu.graphs import single_graph
    from kagnn_tpu.models import NodeClassifier
    from kagnn_tpu.ops import segment
    from kagnn_tpu.train.loops import TrainState

    d = arxiv_scale_graph(n_nodes=169_343, n_edges=1_166_243,
                          num_features=128, n_classes=40)
    g = single_graph(d["senders"], d["receivers"], nodes=d["nodes"],
                     y=d["y"], edge_pad_multiple=1024)
    mask = np.asarray(g.node_mask)

    kw = dict(conv_type="gin", architecture="kan", mp_layers=3,
              num_features=128, hidden_channels=64, num_classes=40,
              grid_size=4, spline_order=3, skip=False, hidden_layers=2,
              heads=4, dropout=0.0)
    model = NodeClassifier(fused=True, compute_dtype=jnp.bfloat16, **kw)
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
    mesh = make_mesh((1,), ("graph",), devices=jax.devices()[:1])
    plan = build_halo_plan(g, 1)
    step, _ = make_halo_node_step(model, tx, mesh, plan, g, mask)
    key = jax.random.key(7)
    s_ = state
    for _ in range(warmup):
        s_, loss = step(s_, key)
    float(loss)
    float(jax.tree_util.tree_leaves(s_.params)[0].sum())
    # params evolve every step, so no two executions are identical (the
    # relay-cache defeat the other rows get from input perturbation)
    t0 = time.perf_counter()
    for _ in range(iters):
        key = jax.random.fold_in(key, 1)
        s_, loss = step(s_, key)
    float(loss)
    float(jax.tree_util.tree_leaves(s_.params)[0].sum())
    sec = (time.perf_counter() - t0) / iters
    return {"sec_per_step": sec, "n_edges": int(g.n_edge),
            "backend": jax.default_backend(),
            "loss_finite": bool(np.isfinite(float(loss)))}


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
    if path == "graphcls-minibatch":
        print(json.dumps(_measure_graphcls()))
        return
    if path == "graphcls-python-loader":
        print(json.dumps(_measure_graphcls(native=False, prefetch=0)))
        return
    if path == "graphcls-noprefetch":
        print(json.dumps(_measure_graphcls(native=None, prefetch=0)))
        return
    if path == "halo-1dev":
        print(json.dumps(_measure_halo_1dev()))
        return
    if path == "graphcls-assembly":
        print(json.dumps(_measure_assembly()))
        return
    if path:
        print(json.dumps(_measure_node_path(path)))
        return

    # required paths (headline + baseline)
    results = {p: _run_subprocess(p) for p in ["xla", "pallas-fused-bf16"]}
    # secondary coverage rows: record errors without failing the headline
    extra = ["gcn-kan-bf16", "gat-fastkan-bf16", "gin-fastkan-bf16",
             "kagin-bf16-reorder", "halo-1dev", "graphcls-minibatch",
             "graphcls-python-loader", "graphcls-noprefetch",
             "graphcls-assembly"]
    if os.environ.get("KAGNN_BENCH_F32_FUSED"):
        extra.insert(0, "pallas-fused")
    if os.environ.get("KAGNN_BENCH_FAST"):
        extra = []
    errors = {}
    for p in extra:
        try:
            results[p] = _run_subprocess(p)
        except Exception as e:  # keep the headline alive
            errors[p] = str(e)[-300:]

    baseline = results["xla"]["sec_per_step"]
    node_paths = [p for p in results if "sec_per_step" in results[p]]
    flagship = min(("pallas-fused-bf16", "pallas-fused", "xla"),
                   key=lambda p: results[p]["sec_per_step"]
                   if p in results else float("inf"))
    best = results[flagship]["sec_per_step"]
    n_edges = results[flagship]["n_edges"]
    detail = {
        "best_path": flagship,
        "sec_per_step_best": round(best, 5),
        "sec_per_step_unfused_xla": round(baseline, 5),
        **{f"sec_per_step_{p}": round(results[p]["sec_per_step"], 5)
           for p in node_paths},
        **{f"edges_per_s_{p}": round(n_edges / results[p]["sec_per_step"], 1)
           for p in node_paths if p != "xla"},
        "n_edges": n_edges,
        "backend": results[flagship]["backend"],
        "isolation": "one fresh subprocess per path, per-iteration "
                     "input perturbation (tunnel-relay cache defeat)",
    }
    if "graphcls-minibatch" in results:
        r = results["graphcls-minibatch"]
        detail["graphcls_graphs_per_s"] = round(r["graphs_per_s"], 1)
        detail["graphcls_sec_per_epoch"] = round(r["sec_per_epoch"], 5)
    for variant, key in (("graphcls-python-loader", "graphcls_python"),
                         ("graphcls-noprefetch", "graphcls_noprefetch")):
        if variant in results:
            detail[f"{key}_graphs_per_s"] = round(
                results[variant]["graphs_per_s"], 1)
    if "graphcls-assembly" in results:
        for k, v in results["graphcls-assembly"].items():
            detail[f"assembly_{k}"] = v
    if errors:
        detail["errors"] = errors
    print(json.dumps({
        "metric": "edges/s/chip (KAGIN train step, arxiv-scale)",
        "value": round(n_edges / best, 1),
        "unit": "edges/s",
        "vs_baseline": round(baseline / best, 4),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
