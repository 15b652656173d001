"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline metric: training-step throughput (edges/s/chip) of the flagship
KAGIN node model on an ogbn-arxiv-scale synthetic graph (same node/edge
counts as the reference's timing target,
node_classification_clean/time_model.py:25-26, :35-48 — the reference times
20-epoch wall clock; here jitted full-graph train steps are timed directly).

vs_baseline compares the current best compute path against the naive unfused
XLA path measured in the same way (>= 1.0 means the fused/optimized path
wins).

Durability contract (round-3 postmortem: BENCH_r03 was rc=124 with an empty
tail — the driver's wall clock expired before the old 11-sequential-
subprocess design printed anything):
  * the headline JSON line is emitted AS SOON AS the flagship row is
    measured, then RE-emitted (enriched) after every additional row — the
    driver parses the LAST JSON line, so early partial lines are strictly
    an improvement;
  * a wall-clock budget (env KAGNN_BENCH_BUDGET_S, default 450 s) is
    enforced both between subprocesses (parent) and between rows (child,
    via an absolute-deadline env var); rows that don't fit are recorded in
    detail.skipped instead of killing the run;
  * the dominant per-subprocess cost was identified and removed: uploading
    the 83 MB synthetic feature matrix through the axon tunnel runs at
    ~1 MB/s (measured 2026-08-20: 87.8 s; on-device jax.random generation
    of the same matrix: 2.6 s).  Features and labels are now generated
    ON DEVICE; only the ~9 MB graph structure is uploaded.

Measurement discipline (the TPU here is behind the axon tunnel relay, which
has two observed failure modes):
  * the relay CACHES responses to repeated identical executions and can
    replay them with the original timing — so every iteration perturbs the
    node features (on device) and every process perturbs the initial input
    with fresh OS entropy, making each execution unique;
  * a process that has compiled several executables can degrade to bogus
    (non-blocking or inflated) timings — so rows are measured in fresh
    subprocesses, EXCEPT the two required rows (flagship + xla baseline)
    which share one subprocess to fit the budget; a sanity floor
    (sec_per_step > 5 ms — physically impossible to beat at this size)
    flags any non-blocking-timing artifact.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_START = time.time()
BUDGET_S = float(os.environ.get("KAGNN_BENCH_BUDGET_S", "450"))
# wall-clock reserved at the tail of the budget for the final emission +
# child teardown: no row may START unless its estimate fits before
# BUDGET_S - MARGIN_S (round-4 postmortem: elapsed 453.1 > 450 budget)
MARGIN_S = 12.0
# fallback baseline (sec/step, unfused XLA row) from the last driver-verified
# bench (BENCH_r02.json) — used for vs_baseline only until/unless the xla row
# is measured live in this run; detail.baseline_source says which was used,
# and vs_baseline is forced to 0.0 so a cross-round ratio is never machine-
# readable as a live one (round-4 advisor finding).
FALLBACK_XLA_SEC = 0.23234


def _remaining() -> float:
    return BUDGET_S - (time.time() - _START)


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
    "gcn-fastkan-bf16": ("gcn", "fastkan", True, True, False, False),
    "gat-fastkan-bf16": ("gat", "fastkan", True, True, False, False),
    "gin-fastkan-bf16": ("gin", "fastkan", True, True, False, False),
}

_ARXIV = dict(n_nodes=169_343, n_edges=1_166_243, num_features=128,
              n_classes=40)


def _arxiv_structure():
    """Graph structure (senders/receivers only — features are generated on
    device, see module docstring). Cached across subprocesses in /tmp."""
    import numpy as np

    cache = "/tmp/kagnn_bench_arxiv_structure.npz"
    try:
        z = np.load(cache)
        return z["senders"], z["receivers"]
    except Exception:
        pass
    from kagnn_tpu.data.synthetic import arxiv_scale_graph

    d = arxiv_scale_graph(**_ARXIV)
    try:
        np.savez(cache + f".tmp{os.getpid()}", senders=d["senders"],
                 receivers=d["receivers"])
        os.replace(cache + f".tmp{os.getpid()}.npz", cache)
    except Exception:
        pass
    return d["senders"], d["receivers"]


def _arxiv_batch(reorder: bool = False):
    """Padded GraphBatch for the bench graph with ON-DEVICE features/labels
    (structure uploads ~9 MB; the 83 MB feature matrix never crosses the
    tunnel). Returns (g, mask)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from kagnn_tpu.graphs import single_graph

    snd, rcv = _arxiv_structure()
    n_nodes = _ARXIV["n_nodes"]
    if reorder:
        from kagnn_tpu.graphs.reorder import bfs_order, reorder_graph

        d = dict(senders=snd, receivers=rcv, n_node=n_nodes,
                 nodes=np.zeros((n_nodes, 1), np.float32),
                 y=np.zeros(n_nodes, np.int32))
        d = reorder_graph(d, bfs_order)
        snd, rcv = d["senders"], d["receivers"]
    g = single_graph(snd, rcv, n_node=n_nodes, edge_pad_multiple=1024)
    n_pad = g.n_node_pad

    @jax.jit
    def gen(key):
        kx, ky = jax.random.split(key)
        nodes = jax.random.normal(kx, (n_pad, _ARXIV["num_features"]),
                                  jnp.float32)
        y = jax.random.randint(ky, (n_pad,), 0, _ARXIV["n_classes"],
                               jnp.int32)
        return nodes, y

    # fresh-entropy seed: no process generates the same features as another
    seed = int.from_bytes(os.urandom(4), "little")
    nodes, y = gen(jax.random.key(seed))
    mask = jnp.asarray(np.arange(n_pad) < n_nodes)
    return g.replace(nodes=nodes, y=y), mask


_NODE_KW = dict(mp_layers=3, num_features=128, hidden_channels=64,
                num_classes=40, grid_size=4, spline_order=3, skip=False,
                hidden_layers=2, heads=4, dropout=0.0)


def _init_variables(conv: str, arch: str):
    """CPU init of the node-model param tree (lstsq spline init must not
    remote-compile). Cached across subprocesses per (conv, arch)."""
    import pickle

    import jax
    import numpy as np

    cache = f"/tmp/kagnn_bench_init_{conv}_{arch}.pkl"
    try:
        with open(cache, "rb") as f:
            return pickle.load(f)
    except Exception:
        pass
    from kagnn_tpu.graphs import single_graph
    from kagnn_tpu.models import NodeClassifier
    from kagnn_tpu.ops import segment

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu), segment.use_pallas_spmm(False):
        tiny = single_graph(np.array([0, 1]), np.array([1, 0]),
                            nodes=np.zeros((8, 128), np.float32),
                            y=np.zeros(8, np.int32))
        variables = NodeClassifier(fused=False, conv_type=conv,
                                   architecture=arch, **_NODE_KW).init(
            {"params": jax.random.key(0)}, tiny)
    variables = jax.tree.map(np.asarray, variables)
    try:
        with open(cache + f".tmp{os.getpid()}", "wb") as f:
            pickle.dump(variables, f)
        os.replace(cache + f".tmp{os.getpid()}", cache)
    except Exception:
        pass
    return variables


def _measure_node_path(path: str, warmup: int = 2, iters: int = 10) -> dict:
    """Runs inside a subprocess: time one full-graph train-step path."""
    _common_setup()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from kagnn_tpu.models import NodeClassifier
    from kagnn_tpu.ops import segment
    from kagnn_tpu.train.loops import TrainState, make_node_steps

    conv, arch, fused, bf16, reorder, force_xla = NODE_PATHS[path]
    g, mask = _arxiv_batch(reorder=reorder)

    model = NodeClassifier(fused=fused, conv_type=conv, architecture=arch,
                           compute_dtype=jnp.bfloat16 if bf16 else None,
                           **_NODE_KW)
    variables = _init_variables(conv, arch)
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

    nodes = g.nodes
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
        # best-of-3 windows: the relay's per-process stream rate sometimes
        # settles degraded (~2.5x) for the first executions of a new
        # executable — the min window is the real device rate
        windows = []
        for _ in range(3):
            t0 = time.perf_counter()
            losses = []
            for _ in range(iters):
                nodes = nodes * (1.0 + 1e-6)
                s, loss = step_fn(s, g.replace(nodes=nodes), mask, key)
                losses.append(loss)
            # last loss + params transitively depend on every step
            last_loss = float(losses[-1])
            checksum = float(jax.tree_util.tree_leaves(s.params)[0].sum())
            windows.append((time.perf_counter() - t0) / iters)
        sec = min(windows)
    return {"sec_per_step": sec, "n_edges": int(g.n_edge),
            "backend": jax.default_backend(),
            "loss_finite": bool(np.isfinite(last_loss)),
            "suspect": bool(sec < 0.005),  # non-blocking-timing artifact
            "windows": [round(w, 5) for w in windows],
            "checksum": checksum}


def _measure_graphcls(warmup: int = 1, iters: int = 2,
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
    # best-of-2 windows (the min already discards the degraded-first-
    # window relay artifact): every epoch uploads ~7 MB of batches
    # through the ~1 MB/s tunnel, so total epochs bound the row's wall
    # cost — 16 epochs blew the per-group watchdog, and a third window
    # costs ~30 s that squeezed the assembly row out of the budget
    windows = []
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            for b in loader():
                s, loss = train_step(s, b, key)
        last = float(loss)
        float(jax.tree_util.tree_leaves(s.params)[0].sum())
        windows.append((time.perf_counter() - t0) / iters)
    sec = min(windows)
    return {"sec_per_epoch": sec, "graphs_per_s": n_graphs_epoch / sec,
            "backend": jax.default_backend(),
            "windows": [round(w, 5) for w in windows],
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

    from kagnn_tpu.dist.halo import build_halo_plan, make_halo_node_step
    from kagnn_tpu.dist.mesh import make_mesh
    from kagnn_tpu.models import NodeClassifier
    from kagnn_tpu.train.loops import TrainState

    g, mask_dev = _arxiv_batch()
    mask = np.asarray(mask_dev)

    model = NodeClassifier(fused=True, compute_dtype=jnp.bfloat16,
                           conv_type="gin", architecture="kan", **_NODE_KW)
    variables = _init_variables("gin", "kan")
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
    # relay-cache defeat the other rows get from input perturbation);
    # best-of-3 windows as in _measure_node_path (per-process relay
    # stream-rate variance)
    windows = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            key = jax.random.fold_in(key, 1)
            s_, loss = step(s_, key)
        float(loss)
        float(jax.tree_util.tree_leaves(s_.params)[0].sum())
        windows.append((time.perf_counter() - t0) / iters)
    sec = min(windows)
    return {"sec_per_step": sec, "n_edges": int(g.n_edge),
            "backend": jax.default_backend(),
            "suspect": bool(sec < 0.005),
            "windows": [round(w, 5) for w in windows],
            "loss_finite": bool(np.isfinite(float(loss)))}


class _nullctx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


SPECIAL_ROWS = {
    "graphcls-minibatch": lambda: _measure_graphcls(),
    "graphcls-python-loader": lambda: _measure_graphcls(native=False,
                                                        prefetch=0),
    "graphcls-noprefetch": lambda: _measure_graphcls(native=None,
                                                     prefetch=0),
    "halo-1dev": _measure_halo_1dev,
    "graphcls-assembly": _measure_assembly,
}


def _child_main(paths):
    """Measure each requested row, print one JSON line per row (flushed),
    respect the absolute deadline between rows."""
    deadline = float(os.environ.get("KAGNN_BENCH_DEADLINE", "0")) or None
    for p in paths:
        if deadline and time.time() > deadline:
            print(json.dumps({"path": p, "skipped": "deadline"}), flush=True)
            continue
        try:
            row = (SPECIAL_ROWS[p]() if p in SPECIAL_ROWS
                   else _measure_node_path(p))
            print(json.dumps({"path": p, **row}), flush=True)
        except Exception as e:  # keep remaining rows alive
            print(json.dumps({"path": p, "error": str(e)[-300:]}),
                  flush=True)


class _Headline:
    """Accumulates row results and (re-)emits the full headline JSON line
    after every update. The driver parses the LAST JSON line, so each
    re-emission supersedes the previous one."""

    def __init__(self):
        self.rows = {}
        self.errors = {}
        self.skipped = []

    def update(self, rec: dict):
        p = rec.pop("path")
        if "error" in rec:
            self.errors[p] = rec["error"]
        elif "skipped" in rec:
            self.skipped.append(p)
        else:
            self.rows[p] = rec

    def emit(self, final: bool = False):
        rows = self.rows
        node_rows = {p: r for p, r in rows.items()
                     if "sec_per_step" in r and not r.get("suspect")}
        if "pallas-fused-bf16" not in node_rows and not any(
                p in node_rows for p in ("pallas-fused", "xla")):
            return False  # nothing measurable yet
        flagship = min(("pallas-fused-bf16", "pallas-fused", "xla"),
                       key=lambda p: node_rows[p]["sec_per_step"]
                       if p in node_rows else float("inf"))
        best = node_rows[flagship]["sec_per_step"]
        n_edges = node_rows[flagship]["n_edges"]
        if "xla" in node_rows:
            baseline, baseline_source = node_rows["xla"]["sec_per_step"], \
                "measured"
            vs_baseline = round(baseline / best, 4)
        else:
            baseline, baseline_source = FALLBACK_XLA_SEC, \
                "cached-BENCH_r02 (xla row not yet measured this run)"
            vs_baseline = 0.0  # stale cross-round ratio must not be machine-readable as live
        detail = {
            "best_path": flagship,
            "sec_per_step_best": round(best, 5),
            "sec_per_step_unfused_xla": round(baseline, 5),
            "baseline_source": baseline_source,
            **{f"sec_per_step_{p}": round(r["sec_per_step"], 5)
               for p, r in node_rows.items()},
            **{f"edges_per_s_{p}":
               round(r["n_edges"] / r["sec_per_step"], 1)
               for p, r in node_rows.items() if p != "xla"},
            "n_edges": n_edges,
            "backend": node_rows[flagship]["backend"],
            "budget_s": BUDGET_S,
            "elapsed_s": round(time.time() - _START, 1),
            "isolation": "required rows share one fresh subprocess, extras "
                         "one subprocess each; per-iteration on-device "
                         "input perturbation (tunnel-relay cache defeat)",
        }
        if "halo-1dev" in node_rows and flagship in node_rows:
            detail["halo_tax_x"] = round(
                node_rows["halo-1dev"]["sec_per_step"]
                / node_rows[flagship]["sec_per_step"], 4)
        if "graphcls-minibatch" in rows:
            r = rows["graphcls-minibatch"]
            detail["graphcls_graphs_per_s"] = round(r["graphs_per_s"], 1)
            detail["graphcls_sec_per_epoch"] = round(r["sec_per_epoch"], 5)
        for variant, key in (("graphcls-python-loader", "graphcls_python"),
                             ("graphcls-noprefetch", "graphcls_noprefetch")):
            if variant in rows:
                detail[f"{key}_graphs_per_s"] = round(
                    rows[variant]["graphs_per_s"], 1)
        if "graphcls-assembly" in rows:
            for k, v in rows["graphcls-assembly"].items():
                detail[f"assembly_{k}"] = v
        suspects = [p for p, r in rows.items() if r.get("suspect")]
        if suspects:
            detail["suspect_rows_excluded"] = suspects
        if self.errors:
            detail["errors"] = self.errors
        if self.skipped:
            detail["skipped"] = sorted(set(self.skipped))
        print(json.dumps({
            "metric": "edges/s/chip (KAGIN train step, arxiv-scale)",
            "value": round(n_edges / best, 1),
            "unit": "edges/s",
            "vs_baseline": vs_baseline,
            "detail": detail,
        }), flush=True)
        return True


def _run_group(paths, headline: _Headline, est_cost: float,
               group_timeout: float | None = None) -> float:
    """Launch one child subprocess measuring `paths`, stream its per-row
    JSON lines into `headline` (re-emitting after each), return measured
    wall cost. Skips (recording why) if the budget can't fit it.

    `group_timeout` is a PER-GROUP watchdog: a hung remote compile in one
    row costs at most this much wall clock instead of the rest of the
    global budget (round-4 postmortem: halo-1dev hung and ate the budget's
    tail, skipping five later rows)."""
    if _remaining() - MARGIN_S < est_cost:
        for p in paths:
            headline.skipped.append(p)
        return 0.0
    import selectors

    t0 = time.time()
    deadline = _START + BUDGET_S - MARGIN_S
    if group_timeout is not None:
        deadline = min(deadline, t0 + group_timeout)
    env = dict(os.environ, KAGNN_BENCH_PATHS=",".join(paths),
               KAGNN_BENCH_DEADLINE=str(deadline))
    # stderr goes to a FILE: a PIPE nobody drains while streaming stdout can
    # fill (jax/axon warnings are chatty) and deadlock the child
    errf = open(f"/tmp/kagnn_bench_{os.getpid()}_{paths[0]}.err", "w+")
    proc = subprocess.Popen([sys.executable, os.path.abspath(__file__)],
                            env=env, stdout=subprocess.PIPE,
                            stderr=errf, text=True)
    got = set()
    killed = False
    # stream rows with a parent-side watchdog: a hung remote compile must
    # not silently eat the whole driver budget (round-3 failure mode)
    sel = selectors.DefaultSelector()
    sel.register(proc.stdout, selectors.EVENT_READ)
    buf = ""
    while True:
        if time.time() > deadline and proc.poll() is None:
            proc.kill()
            killed = True
            break
        if not sel.select(timeout=5.0):
            if proc.poll() is not None:
                break
            continue
        chunk = proc.stdout.readline()
        if chunk == "":
            break
        buf = chunk
        if not buf.startswith("{"):
            continue
        try:
            rec = json.loads(buf)
        except json.JSONDecodeError:
            continue
        got.add(rec.get("path"))
        headline.update(dict(rec))
        headline.emit()
    try:
        proc.wait(timeout=30)
    except subprocess.TimeoutExpired:
        proc.kill()
    errf.close()
    if killed:
        why = ("killed at group watchdog (hung row)"
               if group_timeout is not None
               and time.time() - t0 <= group_timeout + 35
               and _remaining() > MARGIN_S
               else "killed at bench budget (hung row)")
        for p in paths:
            if p not in got:
                headline.errors[p] = why
    elif proc.returncode not in (0, None):
        try:
            err = open(errf.name).read()[-300:]
        except OSError:
            err = ""
        for p in paths:
            if p not in got:
                headline.errors[p] = f"rc={proc.returncode}: {err}"
    else:
        for p in paths:
            if p not in got:
                headline.skipped.append(p)
    return time.time() - t0


def main():
    legacy = os.environ.get("KAGNN_BENCH_PATH")
    paths_env = os.environ.get("KAGNN_BENCH_PATHS")
    if legacy or paths_env:
        _child_main((paths_env or legacy).split(","))
        return

    headline = _Headline()
    # bootstrap line: if the very first remote compile hangs past every
    # budget (observed tunnel failure mode), the driver still parses an
    # honest value-0 diagnostic instead of an empty tail
    print(json.dumps({
        "metric": "edges/s/chip (KAGIN train step, arxiv-scale)",
        "value": 0.0, "unit": "edges/s", "vs_baseline": 0.0,
        "detail": {"note": "bench starting — no row completed yet "
                           "(this line is superseded by later emissions)",
                   "budget_s": BUDGET_S}}), flush=True)
    # required rows: flagship first (headline lands even if the process
    # dies mid-row-2), xla baseline second — ONE subprocess, shared graph
    cost = _run_group(["pallas-fused-bf16", "xla"], headline, est_cost=0.0)
    emitted = headline.emit()

    # extras, in PRIORITY order (a squeezed budget drops from the tail):
    #   1. halo-1dev — the scaling story's on-chip number;
    #   2. the gcn pair shares one subprocess (same graph + structure,
    #      compile amortized); then the remaining node rows as ONE
    #      3-row subprocess (gin-fastkan / reorder / gat share the arxiv
    #      batch; a 2nd..3rd row adds ~0.4x, not 1x — this is what lets
    #      every node row land inside the 450 s budget);
    #   3. one graph-classification device row + the deterministic CPU
    #      assembly row;
    #   4. the loader variants last (their win is already regression-
    #      guarded by the assembly row) — the expected budget casualty.
    extras = [["halo-1dev"],
              ["gcn-kan-bf16", "gcn-fastkan-bf16"],
              ["gin-fastkan-bf16", "kagin-bf16-reorder", "gat-fastkan-bf16"],
              ["graphcls-minibatch"],
              ["graphcls-assembly"],
              ["graphcls-python-loader", "graphcls-noprefetch"]]
    if os.environ.get("KAGNN_BENCH_F32_FUSED"):
        extras.insert(0, ["pallas-fused"])
    if os.environ.get("KAGNN_BENCH_FAST"):
        extras = []
    # a node-path subprocess costs ~(setup + compile + steps); start from
    # the required group's cost (2 rows) and re-base on the most recent
    # completed extra. graphcls-assembly is CPU-only/deterministic (~40 s)
    # — don't let a big node-row estimate squeeze it out. A second row in
    # the same subprocess shares setup/upload, so it adds ~0.4x, not 1x.
    est = max(45.0, cost * 0.6)
    for grp in extras:
        if grp[0] == "graphcls-assembly":
            grp_est = 45.0
        elif grp[0] == "graphcls-minibatch":
            # upload-dominated (~7 MB of host-assembled batches per epoch
            # through the ~1 MB/s tunnel) + its own model compile: a fixed
            # estimate — the adaptive node-row estimate undershoots it and
            # the 2.5x watchdog then kills a row that needs ~130-180 s
            # (observed killed at watchdog in three full runs 2026-08-21)
            grp_est = 110.0
        elif grp[0] == "graphcls-python-loader":
            # same upload-dominated cost x2 rows; a realistic fixed
            # estimate makes a squeezed budget SKIP the pair cleanly
            # instead of starting it and killing it at the deadline
            grp_est = 160.0
        else:
            grp_est = est * (1.0 + 0.4 * (len(grp) - 1))
        # hung-row cost cap: 2.5x the estimate (compile variance headroom)
        took = _run_group(grp, headline, est_cost=grp_est,
                          group_timeout=max(120.0, grp_est * 2.5))
        if took > 5.0 and grp[0] not in ("graphcls-assembly",
                                         "graphcls-minibatch"):
            # cap: a one-off compile-heavy row (fresh executable after a
            # code change, ~270s observed) must not inflate the estimate
            # for warm-cache rows (~60-100s)
            est = max(45.0, min(took * 1.1 / (1.0 + 0.4 * (len(grp) - 1)),
                                150.0))
        emitted = headline.emit() or emitted

    if not headline.emit(final=True) and not emitted:
        # nothing measurable at all — still print a parseable line so the
        # failure mode is visible in the driver artifact
        print(json.dumps({
            "metric": "edges/s/chip (KAGIN train step, arxiv-scale)",
            "value": 0.0, "unit": "edges/s", "vs_baseline": 0.0,
            "detail": {"errors": headline.errors,
                       "skipped": sorted(set(headline.skipped)),
                       "elapsed_s": round(time.time() - _START, 1),
                       "note": "no row completed within budget"},
        }), flush=True)


if __name__ == "__main__":
    main()
