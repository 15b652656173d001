"""On-chip component timing for the arxiv-scale KAGIN train step.

Times each hot component (neighbor aggregation fwd/bwd, fused KAN kernels
fwd/bwd, full forward, full step) with VARYING inputs per iteration (the
tunnel relay caches repeated identical executions) in one process so remote
compiles are paid once.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

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


def timeit(name, fn, *args, iters=10, scale_arg=0):
    """fn(*args) jitted; arg[scale_arg] is scaled by (1 + i/1000) per iter so
    the relay never sees an identical execution twice."""
    jfn = jax.jit(fn)
    args = list(args)
    out = jfn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        args[scale_arg] = args[scale_arg] * (1.0 + 1e-6)
        out = jfn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:55s} {dt:8.2f} ms")
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--skip-ops", action="store_true")
    p.add_argument("--sweep", action="store_true",
                   help="marginal-cost sweep over model variants (full train "
                        "steps; differences between rows isolate components)")
    p.add_argument("--variant", default=None,
                   help="time ONE sweep variant and exit (the tunnel backend "
                        "degrades to bogus timings after several executables "
                        "in one process, so the sweep shells out per variant)")
    args = p.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    from kagnn_tpu.data.synthetic import arxiv_scale_graph
    from kagnn_tpu.graphs import single_graph
    from kagnn_tpu.ops import segment

    d = arxiv_scale_graph()
    g = single_graph(d["senders"], d["receivers"], nodes=d["nodes"],
                     y=d["y"], edge_pad_multiple=1024)
    N, E = g.n_node_pad, g.n_edge_pad
    print(f"graph: {N} nodes (pad), {E} edges (pad), dtype={args.dtype}")
    key = jax.random.key(0)
    x64 = jax.random.normal(key, (N, 64), dt)
    x128 = jax.random.normal(key, (N, 128), dt)

    # --- aggregation ---------------------------------------------------
    for w, x in (() if args.skip_ops else (("64", x64), ("128", x128))):
        timeit(f"gather x[senders] D={w}",
               lambda x, g=g: jnp.take(x, g.senders, axis=0), x,
               iters=args.iters)
        timeit(f"neighbor_sum fwd (kernel) D={w}",
               lambda x, g=g: segment.neighbor_sum(x, g), x,
               iters=args.iters)
        timeit(f"neighbor_sum fwd (xla) D={w}",
               lambda x, g=g: segment.segment_sum(
                   jnp.take(x, g.senders, axis=0), g.receivers, g.n_node_pad,
                   indices_are_sorted=True), x, iters=args.iters)

        def vg_kernel(x, g=g):
            return jax.grad(
                lambda x: segment.neighbor_sum(x, g).sum())(x)

        def vg_xla(x, g=g):
            def f(x):
                m = jnp.take(x, g.senders, axis=0)
                return jax.ops.segment_sum(
                    m, g.receivers, num_segments=g.n_node_pad,
                    indices_are_sorted=True).sum()
            return jax.grad(f)(x)

        timeit(f"neighbor_sum fwd+bwd (kernel) D={w}", vg_kernel, x,
               iters=args.iters)
        timeit(f"neighbor_sum fwd+bwd (xla scatter) D={w}", vg_xla, x,
               iters=args.iters)

    # --- fused KAN -------------------------------------------------------
    from kagnn_tpu.pallas.bspline_fused import bspline_kan_matmul

    if not args.skip_ops:
        D, O, nb, k = 64, 64, 7, 3
        grid_kd = jnp.asarray(
            np.tile(np.linspace(-1.5, 1.5, 12)[:, None], (1, D)), jnp.float32)
        wb = jax.random.normal(key, (D, O), dt) * 0.1
        ws = jax.random.normal(key, (nb, D, O), dt) * 0.1
        timeit("bspline_kan fused fwd 64->64",
               lambda x: bspline_kan_matmul(x, grid_kd, wb, ws, k), x64,
               iters=args.iters)
        timeit("bspline_kan fused fwd+bwd 64->64",
               lambda x: jax.grad(
                   lambda x: bspline_kan_matmul(
                       x, grid_kd, wb, ws, k).sum())(x),
               x64, iters=args.iters)

    # --- full model ------------------------------------------------------
    from kagnn_tpu.models import NodeClassifier
    from kagnn_tpu.train.loops import TrainState, make_node_steps
    from kagnn_tpu.train import losses

    if args.sweep or args.variant:
        _sweep(g, d, dt, args.iters, args.variant, args.dtype)
        return

    cdt = dt if dt == jnp.bfloat16 else None
    kw = dict(conv_type="gin", architecture="kan", mp_layers=3,
              num_features=128, hidden_channels=64, num_classes=40,
              grid_size=4, spline_order=3, skip=False, hidden_layers=2,
              dropout=0.0, compute_dtype=cdt)
    model = NodeClassifier(fused=True, **kw)
    gb = g  # single_graph already padded nodes/y
    mask = jnp.asarray(np.arange(N) < int(d["n_node"]))
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu), segment.use_pallas_spmm(False):
        tiny = single_graph(np.array([0, 1]), np.array([1, 0]),
                            nodes=np.zeros((8, 128), np.float32),
                            y=np.zeros(8, np.int32))
        # init with an unfused twin (same param tree; Pallas can't run on the
        # host CPU backend), then apply the fused model
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

    def fwd(nodes):
        return model.apply(
            {"params": state.params, "buffers": state.buffers,
             "batch_stats": state.batch_stats},
            gb.replace(nodes=nodes), train=False)

    timeit("full model fwd only", fwd, gb.nodes, iters=args.iters)

    def fwd_bwd(nodes):
        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "buffers": state.buffers,
                 "batch_stats": state.batch_stats},
                gb.replace(nodes=nodes), train=True,
                rngs={"dropout": jax.random.key(1)},
                mutable=["batch_stats"])
            return losses.masked_softmax_cross_entropy(out, gb.y, mask)
        return jax.grad(loss_fn)(state.params)

    timeit("full model fwd+bwd (grads)", fwd_bwd, gb.nodes, iters=args.iters)

    train_step, _ = make_node_steps(model, tx)
    k2 = jax.random.key(7)
    s = state
    s, _ = train_step(s, gb, mask, k2)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        s, _ = train_step(s, gb, mask, k2)
    jax.block_until_ready(s)
    print(f"{'full train step':55s} "
          f"{(time.perf_counter() - t0) / args.iters * 1e3:8.2f} ms")


def _time_step(model_kw, g, mask, iters):
    import optax

    from kagnn_tpu.graphs import single_graph
    from kagnn_tpu.models import NodeClassifier
    from kagnn_tpu.ops import segment
    from kagnn_tpu.train.loops import TrainState, make_node_steps

    model = NodeClassifier(fused=True, **model_kw)
    nf = model_kw["num_features"]
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu), segment.use_pallas_spmm(False):
        tiny = single_graph(np.array([0, 1]), np.array([1, 0]),
                            nodes=np.zeros((8, nf), np.float32),
                            y=np.zeros(8, np.int32))
        variables = NodeClassifier(fused=False, **model_kw).init(
            {"params": jax.random.key(0)}, tiny)
    dev = jax.devices()[0]
    variables = jax.tree.map(lambda a: jax.device_put(a, dev), variables)
    tx = optax.adam(1e-3)
    state = TrainState(params=variables["params"],
                       buffers=variables.get("buffers", {}),
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))
    step, _ = make_node_steps(model, tx)
    k = jax.random.key(7)
    nodes = g.nodes * (1.0 + (int.from_bytes(os.urandom(4), "little")
                              % 1000) * 1e-9)
    s, loss = step(state, g.replace(nodes=nodes), mask, k)
    nodes = nodes * (1.0 + 1e-6)
    s, loss = step(s, g.replace(nodes=nodes), mask, k)
    # synchronize by FETCHING DATA (block_until_ready through the tunnel
    # relay can return early); inputs vary per iteration so no execution can
    # be served from the relay's response cache
    float(loss)
    float(jax.tree_util.tree_leaves(s.params)[0].sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        nodes = nodes * (1.0 + 1e-6)
        s, loss = step(s, g.replace(nodes=nodes), mask, k)
    float(loss)
    float(jax.tree_util.tree_leaves(s.params)[0].sum())
    return (time.perf_counter() - t0) / iters * 1e3


def _variants(cdt):
    base = dict(conv_type="gin", architecture="kan", mp_layers=3,
                num_features=128, hidden_channels=64, num_classes=40,
                grid_size=4, spline_order=3, skip=False, hidden_layers=2,
                dropout=0.0, compute_dtype=cdt)
    return {
        "flagship": dict(base),
        "mp2": dict(base, mp_layers=2),
        "mp1": dict(base, mp_layers=1),
        "upd1": dict(base, hidden_layers=1),
        "mlp": dict(base, architecture="mlp"),
        "fastkan": dict(base, architecture="fastkan"),
        "gcn": dict(base, conv_type="gcn"),
        "gat": dict(base, conv_type="gat", architecture="fastkan",
                    heads=4),
        "gat-mp1": dict(base, conv_type="gat", architecture="fastkan",
                        heads=4, mp_layers=1),
        "gat-h1": dict(base, conv_type="gat", architecture="fastkan",
                       heads=1),
        "gat-mlp": dict(base, conv_type="gat", architecture="mlp",
                        heads=4),
    }


def _sweep(g, d, dt, iters, variant, dtype_flag):
    N = g.n_node_pad
    mask = jnp.asarray(np.arange(N) < int(d["n_node"]))
    cdt = dt if dt == jnp.bfloat16 else None
    variants = _variants(cdt)
    if variant is not None:
        ms = _time_step(variants[variant], g, mask, iters)
        print(f"{variant:55s} {ms:8.2f} ms/step")
        return
    # one fresh process per variant: the tunnel backend degrades to bogus
    # (non-blocking) timings after several executables in one process
    import subprocess
    for name in variants:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--skip-ops",
             "--dtype", dtype_flag, "--iters", str(iters),
             "--variant", name],
            capture_output=True, text=True)
        out = [l for l in r.stdout.splitlines() if "ms/step" in l]
        print(out[-1] if out else f"{name}: FAILED\n{r.stderr[-2000:]}")


if __name__ == "__main__":
    main()
