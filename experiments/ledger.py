"""Whole-step roofline LEDGER for the flagship train step (VERDICT round-2
item 2): per-phase wall time, analytic minimum HBM traffic, effective GB/s,
and % of the CALIBRATED practical ceiling (experiments/calibrate_hbm.py) —
ending in a single "% of speed-of-light" figure for the headline step
against BASELINE.md's >=80%-of-SoL north star.

Each phase runs in its OWN subprocess (the tunnel backend degrades to bogus
timings after several executables in one process — PERFORMANCE.md
"Measurement caveats") with per-iteration input perturbation.

    python experiments/ledger.py                 # all phases -> LEDGER.json
    python experiments/ledger.py --phase step    # one phase, this process
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kagnn_tpu.utils.platform import apply_platform_env

apply_platform_env()

ROOT = os.path.join(os.path.dirname(__file__), "..")

# arxiv-scale flagship shapes
N_NODES, N_EDGES, F_IN, HID, CLS = 169_343, 1_166_243, 128, 64, 40
BF = 2  # bf16 bytes

# Analytic MINIMUM HBM traffic per phase (bytes), bf16 activations.
# "Minimum" = every operand read once + every result written once; random
# gathers counted at their payload size (the ceiling for them is lower in
# practice, which makes these figures conservative upper bounds on SoL).


def _conv_fwd_bytes(d_in):
    e, n = N_EDGES, N_NODES
    return (
        e * d_in * BF      # gather: write msgs
        + n * d_in * BF    # gather: read x (once; cache-resident re-reads free)
        + e * d_in * BF    # kernel: stream msgs
        + n * d_in * BF    # kernel: read x block
        + n * HID * BF     # kernel: write out
        + n * d_in * BF    # kernel: write z residual
        + e * 4            # receiver ids
    )


def _conv_bwd_bytes(d_in):
    e, n = N_EDGES, N_NODES
    return (
        n * d_in * BF * 2  # bspline bwd: read z, write dz
        + n * HID * BF     # read dout
        + e * d_in * BF * 2  # A^T dz: gather cot (write+read)
        + e * 4
    )


def _second_kan_bytes():
    n = N_NODES
    return n * HID * BF * 2  # read in, write out (weights tiny)


def flagship_min_bytes():
    """Min traffic of the full fused KAGIN step (3 GIN convs with 2-layer
    KAN update nets, KAN head, BN, masked CE, Adam)."""
    convs = [(128, True), (64, True), (64, True)]  # (d_in, fused)
    total = 0
    for d_in, _ in convs:
        total += _conv_fwd_bytes(d_in) + _second_kan_bytes()
        total += _conv_bwd_bytes(d_in) + _second_kan_bytes()
    total += 2 * N_NODES * HID * BF        # head fwd+bwd (64->40)
    total += 6 * N_NODES * HID * BF        # 3x BN fwd+bwd (read+write)
    total += 2 * N_NODES * CLS * 4         # loss fwd+bwd f32 logits
    # Adam: params ~ 3 convs * (2 KAN layers * (64*64*8 coeffs)) ~ 1.3M
    # params * (read p, m, v + write p, m, v) * 4B
    total += 1_300_000 * 6 * 4
    return total


def _timeit(fn, args, iters=10, warmup=2):
    import jax
    import jax.numpy as jnp

    outs = None
    for i in range(warmup):
        outs = fn(*[a * (1 + 1e-6 * i)
                    if hasattr(a, "dtype") and a.dtype != jnp.int32 else a
                    for a in args])
    jax.block_until_ready(outs)
    leaf = jax.tree_util.tree_leaves(outs)[0]
    float(jnp.asarray(leaf).reshape(-1)[0])
    t0 = time.perf_counter()
    res = []
    for i in range(iters):
        res.append(fn(*[a * (1 + 1e-6 * (i + 7))
                        if hasattr(a, "dtype") and a.dtype != jnp.int32
                        else a for a in args]))
    leaf = jax.tree_util.tree_leaves(res[-1])[0]
    float(jnp.asarray(leaf).reshape(-1)[0])
    jax.block_until_ready(res)
    return (time.perf_counter() - t0) / iters


def _setup_model():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from kagnn_tpu.data.synthetic import arxiv_scale_graph
    from kagnn_tpu.graphs import single_graph
    from kagnn_tpu.models import NodeClassifier
    from kagnn_tpu.ops import segment
    from kagnn_tpu.train.loops import TrainState, make_node_steps

    d = arxiv_scale_graph(n_nodes=N_NODES, n_edges=N_EDGES,
                          num_features=F_IN, n_classes=CLS)
    g = single_graph(d["senders"], d["receivers"], nodes=d["nodes"],
                     y=d["y"], edge_pad_multiple=1024)
    mask = jnp.asarray(np.arange(g.n_node_pad) < int(d["n_node"]))
    kw = dict(conv_type="gin", architecture="kan", mp_layers=3,
              num_features=F_IN, hidden_channels=HID, num_classes=CLS,
              grid_size=4, spline_order=3, skip=False, hidden_layers=2,
              dropout=0.0, compute_dtype=jnp.bfloat16)
    model = NodeClassifier(fused=True, **kw)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu), segment.use_pallas_spmm(False):
        tiny = single_graph(np.array([0, 1]), np.array([1, 0]),
                            nodes=np.zeros((8, F_IN), np.float32),
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
    return model, g, mask, state, tx


def measure(phase: str) -> dict:
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/kagnn_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from kagnn_tpu.train import losses
    from kagnn_tpu.train.loops import make_node_steps

    model, g, mask, state, tx = _setup_model()

    if phase == "step":
        import optax

        step_fn, _ = make_node_steps(model, tx)
        key = jax.random.key(7)
        s, loss = step_fn(state, g, mask, key)
        nodes = g.nodes
        s, loss = step_fn(s, g.replace(nodes=nodes * (1 + 1e-6)), mask, key)
        float(loss)
        t0 = time.perf_counter()
        iters = 10
        for i in range(iters):
            nodes = nodes * (1.0 + 1e-6)
            s, loss = step_fn(s, g.replace(nodes=nodes), mask, key)
        float(loss)
        float(jax.tree_util.tree_leaves(s.params)[0].sum())
        sec = (time.perf_counter() - t0) / iters
        return {"phase": phase, "ms": sec * 1e3}

    if phase == "fwd":
        def fwd(nodes):
            return model.apply(
                {"params": state.params, "buffers": state.buffers,
                 "batch_stats": state.batch_stats},
                g.replace(nodes=nodes), train=False)
        sec = _timeit(jax.jit(fwd), (g.nodes,))
        return {"phase": phase, "ms": sec * 1e3}

    if phase == "fwdbwd":
        def fwd_bwd(nodes):
            def loss_fn(params):
                out, _ = model.apply(
                    {"params": params, "buffers": state.buffers,
                     "batch_stats": state.batch_stats},
                    g.replace(nodes=nodes), train=True,
                    rngs={"dropout": jax.random.key(1)},
                    mutable=["batch_stats"])
                return losses.masked_softmax_cross_entropy(out, g.y, mask)
            return jax.grad(loss_fn)(state.params)
        sec = _timeit(jax.jit(fwd_bwd), (g.nodes,))
        return {"phase": phase, "ms": sec * 1e3}

    raise ValueError(phase)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--phase", default=None)
    p.add_argument("--no-write", action="store_true")
    args = p.parse_args()

    if args.phase:
        print(json.dumps(measure(args.phase)))
        return

    rows = {}
    for phase in ("step", "fwd", "fwdbwd"):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--phase", phase],
            capture_output=True, text=True, timeout=3600)
        for line in reversed(r.stdout.splitlines()):
            if line.startswith("{"):
                rows[phase] = json.loads(line)
                break
        else:
            rows[phase] = {"phase": phase, "error": r.stderr[-500:]}

    cal_path = os.path.join(ROOT, "CALIBRATION.json")
    ceiling = None
    if os.path.exists(cal_path):
        ceiling = json.load(open(cal_path))["practical_ceiling_gbps"]

    step_ms = rows.get("step", {}).get("ms")
    fwd_ms = rows.get("fwd", {}).get("ms")
    fb_ms = rows.get("fwdbwd", {}).get("ms")
    min_bytes = flagship_min_bytes()
    out = {
        "phases": rows,
        "derived": {
            "bwd_ms": round(fb_ms - fwd_ms, 2) if fb_ms and fwd_ms else None,
            "adam_loss_ms": round(step_ms - fb_ms, 2)
            if step_ms and fb_ms else None,
        },
        "min_hbm_bytes": min_bytes,
        "min_hbm_gb": round(min_bytes / 1e9, 3),
        "practical_ceiling_gbps": ceiling,
    }
    if ceiling and step_ms:
        sol_ms = min_bytes / (ceiling * 1e9) * 1e3
        out["sol_step_ms"] = round(sol_ms, 2)
        out["pct_of_sol"] = round(100 * sol_ms / step_ms, 1)
        out["effective_gbps"] = round(min_bytes / (step_ms / 1e3) / 1e9, 1)
    print(json.dumps(out, indent=1))
    if not args.no_write:
        with open(os.path.join(ROOT, "LEDGER.json"), "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
