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
    """Best-of-3 windows (bench.py discipline): the relay sometimes settles
    a new executable at a degraded rate for its first executions.

    Anti-replay perturbation uses bf16-REPRESENTABLE factors: the bf16
    spacing near 1.0 is 2^-8, so the old 1+1e-6 factor rounded to exactly
    1.0 on bf16 operands and every execution was bit-identical — precisely
    the relay's replay-cache condition (round-5 review finding). Factors
    of the form 1 + k/64 are exact in bf16, and tuple args (kernel part
    streams) are perturbed element-wise instead of skipped."""
    import jax
    import jax.numpy as jnp

    def _perturb(a, k):
        f = 1.0 + (k % 7 + 1) / 64.0  # bf16-exact, distinct per call
        if isinstance(a, (tuple, list)):
            return type(a)(_perturb(x, k) for x in a)
        if hasattr(a, "dtype") and a.dtype != jnp.int32:
            return a * jnp.asarray(f, a.dtype)
        return a

    outs = None
    for i in range(warmup):
        outs = fn(*[_perturb(a, i) for a in args])
    jax.block_until_ready(outs)
    leaf = jax.tree_util.tree_leaves(outs)[0]
    float(jnp.asarray(leaf).reshape(-1)[0])
    windows = []
    j = 0
    for _ in range(3):
        t0 = time.perf_counter()
        res = []
        for i in range(iters):
            j += 1
            res.append(fn(*[_perturb(a, j + 7) for a in args]))
        leaf = jax.tree_util.tree_leaves(res[-1])[0]
        float(jnp.asarray(leaf).reshape(-1)[0])
        jax.block_until_ready(res)
        windows.append((time.perf_counter() - t0) / iters)
    return min(windows)


def _setup_model(conv: str = "gin", arch: str = "kan"):
    """bench.py's exact construction (shared helpers: on-device synthetic
    features — the 83 MB matrix never crosses the ~1 MB/s tunnel — and the
    /tmp-cached CPU init with f32 master params; see bench.py for why both
    matter). Phase numbers must decompose the same executable the headline
    row times."""
    import jax
    import jax.numpy as jnp
    import optax

    import bench
    from kagnn_tpu.models import NodeClassifier
    from kagnn_tpu.train.loops import TrainState

    g, mask = bench._arxiv_batch()
    model = NodeClassifier(fused=True, compute_dtype=jnp.bfloat16,
                           conv_type=conv, architecture=arch,
                           **bench._NODE_KW)
    variables = bench._init_variables(conv, arch)
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

    # gat-* phases run the bench's gat-fastkan-bf16 config (the residual-gap
    # attribution, VERDICT round-3 item 5); everything else the flagship
    full_phase = phase
    conv, arch = "gin", "kan"
    if phase.startswith("gat-"):
        conv, arch, phase = "gat", "fastkan", phase[len("gat-"):]

    if phase in ("fwd-kernel", "bwd-dadst", "bwd-sender"):
        return {"phase": full_phase,
                **_measure_gat_kernel(phase)}
    if phase.startswith("halo-"):
        return {"phase": full_phase, **_measure_halo(phase)}

    model, g, mask, state, tx = _setup_model(conv, arch)

    if phase == "step":
        import optax

        step_fn, _ = make_node_steps(model, tx)
        key = jax.random.key(7)
        # EXACTLY bench.py's dispatch discipline: drain the warmup tail
        # (loss AND params fetch) before t0, then dispatch the timed steps
        # back-to-back keeping every loss buffer alive, fetching only at
        # the end. Pipelined dispatch hides ~40 ms/step of tunnel
        # round-trip latency; a per-iteration deviation (overwriting the
        # loss buffer forces a tunnel-side delete each step) once made
        # this phase read 120 ms while the headline row read 84 ms.
        s, loss = step_fn(state, g, mask, key)
        nodes = g.nodes
        s, loss = step_fn(s, g.replace(nodes=nodes * (1 + 1e-6)), mask, key)
        float(loss)
        float(jax.tree_util.tree_leaves(s.params)[0].sum())
        iters = 10
        windows = []
        for _ in range(3):
            t0 = time.perf_counter()
            lvals = []
            for i in range(iters):
                nodes = nodes * (1.0 + 1e-6)
                s, loss = step_fn(s, g.replace(nodes=nodes), mask, key)
                lvals.append(loss)
            float(lvals[-1])
            float(jax.tree_util.tree_leaves(s.params)[0].sum())
            windows.append((time.perf_counter() - t0) / iters)
        from kagnn_tpu.utils.profiling import device_ms_per_call

        def run_traced():
            nonlocal s, nodes
            for _ in range(6):
                nodes = nodes * (1.0 + 1e-6)
                s, loss = step_fn(s, g.replace(nodes=nodes), mask, key)
            float(loss)
            float(jax.tree_util.tree_leaves(s.params)[0].sum())

        dev_ms = device_ms_per_call(run_traced, 6, tag="step")
        out = {"phase": full_phase, "ms": min(windows) * 1e3,
               "windows_ms": [round(w * 1e3, 2) for w in windows]}
        if dev_ms:
            out["device_ms"] = round(dev_ms, 2)
        return out

    if phase == "step-scan":
        # K train steps inside ONE executable (lax.scan): amortizes ALL
        # per-execution tunnel/dispatch overhead, isolating pure device
        # time per step. The gap between this and "step" is the per-step
        # dispatch cost of the axon tunnel (~40 ms RTT when synchronized,
        # partially hidden by bench.py's pipelined dispatch) — on a
        # directly-attached TPU host that gap is ~0.1 ms, so THIS is the
        # number a production deployment would see per step.
        step_fn, _ = make_node_steps(model, tx)
        key = jax.random.key(7)
        K = 10

        @jax.jit
        def multi(s, nodes):
            def body(carry, _):
                s, nodes = carry
                nodes = nodes * (1.0 + 1e-6)
                s2, loss = step_fn(s, g.replace(nodes=nodes), mask, key)
                return (s2, nodes), loss
            (s, nodes), ls = jax.lax.scan(body, (s, nodes), None, length=K)
            return s, nodes, ls

        s, nodes, ls = multi(state, g.nodes)
        float(ls[-1])
        float(jax.tree_util.tree_leaves(s.params)[0].sum())
        t0 = time.perf_counter()
        execs = 3
        for _ in range(execs):
            s, nodes, ls = multi(s, nodes)
        float(ls[-1])
        float(jax.tree_util.tree_leaves(s.params)[0].sum())
        sec = (time.perf_counter() - t0) / (execs * K)
        return {"phase": full_phase, "ms": sec * 1e3}

    if phase == "fwd":
        def fwd(nodes):
            return model.apply(
                {"params": state.params, "buffers": state.buffers,
                 "batch_stats": state.batch_stats},
                g.replace(nodes=nodes), train=False)
        sec = _timeit(jax.jit(fwd), (g.nodes,))
        return {"phase": full_phase, "ms": sec * 1e3}

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
        return {"phase": full_phase, "ms": sec * 1e3}

    if phase == "valgrad":
        # EXACTLY the step's loss_fn (value_and_grad + has_aux batch_stats)
        # minus the optimizer update — isolates whether the step-vs-fwdbwd
        # residual is the optimizer or the value/aux plumbing
        def val_grad(nodes):
            def loss_fn(params):
                out, mut = model.apply(
                    {"params": params, "buffers": state.buffers,
                     "batch_stats": state.batch_stats},
                    g.replace(nodes=nodes), train=True,
                    rngs={"dropout": jax.random.key(1)},
                    mutable=["batch_stats"])
                return (losses.masked_softmax_cross_entropy(out, g.y, mask),
                        mut)
            (loss, mut), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            return loss, grads
        sec = _timeit(jax.jit(val_grad), (g.nodes,))
        return {"phase": full_phase, "ms": sec * 1e3}

    if phase == "gather":
        # ONE wide row gather at the step's message width (bf16, 64 lanes).
        # XLA's TPU gather is row-rate-bound (~8-9 ms at E=1.17M regardless
        # of locality or width — _reorder_probe.py), so this phase bounds
        # every x[senders] / cot-transpose fetch in the step.
        h = jax.random.normal(jax.random.key(3), (g.n_node_pad, HID),
                              jnp.bfloat16)
        sec = _timeit(jax.jit(lambda h: jnp.take(h, g.senders, axis=0)), (h,))
        return {"phase": full_phase, "ms": sec * 1e3}

    if phase == "spmm":
        # ONE fused gather+aggregate (the sorted-segment Pallas kernel) at
        # message width — what each conv's A @ h costs end to end.
        h = jax.random.normal(jax.random.key(4), (g.n_node_pad, HID),
                              jnp.bfloat16)
        from kagnn_tpu.ops import segment as seg
        sec = _timeit(jax.jit(lambda h: seg.neighbor_sum(h, g)), (h,))
        return {"phase": full_phase, "ms": sec * 1e3}

    if phase == "adam":
        import optax

        def loss_fn(params, nodes):
            out, _ = model.apply(
                {"params": params, "buffers": state.buffers,
                 "batch_stats": state.batch_stats},
                g.replace(nodes=nodes), train=True,
                rngs={"dropout": jax.random.key(1)}, mutable=["batch_stats"])
            return losses.masked_softmax_cross_entropy(out, g.y, mask)

        grads = jax.jit(jax.grad(loss_fn))(state.params, g.nodes)
        jax.block_until_ready(grads)

        @jax.jit
        def apply_update(params, opt_state, grads):
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        p, o = state.params, state.opt_state
        apply_update(p, o, grads)  # compile
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            p, o = apply_update(p, o, grads)
        float(jax.tree_util.tree_leaves(p)[0].reshape(-1)[0])
        sec = (time.perf_counter() - t0) / iters
        return {"phase": full_phase, "ms": sec * 1e3}

    raise ValueError(phase)


def _measure_gat_kernel(which: str) -> dict:
    """One GAT Pallas kernel launch at bench shapes (H=4 heads, C=64/head,
    hc=256) with synthetic operands — attributes the gat-fastkan-bf16 gap
    to fwd kernel vs the two backward kernels vs XLA glue."""
    import jax
    import jax.numpy as jnp

    import bench

    g, _ = bench._arxiv_batch()
    H, C = 4, HID
    hc = H * C
    n = g.n_node_pad
    k = jax.random.key(11)
    ks = jax.random.split(k, 8)
    h = jax.random.normal(ks[0], (n, hc), jnp.bfloat16)
    asrc = jax.random.normal(ks[1], (n, H), jnp.float32)
    adst = jax.random.normal(ks[2], (n, H), jnp.float32)
    amat = jax.random.normal(ks[3], (hc, H), jnp.float32) * 0.1

    if which == "fwd-kernel":
        from kagnn_tpu.pallas.gat_fused import gat_attention_fused

        def run(h, asrc, adst):
            return gat_attention_fused(h, asrc, adst, g, 0.2, False,
                                       att_src_matrix=amat)
        sec = _timeit(jax.jit(run), (h, asrc, adst))
        return {"ms": sec * 1e3}

    msgs = jnp.take(h, g.senders, axis=0)
    dout = jax.random.normal(ks[4], (n, hc), jnp.bfloat16)
    alpha = jax.random.normal(ks[5], (n, H), jnp.float32)
    S = jax.random.normal(ks[6], (n, H), jnp.float32)
    IMAX = 2**31 - 1

    if which == "bwd-dadst":
        from kagnn_tpu.pallas.gat_bwd import gat_bwd_dadst

        recv_m = jnp.where(g.edge_mask, g.receivers, IMAX)

        def run(msgs, dout, adst, alpha, S):
            return gat_bwd_dadst(msgs, recv_m, dout, adst, alpha, S, amat,
                                 H, hc, 0.2, False)
        sec = _timeit(jax.jit(run), (msgs, dout, adst, alpha, S))
        return {"ms": sec * 1e3}

    if which == "bwd-sender":
        from kagnn_tpu.pallas.gat_bwd import gat_bwd_sender

        def hilo(x):
            hi = x.astype(jnp.bfloat16)
            lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return hi, lo

        NRW = jnp.concatenate(
            [*hilo(adst), *hilo(alpha), *hilo(S)], axis=1)
        rbs = g.receivers_by_sender
        t_parts = tuple(jnp.take(dout[:, i:i + 128], rbs, axis=0)
                        for i in range(0, hc, 128))
        nrw_table = jnp.take(NRW, rbs, axis=0)
        ssm = jnp.where(g.edge_mask_by_sender, g.senders_sorted, IMAX)

        def run(t_parts, nrw_table, h):
            return gat_bwd_sender(t_parts, nrw_table, ssm, h, amat, H, hc,
                                  0.2, False)
        sec = _timeit(jax.jit(run), (t_parts, nrw_table, h))
        return {"ms": sec * 1e3}

    raise ValueError(which)


def _measure_halo(which: str) -> dict:
    """Halo partition at n_shards=1 on the singleton mesh: the full
    machinery (force_full) vs the specialized plain path — the committed
    per-phase breakdown of the partition tax (VERDICT round-3 item 4)."""
    import jax
    import numpy as np

    from kagnn_tpu.dist.halo import build_halo_plan, make_halo_node_step
    from kagnn_tpu.dist.mesh import make_mesh

    model, g, mask, state, tx = _setup_model()
    mesh = make_mesh((1,), ("graph",), devices=jax.devices()[:1])
    plan = build_halo_plan(g, 1)
    force = which == "halo-step-full"
    step, _ = make_halo_node_step(model, tx, mesh, plan, g,
                                  np.asarray(mask), force_full=force)
    key = jax.random.key(7)
    s_ = state
    for _ in range(2):
        s_, loss = step(s_, key)
    float(loss)
    float(jax.tree_util.tree_leaves(s_.params)[0].sum())
    # best-of-3 windows (bench.py discipline): the relay sometimes settles
    # a new executable at a ~2.5x degraded rate for its first executions
    windows = []
    iters = 10
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(iters):
            key = jax.random.fold_in(key, 1)
            s_, loss = step(s_, key)
        float(loss)
        float(jax.tree_util.tree_leaves(s_.params)[0].sum())
        windows.append((time.perf_counter() - t0) / iters)
    # DEVICE time is the arbiter for spec-vs-full (round-4 verdict item 4:
    # wall windows through the relay are noisy at the few-ms level — the
    # committed r4 windows [150.1, 58.8, 70.5] made the SPECIALIZED path
    # read slower than the full machinery it strictly removes work from)
    from kagnn_tpu.utils.profiling import device_ms_per_call

    def run_traced():
        nonlocal s_, key
        for _ in range(6):
            key = jax.random.fold_in(key, 1)
            s_, loss = step(s_, key)
        float(loss)
        float(jax.tree_util.tree_leaves(s_.params)[0].sum())

    dev_ms = device_ms_per_call(run_traced, 6, tag=which)
    out = {"ms": min(windows) * 1e3,
           "windows_ms": [round(w * 1e3, 2) for w in windows]}
    if dev_ms:
        out["device_ms"] = round(dev_ms, 2)
    return out


UNTRUSTED_REASONS = {
    "step-scan": "XLA pessimizes the 10-step scan (~4.5x slower per step "
                 "than the standalone executable — large-carry loop); NOT "
                 "a dispatch-overhead measurement. Recorded for the "
                 "compiler-regression trail only.",
    "adam": "isolated optimizer executable is dispatch-dominated through "
            "the tunnel (sub-ms of real work behind ~40 ms RTT); the "
            "trusted optimizer+loss figure is derived.opt_loss_ms "
            "(step - fwdbwd).",
}

SETS = {
    "core": ["step", "fwd", "fwdbwd", "valgrad", "gather", "spmm"],
    "untrusted": ["step-scan", "adam"],
    "gat": ["gat-step", "gat-fwd", "gat-fwdbwd", "gat-fwd-kernel",
            "gat-bwd-dadst", "gat-bwd-sender"],
    "halo": ["halo-step-full", "halo-step-spec"],
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--phase", default=None)
    p.add_argument("--set", default="all",
                   help="comma list of phase sets: core,gat,halo,untrusted "
                        "or 'all'")
    p.add_argument("--no-write", action="store_true")
    p.add_argument("--fresh", action="store_true",
                   help="ignore rows from the existing LEDGER.json")
    args = p.parse_args()

    if args.phase:
        print(json.dumps(measure(args.phase)))
        return

    sets = (list(SETS) if args.set == "all" else args.set.split(","))
    phases = [ph for sname in sets for ph in SETS[sname]]
    # MERGE with the committed artifact: rows measured in previous (partial)
    # runs are kept unless re-measured now, and the file is re-written after
    # EVERY phase — a timeout mid-run loses only the phase in flight
    # (bench.py's round-3 lesson applied here).
    rows = {}
    led_path = os.path.join(ROOT, "LEDGER.json")
    if not args.fresh and os.path.exists(led_path):
        try:
            prev = json.load(open(led_path))
            rows.update(prev.get("phases", {}))
            rows.update({k: {kk: vv for kk, vv in v.items()
                             if kk != "reason"}
                         for k, v in prev.get("untrusted", {}).items()})
        except Exception:
            pass
    for phase in phases:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--phase", phase],
            capture_output=True, text=True, timeout=3600)
        for line in reversed(r.stdout.splitlines()):
            if line.startswith("{"):
                rows[phase] = json.loads(line)
                break
        else:
            rows[phase] = {"phase": phase, "error": r.stderr[-500:]}
        print(f"# {phase}: {rows[phase].get('ms', rows[phase])}",
              file=sys.stderr)
        _assemble_and_write(rows, args)

    _assemble_and_write(rows, args)


def _assemble_and_write(rows, args):
    cal_path = os.path.join(ROOT, "CALIBRATION.json")
    ceiling, cal = None, {}
    if os.path.exists(cal_path):
        cal = json.load(open(cal_path))
        ceiling = cal["practical_ceiling_gbps"]

    def ms(name):
        return rows.get(name, {}).get("ms")

    step_ms, fwd_ms, fb_ms = ms("step"), ms("fwd"), ms("fwdbwd")
    trusted = {k: v for k, v in rows.items() if k not in UNTRUSTED_REASONS}
    untrusted = {k: {**rows[k], "reason": UNTRUSTED_REASONS[k]}
                 for k in UNTRUSTED_REASONS if k in rows}
    min_bytes = flagship_min_bytes()
    vg_ms = ms("valgrad")
    out = {
        "phases": trusted,
        "untrusted": untrusted,
        "derived": {
            "bwd_ms": round(fb_ms - fwd_ms, 2) if fb_ms and fwd_ms else None,
            "opt_loss_ms": round(step_ms - fb_ms, 2)
            if step_ms and fb_ms else None,
            # loss-value/aux plumbing vs pure-grad; and the true optimizer
            # cost once the value path is accounted
            "value_aux_ms": round(vg_ms - fb_ms, 2)
            if vg_ms and fb_ms else None,
            "optimizer_ms": round(step_ms - vg_ms, 2)
            if step_ms and vg_ms else None,
            "noise_note": "phase walls carry ~±2 ms tunnel window noise; "
                          "small/negative differences mean 'below the "
                          "noise floor', not negative work",
        },
        "min_hbm_bytes": min_bytes,
        "min_hbm_gb": round(min_bytes / 1e9, 3),
        "practical_ceiling_gbps": ceiling,
    }
    # GAT attribution (VERDICT round-3 item 5): fwd kernel / two bwd
    # kernels / XLA glue (gathers + T-table assembly + optimizer)
    gstep, gfwd, gfb = ms("gat-step"), ms("gat-fwd"), ms("gat-fwdbwd")
    kf, kd, ks_ = (ms("gat-fwd-kernel"), ms("gat-bwd-dadst"),
                   ms("gat-bwd-sender"))
    if gstep:
        gat = {"step_ms": round(gstep, 2)}
        if gfwd:
            gat["fwd_ms"] = round(gfwd, 2)
        if gfb and gfwd:
            gat["bwd_ms"] = round(gfb - gfwd, 2)
        vg = ms("gat-valgrad")
        if vg:
            gat["valgrad_ms"] = round(vg, 2)
        if gstep and gfb:
            gat["opt_loss_ms"] = round(gstep - gfb, 2)
        # per-launch kernel costs x3 conv layers
        for name, v in (("fwd_kernel_ms_per_launch", kf),
                        ("bwd_dadst_ms_per_launch", kd),
                        ("bwd_sender_ms_per_launch", ks_)):
            if v:
                gat[name] = round(v, 2)
        if all(v for v in (gfb, kf, kd, ks_)):
            kernels_total = 3 * (kf + kd + ks_)
            gat["kernels_total_standalone_ms"] = round(kernels_total, 2)
            glue = gfb - kernels_total
            if glue >= 0:
                gat["glue_ms"] = round(glue, 2)
            else:
                # standalone launches carry per-execution dispatch gap the
                # embedded launches do not — once the kernels get fast
                # enough, 3x the standalone sum EXCEEDS the whole in-
                # program fwd+bwd and the subtraction is meaningless. The
                # trustworthy in-program per-launch numbers come from the
                # profiler trace (experiments/profile_step.py --path
                # gat-fastkan-bf16), not from this difference.
                gat["glue_ms"] = None
                gat["glue_note"] = ("standalone kernel walls include "
                                    "dispatch gap; sum exceeds in-program "
                                    "fwdbwd — use profile_step.py for "
                                    "in-program attribution")
        out["gat"] = gat
    # Halo partition tax at 1 shard (VERDICT round-3 item 4)
    hfull, hspec = ms("halo-step-full"), ms("halo-step-spec")
    if hfull or hspec:
        halo = {}
        if hfull:
            halo["step_full_ms"] = round(hfull, 2)
        if hspec:
            halo["step_specialized_ms"] = round(hspec, 2)
        if step_ms:
            if hfull:
                halo["full_tax_x"] = round(hfull / step_ms, 3)
            if hspec:
                halo["specialized_tax_x"] = round(hspec / step_ms, 3)
        out["halo"] = halo
    if ceiling and step_ms:
        sol_ms = min_bytes / (ceiling * 1e9) * 1e3
        out["sol_step_ms"] = round(sol_ms, 2)
        # pipelined wall clock (what bench.py's headline row measures)
        out["pct_of_sol_wall"] = round(100 * sol_ms / step_ms, 1)
        out["effective_gbps_wall"] = round(
            min_bytes / (step_ms / 1e3) / 1e9, 1)

        # Row-rate-aware SoL: XLA's TPU row gather is ROW-RATE-bound
        # (~147M rows/s, locality- and width-independent up to ~128 lanes
        # — _reorder_probe.py + probe_gather_width.py), and the fused step
        # still contains N_GATHERS edge-space gathers XLA must execute as
        # gathers (fwd message fetch + bwd cotangent transpose per conv).
        # Given that primitive, the floor is
        #   sum(gather rows)/row_rate + (remaining bytes)/ceiling,
        # which bounds what ANY schedule of the same ops can reach.
        gr = cal.get("gather_rows_per_s_M") if isinstance(cal, dict) else None
        gri = None
        if isinstance(cal, dict):
            gri = cal.get("gather", {}).get("w64_serial_inprogram",
                                            {}).get("rows_per_s_M")
        if gr:
            n_gathers = 5  # r5 flagship HLO: 5 edge-space gathers/step
            gather_rows = n_gathers * (N_EDGES // 1024 * 1024 + 1024)
            gather_bytes = gather_rows * HID * BF
            stream_ms = (min_bytes - gather_bytes) / (ceiling * 1e9) * 1e3
            # pessimistic floor: standalone-gather row rate (129M rows/s).
            # Round 4's 56 ms step BEATS this floor — in-program gathers
            # pipeline against compute, so the standalone rate is NOT a
            # valid lower bound; kept for the historical trail only.
            row_ms = gather_rows / (gr * 1e6) * 1e3
            out["rowrate_sol_ms_standalone"] = round(row_ms + stream_ms, 2)
            # realistic floor: the fast gather class measured in-program
            # (2.15 ms per E-row 128-lane pass — GATHER_CLASS.json
            # in_program_observed; the r4 w64_serial_inprogram figure was
            # the same class at an older measurement). This is the floor
            # pct_of_rowrate_sol uses.
            gcj = {}
            try:
                gcj = json.load(open(os.path.join(ROOT,
                                                  "GATHER_CLASS.json")))
            except Exception:
                pass
            fast_ms = (gcj.get("in_program_observed", {})
                       .get("fast_128_bf16_ms"))
            if fast_ms:
                row_ms_i = n_gathers * fast_ms
            elif gri:
                row_ms_i = gather_rows / (gri * 1e6) * 1e3
            else:
                row_ms_i = None
            if row_ms_i is not None:
                out["rowrate_sol_ms"] = round(row_ms_i + stream_ms, 2)
                out["pct_of_rowrate_sol"] = round(
                    100 * (row_ms_i + stream_ms) / step_ms, 1)
    # internal consistency: a committed artifact must be self-describing
    # (VERDICT round-3 item 8) — flag any trusted-row relation that fails
    flags = []
    slack = 1.10  # tunnel run-to-run noise
    if fwd_ms and fb_ms and not fwd_ms <= fb_ms * slack:
        flags.append("fwd > fwdbwd")
    if fb_ms and step_ms and not fb_ms <= step_ms * slack:
        flags.append("fwdbwd > step")
    # noise floor: phase walls carry ~±2 ms of tunnel window noise, so a
    # small negative difference means "below the noise floor", not an
    # inconsistency (see derived.noise_note)
    noise_ms = 2.5
    for k, v in out["derived"].items():
        if isinstance(v, (int, float)) and v < -noise_ms:
            flags.append(f"derived.{k} negative beyond noise floor")
    out["consistency"] = {"ok": not flags, "flags": flags,
                          "slack": slack}
    print(json.dumps(out, indent=1))
    if not args.no_write:
        with open(os.path.join(ROOT, "LEDGER.json"), "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
