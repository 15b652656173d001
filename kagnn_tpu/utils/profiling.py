"""Profiling and roofline reporting.

The reference's only performance tooling is wall-clock timing scripts
(node_classification_clean/time_model.py:35-48). Here:

  * `trace(logdir)` — jax.profiler trace context (view in TensorBoard /
    Perfetto);
  * `Roofline` — analytic FLOP/byte model vs hardware peaks, reporting
    compute and bandwidth utilization and the bound resource;
  * `kernel_report(...)` — measures the fused KAN kernels at given shapes
    and emits their roofline rows (the per-kernel roofline deliverable of
    BASELINE.md).
"""
from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass(frozen=True)
class HardwarePeaks:
    name: str
    flops_bf16: float  # FLOP/s
    flops_f32: float
    hbm_gbps: float  # bytes/s


# TPU v5e (one chip): 197 TFLOP/s bf16 MXU peak, ~1/2 for f32 inputs with
# f32 accumulation, 819 GB/s HBM.
V5E = HardwarePeaks("tpu-v5e", 197e12, 98.5e12, 819e9)


@dataclasses.dataclass
class Roofline:
    label: str
    flops: float
    bytes_accessed: float
    seconds: float
    peaks: HardwarePeaks = V5E
    dtype: str = "f32"

    @property
    def achieved_flops(self) -> float:
        return self.flops / self.seconds

    @property
    def achieved_gbps(self) -> float:
        return self.bytes_accessed / self.seconds

    @property
    def compute_util(self) -> float:
        peak = (self.peaks.flops_bf16 if self.dtype == "bf16"
                else self.peaks.flops_f32)
        return self.achieved_flops / peak

    @property
    def bandwidth_util(self) -> float:
        return self.achieved_gbps / self.peaks.hbm_gbps

    @property
    def bound(self) -> str:
        # the resource closer to its peak is the binding one
        return "compute" if self.compute_util >= self.bandwidth_util else "hbm"

    def row(self) -> dict:
        return {
            "kernel": self.label,
            "seconds": round(self.seconds, 6),
            "tflops": round(self.achieved_flops / 1e12, 2),
            "gbps": round(self.achieved_gbps / 1e9, 1),
            "compute_util": round(self.compute_util, 4),
            "bandwidth_util": round(self.bandwidth_util, 4),
            "bound": self.bound,
            "hw": self.peaks.name,
        }


def _time_fn(fn: Callable, x, iters: int = 20) -> float:
    """Honest per-application wall time of fn(x).

    Two failure modes of naive `for _ in range(N): fn(x)` timing on this
    TPU (both observed, PERFORMANCE.md "Measurement caveats"): the tunnel
    relay CACHES responses to repeated identical executions, and its
    per-call dispatch (~4-5 ms) swamps ms-scale kernels. So when fn maps
    (N, D) -> (N, D) the applications are CHAINED inside one jitted
    fori_loop — one dispatch, every iteration data-depends on the previous,
    renormalized between applications to keep values in range — and the
    per-apply cost of the renormalize+loop scaffolding (measured with
    fn=identity) is subtracted. Results are hard-fetched (a host transfer of
    a fresh value cannot be replayed from cache). Falls back to distinct
    pre-generated inputs when the shapes don't chain."""
    from jax import lax

    probe = jax.eval_shape(fn, x)
    if probe.shape == x.shape and probe.dtype == x.dtype:
        def chained(f):
            @jax.jit
            def run(v):
                def body(_, v):
                    y = f(v)
                    return y * lax.rsqrt(jnp.mean(y * y) + 1e-3)
                return lax.fori_loop(0, iters, body, v)
            return run

        def once(run, v):
            t0 = time.perf_counter()
            out = run(v)
            float(out[(0,) * out.ndim])  # hard fetch
            return time.perf_counter() - t0

        run, base = chained(fn), chained(lambda v: v)
        jax.block_until_ready(run(x))        # compile + warm
        jax.block_until_ready(base(x))
        once(run, x * 1.000001)              # settle the relay
        t = min(once(run, x * (1 + 1e-6 * k)) for k in (2, 3, 4))
        t0 = min(once(base, x * (1 + 1e-6 * k)) for k in (5, 6, 7))
        return max(t - t0, 1e-9) / iters

    xs = [x * (1 + 1e-6 * k) for k in range(iters)]
    jax.block_until_ready(fn(x))
    t0 = time.perf_counter()
    outs = [fn(v) for v in xs]
    jax.block_until_ready(outs)
    float(outs[-1][(0,) * outs[-1].ndim])
    return (time.perf_counter() - t0) / iters


def kernel_report(n: int = 131072, d: int = 64, o: int = 64,
                  grid_size: int = 4, spline_order: int = 3,
                  num_grids: int = 8, iters: int = 20,
                  peaks: HardwarePeaks = V5E) -> list[dict]:
    """Roofline rows for the fused B-spline and RBF kernels plus their XLA
    reference paths at the given shapes."""
    from kagnn_tpu.kan import bspline, rbf
    from kagnn_tpu.pallas.bspline_fused import kan_linear_fused
    from kagnn_tpu.pallas.rbf_fused import fastkan_fused

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    rows = []

    # ---- B-spline
    nb = grid_size + spline_order
    grid = bspline.make_grid(d, grid_size, spline_order)
    wb = jnp.asarray(rng.normal(size=(o, d)).astype(np.float32) * 0.1)
    ws = jnp.asarray(rng.normal(size=(o, d, nb)).astype(np.float32) * 0.1)
    flops_bs = 2 * n * d * o * (nb + 1)
    bytes_fused = 4 * (n * d + n * o + d * o * (nb + 1))
    sec = _time_fn(jax.jit(lambda x: kan_linear_fused(
        x, grid, wb, ws, spline_order, interpret=False)), x, iters=iters)
    rows.append(Roofline("bspline_fused", flops_bs, bytes_fused, sec,
                         peaks).row())

    def bs_xla(x):
        base = jax.nn.silu(x) @ wb.T
        bases = bspline.b_splines(x, grid, spline_order)
        return base + bases.reshape(n, -1) @ ws.reshape(o, -1).T

    bytes_xla = bytes_fused + 2 * 4 * n * d * nb  # basis round-trips HBM
    sec = _time_fn(jax.jit(bs_xla), x, iters=iters)
    rows.append(Roofline("bspline_xla", flops_bs, bytes_xla, sec,
                         peaks).row())

    # ---- RBF
    w = jnp.asarray(
        rng.normal(size=(o, d * num_grids)).astype(np.float32) * 0.1)
    h = 4.0 / (num_grids - 1)
    flops_rbf = 2 * n * d * o * num_grids
    bytes_rbf_fused = 4 * (n * d + n * o + d * o * num_grids)
    sec = _time_fn(jax.jit(lambda x: fastkan_fused(
        x, w, -2.0, 2.0, num_grids, h, interpret=False)), x, iters=iters)
    rows.append(Roofline("rbf_fused", flops_rbf, bytes_rbf_fused, sec,
                         peaks).row())

    def rbf_xla(x):
        basis = rbf.rbf_basis(x, rbf.make_rbf_grid(-2.0, 2.0, num_grids), h)
        return basis.reshape(n, -1) @ w.T

    bytes_rbf_xla = bytes_rbf_fused + 2 * 4 * n * d * num_grids
    sec = _time_fn(jax.jit(rbf_xla), x, iters=iters)
    rows.append(Roofline("rbf_xla", flops_rbf, bytes_rbf_xla, sec,
                         peaks).row())

    # ---- full FastKAN layer (layernorm + RBF + spline GEMM + base GEMM)
    from kagnn_tpu.pallas.fastkan_layer import fastkan_layer_fused

    lng = jnp.ones((d,), jnp.float32)
    lnb = jnp.zeros((d,), jnp.float32)
    wbase = jnp.asarray(rng.normal(size=(o, d)).astype(np.float32) * 0.1)
    bbase = jnp.zeros((o,), jnp.float32)
    flops_layer = flops_rbf + 2 * n * d * o + 10 * n * d
    bytes_layer_fused = 4 * (n * d + n * o + d * o * (num_grids + 1))
    sec = _time_fn(jax.jit(lambda x: fastkan_layer_fused(
        x, lng, lnb, w, wbase, bbase, -2.0, 2.0, num_grids, h,
        interpret=False)), x, iters=iters)
    rows.append(Roofline("fastkan_layer_fused", flops_layer,
                         bytes_layer_fused, sec, peaks).row())

    def layer_xla(x):
        mu = x.mean(axis=1, keepdims=True)
        var = ((x - mu) ** 2).mean(axis=1, keepdims=True)
        xs = (x - mu) * jax.lax.rsqrt(var + 1e-5) * lng + lnb
        basis = rbf.rbf_basis(xs, rbf.make_rbf_grid(-2.0, 2.0, num_grids), h)
        return (basis.reshape(n, -1) @ w.T
                + jax.nn.silu(x) @ wbase.T + bbase)

    bytes_layer_xla = bytes_layer_fused + 2 * 4 * n * d * (num_grids + 1)
    sec = _time_fn(jax.jit(layer_xla), x, iters=iters)
    rows.append(Roofline("fastkan_layer_xla", flops_layer, bytes_layer_xla,
                         sec, peaks).row())
    return rows


def device_ms_per_call(run_traced: Callable[[], None], n_calls: int,
                       tag: str = "devms") -> Optional[float]:
    """Total DEVICE op time per call, via a jax.profiler trace.

    `run_traced()` must execute the measured function `n_calls` times and
    hard-fetch the result (the trace context wraps exactly that). Returns
    the busiest device timeline's summed op duration / n_calls in ms, or
    None if no trace was produced.

    Wall clock through the axon tunnel carries a ~3-5 ms per-execution
    dispatch gap plus per-process stream-rate variance (PERFORMANCE.md
    "Measurement discipline"); device op time is immune to both, and is
    the arbiter when two executables' wall times differ by less than the
    window noise (e.g. the round-4 halo spec-vs-full inversion). Summing
    one timeline (the busiest (pid, tid) trace line) avoids double-counting
    module-level spans over op-level events.
    """
    import collections
    import glob
    import gzip
    import json as _json
    import shutil

    tdir = f"/tmp/kagnn_devms_{tag}"
    shutil.rmtree(tdir, ignore_errors=True)
    jax.profiler.start_trace(tdir)
    try:
        run_traced()
    finally:
        jax.profiler.stop_trace()
    tf = sorted(glob.glob(tdir + "/plugins/profile/*/*.trace.json.gz"))
    if not tf:
        return None
    tr = _json.load(gzip.open(tf[-1]))
    pid_names = {}
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev.get("args", {}).get("name", "")
    dev_pids = {pid for pid, name in pid_names.items()
                if "TPU" in name or "/device" in name}
    per_line = collections.Counter()
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        if dev_pids and ev.get("pid") not in dev_pids:
            continue
        per_line[(ev.get("pid"), ev.get("tid"))] += ev.get("dur", 0)
    if not per_line:
        return None
    return max(per_line.values()) / 1000.0 / n_calls
