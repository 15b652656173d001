"""Per-kernel roofline report for the fused KAN kernels (BASELINE.md
deliverable: fused spline kernel throughput vs speed-of-light).

    python experiments/roofline.py --n 131072 --d 64 --o 64
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kagnn_tpu.utils.platform import apply_platform_env

apply_platform_env()


def spmm_row(d: int = 128, iters: int = 10, dtype: str = "float32") -> dict:
    """SpMM (sorted-segment-sum) kernel effective bandwidth at arxiv scale
    vs the CALIBRATED practical ceiling (CALIBRATION.json) — the VERDICT
    round-3 item-2 roofline row. Bytes = the kernel's actual HBM traffic:
    message stream (E x d_eff, lane-padded) + output + receiver ids."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from kagnn_tpu.pallas.spmm import sorted_segment_sum

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/kagnn_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    g, _ = bench._arxiv_batch()
    e = g.n_edge_pad
    n = g.n_node_pad
    d_eff = -(-d // 128) * 128
    dt = jnp.dtype(dtype)
    # feed the kernel the way the framework does (ops/segment._edge_gather):
    # bf16 rows <=64 wide stay NARROW (the r5 pack-2 default halves DMA
    # bytes); wider/f32 rows arrive lane-PREPADDED from gather_rows_padded
    # so no (E, d)->(E, d_eff) copy precedes the launch
    d_feed = d if (dt == jnp.bfloat16 and d <= 64) else d_eff
    msgs = jax.random.normal(jax.random.key(5), (e, d_feed), dt)
    fn = jax.jit(lambda m: sorted_segment_sum(m, g.receivers, n, False))
    out = fn(msgs)
    float(out.sum())
    windows = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = []
        for i in range(iters):
            res.append(fn(msgs * jnp.asarray(
                1.0 + (i % 7 + 1) / 64.0, dt)))  # bf16-exact factor
        float(res[-1].sum())
        windows.append((time.perf_counter() - t0) / iters)
    sec = min(windows)
    # CHAINED-WALL anchor (round 5): 8 scalar-dependent launches inside ONE
    # executable, wall/8 — bounds the per-launch cost from above with only
    # one dispatch and one (E, d) rescale pass per launch of overhead.
    # Needed because the profiler's custom-call durations below are Mosaic
    # STATIC ESTIMATES, not measurements (experiments/gat_sweep.py): the
    # true embedded cost lies between device_ms and this bound.
    @jax.jit
    def chain(m0):
        total = jnp.zeros((), jnp.float32)
        m = m0
        for _ in range(8):
            o = sorted_segment_sum(m, g.receivers, n, False)
            total = total + o[0, 0].astype(jnp.float32)
            # in-program ordering dep; the value perturbation that defeats
            # the relay's replay cache is the OUTER loop's (a replay
            # can only happen per-execution, not per-launch)
            m = m0 * (1.0 + 1e-12 * total).astype(m0.dtype)
        return total

    float(chain(msgs))
    cwins = []
    a = msgs
    for _ in range(3):
        t0 = time.perf_counter()
        for _k in range(4):
            a = msgs * jnp.asarray(1.0 + (len(cwins) * 4 + _k % 4 + 1)
                                   / 64.0, a.dtype)  # bf16-exact
            r = chain(a)
        float(r)
        cwins.append((time.perf_counter() - t0) / 4)
    chained_ms = min(cwins) / 8 * 1e3
    # DEVICE time via profiler trace — CAUTION: for Pallas custom calls
    # this is a Mosaic static estimate, not a measurement (see above)
    device_ms = None
    try:
        import collections
        import glob
        import gzip
        import shutil

        tdir = "/tmp/kagnn_spmm_trace"
        shutil.rmtree(tdir, ignore_errors=True)
        with jax.profiler.trace(tdir):
            res = [fn(msgs * jnp.asarray(1.0 + (i % 7 + 1) / 64.0, dt))
                   for i in range(10)]
            float(res[-1].sum())
        tf = sorted(glob.glob(tdir + "/plugins/profile/*/*.trace.json.gz"))
        if tf:
            tr = json.load(gzip.open(tf[-1]))
            agg = collections.Counter()
            for ev in tr.get("traceEvents", []):
                if ev.get("ph") == "X" and ev.get(
                        "name", "").startswith("_lambda_"):
                    agg[ev["name"]] += ev.get("dur", 0)
            if agg:
                device_ms = max(agg.values()) / 1000 / 10
    except Exception:
        pass
    traffic = dt.itemsize * (e * d_feed + n * d_eff) + 4 * e
    eff = traffic / sec / 1e9
    cal_path = os.path.join(os.path.dirname(__file__), "..",
                            "CALIBRATION.json")
    ceiling = None
    if os.path.exists(cal_path):
        ceiling = json.load(open(cal_path)).get("practical_ceiling_gbps")
    row = {"kernel": "spmm_sorted_segment_sum", "d": d, "d_eff": d_eff,
           "dtype": str(dt), "e": e, "ms": round(sec * 1e3, 3),
           "traffic_bytes": traffic, "effective_gbps": round(eff, 1),
           "windows_ms": [round(w * 1e3, 2) for w in windows],
           "calibrated_ceiling_gbps": ceiling}
    if ceiling:
        row["pct_of_calibrated_ceiling"] = round(100 * eff / ceiling, 1)
    row["chained_wall_ms_per_launch"] = round(chained_ms, 3)
    row["chained_windows_ms"] = [round(w * 1e3, 2) for w in cwins]
    if device_ms:
        eff_dev = traffic / (device_ms / 1e3) / 1e9
        row["device_ms_static_estimate"] = round(device_ms, 3)
        row["device_effective_gbps"] = round(eff_dev, 1)
        if ceiling:
            row["device_pct_of_calibrated_ceiling"] = round(
                100 * eff_dev / ceiling, 1)
    return row


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=131072)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--o", type=int, default=64)
    p.add_argument("--grid_size", type=int, default=4)
    p.add_argument("--spline_order", type=int, default=3)
    p.add_argument("--num_grids", type=int, default=8)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--spmm", action="store_true",
                   help="only the SpMM roofline row (arxiv scale)")
    p.add_argument("--dtype", default="float32")
    args = p.parse_args()

    if args.spmm:
        print(json.dumps(spmm_row(d=args.d, dtype=args.dtype)))
        return

    from kagnn_tpu.utils.profiling import kernel_report

    rows = kernel_report(args.n, args.d, args.o, args.grid_size,
                         args.spline_order, args.num_grids, args.iters)
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
