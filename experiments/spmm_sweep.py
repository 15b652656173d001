"""Device-time tiling sweep of the sorted-segment-sum kernel.

The round-3/4 tiling sweeps ("all within ±5%", pallas/spmm.py docstring)
were WALL-clock through the axon tunnel, where the ~3-5 ms per-execution
dispatch gap swamps sub-ms differences between configurations. This sweep
re-runs the (chunk_rows, g_blocks, dma_slots, pack) grid with profiler
DEVICE time — the methodology that exposed the kernel's true 370 GB/s in
round 4 — against the pallas DMA-stream probe ceiling
(experiments/calibrate_pallas_stream.py).

Usage (on the TPU): python experiments/spmm_sweep.py [--d 64 --dtype bfloat16]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import itertools
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def device_time_ms(fn, x, iters=10, tag="sweep"):
    """Profiler device time per application of jitted fn."""
    out = fn(x)
    float(out.sum())
    tdir = f"/tmp/kagnn_sweep_{tag}"
    shutil.rmtree(tdir, ignore_errors=True)
    with jax.profiler.trace(tdir):
        res = [fn(x * (1 + 1e-6 * (i + 1))) for i in range(iters)]
        float(res[-1].sum())
    tf = sorted(glob.glob(tdir + "/plugins/profile/*/*.trace.json.gz"))
    if not tf:
        return None
    tr = json.load(gzip.open(tf[-1]))
    agg = collections.Counter()
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") == "X" and "_lambda_" in ev.get("name", ""):
            agg[ev["name"]] += ev.get("dur", 0)
    if not agg:
        return None
    return max(agg.values()) / 1000 / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--chunks", default="512,1024,2048")
    p.add_argument("--gblocks", default="4,8")
    p.add_argument("--slots", default="2,4")
    p.add_argument("--pack", default="1,2")
    args = p.parse_args()

    import bench

    from kagnn_tpu.pallas import spmm

    bench._common_setup()
    g, _ = bench._arxiv_batch()
    e, n = g.n_edge_pad, g.n_node_pad
    dt = jnp.dtype(args.dtype)
    d = args.d
    d_eff = -(-d // 128) * 128
    msgs = jax.random.normal(jax.random.key(5), (e, d_eff), jnp.float32
                             ).astype(dt)
    msgs_narrow = msgs[:, :d]
    recv = g.receivers

    cal_path = os.path.join(os.path.dirname(__file__), "..",
                            "CALIBRATION.json")
    ceiling = None
    if os.path.exists(cal_path):
        ceiling = json.load(open(cal_path)).get("practical_ceiling_gbps")

    grid = list(itertools.product(
        [int(c) for c in args.chunks.split(",")],
        [int(c) for c in args.gblocks.split(",")],
        [int(c) for c in args.slots.split(",")],
        [int(c) for c in args.pack.split(",")]))
    for chunk, gb, slots, pack in grid:
        if pack == 2 and d > 64:
            continue
        # pack=2 consumes the narrow (E, d) layout; pack=1 the pre-padded
        m = msgs_narrow if pack == 2 else msgs
        try:
            fn = jax.jit(lambda mm, ch=chunk, gb_=gb, sl=slots, pk=pack:
                         spmm._fwd_impl(mm, recv, n, False, chunk_rows=ch,
                                        g_blocks=gb_, pack=pk,
                                        dma_slots=sl))
            dev_ms = device_time_ms(
                fn, m, iters=args.iters,
                tag=f"{chunk}_{gb}_{slots}_{pack}")
        except Exception as ex:  # config may not compile (VMEM etc.)
            print(json.dumps({"chunk": chunk, "g_blocks": gb,
                              "slots": slots, "pack": pack,
                              "error": str(ex)[-160:]}), flush=True)
            continue
        eff_lanes = d if (pack == 2 and d <= 64) else d_eff
        traffic = dt.itemsize * e * eff_lanes + dt.itemsize * n * d_eff \
            + 4 * e
        row = {"chunk": chunk, "g_blocks": gb, "slots": slots, "pack": pack,
               "d": d, "dtype": str(dt),
               "device_ms": None if dev_ms is None else round(dev_ms, 3),
               "traffic_mb": round(traffic / 1e6, 1)}
        if dev_ms and ceiling:
            row["device_gbps"] = round(traffic / (dev_ms / 1e3) / 1e9, 1)
            row["pct_of_ceiling"] = round(
                100 * row["device_gbps"] / ceiling, 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
