"""Pallas streaming-ceiling probe — the real denominator for SpMM rooflines.

Round-4 verdict item 1: the SpMM kernel itself demonstrated 370 GB/s device
time (ROOFLINE_SPMM.json f32-128) — 142% of the then-committed 260.2 GB/s
"practical ceiling" (a jnp roll-loop probe, experiments/calibrate_inloop.py).
A ceiling the kernel beats by 42% is not a ceiling. This probe reproduces
the kernel's OWN pipeline shape — grouped grid, double-buffered
`make_async_copy` chunk DMA from HBM into VMEM, per-group block write —
with the indicator build and one-hot MXU passes removed (one trivial
128-row VMEM add per chunk keeps the loop honest). What it sustains IS the
practical streaming ceiling for this class of kernel on this chip; the
SpMM kernel's %-of-ceiling is then computed against a number the chip has
actually shown.

Traffic accounting matches pallas/spmm.py: read E_pad x d_eff once + write
rows_out x d_eff once (+ the offsets scalars, negligible).

Usage (on the TPU):  python experiments/calibrate_pallas_stream.py
  [--d 128] [--dtype float32] [--iters 10]
Prints one JSON line; merge into CALIBRATION.json with --commit.
"""
from __future__ import annotations

import argparse
import collections
import functools
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS_PER_BLOCK = 128
G_BLOCKS = 4


def _probe_kernel(offsets_ref, msgs_hbm, out_ref, acc_ref, scratch, sems, *,
                  d_eff: int, chunk_rows: int, dma_slots: int):
    g = pl.program_id(0)
    c0 = offsets_ref[g]
    c1 = offsets_ref[g + 1]

    acc_ref[...] = jnp.zeros_like(acc_ref)

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            msgs_hbm.at[pl.ds(c * chunk_rows, chunk_rows), :],
            scratch.at[slot], sems.at[slot])

    for k in range(dma_slots - 1):
        @pl.when(c0 + k < c1)
        def _(k=k):
            get_dma(k, c0 + k).start()

    def body(c, _):
        slot = (c - c0) % dma_slots

        @pl.when(c + dma_slots - 1 < c1)
        def _():
            get_dma((c - c0 + dma_slots - 1) % dma_slots,
                    c + dma_slots - 1).start()

        get_dma(slot, c).wait()
        # one 128-row VMEM add per chunk: keeps the DMA'd data live without
        # adding meaningful compute (the spmm kernel's per-chunk indicator
        # build + MXU dots are exactly what this probe removes)
        acc_ref[...] = acc_ref[...] + scratch[slot][:ROWS_PER_BLOCK, :]
        return 0

    jax.lax.fori_loop(c0, c1, body, 0)
    for sb in range(G_BLOCKS):
        out_ref[sb * ROWS_PER_BLOCK:(sb + 1) * ROWS_PER_BLOCK, :] = (
            acc_ref[...])


def probe_stream(e_rows: int, n_rows: int, d: int, dtype,
                 chunk_rows: int = 1024, dma_slots: int = 2):
    """Stream an (e_rows, d) array through the spmm-shaped DMA pipeline."""
    d_eff = -(-d // 128) * 128
    ep = -(-e_rows // chunk_rows) * chunk_rows
    n_chunks = ep // chunk_rows
    n_blocks = -(-n_rows // ROWS_PER_BLOCK)
    n_groups = -(-n_blocks // G_BLOCKS)
    rows_out = n_groups * G_BLOCKS * ROWS_PER_BLOCK
    # chunks split evenly across groups (the spmm kernel splits by edge
    # ranges; same totals)
    offsets = np.round(np.linspace(0, n_chunks, n_groups + 1)).astype(
        np.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((G_BLOCKS * ROWS_PER_BLOCK, d_eff),
                               lambda g, *_: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((ROWS_PER_BLOCK, d_eff), jnp.float32),
            pltpu.VMEM((dma_slots, chunk_rows, d_eff), dtype),
            pltpu.SemaphoreType.DMA((dma_slots,)),
        ],
    )
    call = pl.pallas_call(
        functools.partial(_probe_kernel, d_eff=d_eff, chunk_rows=chunk_rows,
                          dma_slots=dma_slots),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows_out, d_eff), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * ep * d_eff,
            bytes_accessed=jnp.dtype(dtype).itemsize * ep * d_eff
            + 4 * rows_out * d_eff,
            transcendentals=0),
    )
    return call, jnp.asarray(offsets), ep, d_eff, rows_out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--d", type=int, default=128)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--e", type=int, default=1_166_336,
                   help="rows streamed (default: arxiv-scale edge count)")
    p.add_argument("--n", type=int, default=169_344,
                   help="output rows (default: arxiv-scale node count)")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--chunk", type=int, default=1024)
    p.add_argument("--slots", type=int, default=2)
    p.add_argument("--commit", action="store_true",
                   help="merge result into CALIBRATION.json")
    args = p.parse_args()

    dt = jnp.dtype(args.dtype)
    call, offsets, ep, d_eff, rows_out = probe_stream(
        args.e, args.n, args.d, dt, args.chunk, args.slots)
    msgs = jax.random.normal(jax.random.key(0), (ep, d_eff), jnp.float32
                             ).astype(dt)
    fn = jax.jit(lambda m: call(offsets, m))
    out = fn(msgs)
    float(out.sum())

    windows = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = [fn(msgs * (1 + 1e-6 * (i + 1))) for i in range(args.iters)]
        float(res[-1].sum())
        windows.append((time.perf_counter() - t0) / args.iters)
    sec = min(windows)

    device_ms = None
    try:
        import shutil

        tdir = "/tmp/kagnn_stream_trace"
        shutil.rmtree(tdir, ignore_errors=True)
        with jax.profiler.trace(tdir):
            res = [fn(msgs * (1 + 1e-6 * (i + 90))) for i in range(10)]
            float(res[-1].sum())
        tf = sorted(glob.glob(tdir + "/plugins/profile/*/*.trace.json.gz"))
        if tf:
            tr = json.load(gzip.open(tf[-1]))
            agg = collections.Counter()
            for ev in tr.get("traceEvents", []):
                if ev.get("ph") == "X" and "_lambda_" in ev.get("name", ""):
                    agg[ev["name"]] += ev.get("dur", 0)
            if agg:
                device_ms = max(agg.values()) / 1000 / 10
    except Exception:
        pass

    traffic = dt.itemsize * ep * d_eff + 4 * rows_out * d_eff
    row = {
        "probe": "pallas_grouped_dma_stream",
        "d": args.d, "d_eff": d_eff, "dtype": str(dt), "rows": ep,
        "rows_out": rows_out, "chunk": args.chunk, "dma_slots": args.slots,
        "traffic_bytes": traffic,
        "wall_ms": round(sec * 1e3, 3),
        "wall_gbps": round(traffic / sec / 1e9, 1),
        "windows_ms": [round(w * 1e3, 2) for w in windows],
    }
    if device_ms:
        row["device_ms"] = round(device_ms, 3)
        row["device_gbps"] = round(traffic / (device_ms / 1e3) / 1e9, 1)
    print(json.dumps(row), flush=True)

    if args.commit and device_ms:
        cal_path = os.path.join(os.path.dirname(__file__), "..",
                                "CALIBRATION.json")
        cal = json.load(open(cal_path)) if os.path.exists(cal_path) else {}
        cal["pallas_stream_probe"] = row
        # the ceiling is what the chip demonstrably streams through this
        # pipeline; keep the superseded roll-loop number for history
        prev = cal.get("practical_ceiling_gbps")
        if prev and prev < row["device_gbps"]:
            cal["superseded_rollloop_ceiling_gbps"] = prev
            cal["practical_ceiling_gbps"] = row["device_gbps"]
            cal["demonstrated_stream_gbps"] = row["device_gbps"]
            cal["demonstrated_stream_how"] = (
                "pallas grouped double-buffered DMA stream probe "
                "(experiments/calibrate_pallas_stream.py) — the spmm "
                "kernel's own pipeline shape minus indicator/MXU work; "
                "replaces the jnp roll-loop probe the spmm kernel itself "
                "exceeded by 42% (round-4 verdict item 1)")
        with open(cal_path, "w") as f:
            json.dump(cal, f, indent=2)
        print(json.dumps({"committed": cal_path,
                          "practical_ceiling_gbps":
                          cal["practical_ceiling_gbps"]}), flush=True)


if __name__ == "__main__":
    main()
