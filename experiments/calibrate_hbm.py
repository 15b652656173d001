"""Practical HBM-bandwidth calibration for THIS chip — the reproducible
artifact behind the "practical streaming ceiling" used by every roofline
number in PERFORMANCE.md (VERDICT round-2 weak #4: the 819 GB/s paper
figure vs the ~350-400 GB/s this chip actually streams must be a committed
measurement, not a docstring claim).

Measures, in one process with per-iteration input perturbation (the tunnel
relay caches identical executions — PERFORMANCE.md "Measurement caveats"):

  * xla_stream   : y = a*x + b over a large f32 array (read + write)
  * xla_reduce   : sum(x) (read only)
  * pallas_dma   : a minimal double-buffered DMA-chain reduction with the
                   exact chunked structure of pallas/spmm.py (read only)

Writes CALIBRATION.json at the repo root:
    {"xla_stream_gbps": ..., "xla_reduce_gbps": ..., "pallas_dma_gbps": ...,
     "practical_ceiling_gbps": max(...), "paper_peak_gbps": 819}

    python experiments/calibrate_hbm.py [--mb 512] [--iters 10]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kagnn_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _time(fn, x, iters):
    # distinct pre-materialized inputs per iteration: the relay caches
    # identical executions, and perturbing INSIDE the timed loop would add
    # a full extra stream pass per iteration (as large as the measured op)
    xs = [x * (1.0 + 1e-6 * (i + 1)) for i in range(iters)]
    jax.block_until_ready(xs)
    out = fn(x)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf).reshape(-1)[0])
    t0 = time.perf_counter()
    res = [fn(v) for v in xs]
    leaf = jax.tree_util.tree_leaves(res[-1])[0]
    float(jnp.asarray(leaf).reshape(-1)[0])
    jax.block_until_ready(res)
    return (time.perf_counter() - t0) / iters


def _dma_reduce_kernel(x_hbm, out_ref, acc_ref, scratch, sems, *,
                       n_chunks: int, chunk: int, width: int):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def get(slot, c):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(c * chunk, chunk), :], scratch.at[slot],
            sems.at[slot])

    get(0, 0).start()

    def body(c, _):
        slot = c % 2

        @pl.when(c + 1 < n_chunks)
        def _():
            get((c + 1) % 2, c + 1).start()

        get(slot, c).wait()
        acc_ref[...] += scratch[slot][:8, :]
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)
    out_ref[...] = acc_ref[...]


def pallas_dma_reduce(x, chunk=1024, interpret=False):
    rows, width = x.shape
    n_chunks = rows // chunk
    return pl.pallas_call(
        functools.partial(_dma_reduce_kernel, n_chunks=n_chunks, chunk=chunk,
                          width=width),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((8, width), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, width), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((8, width), x.dtype),
            pltpu.VMEM((2, chunk, width), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mb", type=int, default=512)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--no-write", action="store_true")
    args = p.parse_args()

    width = 512
    rows = args.mb * 1024 * 1024 // (4 * width)
    rows = (rows // 1024) * 1024
    nbytes = rows * width * 4
    x = jax.random.normal(jax.random.key(0), (rows, width), jnp.float32)

    stream = jax.jit(lambda x: x * 1.000001 + 0.5)
    t = _time(stream, x, args.iters)
    xla_stream = 2 * nbytes / t / 1e9

    reduce = jax.jit(lambda x: jnp.sum(x, axis=0))
    t = _time(reduce, x, args.iters)
    xla_reduce = nbytes / t / 1e9

    interpret = jax.default_backend() != "tpu"
    dma = jax.jit(lambda x: pallas_dma_reduce(x, interpret=interpret))
    t = _time(dma, x, args.iters)
    pallas_dma = nbytes / t / 1e9

    row = {
        "device": str(jax.devices()[0]),
        "array_mb": round(nbytes / 2**20, 1),
        "iters": args.iters,
        "xla_stream_gbps": round(xla_stream, 1),
        "xla_reduce_gbps": round(xla_reduce, 1),
        "pallas_dma_gbps": round(pallas_dma, 1),
        "practical_ceiling_gbps": round(
            max(xla_stream, xla_reduce, pallas_dma), 1),
        "paper_peak_gbps": 819,
    }
    print(json.dumps(row))
    if not args.no_write:
        path = os.path.join(os.path.dirname(__file__), "..",
                            "CALIBRATION.json")
        with open(path, "w") as f:
            json.dump(row, f, indent=1)


if __name__ == "__main__":
    main()
