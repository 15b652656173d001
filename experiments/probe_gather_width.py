"""Gather row-rate calibration: XLA's TPU row gather is ROW-RATE-bound,
not bandwidth-bound (locality-independent — see _reorder_probe.py). This
probe times take(x, idx) at widths 4..512 to expose the row-rate plateau
and the width where byte traffic finally dominates, and records the
calibrated rows/s in CALIBRATION.json — the constant behind the
row-rate-aware speed-of-light model in experiments/ledger.py.

    python experiments/probe_gather_width.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kagnn_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, x, iters=8):
    """Independent executions (each input scaled from the BASE array, depth-2
    DAG): measures the OVERLAPPED gather rate — the regime the train step's
    gathers run in (XLA overlaps them with surrounding compute). A serial
    chain (each input derived from the previous output) reads ~6x slower
    through this runtime; see chain_timeit for the in-program serial rate."""
    outs = None
    for i in range(2):
        outs = fn(x * (1 + 1e-6 * i))
    float(jnp.asarray(outs).reshape(-1)[0])
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    res = []
    for i in range(iters):
        res.append(fn(x * (1 + 1e-6 * (i + 7))))
    float(jnp.asarray(res[-1]).reshape(-1)[0])
    jax.block_until_ready(res)
    return (time.perf_counter() - t0) / iters


def chain_timeit(idx, x, n, k=8, execs=4):
    """K serial gathers inside ONE executable (each feeding the next):
    the pessimistic in-program bound when nothing overlaps."""
    @jax.jit
    def chain(x):
        y = x
        tot = jnp.zeros((), jnp.float32)
        for _ in range(k):
            z = jnp.take(y, idx, axis=0)
            tot = tot + z[0, 0].astype(jnp.float32)
            y = z[:n] * (1 + 1e-6)
        return tot, y

    r, _ = chain(x)
    float(r)
    t0 = time.perf_counter()
    outs = [chain(x * (1 + 1e-6 * (i + 3))) for i in range(execs)]
    float(outs[-1][0])
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / (execs * k)


def main():
    N, E = 169_984, 1_166_336
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, E), jnp.int32)
    rows = {}
    # width sweep in BOTH dtypes: the w256->w512 bf16 cliff left open
    # whether lanes or BYTES classify a gather as slow (round-4 verdict
    # item 5 — the GAT t-table is 384-lane bf16 = 768 B/row); crossing
    # the same byte counts at two dtypes separates the hypotheses
    for dt, tag, isz in ((jnp.bfloat16, "", 2), (jnp.float32, "_f32", 4)):
        for width in (4, 64, 128, 256, 384, 512):
            if dt == jnp.float32 and width in (4, 512):
                continue
            x = jax.random.normal(jax.random.key(1), (N, width), dt)
            f = jax.jit(lambda x: jnp.take(x, idx, axis=0))
            sec = timeit(f, x)
            gbps = E * width * isz / sec / 1e9
            rows[f"w{width}{tag}"] = {"ms": round(sec * 1e3, 2),
                                      "rows_per_s_M": round(E / sec / 1e6, 1),
                                      "eff_gbps": round(gbps, 1),
                                      "bytes_per_row": width * isz}
            print(width, str(dt.dtype if hasattr(dt,'dtype') else dt),
                  rows[f"w{width}{tag}"])

    x64 = jax.random.normal(jax.random.key(1), (N, 64), jnp.bfloat16)
    sec_chain = chain_timeit(idx, x64, N)
    rows["w64_serial_inprogram"] = {
        "ms": round(sec_chain * 1e3, 2),
        "rows_per_s_M": round(E / sec_chain / 1e6, 1)}
    print("w64 serial in-program", rows["w64_serial_inprogram"])

    # plateau row rate = the narrow-width limit (overlapped regime)
    row_rate = max(rows[k]["rows_per_s_M"] for k in ("w4", "w64"))
    path = os.path.join(os.path.dirname(__file__), "..", "CALIBRATION.json")
    try:
        cal = json.load(open(path))
    except Exception:
        cal = {}
    cal["gather"] = rows
    cal["gather_rows_per_s_M"] = row_rate
    with open(path, "w") as f:
        json.dump(cal, f, indent=1)
    print(json.dumps({"gather_rows_per_s_M": row_rate}))


if __name__ == "__main__":
    main()
