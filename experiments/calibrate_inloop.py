"""Single-execution HBM stream probe: K full read+write passes inside ONE
jitted executable (lax.fori_loop whose carry is the streamed array), so any
per-execution tunnel/dispatch overhead is amortized across K passes.

Compares against experiments/calibrate_hbm.py (one pass per execution):
  * if the two agree        -> the chip genuinely streams at that rate;
  * if in-loop is much faster -> per-execution overhead pollutes the
    one-pass numbers, and the in-loop figure is the ceiling that matters
    for the (single-execution) train step.

The loop body is y = roll(y, 128, axis=0) * c — a materializing permuted
copy XLA cannot fuse across iterations (the carry must be produced each
iteration), i.e. K * (read + write) * size bytes of mandatory HBM traffic.

    python experiments/calibrate_inloop.py [--mb 512] [--k 32] [--iters 4]

Appends an "inloop" section to CALIBRATION.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kagnn_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mb", type=int, default=512)
    p.add_argument("--k", type=int, default=32)
    p.add_argument("--iters", type=int, default=4)
    args = p.parse_args()

    n_rows = args.mb * 1024 * 1024 // (4 * 256)
    x = jax.random.normal(jax.random.key(0), (n_rows, 256), jnp.float32)

    @jax.jit
    def k_passes(y):
        def body(i, y):
            return jnp.roll(y, 128, axis=0) * (1.0 + 1e-7 * i)
        return jax.lax.fori_loop(0, args.k, body, y)

    # distinct inputs per execution (relay caches identical executions)
    xs = [x * (1.0 + 1e-6 * (i + 1)) for i in range(args.iters + 1)]
    for v in xs:
        float(v[0, 0])  # force materialization by host fetch
    out = k_passes(xs[-1])
    float(out[0, 0])
    t0 = time.perf_counter()
    res = [k_passes(v) for v in xs[:args.iters]]
    # synchronize by FETCHING freshly-computed data — the tunnel's
    # block_until_ready has been observed to return early (bogus 60us
    # "timings" for a 1GB-traffic loop); a host transfer cannot be faked
    for r in res:
        float(r[0, 0])
    sec = (time.perf_counter() - t0) / args.iters

    nbytes = x.size * 4
    traffic = 2 * nbytes * args.k  # read + write per pass
    gbps = traffic / sec / 1e9
    row = {"mb": args.mb, "k": args.k, "iters": args.iters,
           "sec_per_exec": round(sec, 5),
           "inloop_stream_gbps": round(gbps, 1)}
    print(json.dumps(row))

    path = os.path.join(os.path.dirname(__file__), "..", "CALIBRATION.json")
    try:
        with open(path) as f:
            cal = json.load(f)
    except Exception:
        cal = {}
    # Plausibility gate (advisor round-3 item 2): reject anything above the
    # chip's paper peak (819 GB/s — nothing real can exceed it) OR more than
    # 1.5x the previously-committed ceiling (a tunnel early-return artifact
    # between the real plateau and the peak would otherwise permanently
    # inflate the ceiling and deflate every downstream pct_of_sol). The raw
    # row is ALWAYS persisted — flagged — so a bogus run leaves a trace.
    prior = cal.get("practical_ceiling_gbps")
    implausible = (row["inloop_stream_gbps"] > cal.get("paper_peak_gbps", 819)
                   or (prior and row["inloop_stream_gbps"] > 1.5 * prior))
    if implausible:
        row["implausible"] = True
        row["reason"] = (f"> paper peak or > 1.5x prior ceiling ({prior}); "
                         "likely tunnel early-return — ceiling not updated")
        print("WARNING: implausible bandwidth; persisting flagged row only")
    cal["inloop"] = row
    if not implausible:
        # overwrite, don't max-ratchet: the ceiling should track the most
        # recent plausible measurement of THIS chip, not the historical max
        cal["practical_ceiling_gbps"] = row["inloop_stream_gbps"]
    with open(path, "w") as f:
        json.dump(cal, f, indent=1)


if __name__ == "__main__":
    main()
