"""GAT kernel tiling sweep: per-launch WALL windows of the three fused GAT
Pallas kernels (fwd online-softmax aggregate, bwd dadst, bwd sender) as a
function of the edge CHUNK size, at arxiv scale with the bench graph.

Usage (on the TPU):
    python experiments/gat_sweep.py [--chunks 512,1024,2048]

SWEEP RESULT (2026-08-21, committed as a negative result): wall clock
(best-of-3 perturbed 10-iter windows) shows chunk 256/512/1024 equivalent
within noise (fwd 15.6 / dadst 11.3 / sender 13.2 ms standalone incl.
gather+dispatch) and 2048 ~2x WORSE (fwd 26.3). CHUNK=1024 stays.

MEASUREMENT CAVEAT discovered by this sweep: the profiler "device time"
of PALLAS CUSTOM CALLS on the axon relay is a static estimate, not a
measurement — it was bit-identical across chunk 256..2048 while wall
clock doubled at 2048, and it does NOT respond to a 16x inflated
pl.CostEstimate (so it is Mosaic's internal estimate, not ours). Plain
XLA op rows (gathers, copies, fusions) DO track real changes (e.g. the
round-5 t-gather fix: 15.2 -> 2.15 ms rows explained the measured
-23 ms/step exactly). Treat custom-call rows in any trace as
approximate; arbitrate kernel changes by perturbed wall windows.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", default="512,1024,2048")
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    import bench

    bench._common_setup()
    import jax
    import jax.numpy as jnp

    from kagnn_tpu.pallas import gat_bwd, gat_fused

    g, _ = bench._arxiv_batch()
    H, C = 4, 64
    hc = H * C
    n = g.n_node_pad
    ks = jax.random.split(jax.random.key(11), 8)
    h = jax.random.normal(ks[0], (n, hc), jnp.bfloat16)
    amat = jax.random.normal(ks[3], (hc, H), jnp.float32) * 0.1
    asrc = (h.astype(jnp.float32) @ amat)
    adst = jax.random.normal(ks[2], (n, H), jnp.float32)
    dout = jax.random.normal(ks[4], (n, hc), jnp.bfloat16)
    alpha = jax.random.normal(ks[5], (n, H), jnp.float32)
    S = jax.random.normal(ks[6], (n, H), jnp.float32)
    IMAX = 2**31 - 1
    msgs = jnp.take(h, g.senders, axis=0)
    recv_m = jnp.where(g.edge_mask, g.receivers, IMAX)
    rbs = g.receivers_by_sender
    t_parts = tuple(jnp.take(dout[:, i:i + 128], rbs, axis=0)
                    for i in range(0, hc, 128))

    def hilo(x):
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    NRW = jnp.concatenate(
        [*hilo(adst), *hilo(alpha), *hilo(S)], axis=1)
    nrw_table = jnp.take(NRW, rbs, axis=0)
    ssm = jnp.where(g.edge_mask_by_sender, g.senders_sorted, IMAX)

    def fwd(h, asrc, adst):
        return gat_fused.gat_attention_fused(h, asrc, adst, g, 0.2, False,
                                             att_src_matrix=amat)

    def dadst(msgs, dout, adst, alpha, S):
        return gat_bwd.gat_bwd_dadst(msgs, recv_m, dout, adst, alpha, S,
                                     amat, H, hc, 0.2, False)

    def sender(t_parts, nrw_table, h):
        return gat_bwd.gat_bwd_sender(t_parts, nrw_table, ssm, h, amat, H,
                                      hc, 0.2, False)

    # measurement discipline: the tunnel relay caches responses to
    # repeated identical executions and replays them with the original
    # timing (PERFORMANCE.md) — perturb the FIRST operand every iteration
    # with a bf16-EXACT factor (1 + k/64; the bf16 spacing near 1.0 is
    # 2^-8, so a 1+1e-6 factor would round to exactly 1.0 and defeat
    # nothing). WALL windows are the primary metric: the profiler's
    # custom-call durations are Mosaic static estimates (see module
    # docstring) and cannot detect tiling regressions.
    import time

    cases = [("fwd", fwd, (h, asrc, adst)),
             ("dadst", dadst, (msgs, dout, adst, alpha, S)),
             ("sender", sender, (t_parts, nrw_table, h))]
    for chunk in [int(c) for c in args.chunks.split(",")]:
        gat_fused.CHUNK = chunk
        gat_bwd.CHUNK = chunk
        for name, fn, fargs in cases:
            jf = jax.jit(fn)
            jax.block_until_ready(jf(*fargs))

            def perturb(a, k):
                f = 1.0 + (k % 7 + 1) / 64.0
                if isinstance(a, tuple):
                    return (perturb(a[0], k),) + a[1:]
                return a * jnp.asarray(f, a.dtype)

            wins = []
            k = 0
            for _ in range(3):
                t0 = time.perf_counter()
                r = None
                for _ in range(args.iters):
                    k += 1
                    r = jf(perturb(fargs[0], k), *fargs[1:])
                jax.block_until_ready(r)
                wins.append((time.perf_counter() - t0) / args.iters)
            print(f"chunk={chunk:5d} {name:7s} wall_ms="
                  f"{min(wins) * 1e3:.2f} windows="
                  f"{[round(w * 1e3, 2) for w in wins]}", flush=True)


if __name__ == "__main__":
    main()
