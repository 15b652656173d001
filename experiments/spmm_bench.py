"""Standalone SpMM kernel microbenchmark on the real chip.

Times kagnn_tpu.pallas.spmm.sorted_segment_sum vs jax.ops.segment_sum on an
arxiv-scale power-law edge set (the reference's aggregation hot path,
node_classification_clean/models.py:140 via PyG propagate). Follows the
tunnel measurement discipline from bench.py: per-iteration input
perturbation + value fetch for synchronization.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def powerlaw_receivers(rng, e, n):
    r = (rng.pareto(1.5, size=e) * 12).astype(np.int64) % n
    return np.sort(r).astype(np.int32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=1_166_243)
    ap.add_argument("--nodes", type=int, default=169_343)
    ap.add_argument("--widths", type=str, default="64,128")
    ap.add_argument("--dtype", type=str, default="float32")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import os
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/kagnn_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from kagnn_tpu.pallas.spmm import sorted_segment_sum

    rng = np.random.default_rng(0)
    recv = powerlaw_receivers(rng, args.edges, args.nodes)
    dt = jnp.dtype(args.dtype)
    dev = jax.devices()[0]
    recv_d = jax.device_put(jnp.asarray(recv), dev)

    for d in map(int, args.widths.split(",")):
        msgs = jax.device_put(
            jnp.asarray(rng.standard_normal((args.edges, d)), dt), dev)

        pallas_fn = jax.jit(lambda m: sorted_segment_sum(m, recv_d, args.nodes))
        xla_fn = jax.jit(lambda m: jax.ops.segment_sum(
            m, recv_d, num_segments=args.nodes, indices_are_sorted=True))

        # correctness spot check on small slice via CPU
        got = np.asarray(pallas_fn(msgs)[:512])
        want = np.asarray(xla_fn(msgs)[:512])
        err = float(np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9))

        out = {}
        for name, fn in [("pallas", pallas_fn), ("xla", xla_fn)]:
            m = msgs
            for _ in range(3):
                m = m * 1.000001
                r = fn(m)
            float(r.sum())
            t0 = time.perf_counter()
            for _ in range(args.iters):
                m = m * 1.000001
                r = fn(m)
            float(r.sum())
            out[name] = (time.perf_counter() - t0) / args.iters * 1e3
        bw = (args.edges * d * dt.itemsize) / (out["pallas"] * 1e-3) / 1e9
        print(f"D={d:4d} {args.dtype}: pallas {out['pallas']:7.3f} ms  "
              f"xla {out['xla']:7.3f} ms  speedup {out['xla']/out['pallas']:.2f}x  "
              f"~{bw:.0f} GB/s eff  relerr {err:.2e}")


if __name__ == "__main__":
    main()
