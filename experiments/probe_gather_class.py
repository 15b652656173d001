"""Gather speed-class probe: row-byte-width sweep of (N, k) -> (E, k) row
gathers at arxiv scale (N=169,344, E=1,166,336), standalone jitted.

Round-5 finding (VERDICT round-4 item 5 follow-up): the chip's row-gather
engine has TWO classes —

  * fast (SC-offload / alternate-memory table): ~2.2-3.9 ns/row, requires
    (a) rows <= 512 B ("Gather does not fit in TileSpmem. Unsupported on
    SparseCore." — libtpu) and (b) the TABLE resident in alternate memory
    (HLO layout tag S(1)); XLA's MSA colors tables into the ~128 MB budget;
  * serialized TensorCore fallback: ~10.6-13 ns/row REGARDLESS of width
    (backend_config integer_config 128), chosen whenever (a) or (b) fails.

So the round-4 hypothesis "bf16 halves the row bytes and re-enters the
fast class" was necessary but NOT sufficient: a 384-lane bf16 t-table
(768 B/row) violates (a); splitting it into <=512 B passes satisfies (a)
but the *in-program* fate then hinges on (b) — with three (N, 128) bf16
tables + the index vectors + kernel staging live at the same point, one
table misses the budget and its gather serializes (measured 12.4 ms vs
2.15 for its identically-shaped siblings inside the same train step).

Usage (on the TPU): python experiments/probe_gather_class.py
Writes GATHER_CLASS.json at the repo root.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N, E = 169_344, 1_166_336


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from kagnn_tpu.utils.profiling import device_ms_per_call

    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
    out = {"n_rows_table": N, "n_rows_gathered": E,
           "device": str(jax.devices()[0])}
    rows = {}
    for lanes, dtype, tag in [(128, jnp.bfloat16, "bf16_128"),
                              (256, jnp.bfloat16, "bf16_256"),
                              (384, jnp.bfloat16, "bf16_384"),
                              (512, jnp.bfloat16, "bf16_512"),
                              (128, jnp.float32, "f32_128"),
                              (256, jnp.float32, "f32_256")]:
        table = jnp.asarray(rng.normal(size=(N, lanes)), dtype)

        @jax.jit
        def f(t, i):
            return jnp.take(t, i, axis=0, mode="clip").sum(dtype=jnp.float32)

        f(table, idx).block_until_ready()

        def run():
            r = None
            for _ in range(6):
                r = f(table, idx)
            float(r)

        ms = device_ms_per_call(run, 6, tag=tag)
        if ms is None:
            continue
        rows[tag] = {"row_bytes": lanes * table.dtype.itemsize,
                     "ms": round(ms, 2),
                     "ns_per_row": round(ms * 1e6 / E, 2)}
        print(tag, rows[tag], flush=True)
    out["standalone"] = rows
    out["in_program_observed"] = {
        "fast_128_bf16_ms": 2.15, "fast_256_bf16_ms": 3.71,
        "serialized_any_width_ms": "12.4-15.2",
        "frozen_observation_date": "2026-08-21",
        "note": "FROZEN trace observation (GAT train-step profile "
                "2026-08-21), NOT re-measured by this probe: identical "
                "(E,128) bf16 gathers in one step measured 2.15 ms "
                "(alternate-memory table, integer_config 0) and 12.4 ms "
                "(HBM table, integer_config 128 serialized). Re-derive "
                "from a fresh experiments/profile_step.py trace if the "
                "compiler or hardware changes; ledger.py consumes "
                "fast_128_bf16_ms as the row-rate-floor gather cost."}
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "GATHER_CLASS.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote GATHER_CLASS.json")


if __name__ == "__main__":
    main()
