"""Per-op device-time attribution of a node train step (profiler trace).

Round-4 found the flagship's dominant term is no longer kernels or gathers
but ~19 ms/step of medium XLA fusions (BN, loss, head, optimizer, glue) in
~1.3 ms pieces (PERFORMANCE.md "Flagship device attribution"). This script
names them: it runs N traced steps of any bench path and prints every
device op >= a cutoff, aggregated by op name, per step — the work list for
fusion-tail attacks (round-4 verdict item 3).

Usage (on the TPU): python experiments/profile_step.py [--path pallas-fused-bf16]
                    [--steps 4] [--cutoff_us 200]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--path", default="pallas-fused-bf16")
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--cutoff_us", type=float, default=150.0)
    p.add_argument("--json", action="store_true")
    args = p.parse_args()

    import bench

    import jax

    bench._common_setup()
    import jax.numpy as jnp
    import optax

    from kagnn_tpu.models import NodeClassifier
    from kagnn_tpu.ops import segment
    from kagnn_tpu.train.loops import TrainState, make_node_steps

    conv, arch, fused, bf16, reorder, force_xla = bench.NODE_PATHS[args.path]
    g, mask = bench._arxiv_batch(reorder=reorder)
    model = NodeClassifier(fused=fused, conv_type=conv, architecture=arch,
                           compute_dtype=jnp.bfloat16 if bf16 else None,
                           **bench._NODE_KW)
    variables = bench._init_variables(conv, arch)
    dev = jax.devices()[0]
    variables = jax.tree.map(lambda a: jax.device_put(a, dev), variables)
    tx = optax.adam(1e-3)
    state = TrainState(params=variables["params"],
                       buffers=variables.get("buffers", {}),
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))
    step_fn, _ = make_node_steps(model, tx)
    ctx = segment.use_pallas_spmm(False) if force_xla else bench._nullctx()

    nodes = g.nodes
    key = jax.random.key(7)
    with ctx:
        s = state
        for _ in range(2):
            nodes = nodes * (1.0 + 1e-6)
            s, loss = step_fn(s, g.replace(nodes=nodes), mask, key)
        float(loss)

        import shutil

        tdir = "/tmp/kagnn_step_trace"
        shutil.rmtree(tdir, ignore_errors=True)
        with jax.profiler.trace(tdir):
            for _ in range(args.steps):
                nodes = nodes * (1.0 + 1e-6)
                s, loss = step_fn(s, g.replace(nodes=nodes), mask, key)
            float(loss)
            float(jax.tree_util.tree_leaves(s.params)[0].sum())

    tf = sorted(glob.glob(tdir + "/plugins/profile/*/*.trace.json.gz"))
    if not tf:
        print("no trace produced", file=sys.stderr)
        return
    tr = json.load(gzip.open(tf[-1]))
    # device-track pids: XLA op events carry 'run_id'/'correlation_id' args
    # on TPU tracks; host python threads don't. Aggregate X events by name,
    # excluding obvious host/python tracks by process name.
    pid_names = {}
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev.get("args", {}).get("name", "")
    dev_pids = {pid for pid, name in pid_names.items()
                if "TPU" in name or "tpu" in name or "/device" in name}
    agg = collections.Counter()
    cnt = collections.Counter()
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        if dev_pids and ev.get("pid") not in dev_pids:
            continue
        agg[ev["name"]] += ev.get("dur", 0)
        cnt[ev["name"]] += 1
    total = sum(agg.values())
    rows = []
    for name, dur in agg.most_common():
        per_step_us = dur / args.steps
        if per_step_us < args.cutoff_us:
            continue
        rows.append({"op": name[:120], "us_per_step": round(per_step_us, 1),
                     "count_per_step": round(cnt[name] / args.steps, 1)})
    out = {"path": args.path, "steps": args.steps,
           "device_total_ms_per_step": round(total / args.steps / 1e3, 2),
           "ops": rows}
    if args.json:
        print(json.dumps(out))
    else:
        print(f"device total: {out['device_total_ms_per_step']} ms/step "
              f"({len(rows)} ops >= {args.cutoff_us} us)")
        for r in rows:
            print(f"{r['us_per_step']:>10.1f} us  x{r['count_per_step']:<5}"
                  f" {r['op']}")


if __name__ == "__main__":
    main()
