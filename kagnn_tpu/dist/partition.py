"""Edge-partitioned full-graph training (explicit shard_map halo pattern).

The scaling story for graphs the reference cannot handle (it trains
ogbn-arxiv full-batch on ONE device, node_classification_clean/utils.py:125):
shard the EDGE list across a mesh axis while replicating node features; each
device aggregates its edge shard locally and the partial node aggregates are
all-reduced over ICI (`psum`) — the GNN analogue of context/sequence
parallelism (SURVEY.md §2.4 N9, BASELINE.json north star).

Mechanics: `kagnn_tpu.ops.segment.edge_axis` arms every edge->node segment
reduction with the matching collective, so the whole conv stack runs
unchanged inside `shard_map`. Parameters and node arrays are replicated;
gradients come out replicated (each device computes the identical global
loss after the psums), so no gradient all-reduce is needed.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from kagnn_tpu.graphs.batch import GraphBatch
from kagnn_tpu.ops import segment
from kagnn_tpu.train import losses
from kagnn_tpu.train.loops import TrainState

Array = jax.Array

_EDGE_LEAVES = ("senders", "receivers", "edge_mask", "edges",
                "senders_perm", "senders_sorted")


def pad_edges_to(g: GraphBatch, multiple: int) -> GraphBatch:
    """Repad the edge axis so it divides the partition count."""
    e = g.n_edge_pad
    pad = (-e) % multiple
    if pad == 0:
        return g
    fill = {"senders": g.n_node_pad - 1, "receivers": g.n_node_pad - 1,
            "edge_mask": False}
    upd = {}
    for name in _EDGE_LEAVES:
        v = getattr(g, name)
        if v is None:
            continue
        if name == "edges":
            upd[name] = jnp.pad(v, ((0, pad),) + ((0, 0),) * (v.ndim - 1))
        else:
            upd[name] = jnp.concatenate(
                [v, jnp.full((pad,), fill[name], v.dtype)])
    return g.replace(**upd)


def _specs_for(g: GraphBatch, axis: str):
    return dataclasses.replace(g, **{
        f.name: (P(axis) if f.name in _EDGE_LEAVES
                 and getattr(g, f.name) is not None else
                 (None if getattr(g, f.name) is None else P()))
        for f in dataclasses.fields(g)})


def make_edge_partitioned_node_step(model, tx: optax.GradientTransformation,
                                    mesh: Mesh, axis: str = "graph"):
    """Full-graph node-classification train step with the edge list sharded
    over `axis`. Signature matches `make_node_steps`' train_step:
    (state, graph, mask, dropout_key) -> (state, loss)."""
    n_shards = mesh.shape[axis]

    def body(state: TrainState, g: GraphBatch, mask, key):
        with segment.edge_axis(axis):
            def loss_fn(params):
                variables = {"params": params, **(
                    {"buffers": state.buffers} if state.buffers else {}), **(
                    {"batch_stats": state.batch_stats}
                    if state.batch_stats else {})}
                out, mut = model.apply(
                    variables, g, train=True, rngs={"dropout": key},
                    mutable=["batch_stats"])
                return losses.masked_softmax_cross_entropy(
                    out, g.y, mask), mut

            (loss, mut), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        return state.replace(
            params=optax.apply_updates(state.params, updates),
            batch_stats=mut.get("batch_stats", state.batch_stats)
            if state.batch_stats else state.batch_stats,
            opt_state=new_opt, step=state.step + 1), loss

    cache = {}

    def step(state, g, mask, key):
        g = pad_edges_to(g, n_shards)
        if "fn" not in cache:
            state_spec = jax.tree.map(lambda _: P(), state)
            cache["fn"] = jax.jit(shard_map(
                body, mesh=mesh,
                in_specs=(state_spec, _specs_for(g, axis), P(), P()),
                out_specs=(state_spec, P()),
                check_vma=True,
            ))
        return cache["fn"](state, g, mask, key)

    return step


def scaling_report(model_fn: Callable[[], tuple], n_devices_list=(1, 2, 4, 8),
                   iters: int = 5) -> list[dict]:
    """edges/s at several edge-partition widths (the 1-chip/1-host/N-host
    scaling harness; run on a real pod slice for meaningful numbers)."""
    import time

    rows = []
    for n in n_devices_list:
        if n > len(jax.devices()):
            continue
        mesh = Mesh(np.asarray(jax.devices()[:n]).reshape(n), ("graph",))
        model, state, g, mask, tx = model_fn()
        step = make_edge_partitioned_node_step(model, tx, mesh)
        key = jax.random.key(0)
        state, loss = step(state, g, mask, key)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(iters):
            state, loss = step(state, g, mask, key)
        jax.block_until_ready(loss)
        sec = (time.perf_counter() - t0) / iters
        rows.append({"n_devices": n, "sec_per_step": sec,
                     "edges_per_s": int(g.n_edge) / sec})
    if rows:
        base = rows[0]["edges_per_s"]
        for r in rows:
            r["scaling_efficiency"] = r["edges_per_s"] / (
                base * r["n_devices"])
    return rows
