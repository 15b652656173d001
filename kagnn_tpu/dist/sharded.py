"""Sharded (multi-chip) training steps.

Pure-GSPMD design (the "pick a mesh, annotate shardings, let XLA insert
collectives" recipe): the per-replica loss is vmapped over a stacked leading
batch axis for data parallelism, input shardings place

  * GraphBatch edge leaves on ("data", "graph")  — edge partition,
  * GraphBatch node leaves on ("data",)          — replicated per edge shard,
  * params/opt state replicated,

and XLA lowers the cross-shard reductions (partial segment-sums, gradient
means) to ICI collectives. Gradients are averaged across the data axis by
construction of the vmapped mean loss — no hand-written psum needed.

Replaces: nothing in the reference (it is single-process single-GPU,
SURVEY.md §2.4 N8/N9); this is new TPU capability.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kagnn_tpu.graphs.batch import GraphBatch
from kagnn_tpu.train.loops import TrainState

Array = jax.Array


def stack_batches(batches: list[GraphBatch]) -> GraphBatch:
    """Stack equally-padded GraphBatches along a new leading device axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *batches)


def _batch_sharding(mesh: Mesh, g: GraphBatch, data_axis: str,
                    edge_axis: str | None) -> GraphBatch:
    """Pytree of NamedShardings matching a *stacked* GraphBatch."""
    edge_leaves = {"senders", "receivers", "edge_mask", "edges",
                   "senders_perm", "senders_sorted"}

    def spec_for(name: str, v):
        if v is None:
            return None
        if name in edge_leaves and edge_axis is not None:
            return NamedSharding(mesh, P(data_axis, edge_axis))
        return NamedSharding(mesh, P(data_axis))

    return dataclasses.replace(g, **{
        f.name: spec_for(f.name, getattr(g, f.name))
        for f in dataclasses.fields(g)})


def shard_stacked_batch(mesh: Mesh, stacked: GraphBatch,
                        data_axis: str = "data",
                        edge_axis: str | None = "graph") -> GraphBatch:
    shardings = _batch_sharding(mesh, stacked, data_axis, edge_axis)
    return jax.tree.map(
        lambda x, s: x if s is None else jax.device_put(x, s),
        stacked, shardings, is_leaf=lambda x: x is None)


def make_sharded_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    loss_of_output: Callable[[Array, GraphBatch], Array],
    data_axis: str = "data",
    edge_axis: str | None = "graph",
):
    """Build a jitted data+graph-parallel train step.

    The returned step takes (state, stacked_batch, keys) where stacked_batch
    leaves have leading dim = mesh.shape[data_axis] and keys is a vector of
    per-replica dropout keys.
    """
    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P(data_axis))

    def per_replica_loss(params, buffers, batch_stats, batch, key):
        variables = {"params": params}
        if buffers:
            variables["buffers"] = buffers
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out, mut = model.apply(variables, batch, train=True,
                               rngs={"dropout": key}, mutable=["batch_stats"])
        return loss_of_output(out, batch), mut

    def step(state: TrainState, stacked: GraphBatch, keys):
        from kagnn_tpu.ops import segment

        def loss_fn(params):
            # Pallas kernels under vmap+GSPMD are not exercised yet — pin the
            # vmapped replica loss to the XLA segment ops
            with segment.use_pallas_spmm(False):
                losses, muts = jax.vmap(
                    per_replica_loss, in_axes=(None, None, None, 0, 0))(
                    params, state.buffers, state.batch_stats, stacked, keys)
            # merge per-replica batch stats by mean (sync-BN style)
            mut = jax.tree.map(lambda x: x.mean(0), muts)
            return losses.mean(), mut

        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        return state.replace(
            params=optax.apply_updates(state.params, updates),
            batch_stats=mut.get("batch_stats", state.batch_stats)
            if state.batch_stats else state.batch_stats,
            opt_state=new_opt,
            step=state.step + 1), loss

    cache: dict[str, Any] = {}

    def jitted(state, stacked, keys):
        if "step" not in cache:
            state_sh = jax.tree.map(lambda _: repl, state)
            cache["step"] = jax.jit(
                step,
                in_shardings=(state_sh,
                              _batch_sharding(mesh, stacked, data_axis,
                                              edge_axis), dp),
                out_shardings=(state_sh, repl),
            )
        return cache["step"](state, stacked, keys)

    return jitted
