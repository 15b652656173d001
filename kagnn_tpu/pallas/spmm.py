"""Pallas sorted-segment-sum — the SpMM/aggregation kernel.

XLA lowers scatter-add on TPU to a slow serialized form (measured ~18 ms for
1.17M x 64 at arxiv scale, ~25x off HBM speed-of-light). This kernel exploits
the framework's invariant that edges are SORTED BY RECEIVER (established by
the batchers): the edges of each 128-row output block are contiguous, so the
kernel

  * prefetches per-row-block edge offsets (scalar prefetch),
  * streams aligned (TILE_E, D) message chunks HBM -> VMEM with double
    buffering,
  * accumulates each chunk with a one-hot (128, TILE_E) x (TILE_E, D) MXU
    matmul — receivers outside the block simply match no row, which also
    makes chunk overlap at block boundaries self-masking.

No scatter anywhere. The backward of segment-sum is a plain gather
(cot[receivers]), which XLA handles well, so the custom VJP uses jnp.take.

Replaces SURVEY.md §2.4 N1 (torch-scatter / PyG segment CUDA kernels).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

ROWS_PER_BLOCK = 128
TILE_E = 512


def _kernel(offsets_ref, recv_ref, msgs_hbm, out_ref, scratch, sems,
            *, n_chunk_rows: int, d: int):
    i = pl.program_id(0)
    start = offsets_ref[i]
    end = offsets_ref[i + 1]
    c0 = start // TILE_E
    c1 = jax.lax.select(end > start, (end - 1) // TILE_E + 1, c0)
    row_base = i * ROWS_PER_BLOCK
    row_ids = jax.lax.broadcasted_iota(
        jnp.int32, (ROWS_PER_BLOCK, TILE_E), 0) + row_base

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            msgs_hbm.at[pl.ds(c * TILE_E, TILE_E), :],
            scratch.at[slot], sems.at[slot])

    @pl.when(c1 > c0)
    def _():
        get_dma(0, c0).start()

    def body(c, acc):
        slot = (c - c0) % 2

        @pl.when(c + 1 < c1)
        def _():
            get_dma((c - c0 + 1) % 2, c + 1).start()

        get_dma(slot, c).wait()
        recv = recv_ref[c, :][None, :]  # (1, TILE_E) int32
        onehot = (recv == row_ids).astype(jnp.bfloat16)  # (R, TILE_E), exact
        m = scratch[slot]
        dn = (((1,), (0,)), ((), ()))
        if m.dtype == jnp.bfloat16:
            # bf16 messages: one default-speed pass, exact product
            return acc + jax.lax.dot_general(
                onehot, m, dn, preferred_element_type=jnp.float32)
        # f32 messages, bf16 hi/lo split: the one-hot side is exact in bf16;
        # splitting the messages into bf16 hi + residual lo recovers ~f32
        # fidelity with two default-speed MXU passes (measured 7.3ms vs 8.3ms
        # for the 6-pass HIGHEST f32 matmul, same ~2e-4 error scale).
        hi = m.astype(jnp.bfloat16)
        lo = (m - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return (acc
                + jax.lax.dot_general(onehot, hi, dn,
                                      preferred_element_type=jnp.float32)
                + jax.lax.dot_general(onehot, lo, dn,
                                      preferred_element_type=jnp.float32))

    acc = jnp.zeros((ROWS_PER_BLOCK, d), jnp.float32)
    acc = jax.lax.fori_loop(c0, c1, body, acc)
    out_ref[...] = acc.astype(out_ref.dtype)


def _pad_to(x: Array, m: int, axis: int = 0, fill=0):
    pad = (-x.shape[axis]) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def sorted_segment_sum(msgs: Array, receivers: Array, num_segments: int,
                       interpret: bool = False) -> Array:
    """segment_sum for receiver-SORTED edges. msgs (E, D) f32/bf16,
    receivers (E,) int32 ascending. Returns (num_segments, D)."""
    return _fwd_impl(msgs, receivers, num_segments, interpret)


def _fwd_impl(msgs, receivers, num_segments, interpret):
    e, d_orig = msgs.shape
    # HBM DMA slices must be lane-aligned: pad the feature dim to 128
    msgs = _pad_to(msgs, 128, axis=1)
    d = msgs.shape[1]
    msgs_p = _pad_to(msgs, TILE_E)
    # padded edges get an out-of-range receiver so they match no row
    recv_p = _pad_to(receivers.astype(jnp.int32), TILE_E,
                     fill=jnp.iinfo(jnp.int32).max)
    ep = msgs_p.shape[0]
    n_blocks = -(-num_segments // ROWS_PER_BLOCK)
    rows_out = n_blocks * ROWS_PER_BLOCK
    # per-block first-edge offsets from the sorted receiver vector
    block_starts = jnp.searchsorted(
        receivers, jnp.arange(n_blocks, dtype=jnp.int32) * ROWS_PER_BLOCK
    ).astype(jnp.int32)
    offsets = jnp.concatenate(
        [block_starts, jnp.asarray([e], jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((ep // TILE_E, TILE_E), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),  # receivers, chunked rows
            pl.BlockSpec(memory_space=pl.ANY),  # msgs stay in HBM
        ],
        out_specs=pl.BlockSpec((ROWS_PER_BLOCK, d), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, TILE_E, d), msgs.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, n_chunk_rows=ep // TILE_E, d=d),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows_out, d), msgs.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * ep * ROWS_PER_BLOCK * d,
            bytes_accessed=4 * (ep * d + rows_out * d + ep),
            transcendentals=0),
        interpret=interpret,
    )(offsets, recv_p.reshape(ep // TILE_E, TILE_E), msgs_p)
    return out[:num_segments, :d_orig]


def _vjp_fwd(msgs, receivers, num_segments, interpret):
    return _fwd_impl(msgs, receivers, num_segments, interpret), receivers


def _vjp_bwd(num_segments, interpret, receivers, cot):
    # d segment_sum / d msgs = gather of the cotangent at each edge's segment
    return jnp.take(cot, receivers, axis=0), None


sorted_segment_sum.defvjp(_vjp_fwd, _vjp_bwd)
