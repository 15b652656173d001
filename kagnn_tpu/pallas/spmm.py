"""Pallas sorted-segment-sum — the SpMM/aggregation kernel.

XLA lowers scatter-add on TPU to a slow serialized form (measured ~18 ms for
1.17M x 64 at arxiv scale, ~25x off HBM speed-of-light). This kernel exploits
the framework's invariant that edges are SORTED BY RECEIVER (established by
the batchers): the edges of each 128-row output block are contiguous.

v2 design: a GROUPED grid — each grid step owns G_BLOCKS receiver blocks and
streams all their edge chunks through one double-buffered DMA pipeline, with
per-(chunk, sub-block) overlap predication into a VMEM accumulator (receivers
outside a sub-block match no indicator row, so boundary chunks self-mask).
Lane PACKING (two <=64-wide edge rows per 128-lane register row, halving DMA
bytes) is the DEFAULT for bf16 rows <=64 wide since round 5.

Measured position (1 chip via tunnel, arxiv scale E=1.17M; r5 re-measured
with profiler DEVICE time end to end — CALIBRATION.json, ROOFLINE_SPMM.json):
  * the chip's demonstrated streaming ceiling through this kernel's own
    pipeline shape (grouped double-buffered DMA, indicator/MXU work
    removed) is 607.7 GB/s f32 / ~500-524 GB/s bf16
    (experiments/calibrate_pallas_stream.py). The 260.2 GB/s roll-loop
    number previous rounds used as the ceiling is superseded — this
    kernel itself exceeded it by 42%, so every %-of-ceiling it produced
    was inflated;
  * this kernel, r5 defaults (chunk 512, 4 DMA slots): the embedded
    per-launch cost is BOUNDED, not point-measured — the profiler's
    custom-call duration turned out to be a Mosaic STATIC ESTIMATE
    (experiments/gat_sweep.py), so ROOFLINE_SPMM.json brackets it
    between that estimate and a chained-wall upper bound (8 dependent
    launches in one executable, wall/8): bf16-64 in [1.39, 4.18] ms vs a
    0.39 ms DMA floor, f32-128 in [1.58, 4.32] vs 1.13;
  * the residual vs the DMA-only probe is the per-chunk indicator
    build + one-hot MXU passes (an overlapping chunk pays a full-chunk
    dot per receiver block it straddles) — confirmed COMPUTE-bound by
    the chained bounds nearly coinciding across dtypes (4.18 vs 4.32 ms
    despite 3.5x the bytes);
  * the >=80%-of-SoL north star (BASELINE.md) is NOT met against the
    honest ceiling at these widths under ANY anchor. Stated plainly per
    round-4 verdict item 1.
Further headroom comes from FUSION (consuming the aggregate in-kernel so the
(N, D) round-trip and the next layer's basis tensors never hit HBM — see
pallas/gin_fused.py), not from more tiling.

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

ROWS_PER_BLOCK = 128   # output rows covered by one indicator matmul
G_BLOCKS = 4           # receiver blocks per grid step (group)
CHUNK_ROWS = 512       # message rows per DMA chunk (r5 device-time sweep)


def _split_hilo(m):
    """One-per-chunk bf16 hi/lo split of f32 messages (hoisted out of the
    per-sub-block dots — an overlapping chunk used to redo the split for
    every receiver block it straddles). bf16 messages pass through."""
    if m.dtype == jnp.bfloat16:
        return (m,)
    hi = m.astype(jnp.bfloat16)
    lo = (m - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _acc_dots(onehot, m, acc):
    """acc += onehot @ m with bf16 MXU passes (the one-hot side is exact in
    bf16; hi + residual lo recovers ~f32 fidelity with two default-speed
    MXU passes). `m` is either a raw (CHUNK, lanes) array (other kernels'
    call sites) or a pre-split tuple from `_split_hilo` (this kernel hoists
    the split out of the per-sub-block loop)."""
    dn = (((1,), (0,)), ((), ()))
    for part in (m if isinstance(m, tuple) else _split_hilo(m)):
        acc = acc + jax.lax.dot_general(
            onehot, part, dn, preferred_element_type=jnp.float32)
    return acc


def _kernel(offsets_ref, recv_ref, msgs_hbm, out_ref, acc_ref, scratch, sems,
            *, d_eff: int, pack: int, g_blocks: int, chunk_rows: int,
            dma_slots: int, out_dtype):
    CHUNK_ROWS = chunk_rows
    g = pl.program_id(0)
    epc = CHUNK_ROWS * pack  # edges per chunk
    start = offsets_ref[g * g_blocks]
    end = offsets_ref[g * g_blocks + g_blocks]
    c0 = start // epc
    c1 = jax.lax.select(end > start, (end - 1) // epc + 1, c0)

    acc_ref[...] = jnp.zeros_like(acc_ref)

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            msgs_hbm.at[pl.ds(c * CHUNK_ROWS, CHUNK_ROWS), :],
            scratch.at[slot], sems.at[slot])

    # prime the pipeline: up to dma_slots-1 chunks in flight ahead of compute
    for k in range(dma_slots - 1):
        @pl.when(c0 + k < c1)
        def _(k=k):
            get_dma(k, c0 + k).start()

    # per-sub-block row-id planes for the indicator compare, built once
    row_ids = jax.lax.broadcasted_iota(
        jnp.int32, (ROWS_PER_BLOCK, CHUNK_ROWS), 0)

    def body(c, _):
        slot = (c - c0) % dma_slots

        @pl.when(c + dma_slots - 1 < c1)
        def _():
            get_dma((c - c0 + dma_slots - 1) % dma_slots,
                    c + dma_slots - 1).start()

        get_dma(slot, c).wait()
        # NOTE: the hi/lo split deliberately happens INSIDE each sub-block
        # dot (_acc_dots), not hoisted here — the hoisted variant measured
        # 1.75 vs 1.58 ms at f32-128 (keeping both bf16 halves live across
        # the sub-block loop beats Mosaic's convert-into-MXU-feed fusion)
        m_parts = scratch[slot]  # (CHUNK_ROWS, d_eff*pack)
        ch_lo = c * epc
        ch_hi = ch_lo + epc
        for sb in range(g_blocks):
            b = g * g_blocks + sb
            b_start = offsets_ref[b]
            b_end = offsets_ref[b + 1]

            @pl.when((ch_lo < b_end) & (ch_hi > b_start))
            def _():
                base = b * ROWS_PER_BLOCK
                ids = row_ids + base
                for p in range(pack):
                    recv = recv_ref[c, p, :][None, :]  # (1, CHUNK_ROWS)
                    onehot = (recv == ids).astype(jnp.bfloat16)
                    acc_ref[sb, p] = _acc_dots(onehot, m_parts,
                                               acc_ref[sb, p])

        return 0

    jax.lax.fori_loop(c0, c1, body, 0)

    # fold the packed lane halves and emit the group's output rows
    for sb in range(g_blocks):
        if pack == 2:
            out = acc_ref[sb, 0][:, :d_eff] + acc_ref[sb, 1][:, d_eff:]
        else:
            out = acc_ref[sb, 0]
        out_ref[sb * ROWS_PER_BLOCK:(sb + 1) * ROWS_PER_BLOCK, :] = (
            out.astype(out_dtype))


def vma_shape(shape, dtype, like: Array):
    """ShapeDtypeStruct carrying the varying-manual-axes of `like` — inside
    `shard_map(check_vma=True)` pallas_call outputs must declare how they
    vary across mesh axes; outside shard_map vma is empty and this is a
    plain ShapeDtypeStruct."""
    try:
        vma = jax.typeof(like).vma
    except Exception:  # pragma: no cover
        vma = frozenset()
    return jax.ShapeDtypeStruct(shape, dtype, vma=vma)


def gather_rows_padded(table: Array, idx: Array) -> Array:
    """`jnp.take(table, idx, axis=0)` with the table lane-padded to a
    128 multiple FIRST: padding the (N, d) node table costs E/N x less
    than lane-padding the (E, d) gathered messages (measured: the (E,64)
    -> (E,128) pad was a 0.9 ms full-array copy per kernel launch at arxiv
    scale while the node-side pad is ~0.1 ms), and the gather engine is
    row-rate-bound so the extra lanes ride free."""
    d = table.shape[1]
    d_eff = -(-d // 128) * 128
    if d != d_eff:
        table = jnp.pad(table, ((0, 0), (0, d_eff - d)))
        # pin the pad on the TABLE side: without the barrier XLA commutes
        # it through the gather (gather 64 lanes, then pad the (E, d_eff)
        # RESULT — a 0.9 ms full-edge-space pass at arxiv scale, seen as
        # pad_multiply_fusion/pad.N in the r5 flagship profile), undoing
        # exactly the E/N-times-cheaper node-side pad this helper exists
        # to establish
        table = jax.lax.optimization_barrier(table)
    # mode="clip": every index in this framework is in-range by batcher
    # invariant (padded edges point at the masked last row), and the
    # default "fill" mode costs a full (E, d)-size out-of-bounds select
    # pass fused onto every gather (seen in the optimized HLO)
    return jnp.take(table, idx, axis=0, mode="clip")


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


def _fwd_impl(msgs, receivers, num_segments, interpret, *,
              chunk_rows: int | None = None, g_blocks: int | None = None,
              pack: int | None = None, dma_slots: int | None = None):
    e, d_orig = msgs.shape
    # Tiling defaults: chunk 512 / 4 DMA slots (round 5). The r5
    # device-time sweep (experiments/spmm_sweep.py) suggested 15-20% wins
    # over the r4 1024/2 tiling, but those durations were later shown to
    # be Mosaic STATIC ESTIMATES (experiments/gat_sweep.py); the honest
    # chained-wall arbitration measures the two tilings EQUIVALENT within
    # noise (bf16-64: 4.45 vs 4.26 ms/launch incl. chain overhead) —
    # i.e. the round-3 "all tilings within ±5%" conclusion was right.
    # PACK stays 1 by default: a narrow (E, 64) bf16 array physically
    # occupies 128-lane tiles on TPU, so the (E/2, 128) repack XLA must
    # insert OUTSIDE the kernel (materialized reshape+pad, ~1.6 ms/call
    # in the r5 flagship profile) costs more than the in-kernel DMA
    # saving — pack=2 remains available for callers that already hold
    # packed data.
    if pack is None:
        pack = 1
    if chunk_rows is None:
        chunk_rows = 512
    if dma_slots is None:
        dma_slots = 4
    CHUNK_ROWS = chunk_rows
    G_BLOCKS = g_blocks if g_blocks is not None else globals()["G_BLOCKS"]
    if pack == 2 and d_orig <= 64:
        d_eff = 64
    else:
        pack, d_eff = 1, -(-d_orig // 128) * 128
    epc = CHUNK_ROWS * pack
    # ONE pad for lanes+rows (each jnp.pad is a full-array copy; the lane
    # pad is a no-op when the caller gathered from a pre-padded table —
    # gather_rows_padded — and the row pad is a no-op at the batchers'
    # edge_pad_multiple)
    pad_l = d_eff - msgs.shape[1]
    pad_r = (-msgs.shape[0]) % epc
    msgs_p = (jnp.pad(msgs, ((0, pad_r), (0, pad_l)))
              if pad_l or pad_r else msgs)
    # padded edges get an out-of-range receiver so they match no row
    recv_p = _pad_to(receivers.astype(jnp.int32), epc,
                     fill=jnp.iinfo(jnp.int32).max)
    ep = msgs_p.shape[0]
    n_chunks = ep // epc
    msgs_packed = msgs_p.reshape(ep // pack, d_eff * pack)
    # recv_packed[c, p, r] = receiver of edge (c*epc + r*pack + p)
    recv_packed = recv_p.reshape(n_chunks, CHUNK_ROWS, pack).transpose(0, 2, 1)

    n_blocks = -(-num_segments // ROWS_PER_BLOCK)
    n_groups = -(-n_blocks // G_BLOCKS)
    n_blocks_pad = n_groups * G_BLOCKS
    rows_out = n_blocks_pad * ROWS_PER_BLOCK
    # per-block first-edge offsets from the sorted receiver vector
    block_starts = jnp.searchsorted(
        receivers, jnp.arange(n_blocks_pad, dtype=jnp.int32) * ROWS_PER_BLOCK
    ).astype(jnp.int32)
    offsets = jnp.concatenate(
        [block_starts, jnp.asarray([e], jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((n_chunks, pack, CHUNK_ROWS), lambda g, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),  # receivers, chunked
            pl.BlockSpec(memory_space=pl.ANY),  # msgs stay in HBM
        ],
        out_specs=pl.BlockSpec((G_BLOCKS * ROWS_PER_BLOCK, d_eff),
                               lambda g, *_: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((G_BLOCKS, pack, ROWS_PER_BLOCK, d_eff * pack),
                       jnp.float32),
            pltpu.VMEM((dma_slots, CHUNK_ROWS, d_eff * pack), msgs.dtype),
            pltpu.SemaphoreType.DMA((dma_slots,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, d_eff=d_eff, pack=pack,
                          g_blocks=G_BLOCKS, chunk_rows=CHUNK_ROWS,
                          dma_slots=dma_slots, out_dtype=msgs.dtype),
        grid_spec=grid_spec,
        out_shape=vma_shape((rows_out, d_eff), msgs.dtype, msgs_packed),
        cost_estimate=pl.CostEstimate(
            flops=2 * ep * ROWS_PER_BLOCK * d_eff * pack,
            bytes_accessed=msgs.dtype.itemsize * (ep * d_eff + rows_out * d_eff)
            + 4 * ep,
            transcendentals=0),
        interpret=interpret,
    )(offsets, recv_packed, msgs_packed)
    return out[:num_segments, :d_orig]


NARROW_CHUNK = 8192    # edges per DMA chunk (lane dim of the (8, E) layout)
NARROW_G_BLOCKS = 16   # receiver blocks per grid step


def _narrow_kernel(offsets_ref, recv_ref, vals_hbm, out_ref, acc_ref,
                   scratch, sems, *, k: int, g_blocks: int, chunk: int):
    """Sorted-segment-sum for NARROW rows (k <= 8): vals arrive TRANSPOSED
    as an (8, E) row-per-component layout (a (E, k) lane-slice DMA would
    violate the 128-lane tiling; the general kernel instead pads lanes to
    128 in HBM — ~32x wasted traffic at k=4). Each receiver block
    accumulates with one lane-contracting one-hot MXU matmul per chunk."""
    g = pl.program_id(0)
    start = offsets_ref[g * g_blocks]
    end = offsets_ref[g * g_blocks + g_blocks]
    c0 = start // chunk
    c1 = jax.lax.select(end > start, (end - 1) // chunk + 1, c0)

    acc_ref[...] = jnp.zeros_like(acc_ref)

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            vals_hbm.at[:, pl.ds(c * chunk, chunk)],
            scratch.at[slot], sems.at[slot])

    @pl.when(c1 > c0)
    def _():
        get_dma(0, c0).start()

    row_ids = jax.lax.broadcasted_iota(
        jnp.int32, (ROWS_PER_BLOCK, chunk), 0)
    dn = (((1,), (1,)), ((), ()))  # contract the edge/lane axis

    def body(c, _):
        slot = (c - c0) % 2

        @pl.when(c + 1 < c1)
        def _():
            get_dma((c - c0 + 1) % 2, c + 1).start()

        get_dma(slot, c).wait()
        m = scratch[slot]  # (8, chunk)
        mhi = m.astype(jnp.bfloat16)
        mlo = (m - mhi.astype(jnp.float32)).astype(jnp.bfloat16)
        ch_lo = c * chunk
        ch_hi = ch_lo + chunk
        for sb in range(g_blocks):
            b = g * g_blocks + sb
            b_start = offsets_ref[b]
            b_end = offsets_ref[b + 1]

            @pl.when((ch_lo < b_end) & (ch_hi > b_start))
            def _():
                ids = row_ids + b * ROWS_PER_BLOCK
                onehot = (recv_ref[c, :][None, :] == ids).astype(jnp.bfloat16)
                acc_ref[sb] = (
                    acc_ref[sb]
                    + jax.lax.dot_general(
                        onehot, mhi, dn, preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(
                        onehot, mlo, dn, preferred_element_type=jnp.float32))

        return 0

    jax.lax.fori_loop(c0, c1, body, 0)
    for sb in range(g_blocks):
        out_ref[sb * ROWS_PER_BLOCK:(sb + 1) * ROWS_PER_BLOCK, :] = (
            acc_ref[sb][:, :k].astype(out_ref.dtype))


def sorted_segment_sum_narrow(vals: Array, receivers: Array,
                              num_segments: int,
                              interpret: bool = False) -> Array:
    """segment_sum for receiver-SORTED narrow rows: vals (E, k) f32 with
    k <= 8, receivers (E,) int32 ascending. Streams an (8, E) transposed
    layout — no 128-lane padding of the value array in HBM."""
    e, k = vals.shape
    assert k <= 8
    chunk = NARROW_CHUNK
    g_blocks = NARROW_G_BLOCKS
    vals_t = _pad_to(vals.astype(jnp.float32).T, 8)        # (8, E)
    vals_t = _pad_to(vals_t, chunk, axis=1)
    recv_p = _pad_to(receivers.astype(jnp.int32), chunk,
                     fill=jnp.iinfo(jnp.int32).max)
    ep = vals_t.shape[1]
    n_chunks = ep // chunk

    n_blocks = -(-num_segments // ROWS_PER_BLOCK)
    n_groups = -(-n_blocks // g_blocks)
    rows_out = n_groups * g_blocks * ROWS_PER_BLOCK
    block_starts = jnp.searchsorted(
        receivers,
        jnp.arange(n_groups * g_blocks, dtype=jnp.int32) * ROWS_PER_BLOCK
    ).astype(jnp.int32)
    offsets = jnp.concatenate([block_starts, jnp.asarray([e], jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((n_chunks, chunk), lambda g, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((g_blocks * ROWS_PER_BLOCK, k),
                               lambda g, *_: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((g_blocks, ROWS_PER_BLOCK, 8), jnp.float32),
            pltpu.VMEM((2, 8, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_narrow_kernel, k=k, g_blocks=g_blocks,
                          chunk=chunk),
        grid_spec=grid_spec,
        out_shape=vma_shape((rows_out, k), vals.dtype, vals_t),
        cost_estimate=pl.CostEstimate(
            flops=4 * ep * ROWS_PER_BLOCK * 8,
            bytes_accessed=4 * (ep * 8 + rows_out * k) + 4 * ep,
            transcendentals=0),
        interpret=interpret,
    )(offsets, recv_p.reshape(n_chunks, chunk), vals_t)
    return out[:num_segments]


def _vjp_fwd(msgs, receivers, num_segments, interpret):
    return _fwd_impl(msgs, receivers, num_segments, interpret), receivers


def _vjp_bwd(num_segments, interpret, receivers, cot):
    # d segment_sum / d msgs = gather of the cotangent at each edge's segment
    return jnp.take(cot, receivers, axis=0), None


sorted_segment_sum.defvjp(_vjp_fwd, _vjp_bwd)
