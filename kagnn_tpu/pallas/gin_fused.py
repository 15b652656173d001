"""Fused GIN-aggregate + B-spline KANLinear Pallas kernel (the SURVEY §7.7c
north-star fusion, specialized to the flagship KAGIN conv).

The KAGIN hot path is
    h_i = KANLinear((1 + eps) * x_i + sum_{j in N(i)} x_j)
(reference node_classification_clean/models.py:48-56: GINConv with a KAN
update net; PyG propagate + efficient-kan forward). Round-1 ran this as
three HBM passes: the sorted-segment-sum kernel writes the aggregate
(N, D), XLA adds (1+eps)x (read x + read agg + write z), and the fused
basis+GEMM kernel reads z again. This kernel does all of it in ONE launch:

  * streams the receiver-sorted messages via the grouped double-buffered
    DMA pipeline of pallas/spmm.py and accumulates each receiver group with
    one-hot MXU matmuls in VMEM;
  * adds (1 + eps) * x for the group's rows (x arrives as a pipelined
    per-group block — contiguous, no gather);
  * evaluates the Cox-de Boor ladder + SiLU base path + both GEMMs of
    KANLinear (shared with pallas/bspline_fused.py) on the VMEM-resident
    aggregate and writes the transformed (rows, O) output;
  * also writes the pre-transform aggregate z (rows, D) as a residual, so
    the backward never needs the (E, D) message tensor.

Per conv forward at arxiv scale (D=64) this removes ~2 full (N, D) HBM
round-trips and one kernel launch vs the chained path, and the basis tensor
(N, D, G+k) never exists in HBM (the reference materializes it,
ekan.py:96-105).

Backward is compositional: the bspline backward kernel rematerializes the
ladder from the saved z, and dx flows through the scatter-free
sender-sorted segment-sum (ops/segment.py discipline).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kagnn_tpu.pallas.bspline_fused import _basis_ladder, _bwd_kernel
from kagnn_tpu.pallas.spmm import (G_BLOCKS, ROWS_PER_BLOCK, _acc_dots,
                                   _pad_to, gather_rows_padded,
                                   sorted_segment_sum, vma_shape)

Array = jax.Array

CHUNK_ROWS = 1024


def _kernel(offsets_ref, recv_ref, msgs_hbm, x_ref, grid_ref, wb_ref, ws_ref,
            out_ref, z_ref, acc_ref, scratch, sems, *, d_eff: int, d_in: int,
            g_blocks: int, eps: float, k: int, n_basis: int, n_knots: int,
            out_dtype):
    g = pl.program_id(0)
    start = offsets_ref[g * g_blocks]
    end = offsets_ref[g * g_blocks + g_blocks]
    c0 = start // CHUNK_ROWS
    c1 = jax.lax.select(end > start, (end - 1) // CHUNK_ROWS + 1, c0)

    acc_ref[...] = jnp.zeros_like(acc_ref)

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            msgs_hbm.at[pl.ds(c * CHUNK_ROWS, CHUNK_ROWS), :],
            scratch.at[slot], sems.at[slot])

    @pl.when(c1 > c0)
    def _():
        get_dma(0, c0).start()

    row_ids = jax.lax.broadcasted_iota(
        jnp.int32, (ROWS_PER_BLOCK, CHUNK_ROWS), 0)

    def body(c, _):
        slot = (c - c0) % 2

        @pl.when(c + 1 < c1)
        def _():
            get_dma((c - c0 + 1) % 2, c + 1).start()

        get_dma(slot, c).wait()
        m = scratch[slot]
        ch_lo = c * CHUNK_ROWS
        ch_hi = ch_lo + CHUNK_ROWS
        for sb in range(g_blocks):
            b = g * g_blocks + sb
            b_start = offsets_ref[b]
            b_end = offsets_ref[b + 1]

            @pl.when((ch_lo < b_end) & (ch_hi > b_start))
            def _():
                ids = row_ids + b * ROWS_PER_BLOCK
                recv = recv_ref[c, :][None, :]  # (1, CHUNK_ROWS)
                onehot = (recv == ids).astype(jnp.bfloat16)
                acc_ref[sb] = _acc_dots(onehot, m, acc_ref[sb])

        return 0

    jax.lax.fori_loop(c0, c1, body, 0)

    # ---- epilogue: z = agg + (1+eps)*x, then the full KANLinear ----------
    xin = x_ref[...]  # (g_blocks*R, d_in)
    agg = jnp.concatenate([acc_ref[sb][:, :d_in] for sb in range(g_blocks)],
                          axis=0)
    z32 = agg + (1.0 + eps) * xin.astype(jnp.float32)
    z_ref[...] = z32.astype(z_ref.dtype)

    def t(j):
        return grid_ref[j, :][None, :].astype(jnp.float32)  # (1, d_in)

    sx = (z32 * jax.nn.sigmoid(z32)).astype(out_dtype)
    acc = jnp.dot(sx, wb_ref[...], preferred_element_type=jnp.float32)
    bases, _ = _basis_ladder(z32, t, k, n_knots, keep_penultimate=False)
    basis = jnp.concatenate(bases[:n_basis], axis=1).astype(out_dtype)
    acc += jnp.dot(basis, ws_ref[...], preferred_element_type=jnp.float32)
    out_ref[...] = acc.astype(out_ref.dtype)


def _fwd_impl(msgs, receivers, x, eps, grid_kd, wb_do, ws_gdo, k, interpret):
    e, d_orig = msgs.shape
    n, d_in = x.shape
    # msgs may arrive pre-lane-padded (gather_rows_padded pads the NODE
    # table before the gather — E/N x cheaper than padding messages)
    d_eff = -(-d_in // 128) * 128
    assert d_orig in (d_in, d_eff), (d_orig, d_in)
    n_basis, _, O = ws_gdo.shape
    K = grid_kd.shape[0]
    pad_l = d_eff - d_orig
    pad_r = (-e) % CHUNK_ROWS
    msgs_p = (jnp.pad(msgs, ((0, pad_r), (0, pad_l)))
              if pad_l or pad_r else msgs)
    recv_p = _pad_to(receivers.astype(jnp.int32), CHUNK_ROWS,
                     fill=jnp.iinfo(jnp.int32).max)
    ep = msgs_p.shape[0]
    n_chunks = ep // CHUNK_ROWS

    n_blocks = -(-n // ROWS_PER_BLOCK)
    n_groups = -(-n_blocks // G_BLOCKS)
    rows_out = n_groups * G_BLOCKS * ROWS_PER_BLOCK
    x_p = _pad_to(x, rows_out)
    block_starts = jnp.searchsorted(
        receivers,
        jnp.arange(n_groups * G_BLOCKS, dtype=jnp.int32) * ROWS_PER_BLOCK
    ).astype(jnp.int32)
    offsets = jnp.concatenate([block_starts, jnp.asarray([e], jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((n_chunks, CHUNK_ROWS), lambda g, *_: (0, 0),
                         memory_space=pltpu.VMEM),  # receivers, chunked
            pl.BlockSpec(memory_space=pl.ANY),      # msgs stay in HBM
            pl.BlockSpec((G_BLOCKS * ROWS_PER_BLOCK, d_in),
                         lambda g, *_: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, d_in), lambda g, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, O), lambda g, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_basis * d_in, O), lambda g, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((G_BLOCKS * ROWS_PER_BLOCK, O), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G_BLOCKS * ROWS_PER_BLOCK, d_in),
                         lambda g, *_: (g, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((G_BLOCKS, ROWS_PER_BLOCK, d_eff), jnp.float32),
            pltpu.VMEM((2, CHUNK_ROWS, d_eff), msgs.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out, z = pl.pallas_call(
        functools.partial(_kernel, d_eff=d_eff, d_in=d_in,
                          g_blocks=G_BLOCKS, eps=float(eps), k=k,
                          n_basis=n_basis, n_knots=K, out_dtype=msgs.dtype),
        grid_spec=grid_spec,
        out_shape=(
            vma_shape((rows_out, O), x.dtype, msgs_p),
            vma_shape((rows_out, d_in), x.dtype, msgs_p),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * ep * ROWS_PER_BLOCK * d_eff
            + 2 * rows_out * d_in * O * (n_basis + 1)
            + rows_out * d_in * (K * k * 6 + K),
            bytes_accessed=msgs.dtype.itemsize * (
                ep * d_eff + 2 * rows_out * d_in + rows_out * O) + 4 * ep,
            transcendentals=rows_out * d_in),
        interpret=interpret,
    )(offsets, recv_p.reshape(n_chunks, CHUNK_ROWS), msgs_p, x_p, grid_kd,
      wb_do, ws_gdo.reshape(n_basis * d_in, O))
    return out[:n], z[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def _gin_kan(x, senders, receivers, edge_mask, senders_perm, senders_sorted,
             recv_by_sender, mask_by_sender, params, eps, k, interpret):
    grid_kd, wb_do, ws_gdo = params
    # No edge-mask multiply: padded edges carry sender = receiver =
    # n_node_pad-1 (batcher invariant), so their (finite) garbage lands
    # only in the masked last row, which every downstream consumer masks
    # (MaskedBatchNorm select / masked loss / masked pool). Dropping the
    # (E, d) multiply saves a full edge-space pass per layer (round-5
    # profile: broadcast_multiply_fusion, 0.6 ms at 128 lanes).
    msgs = gather_rows_padded(x, senders)
    out, _ = _fwd_impl(msgs, receivers, x, eps, grid_kd, wb_do, ws_gdo, k,
                       interpret)
    return out


def _gk_fwd(x, senders, receivers, edge_mask, senders_perm, senders_sorted,
            recv_by_sender, mask_by_sender, params, eps, k, interpret):
    grid_kd, wb_do, ws_gdo = params
    msgs = gather_rows_padded(x, senders)  # no mask multiply: see _gin_kan
    out, z = _fwd_impl(msgs, receivers, x, eps, grid_kd, wb_do, ws_gdo, k,
                       interpret)
    return out, (z, receivers, edge_mask, senders_perm, senders_sorted,
                 recv_by_sender, mask_by_sender, grid_kd, wb_do, ws_gdo,
                 x.shape[0])


def _kan_bwd_on_z(z, dout, grid_kd, wb_do, ws_gdo, k, interpret):
    """KANLinear backward on the saved aggregate (ladder rematerialized
    in-kernel; same kernel as bspline_fused's VJP). Returns (dz, dwb, dws)
    with dz unpadded."""
    n_basis, D, O = ws_gdo.shape
    K = grid_kd.shape[0]
    from kagnn_tpu.pallas.bspline_fused import _pad_rows, DEFAULT_TILE_N

    zp, n = _pad_rows(z, DEFAULT_TILE_N)
    gp, _ = _pad_rows(dout, DEFAULT_TILE_N)
    rows = zp.shape[0]
    dz, dwb, dws = pl.pallas_call(
        functools.partial(_bwd_kernel, k=k, n_basis=n_basis, n_knots=K),
        grid=(rows // DEFAULT_TILE_N,),
        in_specs=[
            pl.BlockSpec((DEFAULT_TILE_N, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, O), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_basis * D, O), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((DEFAULT_TILE_N, O), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((DEFAULT_TILE_N, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, O), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_basis * D, O), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            vma_shape((rows, D), z.dtype, zp),
            vma_shape((D, O), wb_do.dtype, zp),
            vma_shape((n_basis * D, O), ws_gdo.dtype, zp),
        ),
        interpret=interpret,
    )(zp, grid_kd, wb_do, ws_gdo.reshape(n_basis * D, O), gp)
    return dz[:n], dwb, dws.reshape(n_basis, D, O)


def _gk_bwd(eps, k, interpret, res, dout):
    (z, receivers, edge_mask, perm, senders_sorted, recv_by_sender,
     mask_by_sender, grid_kd, wb_do, ws_gdo, n) = res
    dz, dwb, dws = _kan_bwd_on_z(z, dout, grid_kd, wb_do, ws_gdo, k,
                                 interpret)

    # dx = (1+eps) dz + A^T dz over the sender-sorted copy — no scatter;
    # the permuted views are host-side precomputes when the batcher ships
    # them (on-device (E,) permutes are gather-row-rate-bound)
    if recv_by_sender is None:
        recv_by_sender = jnp.take(receivers, perm)
    # narrow bf16 gather (pack-2 spmm layout) where eligible; no edge-mask
    # multiply — cotangents at masked rows are exactly zero (every consumer
    # of the conv output masks them: MaskedBatchNorm's select excludes
    # masked rows from both the normalize and the statistics, and the
    # loss/pool are masked), so the padded edges' gathered cotangents
    # (rows of the masked last node) vanish on their own. Round-5 profile:
    # this pass was pad_multiply_fusion, 0.9 ms per layer.
    from kagnn_tpu.ops.segment import _edge_gather

    cot_e = _edge_gather(dz, recv_by_sender)
    dx_a = sorted_segment_sum(cot_e, senders_sorted, n,
                              interpret)[:, :dz.shape[1]]
    dx = (1.0 + eps) * dz + dx_a
    return (dx, None, None, None, None, None, None, None,
            (jnp.zeros_like(grid_kd), dwb, dws))


_gin_kan.defvjp(_gk_fwd, _gk_bwd)


# ------------------------------------------------- halo (node-sharded) ----

@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13))
def _gin_kan_ext(x, ext, senders, receivers, edge_mask, senders_perm,
                 senders_sorted, recv_by_sender, mask_by_sender, params,
                 eps, k, interpret, axis):
    """Fused GIN+KAN over a node SHARD: `x` (B, D) is the local rows,
    `ext` (B + halo, D) the extended [local; halo] sender table (produced
    by a differentiable halo exchange — its VJP routes the halo rows'
    gradients back to their owner shards)."""
    grid_kd, wb_do, ws_gdo = params
    # ext/halo path KEEPS the edge-mask multiply: the halo plan's padded
    # edges point at local row B-1, which is a VALID node on interior
    # shards (only the global batch's last row is masked by construction)
    msgs = (gather_rows_padded(ext, senders)
            * edge_mask.astype(x.dtype)[:, None])
    out, _ = _fwd_impl(msgs, receivers, x, eps, grid_kd, wb_do, ws_gdo, k,
                       interpret)
    return out


def _gke_fwd(x, ext, senders, receivers, edge_mask, senders_perm,
             senders_sorted, recv_by_sender, mask_by_sender, params,
             eps, k, interpret, axis):
    grid_kd, wb_do, ws_gdo = params
    # ext/halo path KEEPS the edge-mask multiply: the halo plan's padded
    # edges point at local row B-1, which is a VALID node on interior
    # shards (only the global batch's last row is masked by construction)
    msgs = (gather_rows_padded(ext, senders)
            * edge_mask.astype(x.dtype)[:, None])
    out, z = _fwd_impl(msgs, receivers, x, eps, grid_kd, wb_do, ws_gdo, k,
                       interpret)
    return out, (z, receivers, edge_mask, senders_perm, senders_sorted,
                 recv_by_sender, mask_by_sender, grid_kd, wb_do, ws_gdo,
                 ext.shape[0])


def _gke_bwd(eps, k, interpret, axis, res, dout):
    (z, receivers, edge_mask, perm, senders_sorted, recv_by_sender,
     mask_by_sender, grid_kd, wb_do, ws_gdo, n_ext) = res
    dz, dwb, dws = _kan_bwd_on_z(z, dout, grid_kd, wb_do, ws_gdo, k,
                                 interpret)
    if recv_by_sender is None:
        recv_by_sender = jnp.take(receivers, perm)
    if mask_by_sender is None:
        mask_by_sender = jnp.take(edge_mask, perm)
    from kagnn_tpu.ops.segment import _edge_gather

    # mask multiply stays on the halo path (padded receivers hit valid
    # rows on interior shards — see _gin_kan_ext); the gather still rides
    # the narrow bf16 pack-2 layout where eligible
    cot_e = _edge_gather(dz, recv_by_sender)
    cot_e = cot_e * mask_by_sender.astype(cot_e.dtype)[:, None]
    dext = sorted_segment_sum(cot_e, senders_sorted, n_ext,
                              interpret)[:, :dz.shape[1]]
    dx = (1.0 + eps) * dz
    # weight grads stay per-shard partials — the halo step body all-reduces
    # the whole grad tree once (legacy shard_map semantics, check_vma=False)
    return (dx, dext, None, None, None, None, None, None, None,
            (jnp.zeros_like(grid_kd), dwb, dws))


_gin_kan_ext.defvjp(_gke_fwd, _gke_bwd)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def gin_kan_fused(x: Array, g, eps: float, grid: Array, base_weight: Array,
                  scaled_spline_weight: Array, spline_order: int,
                  interpret=None) -> Array:
    """Fused GINConv-aggregate + KANLinear forward over a GraphBatch.

    Weight layouts follow the KANLinear module: base_weight (O, D),
    scaled_spline_weight (O, D, n_basis), grid (D, K).
    """
    wb_do = base_weight.T
    ws_gdo = jnp.transpose(scaled_spline_weight, (2, 1, 0))
    if interpret is None:
        interpret = not _on_tpu()
    return _gin_kan(x, g.senders, g.receivers, g.edge_mask, g.senders_perm,
                    g.senders_sorted,
                    getattr(g, "receivers_by_sender", None),
                    getattr(g, "edge_mask_by_sender", None),
                    (grid.T, wb_do, ws_gdo), float(eps),
                    int(spline_order), bool(interpret))


def gin_kan_fused_halo(x: Array, g, eps: float, grid: Array,
                       base_weight: Array, scaled_spline_weight: Array,
                       spline_order: int, interpret=None) -> Array:
    """Node-sharded (shard_map) fused GIN+KAN: ONE differentiable halo
    exchange builds the extended sender table, then the same single-launch
    aggregate+transform kernel runs on the shard; the backward's A^T dz
    lands in extended space and flows back to owner shards through the
    exchange's AD transpose (VERDICT round-2 item 7: halo mode and the
    Pallas kernels compose)."""
    from kagnn_tpu.ops import segment

    ext = segment.halo_extend(x)
    wb_do = base_weight.T
    ws_gdo = jnp.transpose(scaled_spline_weight, (2, 1, 0))
    if interpret is None:
        interpret = not _on_tpu()
    axis = segment.halo_state().axis
    return _gin_kan_ext(x, ext, g.senders, g.receivers, g.edge_mask,
                        g.senders_perm, g.senders_sorted,
                        getattr(g, "receivers_by_sender", None),
                        getattr(g, "edge_mask_by_sender", None),
                        (grid.T, wb_do, ws_gdo), float(eps),
                        int(spline_order), bool(interpret), axis)
