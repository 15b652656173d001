"""Fused GAT attention BACKWARD kernels — gather-minimal.

The XLA composition backward (gat_fused._ga_bwd v1) is row-gather bound:
TPU row gathers cost ~10ns/row regardless of width, and the backward needed
edge-space views of z, alpha, S, dout (receiver order) plus w, dz, dout
(sender order) — ~6 row passes over E=1.2M edges. These two kernels reduce
the whole gradient to ONE wide row gather:

  * `gat_bwd_dadst` (receiver-oriented, ZERO gathers): streams the SAME
    pre-gathered message array the forward used (saved residual) through
    the receiver-block grid; dout/adst/alpha/S are destination-block-local,
    per-edge views come from exact one-hot matmuls (f32 via hi/lo bf16
    splits), asrc_e = msgs @ A in-kernel. Emits the node-space
    da_dst = sum_{e->r} dz_e accumulated per destination block.

  * `gat_bwd_sender` (transpose-oriented, TWO gathers): the same kernel
    structure run over SENDER-sorted edges. The per-edge receiver-side
    values arrive as two streamed tables gathered at receivers[perm] —
    dout as its own (E, hc) pass and the three narrow node arrays as a
    separate (E, 6H) pass of hi/lo bf16 lane pairs (exact on
    reconstruction). Two gathers beat the round-4 single concatenated
    (E, hc+6H) gather: the chip's row-gather engine has a fast class for
    rows <= 512 B (~3.2 ns/row in-program) and a ~4x slower class above
    it (CALIBRATION.json gather table, w256->w512 cliff) — at hc=256
    bf16 the combined 384-lane table (768 B/row) was slow-class
    (15.2 ms/layer measured round 5) while the split 512 B + 256 B
    passes are both fast-class. Messages and asrc are SOURCE-block-local
    (one-hot selects of the x block). Emits node-space
    dh_msgs = sum_{e: src=s} w_e*dout_e and
    da_src = sum_{e: src=s} dz_e per source block.

Edge weights are rematerialized as w_e = exp(lg_e - alpha_e) with the
exp argument clamped at +80: invalid (padded) edges match no block, so
their garbage lanes must stay FINITE for the 0*x one-hot contraction to
vanish (inf*0 = nan).

The derivation (see gat_fused.py): dl_e = w_e (dw_e - S_r) with
S_r = <dout_r, out_r>, dw_e = <dout_r, m_e>; dz = dl * leaky'(z).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kagnn_tpu.pallas.spmm import ROWS_PER_BLOCK, _pad_to, vma_shape

Array = jax.Array

CHUNK = 1024
G_BLOCKS = 8
CLAMP = 80.0


def _hilo(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _sel_rows(oh_bf, block_f32):
    """Exact (CHUNK, k) per-edge view of an f32 (R, k) block: hi/lo one-hot
    contraction over the row axis."""
    hi, lo = _hilo(block_f32)
    dn = (((0,), (0,)), ((), ()))
    return (jax.lax.dot_general(oh_bf, hi, dn,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(oh_bf, lo, dn,
                                  preferred_element_type=jnp.float32))


def _sel_rows_any(oh_bf, block):
    """(CHUNK, k) per-edge view of a block; single matmul for bf16 blocks,
    hi/lo for f32."""
    if block.dtype == jnp.bfloat16:
        return jax.lax.dot_general(
            oh_bf, block, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return _sel_rows(oh_bf, block)


def _acc_rows(oh_bf, vals_f32, acc):
    """acc (R, k) += onehot @ vals (CHUNK, k), exact via hi/lo."""
    hi, lo = _hilo(vals_f32)
    dn = (((1,), (0,)), ((), ()))
    return (acc
            + jax.lax.dot_general(oh_bf, hi, dn,
                                  preferred_element_type=jnp.float32)
            + jax.lax.dot_general(oh_bf, lo, dn,
                                  preferred_element_type=jnp.float32))


def _head_reduce(prod, heads, c_head):
    """(CHUNK, H*C) -> (CHUNK, H): per-head lane-group sums.

    MXU-matmulified (round-4): prod @ E_head with E_head the exact 0/1
    head-indicator (hc, H) matrix, hi/lo-split — two narrow MXU dots
    instead of 2H full VPU masked-sum passes (the old form was the
    dominant per-chunk cost of both backward kernels). NOTE: the 2-term
    hi/lo split carries ~16 mantissa bits, so per-head sums have ~2^-16
    relative error vs the old exact-f32 VPU path — well inside the
    grad-parity tests' 5e-3 tolerances; use a 3-term split if those ever
    tighten."""
    hc = prod.shape[1]
    ehead = (jax.lax.broadcasted_iota(jnp.int32, (hc, heads), 0) // c_head
             == jax.lax.broadcasted_iota(jnp.int32, (hc, heads), 1)
             ).astype(jnp.bfloat16)
    hi, lo = _hilo(prod)
    dn = (((1,), (0,)), ((), ()))
    return (jax.lax.dot_general(hi, ehead, dn,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(lo, ehead, dn,
                                  preferred_element_type=jnp.float32))


def _head_expand_k(w, c_head, heads):
    """(CHUNK, H) -> (CHUNK, H*C)."""
    return jnp.concatenate(
        [jnp.broadcast_to(w[:, h:h + 1], (w.shape[0], c_head))
         for h in range(heads)], axis=1)


def _klky(x, slope):
    return jnp.where(x >= 0, x, slope * x)


def _dklky(x, slope):
    return jnp.where(x >= 0, 1.0, slope)


# --------------------------------------------------------------------------
# receiver-oriented: da_dst (zero gathers)
# --------------------------------------------------------------------------

def _dadst_kernel(offsets_ref, recv_ref, msgs_hbm, dout_ref, nrw_ref,
                  amat_ref, out_ref, acc_ref, msg_scr,
                  msems, *, heads: int, c_head: int, hc: int, hc_eff: int,
                  g_blocks: int, slope: float):
    H, C = heads, c_head
    g = pl.program_id(0)
    start = offsets_ref[g * g_blocks]
    end = offsets_ref[g * g_blocks + g_blocks]
    c0 = start // CHUNK
    c1 = jax.lax.select(end > start, (end - 1) // CHUNK + 1, c0)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (ROWS_PER_BLOCK, CHUNK), 0)

    def msg_dma(slot, c):
        return pltpu.make_async_copy(
            msgs_hbm.at[pl.ds(c * CHUNK, CHUNK), :], msg_scr.at[slot],
            msems.at[slot])

    acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(c1 > c0)
    def _():
        msg_dma(0, c0).start()

    def body(c, _):
        slot = (c - c0) % 2

        @pl.when(c + 1 < c1)
        def _():
            msg_dma((c - c0 + 1) % 2, c + 1).start()

        msg_dma(slot, c).wait()
        m = msg_scr[slot]  # (CHUNK, hc_eff)
        a = amat_ref[...]
        a = a.astype(m.dtype) if m.dtype == jnp.bfloat16 else a
        asrc_e = jax.lax.dot_general(
            m, a, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (CHUNK, H)
        ch_lo = c * CHUNK
        ch_hi = ch_lo + CHUNK
        for sb in range(g_blocks):
            b = g * g_blocks + sb
            b_start = offsets_ref[b]
            b_end = offsets_ref[b + 1]

            @pl.when((ch_lo < b_end) & (ch_hi > b_start))
            def _():
                r0 = sb * ROWS_PER_BLOCK
                ids = row_ids + b * ROWS_PER_BLOCK
                onehot = recv_ref[c, :][None, :] == ids
                oh_bf = onehot.astype(jnp.bfloat16)
                # one consolidated narrow select: [adst | alpha | S]
                nrw_e = _sel_rows(oh_bf, nrw_ref[r0:r0 + ROWS_PER_BLOCK, :])
                adst_e = nrw_e[:, :H]
                alpha_e = nrw_e[:, H:2 * H]
                s_e = nrw_e[:, 2 * H:3 * H]
                dout_e = _sel_rows_any(oh_bf,
                                       dout_ref[r0:r0 + ROWS_PER_BLOCK, :])
                z = asrc_e + adst_e
                lg = _klky(z, slope)
                w = jnp.exp(jnp.minimum(lg - alpha_e, CLAMP))  # (CHUNK, H)
                prod = dout_e[:, :hc] * m[:, :hc].astype(jnp.float32)
                dw = _head_reduce(prod, H, C)                  # (CHUNK, H)
                dz = w * (dw - s_e) * _dklky(z, slope)
                acc_ref[sb] = _acc_rows(oh_bf, dz, acc_ref[sb])

        return 0

    jax.lax.fori_loop(c0, c1, body, 0)
    for sb in range(g_blocks):
        out_ref[sb * ROWS_PER_BLOCK:(sb + 1) * ROWS_PER_BLOCK, :] = (
            acc_ref[sb])


def gat_bwd_dadst(msgs, recv_m, dout, adst, alpha, S, amat, heads, hc,
                  slope, interpret=False):
    """da_dst (N, H) = sum over incoming edges of dz — zero gathers (msgs is
    the forward's saved pre-gathered residual, receiver-sorted)."""
    e, hca = msgs.shape
    n = dout.shape[0]
    H = heads
    C = hc // H
    hc_eff = -(-hca // 128) * 128
    msgs_p = _pad_to(_pad_to(msgs, hc_eff, axis=1), CHUNK)
    recv_p = _pad_to(recv_m.astype(jnp.int32), CHUNK, fill=2**31 - 1)
    ep = msgs_p.shape[0]
    n_chunks = ep // CHUNK

    n_blocks = -(-n // ROWS_PER_BLOCK)
    n_groups = -(-n_blocks // G_BLOCKS)
    rows_out = n_groups * G_BLOCKS * ROWS_PER_BLOCK
    dout_p = _pad_to(_pad_to(dout, hc_eff, axis=1), rows_out)
    nrw_p = _pad_to(jnp.concatenate(
        [adst.astype(jnp.float32), alpha.astype(jnp.float32),
         S.astype(jnp.float32)], axis=1), rows_out)
    amat_p = _pad_to(amat.astype(jnp.float32), hc_eff)
    block_starts = jnp.searchsorted(
        recv_m,
        jnp.arange(n_groups * G_BLOCKS, dtype=jnp.int32) * ROWS_PER_BLOCK
    ).astype(jnp.int32)
    offsets = jnp.concatenate([block_starts, jnp.asarray([e], jnp.int32)])

    blockspec = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups,),
        in_specs=[
            blockspec((n_chunks, CHUNK), lambda g, *_: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            blockspec((G_BLOCKS * ROWS_PER_BLOCK, hc_eff),
                      lambda g, *_: (g, 0)),
            blockspec((G_BLOCKS * ROWS_PER_BLOCK, 3 * H),
                      lambda g, *_: (g, 0)),
            blockspec((hc_eff, H), lambda g, *_: (0, 0)),
        ],
        out_specs=blockspec((G_BLOCKS * ROWS_PER_BLOCK, H),
                            lambda g, *_: (g, 0)),
        scratch_shapes=[
            pltpu.VMEM((G_BLOCKS, ROWS_PER_BLOCK, H), jnp.float32),
            pltpu.VMEM((2, CHUNK, hc_eff), msgs.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_dadst_kernel, heads=H, c_head=C, hc=hc,
                          hc_eff=hc_eff, g_blocks=G_BLOCKS,
                          slope=float(slope)),
        grid_spec=grid_spec,
        out_shape=vma_shape((rows_out, H), jnp.float32, msgs_p),
        cost_estimate=pl.CostEstimate(
            flops=2 * ep * ROWS_PER_BLOCK * hc_eff,
            bytes_accessed=msgs.dtype.itemsize * ep * hc_eff
            + 4 * (ep + 2 * rows_out * hc_eff),
            transcendentals=ep * H),
        interpret=interpret,
    )(offsets, recv_p.reshape(n_chunks, CHUNK), msgs_p, dout_p, nrw_p,
      amat_p)
    return out[:n]


# --------------------------------------------------------------------------
# sender-oriented (transpose): dh_msgs + da_src (one gather)
# --------------------------------------------------------------------------

def _sender_kernel(offsets_ref, snd_ref, *refs, heads: int, c_head: int,
                   hc: int, hc_eff: int, n_parts: int, part_widths,
                   nrw_eff: int, g_blocks: int, slope: float):
    # refs: [t_hbm x n_parts, nrw_hbm, x_ref, amat_ref,  (inputs)
    #        dh_ref, dasrc_ref,                          (outputs)
    #        acc_dh, acc_da, t_scr x n_parts, nrw_scr,   (scratch)
    #        tsems x n_parts, nsems]
    t_hbms = refs[:n_parts]
    nrw_hbm, x_ref, amat_ref, dh_ref, dasrc_ref, acc_dh, acc_da = (
        refs[n_parts:n_parts + 7])
    t_scrs = refs[n_parts + 7:2 * n_parts + 7]
    nrw_scr = refs[2 * n_parts + 7]
    tsems = refs[2 * n_parts + 8:3 * n_parts + 8]
    nsems = refs[3 * n_parts + 8]
    H, C = heads, c_head
    g = pl.program_id(0)
    start = offsets_ref[g * g_blocks]
    end = offsets_ref[g * g_blocks + g_blocks]
    c0 = start // CHUNK
    c1 = jax.lax.select(end > start, (end - 1) // CHUNK + 1, c0)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (ROWS_PER_BLOCK, CHUNK), 0)

    def t_dma(p, slot, c):
        return pltpu.make_async_copy(
            t_hbms[p].at[pl.ds(c * CHUNK, CHUNK), :], t_scrs[p].at[slot],
            tsems[p].at[slot])

    def nrw_dma(slot, c):
        return pltpu.make_async_copy(
            nrw_hbm.at[pl.ds(c * CHUNK, CHUNK), :], nrw_scr.at[slot],
            nsems.at[slot])

    acc_dh[...] = jnp.zeros_like(acc_dh)
    acc_da[...] = jnp.zeros_like(acc_da)

    @pl.when(c1 > c0)
    def _():
        for p in range(n_parts):
            t_dma(p, 0, c0).start()
        nrw_dma(0, c0).start()

    # per-source logits for the WHOLE group, hoisted out of the chunk loop
    # (depends only on the x block — was recomputed per chunk x sub-block)
    asrc_all = jax.lax.dot_general(
        x_ref[...].astype(jnp.float32), amat_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (g_blocks*R, H)

    def body(c, _):
        slot = (c - c0) % 2

        @pl.when(c + 1 < c1)
        def _():
            for p in range(n_parts):
                t_dma(p, (c - c0 + 1) % 2, c + 1).start()
            nrw_dma((c - c0 + 1) % 2, c + 1).start()

        for p in range(n_parts):
            t_dma(p, slot, c).wait()
        nrw_dma(slot, c).wait()
        # (CHUNK, hc): dout at receivers[perm], re-assembled from the
        # <=128-lane part streams (each part's valid width recorded at
        # trace time; the rest of its lanes is gather padding)
        t = jnp.concatenate(
            [t_scrs[p][slot][:, :part_widths[p]] for p in range(n_parts)],
            axis=1)
        nrw = nrw_scr[slot]  # (CHUNK, nrw_eff): [adst hi lo | alpha hi lo
        #                                         | S hi lo] at recv[perm]
        dout_e = t[:, :hc].astype(jnp.float32)
        adst_e = (nrw[:, :H].astype(jnp.float32)
                  + nrw[:, H:2 * H].astype(jnp.float32))
        alpha_e = (nrw[:, 2 * H:3 * H].astype(jnp.float32)
                   + nrw[:, 3 * H:4 * H].astype(jnp.float32))
        s_e = (nrw[:, 4 * H:5 * H].astype(jnp.float32)
               + nrw[:, 5 * H:6 * H].astype(jnp.float32))
        ch_lo = c * CHUNK
        ch_hi = ch_lo + CHUNK
        for sb in range(g_blocks):
            b = g * g_blocks + sb
            b_start = offsets_ref[b]
            b_end = offsets_ref[b + 1]

            @pl.when((ch_lo < b_end) & (ch_hi > b_start))
            def _():
                r0 = sb * ROWS_PER_BLOCK
                ids = row_ids + b * ROWS_PER_BLOCK
                onehot = snd_ref[c, :][None, :] == ids
                oh_bf = onehot.astype(jnp.bfloat16)
                x_block = x_ref[r0:r0 + ROWS_PER_BLOCK, :]
                # per-edge messages and source terms from the SOURCE block
                msgs_e = _sel_rows_any(oh_bf, x_block)  # (CHUNK, hc_eff) f32
                asrc_e = _sel_rows(
                    oh_bf, asrc_all[r0:r0 + ROWS_PER_BLOCK, :])  # (CHUNK, H)
                z = asrc_e + adst_e
                lg = _klky(z, slope)
                w = jnp.exp(jnp.minimum(lg - alpha_e, CLAMP))
                dw = _head_reduce(dout_e[:, :hc] * msgs_e[:, :hc], H, C)
                dz = w * (dw - s_e) * _dklky(z, slope)
                cot = _head_expand_k(w, C, H) * dout_e
                if hc_eff > hc:
                    cot = jnp.pad(cot, ((0, 0), (0, hc_eff - hc)))
                # (a round-5 single-bf16 accumulation probe here failed the
                # 3e-3 grad-parity bar — the hi/lo pair stays)
                acc_dh[sb] = _acc_rows(oh_bf, cot, acc_dh[sb])
                acc_da[sb] = _acc_rows(oh_bf, dz, acc_da[sb])

        return 0

    jax.lax.fori_loop(c0, c1, body, 0)
    for sb in range(g_blocks):
        r0 = sb * ROWS_PER_BLOCK
        dh_ref[r0:r0 + ROWS_PER_BLOCK, :] = acc_dh[sb]
        dasrc_ref[r0:r0 + ROWS_PER_BLOCK, :] = acc_da[sb]


def gat_bwd_sender(t_parts, nrw_table, senders_sorted_m, x_aug, amat, heads,
                   hc, slope, interpret=False, part_widths=None):
    """dh_msgs (N, hc) and da_src (N, H) accumulated per SOURCE block.

    t_parts: tuple of (E, <=128) column parts of dout in sender-sorted edge
    order — each part gathered separately as take(dout[:, lo:hi], rbs) with
    rbs = receivers[perm]; their lane-concat is the per-edge dout.
    nrw_table (E, 6H): the narrow receiver-side values
    [hi/lo(adst) | hi/lo(alpha) | hi/lo(S)] gathered at the same rows.
    Splitting every gather to <= 128 lanes (<= 256 B/row in bf16) keeps all
    of them in the chip's fast gather class — see module docstring; a
    single (E, hc) dout pass at hc=256 bf16 (512 B/row) is fast standalone
    but XLA emits a ~3x serialized variant for it inside the train step.
    senders_sorted_m: ascending source ids with invalid edges at int32max.
    """
    if not isinstance(t_parts, (tuple, list)):
        t_parts = (t_parts,)
    e = t_parts[0].shape[0]
    n, hca = x_aug.shape
    H = heads
    C = hc // H
    n_parts = len(t_parts)
    if part_widths is None:
        # default: the standard 128-column split of dout (parts may arrive
        # lane-padded by gather_rows_padded, so widths can't be read off
        # the shapes). Only valid when the part COUNT matches that split —
        # a caller with a nonstandard split must pass part_widths
        # explicitly (a silently-wrong default would concatenate gather
        # padding as data).
        assert n_parts == -(-hc // 128), (
            f"{n_parts} parts is not the standard 128-column split of "
            f"hc={hc}; pass part_widths explicitly")
        part_widths = tuple(min(128, hc - 128 * p) for p in range(n_parts))
    assert sum(part_widths) == hc and all(w > 0 for w in part_widths), (
        part_widths, hc)
    part_lanes = -(-max(p.shape[1] for p in t_parts) // 128) * 128
    hc_eff = -(-hca // 128) * 128
    nrw_eff = -(-nrw_table.shape[1] // 128) * 128
    t_ps = [_pad_to(_pad_to(t, part_lanes, axis=1), CHUNK) for t in t_parts]
    nrw_p = _pad_to(_pad_to(nrw_table, nrw_eff, axis=1), CHUNK)
    snd_p = _pad_to(senders_sorted_m.astype(jnp.int32), CHUNK,
                    fill=2**31 - 1)
    ep = t_ps[0].shape[0]
    n_chunks = ep // CHUNK

    n_blocks = -(-n // ROWS_PER_BLOCK)
    n_groups = -(-n_blocks // G_BLOCKS)
    rows_out = n_groups * G_BLOCKS * ROWS_PER_BLOCK
    x_p = _pad_to(_pad_to(x_aug, hc_eff, axis=1), rows_out)
    amat_p = _pad_to(amat.astype(jnp.float32), hc_eff)
    block_starts = jnp.searchsorted(
        senders_sorted_m,
        jnp.arange(n_groups * G_BLOCKS, dtype=jnp.int32) * ROWS_PER_BLOCK
    ).astype(jnp.int32)
    offsets = jnp.concatenate([block_starts, jnp.asarray([e], jnp.int32)])

    blockspec = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    in_specs = [
        blockspec((n_chunks, CHUNK), lambda g, *_: (0, 0)),
        *[pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_parts)],
        pl.BlockSpec(memory_space=pl.ANY),
        blockspec((G_BLOCKS * ROWS_PER_BLOCK, hc_eff),
                  lambda g, *_: (g, 0)),
        blockspec((hc_eff, H), lambda g, *_: (0, 0)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups,),
        in_specs=in_specs,
        out_specs=(
            blockspec((G_BLOCKS * ROWS_PER_BLOCK, hc_eff),
                      lambda g, *_: (g, 0)),
            blockspec((G_BLOCKS * ROWS_PER_BLOCK, H), lambda g, *_: (g, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((G_BLOCKS, ROWS_PER_BLOCK, hc_eff), jnp.float32),
            pltpu.VMEM((G_BLOCKS, ROWS_PER_BLOCK, H), jnp.float32),
            *[pltpu.VMEM((2, CHUNK, part_lanes), t.dtype) for t in t_parts],
            pltpu.VMEM((2, CHUNK, nrw_eff), nrw_table.dtype),
            *[pltpu.SemaphoreType.DMA((2,)) for _ in range(n_parts)],
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    dh, dasrc = pl.pallas_call(
        functools.partial(_sender_kernel, heads=H, c_head=C, hc=hc,
                          hc_eff=hc_eff, n_parts=n_parts,
                          part_widths=part_widths, nrw_eff=nrw_eff,
                          g_blocks=G_BLOCKS, slope=float(slope)),
        grid_spec=grid_spec,
        out_shape=(
            vma_shape((rows_out, hc_eff), jnp.float32, t_ps[0]),
            vma_shape((rows_out, H), jnp.float32, t_ps[0]),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * ep * ROWS_PER_BLOCK * hc_eff,
            bytes_accessed=t_parts[0].dtype.itemsize * ep * n_parts
            * part_lanes
            + nrw_table.dtype.itemsize * ep * nrw_eff
            + 4 * (ep + 3 * rows_out * hc_eff),
            transcendentals=ep * H),
        interpret=interpret,
    )(offsets, snd_p.reshape(n_chunks, CHUNK), *t_ps, nrw_p, x_p, amat_p)
    return dh[:n, :hc], dasrc[:n]
