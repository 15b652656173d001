"""Fused GAT attention Pallas kernel: SDDMM logits -> per-destination
softmax -> weighted aggregation in ONE launch (SURVEY.md §2.4 N3's named
TPU equivalent of PyG's `softmax` CUDA kernel + propagate, grafted at
reference node_classification_clean/models.py:39-46).

The round-2 GAT path ran 5 XLA segment/gather ops per conv, including a
serialized scatter-max (`jax.ops.segment_max`) and two narrow (E, H)
scatter-adds — 8x off the flagship. This kernel exploits the framework's
receiver-sorted edge invariant (the edges of each 128-row destination block
are contiguous) to stream the whole attention pipeline:

  pass 1  stream the (H, E) logit chunks only (~E*H*4 bytes) and fold a
          compare-select max per destination row — per-receiver logit max
          without any scatter;
  fold    the implicit self-loop logit joins the max, and initializes the
          numerator/denominator accumulators with the self contribution;
  pass 2  stream the pre-gathered messages once; per destination block the
          softmax weight matrix W[r, e] = exp(l_e - max_r) * 1[recv_e == r]
          is built in registers and consumed immediately by MXU matmuls
          acc_h += W_h @ m_h, while the denominator accumulates as the row
          sum of W_h. Per-edge softmax weights never exist in HBM.

The kernel emits out = acc / denom and the residual alpha = max + log(denom)
(the per-node log-normalizer), from which the backward rematerializes any
edge weight as w_e = exp(l_e - alpha[recv_e]).

Backward needs NO segment-softmax machinery: with S_r = <dout_r, out_r>
per head, the softmax VJP collapses to dl_e = w_e * (dw_e - S[recv_e])
(because sum_k w_k dw_k = <dout_r, sum_k w_k m_k> = S_r, self term
included). The remaining reductions are
  * dh (messages) and da_src: ONE sender-sorted segment-sum over the
    concatenated (E, H*C + H) cotangent (pallas/spmm.py kernel);
  * da_dst: one narrow receiver-sorted segment-sum (lane-packed spmm);
so the entire GAT gradient is scatter-free.

Numerics: the weighted matmuls run in bf16 when the messages are bf16
(mixed-precision path); for f32 messages both W and m are split into
bf16 hi/lo pairs (three MXU passes) recovering ~f32 fidelity, same
discipline as pallas/spmm.py `_acc_dots`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kagnn_tpu.pallas.spmm import ROWS_PER_BLOCK, _pad_to, vma_shape

# receiver blocks per grid step: larger groups than the generic SpMM
# kernel (4) because at GAT's typical degree each 128-row block owns
# <1 edge chunk — small groups leave the per-group DMA pipelines
# latency-bound (2 passes x n_groups un-hidden first-DMA latencies).
# 16 blows the 16MB VMEM budget at HC=256 (measured 28M); 8 fits.
GAT_G_BLOCKS = 8

Array = jax.Array

CHUNK = 1024
NEG = -1e30


def _wdots(w, m, acc):
    """acc += w @ m. w is an f32 softmax-weight matrix (not exact in bf16),
    so the f32-message path splits BOTH operands hi/lo (three passes)."""
    dn = (((1,), (0,)), ((), ()))
    if m.dtype == jnp.bfloat16:
        return acc + jax.lax.dot_general(
            w.astype(jnp.bfloat16), m, dn,
            preferred_element_type=jnp.float32)
    whi = w.astype(jnp.bfloat16)
    wlo = (w - whi.astype(jnp.float32)).astype(jnp.bfloat16)
    mhi = m.astype(jnp.bfloat16)
    mlo = (m - mhi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (acc
            + jax.lax.dot_general(whi, mhi, dn,
                                  preferred_element_type=jnp.float32)
            + jax.lax.dot_general(whi, mlo, dn,
                                  preferred_element_type=jnp.float32)
            + jax.lax.dot_general(wlo, mhi, dn,
                                  preferred_element_type=jnp.float32))


def _kernel(offsets_ref, recv_ref, lg_hbm, msgs_hbm, h_ref, sl_ref,
            out_ref, alpha_ref, m_scr, s_scr, acc_scr, lg_scr, msg_scr, sems,
            msems, *, heads: int, h_pad: int, c_head: int, hc: int,
            hc_eff: int, g_blocks: int, out_dtype):
    H, C = heads, c_head
    g = pl.program_id(0)
    start = offsets_ref[g * g_blocks]
    end = offsets_ref[g * g_blocks + g_blocks]
    c0 = start // CHUNK
    c1 = jax.lax.select(end > start, (end - 1) // CHUNK + 1, c0)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (ROWS_PER_BLOCK, CHUNK), 0)

    def lg_dma(slot, c):
        # h_pad (a multiple of 8) keeps the DMA slice sublane-aligned
        return pltpu.make_async_copy(
            lg_hbm.at[pl.ds(c * h_pad, h_pad), :], lg_scr.at[slot],
            sems.at[slot])

    def msg_dma(slot, c):
        return pltpu.make_async_copy(
            msgs_hbm.at[pl.ds(c * CHUNK, CHUNK), :], msg_scr.at[slot],
            msems.at[slot])

    # ---- pass 1: per-destination-row logit max (logit chunks only) -------
    for sb in range(g_blocks):
        m_scr[sb] = jnp.full_like(m_scr[sb], NEG)

    @pl.when(c1 > c0)
    def _():
        lg_dma(0, c0).start()

    def body_max(c, _):
        slot = (c - c0) % 2

        @pl.when(c + 1 < c1)
        def _():
            lg_dma((c - c0 + 1) % 2, c + 1).start()

        lg_dma(slot, c).wait()
        lg = lg_scr[slot]  # (H, CHUNK) f32
        ch_lo = c * CHUNK
        ch_hi = ch_lo + CHUNK
        for sb in range(g_blocks):
            b = g * g_blocks + sb
            b_start = offsets_ref[b]
            b_end = offsets_ref[b + 1]

            @pl.when((ch_lo < b_end) & (ch_hi > b_start))
            def _():
                ids = row_ids + b * ROWS_PER_BLOCK
                onehot = recv_ref[c, :][None, :] == ids  # (R, CHUNK) bool
                cur = jnp.concatenate(
                    [jnp.max(jnp.where(onehot, lg[h, :][None, :], NEG),
                             axis=1, keepdims=True) for h in range(H)],
                    axis=1)  # (R, H)
                m_scr[sb] = jnp.maximum(m_scr[sb], cur)

        return 0

    jax.lax.fori_loop(c0, c1, body_max, 0)

    # ---- fold the implicit self-loop into max / denom / numerator --------
    for sb in range(g_blocks):
        r0 = sb * ROWS_PER_BLOCK
        sl = sl_ref[r0:r0 + ROWS_PER_BLOCK, :].astype(jnp.float32)  # (R, H)
        mx = jnp.maximum(m_scr[sb], sl)
        # round the shift to bf16 NOW so pass 2 can recover each edge's
        # shift exactly with a bf16 one-hot matmul; softmax is invariant to
        # the shift as long as numerator (edges), self term and alpha all
        # use this same rounded value
        mx = mx.astype(jnp.bfloat16).astype(jnp.float32)
        m_scr[sb] = mx
        es = jnp.exp(sl - mx)  # (R, H); isolated rows -> 1
        s_scr[sb] = es
        hrows = h_ref[r0:r0 + ROWS_PER_BLOCK, :].astype(jnp.float32)
        es_wide = jnp.concatenate(
            [jnp.broadcast_to(es[:, h:h + 1], (ROWS_PER_BLOCK, C))
             for h in range(H)], axis=1)  # (R, HC)
        if hc_eff > hc:
            es_wide = jnp.pad(es_wide, ((0, 0), (0, hc_eff - hc)))
        acc_scr[sb] = es_wide * hrows

    # ---- pass 2: softmax-weighted aggregation (messages + logits) --------
    @pl.when(c1 > c0)
    def _():
        lg_dma(0, c0).start()
        msg_dma(0, c0).start()

    def body_acc(c, _):
        slot = (c - c0) % 2

        @pl.when(c + 1 < c1)
        def _():
            lg_dma((c - c0 + 1) % 2, c + 1).start()
            msg_dma((c - c0 + 1) % 2, c + 1).start()

        lg_dma(slot, c).wait()
        msg_dma(slot, c).wait()
        lg = lg_scr[slot]   # (H, CHUNK) f32
        m = msg_scr[slot]   # (CHUNK, hc_eff)
        ch_lo = c * CHUNK
        ch_hi = ch_lo + CHUNK
        for sb in range(g_blocks):
            b = g * g_blocks + sb
            b_start = offsets_ref[b]
            b_end = offsets_ref[b + 1]

            @pl.when((ch_lo < b_end) & (ch_hi > b_start))
            def _():
                ids = row_ids + b * ROWS_PER_BLOCK
                onehot = recv_ref[c, :][None, :] == ids
                # per-EDGE shift via a tiny one-hot matmul: mx is bf16-
                # rounded (see self fold), so onehot^T @ mx is exact, and
                # exp runs on (H, CHUNK) instead of H broadcast (R, CHUNK)
                # tiles — ~32x fewer transcendentals
                oh_bf = onehot.astype(jnp.bfloat16)
                mxe = jax.lax.dot_general(
                    m_scr[sb].astype(jnp.bfloat16), oh_bf,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (H, CHUNK)
                # out-of-block edges get mxe = 0 -> exp(lg) may overflow to
                # +inf; the select below drops them without producing nans
                we = jnp.exp(lg[:H, :] - mxe)  # (H, CHUNK)
                nums = []
                sums = []
                for h in range(H):
                    w = jnp.where(onehot, we[h, :][None, :], 0.0)
                    sums.append(jnp.sum(w, axis=1, keepdims=True))
                    nums.append(_wdots(w, m[:, h * C:(h + 1) * C],
                                       jnp.zeros((ROWS_PER_BLOCK, C),
                                                 jnp.float32)))
                s_scr[sb] += jnp.concatenate(sums, axis=1)
                num = jnp.concatenate(nums, axis=1)  # (R, HC)
                if hc_eff > hc:
                    num = jnp.pad(num, ((0, 0), (0, hc_eff - hc)))
                acc_scr[sb] += num

        return 0

    jax.lax.fori_loop(c0, c1, body_acc, 0)

    # ---- emit out = acc / denom and alpha = max + log(denom) -------------
    for sb in range(g_blocks):
        r0 = sb * ROWS_PER_BLOCK
        s = s_scr[sb]  # (R, H), >= exp(sl - mx) > 0
        s_wide = jnp.concatenate(
            [jnp.broadcast_to(s[:, h:h + 1], (ROWS_PER_BLOCK, C))
             for h in range(H)], axis=1)
        if hc_eff > hc:
            s_wide = jnp.pad(s_wide, ((0, 0), (0, hc_eff - hc)),
                             constant_values=1.0)
        out_ref[r0:r0 + ROWS_PER_BLOCK, :] = (
            acc_scr[sb] / s_wide).astype(out_dtype)
        alpha_ref[r0:r0 + ROWS_PER_BLOCK, :] = (
            m_scr[sb] + jnp.log(s)).astype(alpha_ref.dtype)


def _fwd_impl(msgs, logits, receivers, x_self, self_logits, heads, interpret):
    """msgs (E, HC) pre-gathered h[senders]; logits (E, H) masked (-1e30 on
    padded edges); receivers (E,) ascending; x_self (N, HC); self_logits
    (N, H). Returns out (N, HC), alpha (N, H)."""
    e, hc = msgs.shape
    n = x_self.shape[0]
    H = heads
    C = hc // H
    hc_eff = -(-hc // 128) * 128
    msgs = _pad_to(msgs, hc_eff, axis=1)
    msgs_p = _pad_to(msgs, CHUNK)
    recv_p = _pad_to(receivers.astype(jnp.int32), CHUNK,
                     fill=jnp.iinfo(jnp.int32).max)
    lg_p = _pad_to(logits.astype(jnp.float32), CHUNK, fill=NEG)
    ep = msgs_p.shape[0]
    n_chunks = ep // CHUNK
    # (E, H) -> (n_chunks * h_pad, CHUNK): chunk c's logits occupy rows
    # [c*h_pad, c*h_pad + H) — h_pad rounds H to the 8-row sublane tile so
    # the per-chunk DMA slice is aligned
    h_pad = -(-H // 8) * 8
    lg_rows = _pad_to(lg_p, h_pad, axis=1, fill=NEG)
    lg_rows = lg_rows.reshape(n_chunks, CHUNK, h_pad).transpose(0, 2, 1)
    lg_rows = lg_rows.reshape(n_chunks * h_pad, CHUNK)

    n_blocks = -(-n // ROWS_PER_BLOCK)
    n_groups = -(-n_blocks // GAT_G_BLOCKS)
    rows_out = n_groups * GAT_G_BLOCKS * ROWS_PER_BLOCK
    x_p = _pad_to(_pad_to(x_self, hc_eff, axis=1), rows_out)
    sl_p = _pad_to(self_logits.astype(jnp.float32), rows_out)
    block_starts = jnp.searchsorted(
        receivers,
        jnp.arange(n_groups * GAT_G_BLOCKS, dtype=jnp.int32) * ROWS_PER_BLOCK
    ).astype(jnp.int32)
    offsets = jnp.concatenate([block_starts, jnp.asarray([e], jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((n_chunks, CHUNK), lambda g, *_: (0, 0),
                         memory_space=pltpu.VMEM),   # receivers, chunked
            pl.BlockSpec(memory_space=pl.ANY),       # logits stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),       # msgs stay in HBM
            pl.BlockSpec((GAT_G_BLOCKS * ROWS_PER_BLOCK, hc_eff),
                         lambda g, *_: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GAT_G_BLOCKS * ROWS_PER_BLOCK, H),
                         lambda g, *_: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((GAT_G_BLOCKS * ROWS_PER_BLOCK, hc_eff),
                         lambda g, *_: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GAT_G_BLOCKS * ROWS_PER_BLOCK, H),
                         lambda g, *_: (g, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((GAT_G_BLOCKS, ROWS_PER_BLOCK, H), jnp.float32),  # max
            pltpu.VMEM((GAT_G_BLOCKS, ROWS_PER_BLOCK, H), jnp.float32),  # denom
            pltpu.VMEM((GAT_G_BLOCKS, ROWS_PER_BLOCK, hc_eff), jnp.float32),
            pltpu.VMEM((2, h_pad, CHUNK), jnp.float32),   # logit chunks
            pltpu.VMEM((2, CHUNK, hc_eff), msgs.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out, alpha = pl.pallas_call(
        functools.partial(_kernel, heads=H, h_pad=h_pad, c_head=C, hc=hc,
                          hc_eff=hc_eff, g_blocks=GAT_G_BLOCKS,
                          out_dtype=msgs.dtype),
        grid_spec=grid_spec,
        out_shape=(
            vma_shape((rows_out, hc_eff), msgs.dtype, msgs_p),
            vma_shape((rows_out, H), jnp.float32, msgs_p),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * ep * ROWS_PER_BLOCK * hc_eff
            + 2 * ep * ROWS_PER_BLOCK * H,
            bytes_accessed=msgs.dtype.itemsize * (ep * hc_eff
                                                  + 2 * rows_out * hc_eff)
            + 4 * (2 * ep * H + ep + rows_out * H),
            transcendentals=ep * H),
        interpret=interpret,
    )(offsets, recv_p.reshape(n_chunks, CHUNK), lg_rows, msgs_p, x_p, sl_p)
    return out[:n, :hc], alpha[:n]


def _leaky(x, slope):
    return jnp.where(x >= 0, x, slope * x)


def _dleaky(x, slope):
    return jnp.where(x >= 0, 1.0, slope)


def _head_expand(w, c_head):
    """(rows, H) -> (rows, H*C): lane h*C..(h+1)*C carries w[:, h]."""
    return jnp.repeat(w, c_head, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _gat_attn(h, asrc, adst, senders, receivers, edge_mask, senders_perm,
              senders_sorted, heads, negative_slope, interpret):
    out, _ = _gat_fwd_parts(h, asrc, adst, senders, receivers, edge_mask,
                            heads, negative_slope, interpret)
    return out


def _gat_fwd_parts(h, asrc, adst, senders, receivers, edge_mask, heads,
                   negative_slope, interpret):
    z = jnp.take(asrc, senders, axis=0) + jnp.take(adst, receivers, axis=0)
    lg = _leaky(z.astype(jnp.float32), negative_slope)
    lg = jnp.where(edge_mask[:, None], lg, NEG)
    msgs = jnp.take(h, senders, axis=0)
    sl = _leaky((asrc + adst).astype(jnp.float32), negative_slope)
    out, alpha = _fwd_impl(msgs, lg, receivers, h, sl, heads, interpret)
    return out, (msgs, alpha, sl)


def _ga_fwd(h, asrc, adst, senders, receivers, edge_mask, senders_perm,
            senders_sorted, heads, negative_slope, interpret):
    out, (msgs, alpha, sl) = _gat_fwd_parts(
        h, asrc, adst, senders, receivers, edge_mask, heads, negative_slope,
        interpret)
    return out, (h, asrc, adst, senders, receivers, edge_mask, senders_perm,
                 senders_sorted, msgs, out, alpha, sl)


def _ga_bwd(heads, negative_slope, interpret, res, dout):
    (h, asrc, adst, senders, receivers, edge_mask, perm, senders_sorted,
     msgs, out, alpha, sl) = res
    from kagnn_tpu.pallas.spmm import _fwd_impl as _segsum
    from kagnn_tpu.pallas.spmm import sorted_segment_sum_narrow

    n, hc = h.shape
    e = senders.shape[0]
    H = heads
    C = hc // H
    f32 = jnp.float32
    # wide edge-space tensors stay in the input dtype (bf16 mixed-precision
    # halves the dominant gather/segment-sum traffic); narrow (·, H)
    # softmax algebra runs in f32. Every wide gather below indexes the
    # small (N, HC) node tables — never an (E, HC) edge table (measured 2x
    # slower per row at arxiv scale).
    wd = h.dtype

    # S_r = <dout_r, out_r> per head — softmax-sum term, pure node space
    S = jnp.sum((dout * out).astype(f32).reshape(n, H, C), axis=2)  # (N, H)

    # edge-space map (narrow gathers; receivers ascending)
    z = jnp.take(asrc, senders, axis=0) + jnp.take(adst, receivers, axis=0)
    z = z.astype(f32)
    lg = jnp.where(edge_mask[:, None], _leaky(z, negative_slope), NEG)
    w = jnp.exp(lg - jnp.take(alpha, receivers, axis=0))          # (E, H) f32
    douted = jnp.take(dout, receivers, axis=0)                    # (E, HC) wd
    dw = jnp.sum((douted * msgs).astype(f32).reshape(e, H, C), axis=2)
    dl = w * (dw - jnp.take(S, receivers, axis=0))                # (E, H)
    dz = dl * _dleaky(z, negative_slope)                          # (E, H)

    # da_dst / da_src: unpadded narrow segment-sum kernels (receiver order
    # and sender order); dh (messages): gather dout straight in SENDER
    # order (receivers[perm] indexes the N-table) + one wide segment-sum —
    # all scatter-free
    dadst_e = sorted_segment_sum_narrow(dz, receivers, n, interpret)
    dasrc_e = sorted_segment_sum_narrow(jnp.take(dz, perm, axis=0),
                                        senders_sorted, n, interpret)
    recv_by_sender = jnp.take(receivers, perm)
    cot_s = (_head_expand(jnp.take(w, perm, axis=0), C).astype(wd)
             * jnp.take(dout, recv_by_sender, axis=0))            # (E, HC) wd
    dh_msgs = _segsum(cot_s, senders_sorted, n, interpret)

    # self-loop terms
    zs = (asrc + adst).astype(f32)
    w_self = jnp.exp(sl - alpha)                                  # (N, H)
    dw_self = jnp.sum((dout * h).astype(f32).reshape(n, H, C), axis=2)
    dz_self = w_self * (dw_self - S) * _dleaky(zs, negative_slope)

    dh = (dh_msgs.astype(f32)
          + _head_expand(w_self, C) * dout.astype(f32)).astype(h.dtype)
    dasrc = (dasrc_e + dz_self).astype(asrc.dtype)
    dadst = (dadst_e + dz_self).astype(adst.dtype)
    return dh, dasrc, dadst, None, None, None, None, None


_gat_attn.defvjp(_ga_fwd, _ga_bwd)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def gat_attention_fused(h: Array, asrc: Array, adst: Array, g,
                        negative_slope: float = 0.2,
                        interpret=None) -> Array:
    """Full GAT attention block over a receiver-sorted GraphBatch:
    logits -> per-destination softmax (with implicit self-loop) -> weighted
    aggregation. h (N, H*C) with H = asrc.shape[1]; returns (N, H*C)."""
    if interpret is None:
        interpret = not _on_tpu()
    return _gat_attn(h, asrc, adst, g.senders, g.receivers, g.edge_mask,
                     g.senders_perm, g.senders_sorted, asrc.shape[1],
                     float(negative_slope), bool(interpret))
