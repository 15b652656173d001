"""Fused GAT attention Pallas kernel: SDDMM logits -> per-destination
softmax -> weighted aggregation in ONE launch (SURVEY.md §2.4 N3's named
TPU equivalent of PyG's `softmax` CUDA kernel + propagate, grafted at
reference node_classification_clean/models.py:39-46).

The round-2 GAT path ran 5 XLA segment/gather ops per conv, including a
serialized scatter-max (`jax.ops.segment_max`) and two narrow (E, H)
scatter-adds — 8x off the flagship. This kernel exploits the framework's
receiver-sorted edge invariant (the edges of each 128-row destination block
are contiguous) to stream the whole attention pipeline. Crucially the
LOGITS ARE COMPUTED IN-KERNEL — XLA row gathers cost ~10ns/row regardless
of width (measured: a narrow (E,4) gather costs the same ~11-12 ms as the
wide (E,256) message gather at arxiv scale), so the v1 design's per-edge
logit preparation (two narrow gathers + an (H, E) stream) cost more than
the whole kernel. Here the ONLY gather is the unavoidable wide message
gather:

  * per-edge source terms  asrc_e = msgs @ A  (a tiny matmul on the already
    -streamed message chunk; A maps message lanes to per-head logits);
  * destination terms adst_r and the self logits are block-local (the
    destination block's rows ride the grid);
  * ONE message pass with ONLINE softmax: per destination row the kernel
    maintains a running bf16-rounded shift m, denominator s and numerator
    acc, rescaling (s, acc) by exp(m_old - m_new) when a chunk raises the
    max (exact telescoping; the factor is exactly 1 while the rounded max
    is unchanged). Chunk maxima use the monotonicity identity
    max_e leaky(a_e + b_r) = leaky(max_e a_e + b_r). Per-edge shifts and
    destination terms are recovered with exact one-hot matmuls (shift
    bf16-rounded at the source — softmax is shift-invariant as long as
    every term uses the same rounded shift; adst split hi/lo), the weight
    row w_e = exp(leaky(asrc_e+adst_e) - mx_e) is built in registers
    ((H, CHUNK) transcendentals only) and consumed immediately by MXU
    matmuls acc_h += W_h @ m_h, with the denominator as the row sum.
    Per-edge weights never exist in HBM.

Invalid (padded) edges are excluded by rewriting their receiver to int32max
(they then match no destination block) — one fused elementwise pass, no
mask stream.

The kernel emits out = acc / denom and the residual alpha = max + log(denom)
(the per-node log-normalizer), from which the backward rematerializes any
edge weight as w_e = exp(l_e - alpha[recv_e]).

Backward needs NO segment-softmax machinery: with S_r = <dout_r, out_r>
per head, the softmax VJP collapses to dl_e = w_e * (dw_e - S[recv_e])
(because sum_k w_k dw_k = <dout_r, sum_k w_k m_k> = S_r, self term
included). The whole gradient runs through the two gather-minimal kernels
in pallas/gat_bwd.py (receiver-oriented da_dst with zero gathers;
transpose-oriented dh/da_src with one wide row gather) — scatter-free.

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

from kagnn_tpu.pallas.spmm import (ROWS_PER_BLOCK, _pad_to,
                                   gather_rows_padded, vma_shape)

# receiver blocks per grid step (16 blows the 16MB VMEM budget at HC=256)
GAT_G_BLOCKS = 8

Array = jax.Array

CHUNK = 1024
NEG = -1e30
IMAX = 2**31 - 1


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


def _klky(x, slope):
    return jnp.where(x >= 0, x, slope * x)


def _kernel(offsets_ref, recv_ref, msgs_hbm, x_ref, adst_ref, amat_ref,
            out_ref, alpha_ref, m_scr, s_scr, acc_scr, msg_scr, msems, *,
            heads: int, c_head: int, hc: int, hc_eff: int, g_blocks: int,
            slope: float, out_dtype):
    H, C = heads, c_head
    g = pl.program_id(0)
    start = offsets_ref[g * g_blocks]
    end = offsets_ref[g * g_blocks + g_blocks]
    c0 = start // CHUNK
    c1 = jax.lax.select(end > start, (end - 1) // CHUNK + 1, c0)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (ROWS_PER_BLOCK, CHUNK), 0)
    ct_hc = (((0,), (1,)), ((), ()))  # contract message lanes
    ct_r = (((0,), (0,)), ((), ()))   # contract destination rows

    def msg_dma(slot, c):
        return pltpu.make_async_copy(
            msgs_hbm.at[pl.ds(c * CHUNK, CHUNK), :], msg_scr.at[slot],
            msems.at[slot])

    def asrc_of(m):
        a = amat_ref[...]
        a = a.astype(m.dtype) if m.dtype == jnp.bfloat16 else a
        return jax.lax.dot_general(
            a, m, ct_hc, preferred_element_type=jnp.float32)  # (H, CHUNK)

    def _wide(v, fill):
        """(R, H) -> (R, hc_eff): lane h*C..(h+1)*C carries v[:, h]."""
        out = jnp.concatenate(
            [jnp.broadcast_to(v[:, h:h + 1], (ROWS_PER_BLOCK, C))
             for h in range(H)], axis=1)
        if hc_eff > hc:
            out = jnp.pad(out, ((0, 0), (0, hc_eff - hc)),
                          constant_values=fill)
        return out

    # ---- init from the implicit self-loop --------------------------------
    # ONLINE softmax: a single message pass maintains (running bf16-rounded
    # shift m, denom s, numerator acc) per destination row, rescaling by
    # exp(m_old - m_new) when a chunk raises the max. The shift stays
    # bf16-rounded at every step so the per-edge shift is recoverable with
    # an exact bf16 one-hot matmul; rescale factors use exact f32 exps of
    # rounded values, so the telescoped product equals exp(lg - m_final).
    for sb in range(g_blocks):
        r0 = sb * ROWS_PER_BLOCK
        rows = x_ref[r0:r0 + ROWS_PER_BLOCK, :]
        asrc_r = jax.lax.dot_general(
            rows.astype(jnp.float32), amat_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (R, H)
        adst_r = adst_ref[r0:r0 + ROWS_PER_BLOCK, :].astype(jnp.float32)
        sl = _klky(asrc_r + adst_r, slope)
        mx = sl.astype(jnp.bfloat16).astype(jnp.float32)
        m_scr[sb] = mx
        es = jnp.exp(sl - mx)  # (R, H); ~1
        s_scr[sb] = es
        # the zero pad beyond hc also kills any augmented lanes
        acc_scr[sb] = _wide(es, 0.0) * rows.astype(jnp.float32)

    # ---- single pass: online-softmax weighted aggregation ----------------
    @pl.when(c1 > c0)
    def _():
        msg_dma(0, c0).start()

    def body_acc(c, _):
        slot = (c - c0) % 2

        @pl.when(c + 1 < c1)
        def _():
            msg_dma((c - c0 + 1) % 2, c + 1).start()

        msg_dma(slot, c).wait()
        m = msg_scr[slot]        # (CHUNK, hc_eff)
        asrc_e = asrc_of(m)      # (H, CHUNK) f32
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
                adst_sb = adst_ref[r0:r0 + ROWS_PER_BLOCK, :].astype(
                    jnp.float32)
                # chunk max via monotonicity (max_e leaky(a_e + b) =
                # leaky(max_e a_e + b)); fold into the running shift
                cur = jnp.concatenate(
                    [jnp.max(jnp.where(onehot, asrc_e[h, :][None, :], NEG),
                             axis=1, keepdims=True) for h in range(H)],
                    axis=1)  # (R, H)
                mx_old = m_scr[sb]
                mx = jnp.maximum(mx_old, _klky(cur + adst_sb, slope))
                mx = mx.astype(jnp.bfloat16).astype(jnp.float32)
                r = jnp.exp(mx_old - mx)  # (R, H) <= 1; == 1 when unchanged
                m_scr[sb] = mx
                s_old = s_scr[sb]
                acc_old = acc_scr[sb]
                # per-edge destination term (exact via hi/lo one-hot
                # matmuls) and per-edge shift (exact: mx bf16-rounded).
                # NOTE round-5 probe: a "one wide matmul over weight-scaled
                # messages" restructure (build (CHUNK, HC) wexp by lane-
                # broadcasting per-head weights, then a single onehot@ms
                # MXU pass) measured 7.98 ms/launch vs 4.97 for this
                # per-head loop — VPU cross-lane broadcasts dominate; the
                # narrow per-head masked matmuls are the faster form.
                hi = adst_sb.astype(jnp.bfloat16)
                lo = (adst_sb - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                adst_e = (jax.lax.dot_general(
                    hi, oh_bf, ct_r, preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(
                        lo, oh_bf, ct_r,
                        preferred_element_type=jnp.float32))  # (H, CHUNK)
                mxe = jax.lax.dot_general(
                    mx.astype(jnp.bfloat16), oh_bf, ct_r,
                    preferred_element_type=jnp.float32)
                lg = _klky(asrc_e + adst_e, slope)
                # out-of-block edges get mxe/adst_e = 0 -> exp may overflow
                # to +inf; the select below drops them without nans
                we = jnp.exp(lg - mxe)  # (H, CHUNK)
                nums = []
                sums = []
                for h in range(H):
                    w = jnp.where(onehot, we[h, :][None, :], 0.0)
                    sums.append(jnp.sum(w, axis=1, keepdims=True))
                    nums.append(_wdots(w, m[:, h * C:(h + 1) * C],
                                       jnp.zeros((ROWS_PER_BLOCK, C),
                                                 jnp.float32)))
                s_scr[sb] = s_old * r + jnp.concatenate(sums, axis=1)
                num = jnp.concatenate(nums, axis=1)  # (R, HC)
                if hc_eff > hc:
                    num = jnp.pad(num, ((0, 0), (0, hc_eff - hc)))
                acc_scr[sb] = acc_old * _wide(r, 1.0) + num

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


def _fwd_impl(msgs, recv_m, x_aug, adst, amat, heads, hc, slope, interpret):
    """msgs (E, HCa) pre-gathered x_aug[senders]; recv_m (E,) ascending with
    invalid edges rewritten to int32max; x_aug (N, HCa) node table (messages
    in lanes [0, hc), optionally augmented); adst (N, H); amat (HCa, H) with
    asrc == x_aug @ amat. Returns out (N, hc), alpha (N, H)."""
    e, hca = msgs.shape
    n = x_aug.shape[0]
    H = heads
    C = hc // H
    hc_eff = -(-hca // 128) * 128
    msgs = _pad_to(msgs, hc_eff, axis=1)
    msgs_p = _pad_to(msgs, CHUNK)
    recv_p = _pad_to(recv_m.astype(jnp.int32), CHUNK, fill=IMAX)
    ep = msgs_p.shape[0]
    n_chunks = ep // CHUNK

    n_blocks = -(-n // ROWS_PER_BLOCK)
    n_groups = -(-n_blocks // GAT_G_BLOCKS)
    rows_out = n_groups * GAT_G_BLOCKS * ROWS_PER_BLOCK
    x_p = _pad_to(_pad_to(x_aug, hc_eff, axis=1), rows_out)
    adst_p = _pad_to(adst.astype(jnp.float32), rows_out)
    amat_p = _pad_to(amat.astype(jnp.float32), hc_eff)
    block_starts = jnp.searchsorted(
        recv_m,
        jnp.arange(n_groups * GAT_G_BLOCKS, dtype=jnp.int32) * ROWS_PER_BLOCK
    ).astype(jnp.int32)
    offsets = jnp.concatenate([block_starts, jnp.asarray([e], jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((n_chunks, CHUNK), lambda g, *_: (0, 0),
                         memory_space=pltpu.VMEM),   # receivers, chunked
            pl.BlockSpec(memory_space=pl.ANY),       # msgs stay in HBM
            pl.BlockSpec((GAT_G_BLOCKS * ROWS_PER_BLOCK, hc_eff),
                         lambda g, *_: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GAT_G_BLOCKS * ROWS_PER_BLOCK, H),
                         lambda g, *_: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hc_eff, H), lambda g, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((GAT_G_BLOCKS * ROWS_PER_BLOCK, hc_eff),
                         lambda g, *_: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GAT_G_BLOCKS * ROWS_PER_BLOCK, H),
                         lambda g, *_: (g, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((GAT_G_BLOCKS, ROWS_PER_BLOCK, H), jnp.float32),
            pltpu.VMEM((GAT_G_BLOCKS, ROWS_PER_BLOCK, H), jnp.float32),
            pltpu.VMEM((GAT_G_BLOCKS, ROWS_PER_BLOCK, hc_eff), jnp.float32),
            pltpu.VMEM((2, CHUNK, hc_eff), msgs.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out, alpha = pl.pallas_call(
        functools.partial(_kernel, heads=H, c_head=C, hc=hc, hc_eff=hc_eff,
                          g_blocks=GAT_G_BLOCKS, slope=float(slope),
                          out_dtype=msgs.dtype),
        grid_spec=grid_spec,
        out_shape=(
            vma_shape((rows_out, hc_eff), msgs.dtype, msgs_p),
            vma_shape((rows_out, H), jnp.float32, msgs_p),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (2 * ep * ROWS_PER_BLOCK * hc_eff
                       + 2 * ep * hc_eff * H),
            bytes_accessed=msgs.dtype.itemsize * (2 * ep * hc_eff
                                                  + 2 * rows_out * hc_eff)
            + 4 * (ep + rows_out * H),
            transcendentals=2 * ep * H),
        interpret=interpret,
    )(offsets, recv_p.reshape(n_chunks, CHUNK), msgs_p, x_p, adst_p, amat_p)
    return out[:n, :hc], alpha[:n]


def _leaky(x, slope):
    return jnp.where(x >= 0, x, slope * x)


def _dleaky(x, slope):
    return jnp.where(x >= 0, 1.0, slope)


def _head_expand(w, c_head):
    """(rows, H) -> (rows, H*C): lane h*C..(h+1)*C carries w[:, h]."""
    return jnp.repeat(w, c_head, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13))
def _gat_attn(h, asrc, adst, amat, senders, receivers, edge_mask,
              senders_perm, senders_sorted, recv_by_sender, mask_by_sender,
              heads, negative_slope, interpret):
    out, _ = _gat_fwd_parts(h, asrc, adst, amat, senders, receivers,
                            edge_mask, heads, negative_slope, interpret)
    return out


def _resolve_amat(h, asrc, amat, heads):
    """(x_aug, amat) such that asrc == x_aug @ amat exactly. When no logit
    matrix is available (direct calls with free-standing asrc/adst) the
    asrc columns ride the node table as augmented lanes."""
    hc = h.shape[1]
    if amat is None:
        x_aug = jnp.concatenate([h, asrc.astype(h.dtype)], axis=1)
        amat = jnp.concatenate(
            [jnp.zeros((hc, heads), jnp.float32),
             jnp.eye(heads, dtype=jnp.float32)], axis=0)
        return x_aug, amat
    return h, amat


def _gat_fwd_parts(h, asrc, adst, amat, senders, receivers, edge_mask,
                   heads, negative_slope, interpret):
    hc = h.shape[1]
    x_aug, amat_r = _resolve_amat(h, asrc, amat, heads)
    # node-side lane pre-pad: padding the (N, hca) table costs E/N x less
    # than lane-padding the (E, hca) gathered messages
    msgs = gather_rows_padded(x_aug, senders)
    recv_m = jnp.where(edge_mask, receivers, IMAX)
    out, alpha = _fwd_impl(msgs, recv_m, x_aug, adst, amat_r, heads, hc,
                           negative_slope, interpret)
    return out, (msgs, alpha)


def _ga_fwd(h, asrc, adst, amat, senders, receivers, edge_mask, senders_perm,
            senders_sorted, recv_by_sender, mask_by_sender, heads,
            negative_slope, interpret):
    out, (msgs, alpha) = _gat_fwd_parts(
        h, asrc, adst, amat, senders, receivers, edge_mask, heads,
        negative_slope, interpret)
    return out, (h, asrc, adst, amat, senders, receivers, edge_mask,
                 senders_perm, senders_sorted, recv_by_sender,
                 mask_by_sender, msgs, out, alpha)


def _ga_bwd(heads, negative_slope, interpret, res, dout):
    (h, asrc, adst, amat, senders, receivers, edge_mask, perm,
     senders_sorted, recv_by_sender, mask_by_sender, msgs, out,
     alpha) = res
    from kagnn_tpu.pallas.gat_bwd import gat_bwd_dadst, gat_bwd_sender

    n, hc = h.shape
    H = heads
    C = hc // H
    f32 = jnp.float32
    wd = h.dtype

    x_aug, amat_r = _resolve_amat(h, asrc, amat, heads)

    # S_r = <dout_r, out_r> per head — softmax-sum term, pure node space
    S = jnp.sum((dout * out).astype(f32).reshape(n, H, C), axis=2)  # (N, H)

    # da_dst: receiver-oriented kernel, ZERO gathers (re-streams the saved
    # message residual; dout/adst/alpha/S are destination-block-local)
    recv_m = jnp.where(edge_mask, receivers, IMAX)
    dout_w = dout.astype(wd)
    dadst_e = gat_bwd_dadst(msgs, recv_m, dout_w, adst, alpha, S, amat_r,
                            H, hc, negative_slope, interpret)

    # dh_msgs + da_src: transpose (sender-oriented) kernel; the per-edge
    # receiver-side values arrive as ONE gathered table (dout wide, the
    # three narrow node arrays as exact hi/lo bf16 lane pairs)
    def hilo(x):
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(f32)).astype(jnp.bfloat16)
        return hi.astype(wd), lo.astype(wd)

    # dout rides 128-lane column-part gathers and the three narrow node
    # arrays a separate (E, 6H) one: every per-edge row pass stays <= 256 B
    # in bf16, the chip's fast gather class (a single 256-lane pass is fast
    # standalone but XLA serializes it ~3x inside the step — see gat_bwd.py)
    NRW = jnp.concatenate(
        [*hilo(adst.astype(f32)), *hilo(alpha), *hilo(S)], axis=1)
    # the sender-sorted permuted views are host-side precomputes when the
    # batcher ships them (on-device (E,) permutes are gather-row-rate-bound)
    rbs = (jnp.take(receivers, perm) if recv_by_sender is None
           else recv_by_sender)
    mbs = (jnp.take(edge_mask, perm) if mask_by_sender is None
           else mask_by_sender)
    # chain the part gathers: each 128-lane slice of dout is only
    # produced AFTER the previous part's gather completes, so the (N, 128)
    # tables' alternate-memory live ranges don't overlap — XLA's fast
    # (SC-offloaded) gather path requires the table in alternate memory,
    # whose budget fits ~2 such tables; overlapping ranges force one
    # gather onto the ~6x slower serialized TensorCore path
    t_parts = []
    src = dout_w
    for i in range(0, hc, 128):
        t_parts.append(gather_rows_padded(src[:, i:i + 128], rbs))
        if i + 128 < hc:
            src = jax.lax.optimization_barrier((src, t_parts[-1]))[0]
    t_parts = tuple(t_parts)
    nrw_table = gather_rows_padded(NRW, rbs)
    ssm = jnp.where(mbs, senders_sorted, IMAX)
    dh_msgs, dasrc_e = gat_bwd_sender(t_parts, nrw_table, ssm, x_aug,
                                      amat_r, H, hc, negative_slope,
                                      interpret)

    # self-loop terms
    zs = (asrc + adst).astype(f32)
    sl = _leaky(zs, negative_slope)
    w_self = jnp.exp(sl - alpha)                                  # (N, H)
    dw_self = jnp.sum((dout * h).astype(f32).reshape(n, H, C), axis=2)
    dz_self = w_self * (dw_self - S) * _dleaky(zs, negative_slope)

    dh = (dh_msgs
          + _head_expand(w_self, C) * dout.astype(f32)).astype(h.dtype)
    dasrc = (dasrc_e + dz_self).astype(asrc.dtype)
    dadst = (dadst_e + dz_self).astype(adst.dtype)
    # amat's direct cotangent is zero: the kernels consume it only to
    # recompute asrc values (asrc == x_aug @ amat by construction), and the
    # full sensitivity flows through the `asrc` input
    damat = None if amat is None else jnp.zeros_like(amat)
    return (dh, dasrc, dadst, damat, None, None, None, None, None, None,
            None)


_gat_attn.defvjp(_ga_fwd, _ga_bwd)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def gat_attention_fused(h: Array, asrc: Array, adst: Array, g,
                        negative_slope: float = 0.2, interpret=None,
                        att_src_matrix: Array | None = None) -> Array:
    """Full GAT attention block over a receiver-sorted GraphBatch:
    logits -> per-destination softmax (with implicit self-loop) -> weighted
    aggregation. h (N, H*C) with H = asrc.shape[1]; returns (N, H*C).

    `att_src_matrix` (H*C, H): the linear map with asrc == h @ att_src_matrix
    (GATConv's att_src parameter expanded block-diagonally). When given, the
    kernel recomputes per-edge source logits from the message stream itself
    — zero extra gathers; without it, the asrc columns ride the message
    gather as augmented lanes."""
    if interpret is None:
        interpret = not _on_tpu()
    return _gat_attn(h, asrc, adst, att_src_matrix, g.senders, g.receivers,
                     g.edge_mask, g.senders_perm, g.senders_sorted,
                     getattr(g, "receivers_by_sender", None),
                     getattr(g, "edge_mask_by_sender", None),
                     asrc.shape[1], float(negative_slope), bool(interpret))
