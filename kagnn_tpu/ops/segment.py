"""Segment (gather-scatter) primitives — the TPU-native replacement for the
torch_scatter/PyG C++/CUDA aggregation kernels used by the reference
(`MessagePassing.propagate` scatter-add; see reference
node_classification_clean/models.py:140 call path, SURVEY.md §2.4 N1).

All ops take *padded, statically-shaped* index vectors. Padded entries must be
masked by the caller (or carry zero data); `num_segments` is always static so
XLA can compile a single scatter/sort kernel.
"""
from __future__ import annotations

import contextlib
import threading

import jax
import jax.numpy as jnp

Array = jax.Array

# --- edge-partition collective mode -----------------------------------------
# When the graph's edge arrays are sharded across a mesh axis (each device
# holds an edge shard but a full node-feature replica — the halo-exchange
# edge partition of SURVEY.md §2.4 N9), every edge->node reduction computes a
# PARTIAL result that must be all-reduced. Entering `edge_axis("axis")` makes
# every segment reduction in this module finish with the matching collective
# (psum / pmax), so the whole conv stack becomes edge-partition-aware inside
# `shard_map` with no changes elsewhere.

_STATE = threading.local()


@contextlib.contextmanager
def edge_axis(axis_name: str | None):
    prev = getattr(_STATE, "axis", None)
    _STATE.axis = axis_name
    try:
        yield
    finally:
        _STATE.axis = prev


def _current_axis() -> str | None:
    return getattr(_STATE, "axis", None)


def current_edge_axis() -> str | None:
    """Mesh axis edges are partitioned over (inside `edge_axis`), or None.
    Callers computing per-node reductions from the LOCAL edge shard by means
    other than `segment_sum` (e.g. searchsorted degree counts) must psum
    their result over this axis themselves."""
    return _current_axis()


# --- halo-exchange node partition --------------------------------------------
# The scalable alternative to `edge_axis` (which psums the FULL (N, F) node
# array per reduction): nodes are sharded into contiguous blocks, edges are
# partitioned by DESTINATION block, and each segment reduction gathers only
# the boundary sender rows from their owner shards via one `all_to_all`
# (comm volume ∝ boundary nodes, not N — SURVEY.md §2.4 N9 / §7.8). Entering
# `halo_mode(state)` inside `shard_map` makes `neighbor_sum`,
# `sender_gather` and the conv layers run the exchange + local aggregation;
# the plan arrays come from `kagnn_tpu.dist.halo.build_halo_plan`.

import dataclasses as _dc
from typing import Optional as _Opt


@_dc.dataclass(frozen=True)
class HaloState:
    """Per-device (inside-shard_map) halo-exchange arrays.

    All index arrays are the device-local slices of the stacked HaloPlan
    (leading device axis consumed by shard_map's in_specs).
    """

    axis: str                     # mesh axis name node blocks are sharded over
    n_local: int                  # B — rows per node shard
    send_idx: Array               # (D, H) int32: local rows to send to peer p
    send_mask: Array              # (D, H) bool
    dinv_ext: _Opt[Array] = None  # (B + D*H,) f32 — D^-1/2(deg+1), ext space
    # optional internal/halo edge split (overlap of comm with local compute)
    s_int: _Opt[Array] = None     # (Ei,) int32 local sender rows
    r_int: _Opt[Array] = None     # (Ei,) int32 local receiver rows (sorted)
    int_sel: _Opt[Array] = None   # (Ei,) int32 index into the full edge list
    int_mask: _Opt[Array] = None  # (Ei,) bool
    s_halo: _Opt[Array] = None    # (Eh,) int32 rows into recv_flat (D*H)
    r_halo: _Opt[Array] = None    # (Eh,) int32 local receiver rows (sorted)
    halo_sel: _Opt[Array] = None  # (Eh,) int32 index into the full edge list
    halo_mask: _Opt[Array] = None # (Eh,) bool


@contextlib.contextmanager
def halo_mode(state: "HaloState"):
    prev = getattr(_STATE, "halo", None)
    _STATE.halo = state
    try:
        yield
    finally:
        _STATE.halo = prev


def halo_state() -> "HaloState | None":
    return getattr(_STATE, "halo", None)


def node_stats_axis() -> str | None:
    """Mesh axis node rows are sharded over (for cross-shard batch-norm /
    loss statistics), or None outside halo mode."""
    hs = halo_state()
    return hs.axis if hs is not None else None


def halo_exchange(x: Array) -> Array:
    """Exchange boundary rows of the local node shard `x` (B, F): returns
    recv_flat (D*H, F) where row p*H + j is peer p's j-th boundary row for
    this device. One all_to_all over ICI; volume = D*H*F per device."""
    hs = halo_state()
    send = jnp.take(x, hs.send_idx.reshape(-1), axis=0)
    send = send.reshape(hs.send_idx.shape + x.shape[1:])
    send = jnp.where(
        hs.send_mask.reshape(hs.send_mask.shape + (1,) * (x.ndim - 1)),
        send, 0)
    recv = jax.lax.all_to_all(send, hs.axis, split_axis=0, concat_axis=0)
    return recv.reshape((-1,) + x.shape[1:])


def halo_extend(x: Array) -> Array:
    """Local shard (B, F) -> extended table (B + D*H, F) = [local; halo]."""
    return jnp.concatenate([x, halo_exchange(x)], axis=0)


@contextlib.contextmanager
def use_pallas_spmm(enabled: bool | None = True, interpret: bool = False):
    """Control routing of sorted segment-sums through the Pallas
    sorted-segment-sum kernel (pallas/spmm.py). XLA's TPU scatter-add is far
    off bandwidth at arxiv scale; the kernel streams sorted edges and
    accumulates on the MXU. Default (no context): AUTO — kernel is used on
    the TPU backend for sorted 2D float32 reductions wide enough to be worth
    the lane-aligned DMA (>= 64 features)."""
    prev = getattr(_STATE, "spmm", None)
    _STATE.spmm = (enabled, interpret)
    try:
        yield
    finally:
        _STATE.spmm = prev


def _spmm_mode():
    return getattr(_STATE, "spmm", None)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def segment_sum(
    data: Array,
    segment_ids: Array,
    num_segments: int,
    indices_are_sorted: bool = False,
) -> Array:
    """Sum `data` rows into `num_segments` buckets given by `segment_ids`."""
    spmm = _spmm_mode()
    eligible = (indices_are_sorted and data.ndim == 2
                and data.dtype in (jnp.float32, jnp.bfloat16)
                and _current_axis() is None)
    if spmm is None:
        route = eligible and data.shape[1] >= 64 and _on_tpu()
        interpret = False
    else:
        route = eligible and bool(spmm[0])
        interpret = spmm[1]
    if route:
        from kagnn_tpu.pallas.spmm import sorted_segment_sum

        return sorted_segment_sum(data, segment_ids, num_segments, interpret)
    out = jax.ops.segment_sum(
        data,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    ax = _current_axis()
    if ax is not None:
        out = jax.lax.psum(out, ax)
    return out


def segment_mean(
    data: Array,
    segment_ids: Array,
    num_segments: int,
    indices_are_sorted: bool = False,
    mask: Array | None = None,
) -> Array:
    """Mean per segment. `mask` (bool, per row) excludes padded rows from both
    numerator and denominator."""
    if mask is not None:
        data = jnp.where(mask.reshape(mask.shape + (1,) * (data.ndim - 1)), data, 0)
        ones = mask.astype(data.dtype)
    else:
        ones = jnp.ones(data.shape[0], dtype=data.dtype)
    total = segment_sum(data, segment_ids, num_segments, indices_are_sorted)
    count = segment_sum(ones, segment_ids, num_segments, indices_are_sorted)
    return total / jnp.maximum(count, 1.0).reshape(count.shape + (1,) * (data.ndim - 1))


def segment_max(
    data: Array,
    segment_ids: Array,
    num_segments: int,
    indices_are_sorted: bool = False,
) -> Array:
    out = jax.ops.segment_max(
        data,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    ax = _current_axis()
    if ax is not None:
        out = jax.lax.pmax(out, ax)
    return out


def segment_softmax(
    logits: Array,
    segment_ids: Array,
    num_segments: int,
    mask: Array | None = None,
    indices_are_sorted: bool = False,
    extra_logits: Array | None = None,
) -> tuple[Array, Array]:
    """Numerically-stable per-segment softmax (the edge-softmax of GAT;
    replaces PyG's `softmax` CUDA kernel, SURVEY.md §2.4 N3).

    Args:
      logits: (E, ...) per-edge logits.
      segment_ids: (E,) destination-node ids.
      mask: (E,) validity of each edge; invalid edges get weight 0.
      extra_logits: optional (num_segments, ...) additional per-segment logit
        participating in the softmax (used for implicit self-loop edges).

    Returns:
      (edge_weights, extra_weights) — softmax weights for the edges and for the
      extra per-segment logits (zeros-shaped like extra_logits if None given).
    """
    neg = jnp.asarray(-1e30, dtype=logits.dtype)
    masked_logits = logits if mask is None else jnp.where(
        mask.reshape(mask.shape + (1,) * (logits.ndim - 1)), logits, neg)
    # the max is only a numerical-stability shift (softmax is shift-
    # invariant), so it carries no gradient — stop_gradient on the INPUT so
    # the whole max/pmax subgraph stays out of the AD trace (pmax has no AD
    # rule, which would break the edge-partitioned path)
    seg_max = segment_max(jax.lax.stop_gradient(masked_logits), segment_ids,
                          num_segments, indices_are_sorted)
    seg_max = jnp.maximum(seg_max, neg)  # segments with no edges -> -1e30 not -inf
    if extra_logits is not None:
        seg_max = jnp.maximum(seg_max, extra_logits)
    edge_exp = jnp.exp(masked_logits - seg_max[segment_ids])
    if mask is not None:
        edge_exp = jnp.where(
            mask.reshape(mask.shape + (1,) * (logits.ndim - 1)), edge_exp, 0)
    denom = segment_sum(edge_exp, segment_ids, num_segments, indices_are_sorted)
    if extra_logits is not None:
        extra_exp = jnp.exp(extra_logits - seg_max)
        denom = denom + extra_exp
        denom = jnp.maximum(denom, 1e-16)
        return edge_exp / denom[segment_ids], extra_exp / denom
    denom = jnp.maximum(denom, 1e-16)
    return edge_exp / denom[segment_ids], jnp.zeros_like(seg_max)


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _sorted_bwd_gather(x, indices, perm, sorted_indices, interpret):
    return jnp.take(x, indices, axis=0, mode="clip")


def _sbg_fwd(x, indices, perm, sorted_indices, interpret):
    return jnp.take(x, indices, axis=0), (perm, sorted_indices, x.shape[0])


def _sbg_bwd(interpret, res, cot):
    perm, sorted_indices, n_rows = res
    from kagnn_tpu.pallas.spmm import sorted_segment_sum

    cot_sorted = jnp.take(cot, perm, axis=0)
    dx = sorted_segment_sum(cot_sorted, sorted_indices, n_rows, interpret)
    return dx, None, None, None


_sorted_bwd_gather.defvjp(_sbg_fwd, _sbg_bwd)


def _edge_gather(table, idx):
    """Edge-space row gather feeding sorted_segment_sum: the table is
    lane-pre-padded (barrier-pinned — see gather_rows_padded) so no
    (E, d) pad copy precedes the kernel launch. A narrow bf16 variant
    feeding the pack-2 kernel layout was tried in round 5 and reverted:
    (E, 64) bf16 occupies 128-lane tiles physically, so the repack XLA
    inserts outside the kernel costs more than the in-kernel DMA saving."""
    from kagnn_tpu.pallas.spmm import gather_rows_padded

    return gather_rows_padded(table, idx)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _neighbor_sum_sorted(x, senders, receivers, edge_weight, senders_perm,
                         senders_sorted, recv_by_sender, w_by_sender,
                         num_segments, interpret):
    from kagnn_tpu.pallas.spmm import sorted_segment_sum

    d = x.shape[1]
    msgs = _edge_gather(x, senders)
    if edge_weight is not None:
        msgs = msgs * edge_weight[:, None]
    return sorted_segment_sum(msgs, receivers, num_segments,
                              interpret)[:, :d]


def _ns_fwd(x, senders, receivers, edge_weight, senders_perm, senders_sorted,
            recv_by_sender, w_by_sender, num_segments, interpret):
    out = _neighbor_sum_sorted(x, senders, receivers, edge_weight,
                               senders_perm, senders_sorted, recv_by_sender,
                               w_by_sender, num_segments, interpret)
    return out, (receivers, edge_weight, senders_perm, senders_sorted,
                 recv_by_sender, w_by_sender, x.shape[0])


def _ns_bwd(num_segments, interpret, res, cot):
    from kagnn_tpu.pallas.spmm import sorted_segment_sum

    (receivers, edge_weight, perm, senders_sorted, recv_by_sender,
     w_by_sender, n_rows) = res

    # dx = A^T @ cot: gather the cotangent rows at the receivers of the
    # SENDER-sorted edge copy, then one more sorted-segment-sum — no scatter,
    # no separate edge-cotangent permute. The permuted receiver view is a
    # host-side precompute when the batcher ships it (the TPU gather engine
    # is row-rate-bound, so the on-device (E,) permute costs ~ as much as a
    # wide gather — CALIBRATION.json "gather").
    if recv_by_sender is None:
        recv_by_sender = jnp.take(receivers, perm)
    d = cot.shape[1]
    cot_edges = _edge_gather(cot, recv_by_sender)
    if edge_weight is not None:
        w_p = (jnp.take(edge_weight, perm) if w_by_sender is None
               else w_by_sender.astype(edge_weight.dtype))
        cot_edges = cot_edges * w_p[:, None]
    dx = sorted_segment_sum(cot_edges, senders_sorted, n_rows,
                            interpret)[:, :d]
    return dx, None, None, None, None, None, None, None


_neighbor_sum_sorted.defvjp(_ns_fwd, _ns_bwd)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _neighbor_sum_attn(x, w, senders, receivers, senders_perm, senders_sorted,
                       recv_by_sender, num_segments, heads, interpret):
    e = senders.shape[0]
    msgs = jnp.take(x, senders, axis=0)
    msgs = (msgs.reshape(e, heads, -1) * w[:, :, None]).reshape(e, -1)
    from kagnn_tpu.pallas.spmm import sorted_segment_sum

    return sorted_segment_sum(msgs, receivers, num_segments, interpret)


def _nsa_fwd(x, w, senders, receivers, senders_perm, senders_sorted,
             recv_by_sender, num_segments, heads, interpret):
    out = _neighbor_sum_attn(x, w, senders, receivers, senders_perm,
                             senders_sorted, recv_by_sender, num_segments,
                             heads, interpret)
    return out, (x, w, senders, receivers, senders_perm, senders_sorted,
                 recv_by_sender)


def _nsa_bwd(num_segments, heads, interpret, res, cot):
    from kagnn_tpu.pallas.spmm import sorted_segment_sum

    x, w, senders, receivers, perm, senders_sorted, recv_by_sender = res
    e = senders.shape[0]
    # dw_e = <cot[recv_e], x[send_e]> per head: one sorted gather of the
    # cotangent (receivers ascending -> sequential-ish) + one random gather
    cot_recv = jnp.take(cot, receivers, axis=0, mode="clip")
    xs = jnp.take(x, senders, axis=0, mode="clip")
    dw = jnp.sum(cot_recv.reshape(e, heads, -1) * xs.reshape(e, heads, -1),
                 axis=2).astype(w.dtype)
    # dx = A^T(w) @ cot over the SENDER-sorted edge copy: gather + one more
    # sorted-segment-sum — no scatter anywhere in the gradient path
    if recv_by_sender is None:
        recv_by_sender = jnp.take(receivers, perm)
    cot_e = jnp.take(cot, recv_by_sender, axis=0)
    w_p = jnp.take(w, perm, axis=0)
    cot_e = (cot_e.reshape(e, heads, -1) * w_p[:, :, None]).reshape(e, -1)
    dx = sorted_segment_sum(cot_e, senders_sorted, x.shape[0], interpret)
    return dx.astype(x.dtype), dw, None, None, None, None, None


_neighbor_sum_attn.defvjp(_nsa_fwd, _nsa_bwd)


def neighbor_sum_attn(x: Array, g, edge_weight: Array) -> Array:
    """out_i = sum over edges e with receiver i of w_e[h] * x[sender_e]
    — the attention-weighted aggregation of GAT, differentiable in BOTH
    `x` (N, H*C) and `edge_weight` (E, H), with a scatter-free backward
    (dw via gathers; dx via the sender-sorted segment-sum kernel).

    Replaces PyG's propagate-with-attention scatter path (reference
    node_classification_clean/models.py:39-46 -> GATConv CUDA kernels).
    Falls back to gather + segment_sum (XLA AD) off-TPU.
    """
    heads = edge_weight.shape[1] if edge_weight.ndim == 2 else 1
    w2 = edge_weight if edge_weight.ndim == 2 else edge_weight[:, None]
    hs = halo_state()
    if hs is not None:
        # x is the EXTENDED table here (GATConv exchanges once for logits +
        # aggregation); aggregate locally into the node shard
        e = g.senders.shape[0]
        msgs = jnp.take(x, g.senders, axis=0)
        msgs = (msgs.reshape(e, heads, -1) * w2[:, :, None]).reshape(e, -1)
        return segment_sum(msgs, g.receivers, hs.n_local,
                           indices_are_sorted=True)
    eligible = (x.ndim == 2 and x.dtype in (jnp.float32, jnp.bfloat16)
                and _current_axis() is None
                and getattr(g, "senders_perm", None) is not None
                and g.senders_sorted is not None
                and x.shape[1] % heads == 0)
    spmm = _spmm_mode()
    if spmm is None:
        route = eligible and x.shape[1] >= 64 and _on_tpu()
        interpret = False
    else:
        route = eligible and bool(spmm[0])
        interpret = spmm[1]
    if route:
        return _neighbor_sum_attn(x, w2, g.senders, g.receivers,
                                  g.senders_perm, g.senders_sorted,
                                  getattr(g, "receivers_by_sender", None),
                                  g.n_node_pad, heads, interpret)
    e = g.senders.shape[0]
    msgs = jnp.take(x, g.senders, axis=0)
    msgs = (msgs.reshape(e, heads, -1) * w2[:, :, None]).reshape(e, -1)
    return segment_sum(msgs, g.receivers, g.n_node_pad,
                       indices_are_sorted=True)


def gat_attention(h: Array, asrc: Array, adst: Array, g,
                  negative_slope: float = 0.2,
                  att_src_matrix: Array | None = None) -> Array:
    """The full GAT attention block: per-edge logits leaky_relu(asrc[j] +
    adst[i]) -> per-destination softmax (with the implicit self-loop edge)
    -> attention-weighted aggregation + self term. h (N, H*C), asrc/adst
    (N, H); returns (N, H*C).

    On TPU with sorted-edge metadata this runs through the fully-fused
    Pallas attention kernel (pallas/gat_fused.py) — no segment-max, no
    scatter, per-edge weights never hit HBM, and a scatter-free custom VJP.
    Elsewhere it falls back to the segment_softmax + neighbor_sum_attn
    composition. Replaces PyG's `softmax` CUDA kernel + propagate (reference
    node_classification_clean/models.py:39-46; SURVEY.md §2.4 N3)."""
    heads = asrc.shape[1]
    hc = h.shape[1]
    eligible = (h.ndim == 2 and h.dtype in (jnp.float32, jnp.bfloat16)
                and _current_axis() is None and halo_state() is None
                and getattr(g, "senders_perm", None) is not None
                and g.senders_sorted is not None
                and hc % heads == 0 and (hc // heads) % 8 == 0)
    spmm = _spmm_mode()
    if spmm is None:
        route = eligible and _on_tpu()
        interpret = False
    else:
        route = eligible and bool(spmm[0])
        interpret = spmm[1]
    if route:
        from kagnn_tpu.pallas.gat_fused import gat_attention_fused

        return gat_attention_fused(h, asrc, adst, g, negative_slope,
                                   interpret,
                                   att_src_matrix=att_src_matrix)
    slope = negative_slope
    logits = (jnp.take(asrc, g.senders, axis=0)
              + jnp.take(adst, g.receivers, axis=0))
    logits = jnp.where(logits >= 0, logits, slope * logits)
    zs = asrc + adst
    self_logits = jnp.where(zs >= 0, zs, slope * zs)
    w_edge, w_self = segment_softmax(
        logits, g.receivers, g.n_node_pad, mask=g.edge_mask,
        indices_are_sorted=True, extra_logits=self_logits)
    out = neighbor_sum_attn(h, g, w_edge)
    n, c = h.shape[0], hc // heads
    out = (out.reshape(n, heads, c)
           + h.reshape(n, heads, c) * w_self[..., None])
    return out.reshape(n, hc)


def neighbor_sum(x: Array, g, edge_weight: Array | None = None,
                 w_by_sender: Array | None = None) -> Array:
    """out_i = sum over edges e with receiver i of w_e * x[sender_e] — the
    fused gather+aggregate (SpMM with A as the weighted adjacency).
    `w_by_sender` optionally supplies edge_weight pre-permuted into
    sender-sorted order (e.g. g.edge_mask_by_sender when edge_weight is the
    mask), sparing the backward an (E,) on-device permute-gather.

    On TPU with sorted-edge metadata this runs forward AND backward through
    the sorted-segment-sum kernel (backward re-expresses A^T @ cot over the
    sender-sorted edge copy), eliminating XLA's serialized scatter from the
    gradient path. `edge_weight` is treated as non-differentiable (GCN norms
    are functions of the masks only; attention weights must NOT use this op).
    Falls back to gather + segment_sum elsewhere.

    Under `halo_mode` (node-sharded shard_map), senders index the extended
    [local; halo] table: boundary rows are fetched with one all_to_all and,
    when the plan pre-split the edges, the internal segment-sum is issued
    independently of the collective so XLA can overlap them.
    """
    hs = halo_state()
    if hs is not None:
        return _halo_neighbor_sum(x, g, edge_weight, hs)
    eligible = (x.ndim == 2 and x.dtype in (jnp.float32, jnp.bfloat16)
                and _current_axis() is None
                and getattr(g, "senders_perm", None) is not None
                and g.senders_sorted is not None)
    spmm = _spmm_mode()
    if spmm is None:
        route = eligible and x.shape[1] >= 64 and _on_tpu()
        interpret = False
    else:
        route = eligible and bool(spmm[0])
        interpret = spmm[1]
    if route:
        w = None if edge_weight is None else jax.lax.stop_gradient(edge_weight)
        # w_by_sender: only the edge-MASK weighting has a precomputed view;
        # callers passing data-dependent weights fall back to the on-device
        # permute (attention weights must use neighbor_sum_attn anyway)
        wbs = w_by_sender if w is not None else None
        return _neighbor_sum_sorted(x, g.senders, g.receivers, w,
                                    g.senders_perm, g.senders_sorted,
                                    getattr(g, "receivers_by_sender", None),
                                    wbs, g.n_node_pad, interpret)
    msgs = jnp.take(x, g.senders, axis=0)
    if edge_weight is not None:
        msgs = msgs * edge_weight[:, None]
    return segment_sum(msgs, g.receivers, g.n_node_pad,
                       indices_are_sorted=True)


def _halo_neighbor_sum(x: Array, g, edge_weight: Array | None,
                       hs: HaloState) -> Array:
    """Node-sharded neighbor sum: all_to_all boundary rows + local
    segment-sums. With the pre-split plan the internal sum has no data
    dependency on the collective (comm/compute overlap)."""
    B = hs.n_local
    w = edge_weight if edge_weight is not None else g.edge_mask.astype(x.dtype)
    if hs.s_int is not None:
        w_int = jnp.take(w, hs.int_sel) * hs.int_mask.astype(w.dtype)
        msgs_int = jnp.take(x, hs.s_int, axis=0) * w_int[:, None]
        out = segment_sum(msgs_int, hs.r_int, B, indices_are_sorted=True)
        recv = halo_exchange(x)
        w_h = jnp.take(w, hs.halo_sel) * hs.halo_mask.astype(w.dtype)
        msgs_h = jnp.take(recv, hs.s_halo, axis=0) * w_h[:, None]
        return out + segment_sum(msgs_h, hs.r_halo, B,
                                 indices_are_sorted=True)
    ext = halo_extend(x)
    msgs = jnp.take(ext, g.senders, axis=0) * w[:, None]
    return segment_sum(msgs, g.receivers, B, indices_are_sorted=True)


def gcn_aggregate(hs: Array, g, dinv: Array) -> Array:
    """GCN epilogue `dinv ⊙ (A @ hs + hs)` — the transform→aggregate
    ordering's aggregation with the self-loop term and both norm scalings
    folded in (`hs` must already carry the sender-side norm, hs = h * dinv).

    On TPU with sorted-edge metadata this runs through the single-launch
    fused kernel (pallas/gcn_agg.py): aggregate + self term + dinv scale
    with no intermediate (N, D) tensors in HBM, and a scatter-free backward.
    Falls back to neighbor_sum + XLA epilogue elsewhere (including edge
    partitioning, where segment_sum carries the psum)."""
    dinv = jax.lax.stop_gradient(dinv)
    eligible = (hs.ndim == 2 and hs.dtype in (jnp.float32, jnp.bfloat16)
                and _current_axis() is None and halo_state() is None
                and getattr(g, "senders_perm", None) is not None
                and g.senders_sorted is not None)
    spmm = _spmm_mode()
    if spmm is None:
        route = eligible and hs.shape[1] >= 64 and _on_tpu()
        interpret = False
    else:
        route = eligible and bool(spmm[0])
        interpret = spmm[1]
    if route:
        from kagnn_tpu.pallas.gcn_agg import gcn_aggregate as _fused

        return _fused(hs, g, dinv, interpret)
    agg = neighbor_sum(hs, g)
    return (agg + hs) * dinv[:, None].astype(hs.dtype)


def gather(x: Array, indices: Array, sort_perm: Array | None = None,
           sorted_indices: Array | None = None) -> Array:
    """Row gather `x[indices]`.

    PRECONDITION: indices in [0, x.shape[0]) — the gather runs with
    mode="clip" (the default "fill" mode fuses a full-size out-of-bounds
    select onto every gather), so an out-of-range index silently reads the
    clamped last row. The framework batchers validate this at construction
    (graphs/batch.py); see the GraphBatch docstring.

    The TRANSPOSE of a gather is a scatter-add, which XLA serializes on TPU
    (~20ms at arxiv scale — as slow as the forward aggregation it pairs
    with). When the caller supplies a precomputed sort-by-index permutation
    (`indices[sort_perm] == sorted_indices`, ascending — the batchers build
    these), the backward is rewritten as permute-gather + the Pallas
    sorted-segment-sum kernel instead.
    """
    # Opt-in only (use_pallas_spmm(True)): at bench shapes the rewrite
    # (perm-gather of the cotangent + sorted-segment-sum) measured slightly
    # slower than XLA's scatter (100.7 vs 97.6 ms full fwd+bwd), because the
    # random cotangent permute costs about what the scatter saves. It wins
    # when scatter degrades further (very high skew / wider rows).
    spmm = _spmm_mode()
    if spmm is not None and spmm[0] and x.ndim == 2 \
            and x.dtype == jnp.float32 and _current_axis() is None \
            and halo_state() is None \
            and sort_perm is not None and sorted_indices is not None:
        return _sorted_bwd_gather(x, indices, sort_perm, sorted_indices,
                                  spmm[1])
    # mode="clip": indices are in-range by batcher invariant; the default
    # "fill" mode fuses a full-size out-of-bounds select onto the gather
    return jnp.take(x, indices, axis=0, mode="clip")


def sender_gather(x: Array, g) -> Array:
    """x[g.senders] — per-edge sender-feature gather. Under `halo_mode`,
    senders index the extended [local; halo] table, so the boundary rows are
    fetched with one all_to_all first."""
    if halo_state() is not None:
        return jnp.take(halo_extend(x), g.senders, axis=0, mode="clip")
    return gather(x, g.senders, getattr(g, "senders_perm", None),
                  getattr(g, "senders_sorted", None))
