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
    return jnp.take(x, indices, axis=0)


def _sbg_fwd(x, indices, perm, sorted_indices, interpret):
    return jnp.take(x, indices, axis=0), (perm, sorted_indices, x.shape[0])


def _sbg_bwd(interpret, res, cot):
    perm, sorted_indices, n_rows = res
    from kagnn_tpu.pallas.spmm import sorted_segment_sum

    cot_sorted = jnp.take(cot, perm, axis=0)
    dx = sorted_segment_sum(cot_sorted, sorted_indices, n_rows, interpret)
    return dx, None, None, None


_sorted_bwd_gather.defvjp(_sbg_fwd, _sbg_bwd)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _neighbor_sum_sorted(x, senders, receivers, edge_weight, senders_perm,
                         senders_sorted, num_segments, interpret):
    from kagnn_tpu.pallas.spmm import sorted_segment_sum

    msgs = jnp.take(x, senders, axis=0)
    if edge_weight is not None:
        msgs = msgs * edge_weight[:, None]
    return sorted_segment_sum(msgs, receivers, num_segments, interpret)


def _ns_fwd(x, senders, receivers, edge_weight, senders_perm, senders_sorted,
            num_segments, interpret):
    out = _neighbor_sum_sorted(x, senders, receivers, edge_weight,
                               senders_perm, senders_sorted, num_segments,
                               interpret)
    return out, (receivers, edge_weight, senders_perm, senders_sorted,
                 x.shape[0])


def _ns_bwd(num_segments, interpret, res, cot):
    from kagnn_tpu.pallas.spmm import sorted_segment_sum

    receivers, edge_weight, perm, senders_sorted, n_rows = res
    # dx = A^T @ cot: gather the cotangent rows at the receivers of the
    # SENDER-sorted edge copy, then one more sorted-segment-sum — no scatter,
    # no separate edge-cotangent permute
    recv_sorted_by_sender = jnp.take(receivers, perm)
    cot_edges = jnp.take(cot, recv_sorted_by_sender, axis=0)
    if edge_weight is not None:
        cot_edges = cot_edges * jnp.take(edge_weight, perm)[:, None]
    dx = sorted_segment_sum(cot_edges, senders_sorted, n_rows, interpret)
    return dx, None, None, None, None, None


_neighbor_sum_sorted.defvjp(_ns_fwd, _ns_bwd)


def neighbor_sum(x: Array, g, edge_weight: Array | None = None) -> Array:
    """out_i = sum over edges e with receiver i of w_e * x[sender_e] — the
    fused gather+aggregate (SpMM with A as the weighted adjacency).

    On TPU with sorted-edge metadata this runs forward AND backward through
    the sorted-segment-sum kernel (backward re-expresses A^T @ cot over the
    sender-sorted edge copy), eliminating XLA's serialized scatter from the
    gradient path. `edge_weight` is treated as non-differentiable (GCN norms
    are functions of the masks only; attention weights must NOT use this op).
    Falls back to gather + segment_sum elsewhere.
    """
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
        return _neighbor_sum_sorted(x, g.senders, g.receivers, w,
                                    g.senders_perm, g.senders_sorted,
                                    g.n_node_pad, interpret)
    msgs = jnp.take(x, g.senders, axis=0)
    if edge_weight is not None:
        msgs = msgs * edge_weight[:, None]
    return segment_sum(msgs, g.receivers, g.n_node_pad,
                       indices_are_sorted=True)


def gather(x: Array, indices: Array, sort_perm: Array | None = None,
           sorted_indices: Array | None = None) -> Array:
    """Row gather `x[indices]`.

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
            and sort_perm is not None and sorted_indices is not None:
        return _sorted_bwd_gather(x, indices, sort_perm, sorted_indices,
                                  spmm[1])
    return jnp.take(x, indices, axis=0)
