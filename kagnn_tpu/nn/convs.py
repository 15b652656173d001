"""Graph convolution layers (flax.linen) over padded `GraphBatch`es.

TPU-native re-implementations of the PyG conv semantics the reference relies
on, with the feature transform factored out as a pluggable submodule — the
idiomatic version of the reference's "grafting" trick of overwriting
`conv.lin` with a KAN (reference node_classification_clean/models.py:31-92):

  * `GCNConv`  — x' = D^-1/2 (A+I) D^-1/2 · t(x) + b, self-loops folded in
                 analytically (no edge-list mutation). Matches PyG GCNConv
                 with add_self_loops=True, normalize=True.
  * `GATConv`  — per-edge attention, LeakyReLU(0.2), per-destination softmax,
                 implicit self-loops, concat heads. Matches PyG GATConv
                 defaults.
  * `GINConv`  — t((1+eps)·x_i + sum_j x_j), eps fixed at 0 (PyG default
                 train_eps=False).
  * `GINEConv` — messages ReLU(x_j + e_ij) then GIN update. Matches PyG
                 GINEConv.

A `transform` factory (in_features, out_features) -> nn.Module selects MLP /
Dense / KANLinear / FastKANLayer, giving the 4-conv x 3-architecture grid of
SURVEY.md §2.2-2.3.

Aggregations ride `kagnn_tpu.ops.segment` (sorted-by-receiver segment sums);
self-loop terms are computed in closed form so no self-edges are ever
materialized — fewer gathers, same math.
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from kagnn_tpu.graphs.batch import GraphBatch
from kagnn_tpu.kan.layers import FastKANLayer, KANLinear
from kagnn_tpu.ops import segment

Array = jax.Array
TransformFactory = Callable[[int, int], nn.Module]


def dense_transform(fin: int, fout: int, name: str | None = None) -> nn.Module:
    """Bias-free Dense with Glorot init — PyG's internal `Linear` for conv
    feature transforms."""
    return nn.Dense(fout, use_bias=False,
                    kernel_init=nn.initializers.glorot_uniform(), name=name)


def kan_transform(grid_size: int = 4, spline_order: int = 3,
                  fused: bool = False) -> TransformFactory:
    """The reference's `KANLayer` adapter (grid_size default 4,
    node_classification_clean/models.py:27-29)."""
    def make(fin: int, fout: int) -> nn.Module:
        return KANLinear(fin, fout, grid_size=grid_size,
                         spline_order=spline_order, fused=fused)
    return make


def fastkan_transform(num_grids: int = 4, fused: bool = False) -> TransformFactory:
    """The reference's `FKANLayer` adapter (models.py:58-66)."""
    def make(fin: int, fout: int) -> nn.Module:
        return FastKANLayer(fin, fout, num_grids=num_grids, fused=fused)
    return make


def _degree_with_self_loops(g: GraphBatch, dtype) -> Array:
    """d_i = 1 + #incoming valid edges.

    The framework batchers ship `in_degrees` (a free host-side bincount at
    assembly) — the on-device computation below is the fallback for
    directly-constructed batches. It looks vectorized, but XLA lowers
    searchsorted to a ~log2(E)-iteration binary-search while loop whose
    per-iteration (N,) gather is row-rate-bound: ~80 ms/step at arxiv
    scale (round-5 profile) for a data-independent quantity."""
    if g.in_degrees is not None:
        # in_degrees is always the GLOBAL count: the batchers compute it
        # over all valid edges, and the edge-partition mode replicates
        # node-space leaves across shards (dist/partition._specs_for), so
        # no collective is needed here.
        return g.in_degrees.astype(dtype) + 1.0
    bounds = jnp.searchsorted(
        g.receivers, jnp.arange(g.n_node_pad + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    deg = (bounds[1:] - bounds[:-1]).astype(dtype)
    ax = segment.current_edge_axis()
    if ax is not None:
        # edge-partitioned shard_map: each shard counts only its own edge
        # range (still receiver-sorted), so the global in-degree is the psum
        # — same collective the old masked segment_sum path carried
        # implicitly.
        deg = jax.lax.psum(deg, ax)
    return deg + 1.0


class GCNConv(nn.Module):
    """GCN layer; parity target: PyG GCNConv as used at reference
    node_classification_clean/models.py:113 / 31-37 (KAN-grafted)."""

    in_features: int
    out_features: int
    transform: Optional[TransformFactory] = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, g: GraphBatch, x: Array) -> Array:
        make = self.transform or dense_transform
        h = make(self.in_features, self.out_features)(x)
        dtype = h.dtype

        # the symmetric norm FACTORIZES: D^-1/2 A D^-1/2 h =
        # diag(dinv) . Agg . diag(dinv) h — scale h by dinv in NODE space,
        # aggregate unweighted, scale the result by dinv. This removes both
        # per-edge norm gathers (XLA row gathers cost ~10ns/row regardless
        # of width, so two narrow (E,) gathers cost as much as the wide
        # message gather). Padded edges point at the last padded row
        # (batcher invariant), so the unweighted aggregate only pollutes
        # that masked row.
        hs = segment.halo_state()
        if hs is not None:
            # node-sharded: degrees are data-independent, so the plan ships
            # D^-1/2 in extended [local; halo] index space — no exchange
            # here. Halo senders index the EXTENDED table; the halo
            # neighbor_sum applies per-edge weights, so keep the masked
            # edge-norm form there (boundary shards are small).
            dinv_sqrt = hs.dinv_ext.astype(dtype)
            dinv_local = dinv_sqrt[:hs.n_local]
            norm = dinv_sqrt[g.senders] * dinv_local[g.receivers]
            norm = jnp.where(g.edge_mask, norm, 0.0).astype(dtype)
            out = segment.neighbor_sum(h, g, edge_weight=norm)
            # implicit self-loop: weight d_i^-1
            out = out + h * (dinv_local * dinv_local)[:, None].astype(dtype)
        else:
            # fused path: out = dinv ⊙ (A @ hs + hs) with hs = h * dinv —
            # aggregate, self-loop term, and both norm scalings in one
            # kernel launch (pallas/gcn_agg.py on TPU; XLA epilogue
            # elsewhere, same factorized math)
            deg = _degree_with_self_loops(g, dtype)
            dinv_local = jax.lax.rsqrt(deg)
            hs_scaled = h * dinv_local[:, None].astype(dtype)
            out = segment.gcn_aggregate(hs_scaled, g, dinv_local)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.out_features,))
            out = out + bias
        return out


class GATConv(nn.Module):
    """Multi-head graph attention; parity target: PyG GATConv defaults
    (LeakyReLU slope 0.2, implicit self-loops, concat heads, bias) as grafted
    at reference node_classification_clean/models.py:39-46."""

    in_features: int
    out_features: int  # per-head
    heads: int = 1
    negative_slope: float = 0.2
    transform: Optional[TransformFactory] = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, g: GraphBatch, x: Array) -> Array:
        H, C = self.heads, self.out_features
        make = self.transform or dense_transform
        h = make(self.in_features, H * C)(x).reshape(-1, H, C)

        att_src = self.param("att_src", nn.initializers.glorot_uniform(),
                             (1, H, C))
        att_dst = self.param("att_dst", nn.initializers.glorot_uniform(),
                             (1, H, C))

        hs = segment.halo_state()
        if hs is not None:
            # node-sharded: ONE all_to_all fetches the boundary rows of h;
            # alpha_src for remote senders is re-derived from the extended
            # table (it is a function of h), so no second exchange is needed.
            # Edges are partitioned by destination block, so every edge of a
            # receiver is local and the softmax needs no collective.
            h_ext = segment.halo_extend(h.reshape(-1, H * C)).reshape(-1, H, C)
            alpha_src_ext = (h_ext * att_src).sum(-1)
            alpha_src = alpha_src_ext[:hs.n_local]
            alpha_dst = (h * att_dst).sum(-1)
            logits = alpha_src_ext[g.senders] + alpha_dst[g.receivers]
            logits = nn.leaky_relu(logits, self.negative_slope)
            self_logits = nn.leaky_relu(alpha_src + alpha_dst,
                                        self.negative_slope)
            w_edge, w_self = segment.segment_softmax(
                logits, g.receivers, hs.n_local,
                mask=g.edge_mask, indices_are_sorted=True,
                extra_logits=self_logits)
            out = segment.neighbor_sum_attn(
                h_ext.reshape(-1, H * C), g, w_edge)
            out = out.reshape(-1, H, C) + h * w_self[..., None]
            out = out.reshape(-1, H * C)
        else:
            # single-device / replicated: the whole attention block (logits,
            # self-loop softmax, weighted aggregation) routes through the
            # fused Pallas kernel on TPU — see ops/segment.gat_attention.
            # The block-diagonal expansion of att_src lets the kernel
            # recompute per-edge source logits from the message stream
            # (asrc == h_flat @ amat), killing the narrow logit gathers.
            # per-head logit reductions as bf16-input dots with f32
            # accumulation: `(h * att).sum(-1)` promotes h to a full f32
            # (N, H, C) intermediate (and its VJP transposes it for the
            # att-weight grad) — ~174 MB of f32 node-space traffic per
            # layer at arxiv scale (round-5 GAT profile: the 0.5 ms
            # {1,0}->{0,1} copies + multiply_convert fusions)
            amat = (att_src[0][:, :, None]
                    * jnp.eye(H, dtype=att_src.dtype)[:, None, :]
                    ).reshape(H * C, H)
            amat_dst = (att_dst[0][:, :, None]
                        * jnp.eye(H, dtype=att_dst.dtype)[:, None, :]
                        ).reshape(H * C, H)
            if h.dtype != jnp.float32:
                # round the logit matrices ONCE to the compute dtype so the
                # host alpha dots, the kernel's per-edge recomputation
                # (which casts amat to the message dtype) and the kernel's
                # f32 self-logit path all consume identical values — the
                # backward rematerializes self-loop weights from the host
                # asrc, so a fwd/bwd mismatch here would bias dz_self
                amat = amat.astype(h.dtype).astype(jnp.float32)
                amat_dst = amat_dst.astype(h.dtype).astype(jnp.float32)
            h_flat = h.reshape(-1, H * C)
            dnum = (((1,), (0,)), ((), ()))
            alpha_src = jax.lax.dot_general(
                h_flat, amat.astype(h.dtype), dnum,
                preferred_element_type=jnp.float32)  # (N, H)
            alpha_dst = jax.lax.dot_general(
                h_flat, amat_dst.astype(h.dtype), dnum,
                preferred_element_type=jnp.float32)
            out = segment.gat_attention(h_flat, alpha_src,
                                        alpha_dst, g, self.negative_slope,
                                        att_src_matrix=amat)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (H * C,))
            out = out + bias
        return out


class GINConv(nn.Module):
    """GIN layer: update((1+eps)·x_i + sum_{j in N(i)} x_j); eps=0 untrained
    (PyG default), as used at reference models.py:48-56 with a KAN update
    net."""

    update: nn.Module  # the epsilon-update network (MLP / KAN / FastKAN)
    eps: float = 0.0

    @nn.compact
    def __call__(self, g: GraphBatch, x: Array, train: bool = False) -> Array:
        from kagnn_tpu.kan.layers import KAN

        if isinstance(self.update, KAN):
            # aggregation fuses into the update net's first KANLinear
            # (one kernel launch on TPU when update.fused; the same
            # neighbor_sum otherwise — see KANLinear.__call__)
            return self.update(x, mask=g.node_mask, train=train,
                               gin_graph=(g, self.eps))
        mbs = getattr(g, "edge_mask_by_sender", None)
        agg = segment.neighbor_sum(
            x, g, edge_weight=g.edge_mask.astype(x.dtype),
            w_by_sender=None if mbs is None else mbs.astype(x.dtype))
        return self.update((1.0 + self.eps) * x + agg,
                           mask=g.node_mask, train=train)


class GINEConv(nn.Module):
    """GINE layer with edge features: messages ReLU(x_j + e_ij); parity
    target: PyG GINEConv as used at reference graph_regression/models.py:96-99."""

    update: nn.Module
    eps: float = 0.0

    @nn.compact
    def __call__(self, g: GraphBatch, x: Array, edge_attr: Array,
                 train: bool = False) -> Array:
        msgs = nn.relu(segment.sender_gather(x, g) + edge_attr)
        msgs = jnp.where(g.edge_mask[:, None], msgs, 0.0)
        hs = segment.halo_state()
        agg = segment.segment_sum(
            msgs, g.receivers, g.n_node_pad if hs is None else hs.n_local,
            indices_are_sorted=True)
        return self.update((1.0 + self.eps) * x + agg,
                           mask=g.node_mask, train=train)


def global_add_pool(g: GraphBatch, x: Array) -> Array:
    """Sum-pool node features per graph (reference
    graph_classification/models.py:43). Returns (n_graph_pad, F).

    Node->graph reduction: nodes are replicated under edge partitioning, so
    the edge-collective mode is suspended here."""
    x = jnp.where(g.node_mask[:, None], x, 0.0)
    with segment.edge_axis(None):
        return segment.segment_sum(x, g.node_graph, g.n_graph_pad,
                                   indices_are_sorted=True)


def global_mean_pool(g: GraphBatch, x: Array) -> Array:
    """Mean-pool node features per graph (reference models.py:65)."""
    with segment.edge_axis(None):
        return segment.segment_mean(x, g.node_graph, g.n_graph_pad,
                                    indices_are_sorted=True,
                                    mask=g.node_mask)
