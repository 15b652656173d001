"""Immutable, statically-padded graph containers and the block-diagonal
batcher.

This is the TPU-native replacement for PyG's `Data`/`Batch`/`DataLoader`
collation (reference graph_classification/graph_classification_utils.py:109-110,
SURVEY.md §2.4 N5). PyG produces a different shape per mini-batch; under XLA
that would recompile every step, so here every `GraphBatch` is padded to a
static (n_node_pad, n_edge_pad, n_graph_pad) bucket:

  * padded nodes/edges/graphs are appended at the end and flagged off by
    boolean masks;
  * all padded nodes belong to the final (padding) graph, jraph-style, so
    segment-based global pooling stays branch-free;
  * padded edges point at the last padded node and are masked out of every
    aggregation.

Edges are kept in COO (senders, receivers), sorted by receiver so downstream
`segment_sum` calls can claim `indices_are_sorted`.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GraphBatch:
    """A padded batch of graphs (possibly a single graph).

    Shapes (static): N = n_node_pad, E = n_edge_pad, G = n_graph_pad.

    INVARIANT (required by every consumer): `senders` and `receivers` are
    in-range — 0 <= idx < n_node_pad, with padded edges pointing at the
    masked last row (n_node_pad - 1). The hot gathers run with
    `mode="clip"` (ops/segment.gather), so an out-of-range index silently
    reads the clamped last row instead of failing. The framework batchers
    (`single_graph` / `batch_graphs` / the native assembler) establish and
    validate this; construct `GraphBatch` directly only with in-range
    indices.
    """

    # topology
    senders: Array  # (E,) int32 — source node of each directed edge
    receivers: Array  # (E,) int32 — destination node
    # features (any may be None)
    nodes: Optional[Array]  # (N, F) node features
    edges: Optional[Array]  # (E, Fe) edge features
    y: Optional[Array]  # (G, ...) graph targets or (N, ...) node targets
    # masks / segments
    node_mask: Array  # (N,) bool
    edge_mask: Array  # (E,) bool
    graph_mask: Array  # (G,) bool
    node_graph: Array  # (N,) int32 — graph id of each node
    # counts (dynamic scalars, traced)
    n_node: Array  # () int32 — number of valid nodes
    n_edge: Array  # () int32
    n_graph: Array  # () int32
    # sender-sort metadata (optional): senders[senders_perm] ==
    # senders_sorted, ascending. Lets the backward of neighbor gathers run
    # through the sorted-segment-sum kernel instead of an XLA scatter.
    senders_perm: Optional[Array] = None  # (E,) int32
    senders_sorted: Optional[Array] = None  # (E,) int32
    # valid in-edge counts per node (host-side bincount, free at assembly).
    # GCNConv's symmetric norm needs them; computing on device would be a
    # searchsorted over E = a 21-iteration binary-search while-loop costing
    # ~80 ms/step at arxiv scale (round-5 profile, while.47). Optional:
    # consumers fall back to the on-device computation when None.
    in_degrees: Optional[Array] = None  # (N,) int32
    # precomputed permuted views (host-side, free): receivers/edge_mask in
    # SENDER-sorted edge order. Consumed by the scatter-free backwards
    # (ops/segment._ns_bwd/_nsa_bwd, pallas gin_fused/gin_fastkan/gat_fused/
    # gcn_agg VJPs), which fall back to an on-device take when None;
    # computing them on device is an (E,) gather each (~ms at arxiv scale —
    # the TPU gather engine is row-rate-bound, see CALIBRATION.json), while
    # here they are a numpy fancy-index at batch-assembly time.
    receivers_by_sender: Optional[Array] = None  # (E,) int32
    edge_mask_by_sender: Optional[Array] = None  # (E,) bool

    # -- static helpers ----------------------------------------------------
    @property
    def n_node_pad(self) -> int:
        return self.node_mask.shape[0]

    @property
    def n_edge_pad(self) -> int:
        return self.edge_mask.shape[0]

    @property
    def n_graph_pad(self) -> int:
        return self.graph_mask.shape[0]

    def replace(self, **kw: Any) -> "GraphBatch":
        return dataclasses.replace(self, **kw)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def single_graph(
    senders: np.ndarray,
    receivers: np.ndarray,
    nodes: Optional[np.ndarray] = None,
    edges: Optional[np.ndarray] = None,
    y: Optional[np.ndarray] = None,
    n_node: Optional[int] = None,
    node_pad_multiple: int = 8,
    edge_pad_multiple: int = 128,
    sort_edges: bool = True,
) -> GraphBatch:
    """Wrap a single graph (e.g. a full-batch node-classification graph) into a
    padded `GraphBatch` with one valid graph."""
    senders = np.asarray(senders, np.int32)
    receivers = np.asarray(receivers, np.int32)
    if n_node is None:
        n_node = int(nodes.shape[0]) if nodes is not None else int(
            max(senders.max(initial=-1), receivers.max(initial=-1)) + 1)
    n_edge = int(senders.shape[0])
    if n_edge:
        # in-range precondition for the clip-mode gathers (GraphBatch
        # docstring): catch bad indices here, where the failure is loud,
        # not downstream where clip silently reads the last row
        if (int(senders.min()) < 0 or int(senders.max()) >= n_node
                or int(receivers.min()) < 0
                or int(receivers.max()) >= n_node):
            raise ValueError(
                f"edge indices out of range [0, {n_node}): senders in "
                f"[{senders.min()}, {senders.max()}], receivers in "
                f"[{receivers.min()}, {receivers.max()}]")
    n_pad = _round_up(max(n_node, 1) + 1, node_pad_multiple)
    e_pad = _round_up(max(n_edge, 1), edge_pad_multiple)

    if sort_edges and n_edge > 0:
        order = np.argsort(receivers, kind="stable")
        senders, receivers = senders[order], receivers[order]
        if edges is not None:
            edges = np.asarray(edges)[order]

    in_deg = np.bincount(receivers, minlength=n_pad).astype(np.int32)

    pad_e = e_pad - n_edge
    senders = np.concatenate([senders, np.full(pad_e, n_pad - 1, np.int32)])
    receivers = np.concatenate([receivers, np.full(pad_e, n_pad - 1, np.int32)])
    edge_mask = np.arange(e_pad) < n_edge

    node_mask = np.arange(n_pad) < n_node
    node_graph = np.where(node_mask, 0, 1).astype(np.int32)

    if nodes is not None:
        nodes = np.asarray(nodes)
        nodes = np.concatenate(
            [nodes, np.zeros((n_pad - nodes.shape[0],) + nodes.shape[1:], nodes.dtype)])
    if edges is not None:
        edges = np.asarray(edges)
        edges = np.concatenate(
            [edges, np.zeros((pad_e,) + edges.shape[1:], edges.dtype)])
    if y is not None:
        y = np.asarray(y)
        if y.ndim >= 1 and y.shape[0] == n_node:
            # node-level targets: pad alongside the nodes
            y = np.concatenate(
                [y, np.zeros((n_pad - n_node,) + y.shape[1:], y.dtype)])

    perm = np.argsort(senders, kind="stable").astype(np.int32)
    return GraphBatch(
        senders=jnp.asarray(senders),
        receivers=jnp.asarray(receivers),
        nodes=None if nodes is None else jnp.asarray(nodes),
        edges=None if edges is None else jnp.asarray(edges),
        y=None if y is None else jnp.asarray(y),
        node_mask=jnp.asarray(node_mask),
        edge_mask=jnp.asarray(edge_mask),
        graph_mask=jnp.asarray(np.array([True, False])),
        node_graph=jnp.asarray(node_graph),
        n_node=jnp.asarray(n_node, jnp.int32),
        n_edge=jnp.asarray(n_edge, jnp.int32),
        n_graph=jnp.asarray(1, jnp.int32),
        senders_perm=jnp.asarray(perm),
        senders_sorted=jnp.asarray(senders[perm]),
        receivers_by_sender=jnp.asarray(receivers[perm]),
        edge_mask_by_sender=jnp.asarray(edge_mask[perm]),
        in_degrees=jnp.asarray(in_deg),
    )


@dataclasses.dataclass(frozen=True)
class PadSpec:
    """Static pad sizes of a bucket. One PadSpec == one XLA compilation."""

    n_node: int
    n_edge: int
    n_graph: int


def pad_spec_for(
    graphs: Sequence[dict],
    batch_size: int,
    node_pad_multiple: int = 8,
    edge_pad_multiple: int = 128,
) -> PadSpec:
    """Compute a single PadSpec covering every `batch_size`-sized batch of
    `graphs` (list of dicts with 'senders'/'receivers'/'n_node')."""
    sizes_n = sorted((int(g["n_node"]) for g in graphs), reverse=True)
    sizes_e = sorted((len(g["senders"]) for g in graphs), reverse=True)
    worst_n = sum(sizes_n[:batch_size])
    worst_e = sum(sizes_e[:batch_size])
    return PadSpec(
        n_node=_round_up(worst_n + 1, node_pad_multiple),
        n_edge=_round_up(max(worst_e, 1), edge_pad_multiple),
        n_graph=batch_size + 1,
    )


def batch_graphs(
    graphs: Sequence[dict],
    spec: PadSpec,
    sort_edges: bool = True,
) -> GraphBatch:
    """Block-diagonally collate a list of graphs into one padded GraphBatch.

    Each graph dict carries numpy arrays: 'senders', 'receivers', 'n_node',
    and optionally 'nodes', 'edges', 'y'.
    """
    assert len(graphs) <= spec.n_graph - 1, "batch larger than PadSpec.n_graph-1"
    senders, receivers, node_feats, edge_feats, ys = [], [], [], [], []
    node_graph = []
    offset = 0
    for gid, g in enumerate(graphs):
        nn_ = int(g["n_node"])
        s = np.asarray(g["senders"], np.int32)
        r = np.asarray(g["receivers"], np.int32)
        if s.size and (int(s.min()) < 0 or int(s.max()) >= nn_
                       or int(r.min()) < 0 or int(r.max()) >= nn_):
            # in-range precondition for the clip-mode gathers (GraphBatch
            # docstring); an index >= this graph's n_node would silently
            # alias into the NEXT graph's rows after the offset shift
            raise ValueError(
                f"graph {gid}: edge indices out of range [0, {nn_})")
        senders.append(s + offset)
        receivers.append(r + offset)
        node_graph.append(np.full(nn_, gid, np.int32))
        if g.get("nodes") is not None:
            node_feats.append(np.asarray(g["nodes"]))
        if g.get("edges") is not None:
            edge_feats.append(np.asarray(g["edges"]))
        if g.get("y") is not None:
            ys.append(np.asarray(g["y"]).reshape(1, -1))
        offset += nn_

    n_node = offset
    senders = np.concatenate(senders) if senders else np.zeros(0, np.int32)
    receivers = np.concatenate(receivers) if receivers else np.zeros(0, np.int32)
    n_edge = senders.shape[0]
    assert n_node < spec.n_node and n_edge <= spec.n_edge, (
        f"batch ({n_node} nodes, {n_edge} edges) exceeds PadSpec {spec}")

    if sort_edges and n_edge > 0:
        order = np.argsort(receivers, kind="stable")
        senders, receivers = senders[order], receivers[order]
        if edge_feats:
            edge_feats = [np.concatenate(edge_feats)[order]]

    in_deg = np.bincount(receivers, minlength=spec.n_node).astype(np.int32)

    pad_e = spec.n_edge - n_edge
    senders = np.concatenate([senders, np.full(pad_e, spec.n_node - 1, np.int32)])
    receivers = np.concatenate([receivers, np.full(pad_e, spec.n_node - 1, np.int32)])
    edge_mask = np.arange(spec.n_edge) < n_edge
    node_mask = np.arange(spec.n_node) < n_node
    node_graph = np.concatenate(
        [np.concatenate(node_graph) if node_graph else np.zeros(0, np.int32),
         np.full(spec.n_node - n_node, spec.n_graph - 1, np.int32)])
    graph_mask = np.arange(spec.n_graph) < len(graphs)

    nodes = None
    if node_feats:
        nf = np.concatenate(node_feats)
        nodes = np.concatenate(
            [nf, np.zeros((spec.n_node - nf.shape[0],) + nf.shape[1:], nf.dtype)])
    edges = None
    if edge_feats:
        ef = np.concatenate(edge_feats) if len(edge_feats) > 1 else edge_feats[0]
        edges = np.concatenate(
            [ef, np.zeros((spec.n_edge - ef.shape[0],) + ef.shape[1:], ef.dtype)])
    y = None
    if ys:
        yv = np.concatenate(ys)
        pad_y = np.zeros((spec.n_graph - yv.shape[0],) + yv.shape[1:], yv.dtype)
        y = np.concatenate([yv, pad_y])
        if y.shape[-1] == 1:
            y = y[..., 0]

    perm = np.argsort(senders, kind="stable").astype(np.int32)
    return GraphBatch(
        senders=jnp.asarray(senders),
        receivers=jnp.asarray(receivers),
        nodes=None if nodes is None else jnp.asarray(nodes),
        edges=None if edges is None else jnp.asarray(edges),
        y=None if y is None else jnp.asarray(y),
        node_mask=jnp.asarray(node_mask),
        edge_mask=jnp.asarray(edge_mask),
        graph_mask=jnp.asarray(graph_mask),
        node_graph=jnp.asarray(node_graph),
        n_node=jnp.asarray(n_node, jnp.int32),
        n_edge=jnp.asarray(n_edge, jnp.int32),
        n_graph=jnp.asarray(len(graphs), jnp.int32),
        senders_perm=jnp.asarray(perm),
        senders_sorted=jnp.asarray(senders[perm]),
        receivers_by_sender=jnp.asarray(receivers[perm]),
        edge_mask_by_sender=jnp.asarray(edge_mask[perm]),
        in_degrees=jnp.asarray(in_deg),
    )
