"""Layered neighbor sampling for large-graph node classification.

The reference trains ogbn-arxiv full-batch on one GPU
(node_classification_clean/utils.py:125-132) and simply cannot scale past
one device's memory; SURVEY.md §2.4 N9 names neighbor sampling as the second
scaling lever this framework adds. This is the GraphSAGE-style sampler:
every mini-batch is the union of the seeds' sampled L-hop in-neighborhoods,
assembled as a standard padded `GraphBatch` whose pad sizes depend only on
(batch_size, fanouts) — so every batch of an epoch (and every epoch) reuses
ONE XLA executable, the property that makes sampling viable under jit.

Conventions:
  * the first `batch_size` rows of the batch are exactly the seed nodes, in
    the order given (`seed_mask()` selects them for losses/metrics);
  * edges point sender -> receiver like the rest of the framework; sampling
    walks *incoming* edges so messages flow toward the seeds;
  * receiver-sorted COO + sender-sort metadata, same as the batchers, so the
    fused aggregation kernels apply unchanged.
"""
from __future__ import annotations

from typing import Iterator, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from kagnn_tpu.graphs.batch import GraphBatch


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class NeighborSampler:
    """Sample fixed-fanout in-neighborhoods around seed nodes.

    fanouts[l] is the per-node fanout at hop l (hop 0 expands the seeds).
    Pad sizes are the worst case `batch_size * prod(fanouts[:l])` expansion,
    rounded to the framework's node/edge pad multiples — static across calls.
    """

    def __init__(self, senders, receivers, n_nodes: int,
                 fanouts: Sequence[int], batch_size: int, seed: int = 0,
                 node_pad_multiple: int = 8, edge_pad_multiple: int = 128):
        senders = np.asarray(senders, np.int32)
        receivers = np.asarray(receivers, np.int32)
        self.n_nodes = int(n_nodes)
        self.fanouts = [int(f) for f in fanouts]
        self.batch_size = int(batch_size)
        self._rng = np.random.default_rng(seed)

        # CSR over incoming edges: in_neighbors(v) = senders of edges into v
        order = np.argsort(receivers, kind="stable")
        self._in_nbrs = senders[order]
        self._indptr = np.zeros(self.n_nodes + 1, np.int64)
        np.add.at(self._indptr, receivers + 1, 1)
        np.cumsum(self._indptr, out=self._indptr)

        # static pads from the worst-case expansion
        max_nodes, max_edges, frontier = self.batch_size, 0, self.batch_size
        for f in self.fanouts:
            frontier *= f
            max_edges += frontier
            max_nodes += frontier
        self.n_node_pad = _round_up(max_nodes + 1, node_pad_multiple)
        self.n_edge_pad = _round_up(max(max_edges, 1), edge_pad_multiple)

    def seed_mask(self) -> jnp.ndarray:
        """Boolean (n_node_pad,) mask selecting the seed rows."""
        return jnp.asarray(np.arange(self.n_node_pad) < self.batch_size)

    def sample(self, seeds, node_feat: Optional[np.ndarray] = None,
               y: Optional[np.ndarray] = None) -> GraphBatch:
        """One mini-batch: seeds first, then hop-by-hop sampled neighbors."""
        seeds = np.asarray(seeds, np.int64)
        if seeds.shape[0] != self.batch_size:
            raise ValueError(
                f"got {seeds.shape[0]} seeds, sampler built for "
                f"batch_size={self.batch_size}")
        local = {int(v): i for i, v in enumerate(seeds)}
        node_ids = list(seeds)
        snd_l, rcv_l = [], []
        frontier = seeds
        for f in self.fanouts:
            nxt = []
            for v in frontier:
                lo, hi = self._indptr[v], self._indptr[v + 1]
                deg = int(hi - lo)
                if deg == 0:
                    continue
                if deg <= f:
                    picked = self._in_nbrs[lo:hi]
                else:
                    picked = self._in_nbrs[
                        lo + self._rng.choice(deg, f, replace=False)]
                rv = local[int(v)]
                for u in picked:
                    ui = local.get(int(u))
                    if ui is None:
                        ui = len(node_ids)
                        local[int(u)] = ui
                        node_ids.append(int(u))
                    snd_l.append(ui)
                    rcv_l.append(rv)
                nxt.append(picked)
            frontier = (np.unique(np.concatenate(nxt)) if nxt
                        else np.zeros(0, np.int64))

        n_node = len(node_ids)
        n_edge = len(snd_l)
        node_ids = np.asarray(node_ids, np.int64)
        snd = np.asarray(snd_l, np.int32)
        rcv = np.asarray(rcv_l, np.int32)
        if n_edge:
            order = np.argsort(rcv, kind="stable")
            snd, rcv = snd[order], rcv[order]
        pad_e = self.n_edge_pad - n_edge
        snd = np.concatenate(
            [snd, np.full(pad_e, self.n_node_pad - 1, np.int32)])
        rcv = np.concatenate(
            [rcv, np.full(pad_e, self.n_node_pad - 1, np.int32)])

        node_mask = np.arange(self.n_node_pad) < n_node
        node_graph = np.where(node_mask, 0, 1).astype(np.int32)

        nodes = None
        if node_feat is not None:
            nf = np.asarray(node_feat)[node_ids]
            nodes = np.concatenate(
                [nf, np.zeros((self.n_node_pad - n_node,) + nf.shape[1:],
                              nf.dtype)])
        yb = None
        if y is not None:
            yv = np.asarray(y)[node_ids]
            yb = np.concatenate(
                [yv, np.zeros((self.n_node_pad - n_node,) + yv.shape[1:],
                              yv.dtype)])

        perm = np.argsort(snd, kind="stable").astype(np.int32)
        return GraphBatch(
            senders=jnp.asarray(snd),
            receivers=jnp.asarray(rcv),
            nodes=None if nodes is None else jnp.asarray(nodes),
            edges=None,
            y=None if yb is None else jnp.asarray(yb),
            node_mask=jnp.asarray(node_mask),
            edge_mask=jnp.asarray(np.arange(self.n_edge_pad) < n_edge),
            graph_mask=jnp.asarray(np.array([True, False])),
            node_graph=jnp.asarray(node_graph),
            n_node=jnp.asarray(n_node, jnp.int32),
            n_edge=jnp.asarray(n_edge, jnp.int32),
            n_graph=jnp.asarray(1, jnp.int32),
            senders_perm=jnp.asarray(perm),
            senders_sorted=jnp.asarray(snd[perm]),
            receivers_by_sender=jnp.asarray(rcv[perm]),
            edge_mask_by_sender=jnp.asarray(
                (np.arange(self.n_edge_pad) < n_edge)[perm]),
            in_degrees=jnp.asarray(np.bincount(
                rcv[:n_edge], minlength=self.n_node_pad).astype(np.int32)),
        )

    def epoch(self, train_nodes, node_feat=None, y=None
              ) -> Iterator[GraphBatch]:
        """Shuffled full batches over `train_nodes` (remainder dropped —
        static shapes are worth more than the tail on TPUs)."""
        train_nodes = np.asarray(train_nodes, np.int64)
        perm = self._rng.permutation(train_nodes.shape[0])
        for lo in range(0, train_nodes.shape[0] - self.batch_size + 1,
                        self.batch_size):
            yield self.sample(train_nodes[perm[lo:lo + self.batch_size]],
                              node_feat, y)
