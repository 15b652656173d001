"""Batcher invariants: block-diagonal collation, masks, pooling segments."""
import numpy as np

from kagnn_tpu.graphs import PadSpec, batch_graphs, pad_spec_for, single_graph


def mk(rng, n, e, f=3):
    return dict(senders=rng.integers(0, n, e), receivers=rng.integers(0, n, e),
                n_node=n, nodes=rng.normal(size=(n, f)).astype(np.float32),
                y=np.array([1]))


def test_single_graph_masks(rng):
    g = single_graph(np.array([0, 1]), np.array([1, 2]),
                     nodes=np.ones((3, 2), np.float32))
    assert int(g.n_node) == 3 and int(g.n_edge) == 2
    assert g.node_mask.sum() == 3 and g.edge_mask.sum() == 2
    # padded edges point at the last padded node
    assert np.all(np.asarray(g.senders)[2:] == g.n_node_pad - 1)
    assert int(g.n_graph) == 1 and bool(g.graph_mask[0])


def test_batch_block_diagonal(rng):
    gs = [mk(rng, 5, 8), mk(rng, 7, 12), mk(rng, 4, 6)]
    spec = pad_spec_for(gs, 3)
    b = batch_graphs(gs, spec)
    assert int(b.n_node) == 16 and int(b.n_edge) == 26
    s = np.asarray(b.senders)[:26]
    r = np.asarray(b.receivers)[:26]
    ng = np.asarray(b.node_graph)
    # every edge stays within its own graph's node range
    assert np.all(ng[s] == ng[r])
    # node_graph is sorted (graphs laid out consecutively, pad last)
    assert np.all(np.diff(ng) >= 0)
    # receivers sorted for indices_are_sorted segment ops
    assert np.all(np.diff(r) >= 0)
    # y: one row per graph slot
    assert b.y.shape[0] == spec.n_graph


def test_pad_spec_covers_worst_case(rng):
    gs = [mk(rng, int(n), int(e)) for n, e in
          rng.integers(3, 20, size=(20, 2))]
    spec = pad_spec_for(gs, 4)
    # any batch of 4 must fit
    for i in range(0, 20, 4):
        b = batch_graphs(gs[i:i + 4], spec)
        assert b.n_node_pad == spec.n_node


def test_batch_features_roundtrip(rng):
    gs = [mk(rng, 5, 8), mk(rng, 6, 9)]
    spec = pad_spec_for(gs, 2)
    b = batch_graphs(gs, spec)
    nodes = np.asarray(b.nodes)
    np.testing.assert_array_equal(nodes[:5], gs[0]["nodes"])
    np.testing.assert_array_equal(nodes[5:11], gs[1]["nodes"])
    assert np.all(nodes[11:] == 0)
