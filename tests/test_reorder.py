"""Graph reordering: permutation validity, model-output equivalence, and
bandwidth reduction on a community graph."""
import jax
import numpy as np

from kagnn_tpu.data.synthetic import community_node_graph
from kagnn_tpu.graphs import single_graph
from kagnn_tpu.graphs.reorder import bfs_order, degree_order, reorder_graph
from kagnn_tpu.models import NodeClassifier


def test_permutation_valid(rng):
    d = community_node_graph(n_nodes=150, seed=2)
    for fn in (bfs_order, degree_order):
        perm = fn(d["senders"], d["receivers"], 150)
        assert sorted(perm.tolist()) == list(range(150))


def test_reorder_reduces_bandwidth(rng):
    # community graph with shuffled ids: BFS ordering should cut the mean
    # |sender - receiver| id distance substantially
    d = community_node_graph(n_nodes=400, n_classes=8, avg_degree=10,
                             p_intra=0.95, seed=5)
    shuffle = rng.permutation(400)
    inv = np.empty(400, np.int64)
    inv[shuffle] = np.arange(400)
    d["senders"] = inv[d["senders"]].astype(np.int32)
    d["receivers"] = inv[d["receivers"]].astype(np.int32)
    d["nodes"] = d["nodes"][shuffle]
    d["y"] = d["y"][shuffle]
    d["masks"] = {k: v[shuffle] for k, v in d["masks"].items()}

    before = np.abs(d["senders"].astype(np.int64) - d["receivers"]).mean()
    r = reorder_graph(d)
    after = np.abs(r["senders"].astype(np.int64) - r["receivers"]).mean()
    assert after < 0.6 * before, (before, after)


def test_model_output_equivalent_under_reorder(rng):
    d = community_node_graph(n_nodes=60, n_classes=3, num_features=5, seed=7)
    r = reorder_graph(d)
    model = NodeClassifier(conv_type="gcn", architecture="fastkan",
                           mp_layers=2, num_features=5, hidden_channels=8,
                           num_classes=3, skip=False)
    g0 = single_graph(d["senders"], d["receivers"], nodes=d["nodes"],
                      y=d["y"])
    g1 = single_graph(r["senders"], r["receivers"], nodes=r["nodes"],
                      y=r["y"])
    vs = model.init(jax.random.key(0), g0)
    o0 = np.asarray(model.apply(vs, g0))[:60]
    o1 = np.asarray(model.apply(vs, g1))[:60]
    # per-node outputs must match up to the permutation
    np.testing.assert_allclose(o1, o0[r["reorder_perm"]], rtol=1e-4,
                               atol=1e-5)
