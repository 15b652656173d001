"""Neighbor sampler: shape/static-pad invariants, semantics, and trainability
of a sampled-minibatch node classifier."""
import jax
import jax.numpy as jnp
import numpy as np

from kagnn_tpu.data.sampling import NeighborSampler
from kagnn_tpu.data.synthetic import community_node_graph


def test_static_shapes_and_seed_rows(rng):
    d = community_node_graph(n_nodes=300, seed=1)
    s = NeighborSampler(d["senders"], d["receivers"], 300, fanouts=[5, 3],
                        batch_size=8, seed=0)
    shapes = set()
    for _ in range(4):
        seeds = rng.choice(300, 8, replace=False)
        b = s.sample(seeds, d["nodes"], d["y"])
        shapes.add((b.n_node_pad, b.n_edge_pad))
        # first batch_size rows are exactly the seeds
        np.testing.assert_array_equal(np.asarray(b.y)[:8], d["y"][seeds])
        # every edge receiver is a valid node
        e = int(b.n_edge)
        assert np.asarray(b.receivers)[:e].max() < int(b.n_node)
    assert len(shapes) == 1  # static pads -> one XLA executable


def test_fanout_respected(rng):
    d = community_node_graph(n_nodes=200, avg_degree=20, seed=2)
    s = NeighborSampler(d["senders"], d["receivers"], 200, fanouts=[4],
                        batch_size=4, seed=0)
    seeds = np.array([0, 1, 2, 3])
    b = s.sample(seeds, d["nodes"], d["y"])
    rcv = np.asarray(b.receivers)[:int(b.n_edge)]
    for i in range(4):
        assert (rcv == i).sum() <= 4


def test_sampled_training_learns(rng):
    import optax

    from kagnn_tpu.models import NodeClassifier
    from kagnn_tpu.train import create_train_state, losses, make_node_steps

    d = community_node_graph(n_nodes=400, n_classes=2, num_features=8,
                            seed=3)
    s = NeighborSampler(d["senders"], d["receivers"], 400, fanouts=[8, 4],
                        batch_size=32, seed=0)
    model = NodeClassifier(conv_type="gcn", architecture="fastkan",
                           mp_layers=2, num_features=8, hidden_channels=16,
                           num_classes=2, skip=False, grid_size=4)
    tx = optax.adam(5e-3)
    train_nodes = np.flatnonzero(d["masks"]["train"])
    b0 = next(s.epoch(train_nodes, d["nodes"], d["y"]))
    state, _ = create_train_state(model, jax.random.key(0), b0, tx)
    train_step, evaluate = make_node_steps(model, tx)
    seed_mask = s.seed_mask()
    key = jax.random.key(1)
    last = None
    for epoch in range(6):
        for b in s.epoch(train_nodes, d["nodes"], d["y"]):
            key, sub = jax.random.split(key)
            state, last = train_step(state, b, seed_mask, sub)
    # eval on a fresh sampled batch of test nodes
    test_nodes = np.flatnonzero(d["masks"]["test"])[:32]
    b = s.sample(test_nodes, d["nodes"], d["y"])
    logits = evaluate(state, b)
    acc = float(losses.masked_accuracy(logits, b.y, seed_mask))
    assert acc > 0.8, acc
