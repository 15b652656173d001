"""Orbax checkpoint save/restore of full TrainState."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kagnn_tpu.data.synthetic import community_node_graph
from kagnn_tpu.graphs import single_graph
from kagnn_tpu.models import NodeClassifier
from kagnn_tpu.train import checkpoint, create_train_state, make_node_steps


def test_save_restore_roundtrip(rng):
    d = community_node_graph(n_nodes=40, num_features=4, seed=0)
    g = single_graph(d["senders"], d["receivers"], nodes=d["nodes"],
                     y=d["y"])
    model = NodeClassifier(conv_type="gcn", architecture="kan", mp_layers=1,
                           num_features=4, hidden_channels=4, num_classes=4,
                           grid_size=3, spline_order=2)
    tx = optax.adam(1e-3)
    state, _ = create_train_state(model, jax.random.key(0), g, tx)
    step, _ = make_node_steps(model, tx)
    state, _ = step(state, g, g.node_mask, jax.random.key(1))

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ckpt")
        checkpoint.save(path, state)
        template = jax.tree.map(jnp.zeros_like, state)
        restored = checkpoint.restore(path, template)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == 1
