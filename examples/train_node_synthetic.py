"""Minimal end-to-end example: train a KAGCN (FastKAN basis) on a synthetic
two-community node-classification graph, full batch.

    KAGNN_PLATFORM=cpu python examples/train_node_synthetic.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kagnn_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kagnn_tpu.data.synthetic import community_node_graph
from kagnn_tpu.graphs import single_graph
from kagnn_tpu.models import NodeClassifier
from kagnn_tpu.train import create_train_state, losses, make_node_steps


def main():
    d = community_node_graph(n_nodes=400, n_classes=4, num_features=16,
                             seed=0)
    g = single_graph(d["senders"], d["receivers"], nodes=d["nodes"],
                     y=d["y"])
    pad = g.n_node_pad - d["n_node"]

    def mask(name):
        return jnp.asarray(np.concatenate(
            [d["masks"][name], np.zeros(pad, bool)]))

    model = NodeClassifier(conv_type="gcn", architecture="fastkan",
                           mp_layers=2, num_features=16, hidden_channels=32,
                           num_classes=4, grid_size=6, dropout=0.1)
    tx = optax.adam(5e-3)
    state, _ = create_train_state(model, jax.random.key(0), g, tx)
    train_step, evaluate = make_node_steps(model, tx)

    key = jax.random.key(1)
    for epoch in range(100):
        key, sub = jax.random.split(key)
        state, loss = train_step(state, g, mask("train"), sub)
        if epoch % 20 == 0:
            logits = evaluate(state, g)
            acc = losses.masked_accuracy(logits, g.y, mask("val"))
            print(f"epoch {epoch:3d}  loss {float(loss):.4f}  "
                  f"val acc {float(acc):.3f}")

    logits = evaluate(state, g)
    print("test acc:",
          float(losses.masked_accuracy(logits, g.y, mask("test"))))


if __name__ == "__main__":
    main()
