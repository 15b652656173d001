"""Multi-device tests on the virtual 8-device CPU mesh: the sharded train
step must (a) compile and execute under dp x edge-partition shardings and
(b) produce the same numbers as the equivalent single-device computation."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from kagnn_tpu.data.synthetic import random_molecule_graphs
from kagnn_tpu.dist.mesh import make_mesh
from kagnn_tpu.dist.sharded import (make_sharded_train_step,
                                    shard_stacked_batch, stack_batches)
from kagnn_tpu.graphs import batch_graphs, pad_spec_for
from kagnn_tpu.models import GraphClassifier
from kagnn_tpu.train import losses
from kagnn_tpu.train.loops import TrainState

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def _setup(dp):
    graphs = random_molecule_graphs(n_graphs=4 * dp, seed=1)
    spec = pad_spec_for(graphs, 4)
    batches = [batch_graphs(graphs[i * 4:(i + 1) * 4], spec)
               for i in range(dp)]

    def prep(gb):
        return gb.replace(nodes=jax.nn.one_hot(gb.nodes[:, 0], 21),
                          y=gb.y.astype(jnp.int32))

    batches = [prep(b) for b in batches]
    model = GraphClassifier(conv_type="gin", architecture="kan",
                            gnn_layers=2, num_features=21, hidden_dim=8,
                            num_classes=2, grid_size=3, spline_order=2)
    variables = model.init({"params": jax.random.key(0)}, batches[0])
    tx = optax.adam(1e-3)
    state = TrainState(params=variables["params"],
                       buffers=variables.get("buffers", {}),
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))
    return model, tx, state, batches


def loss_of_output(out, batch):
    return losses.masked_nll(out, batch.y.astype(jnp.int32), batch.graph_mask)


def test_sharded_step_runs_and_matches_single_device():
    dp, gp = 4, 2
    model, tx, state, batches = _setup(dp)
    mesh = make_mesh((dp, gp), ("data", "graph"),
                     devices=jax.devices()[:dp * gp])
    stacked = shard_stacked_batch(mesh, stack_batches(batches))
    step = make_sharded_train_step(model, tx, mesh, loss_of_output)
    keys = jax.random.split(jax.random.key(42), dp)
    new_state, loss = step(state, stacked, keys)
    assert jnp.isfinite(loss)
    assert int(new_state.step) == 1

    # single-device reference: mean loss/grads over the same batches
    def loss_fn(params):
        tot = 0.0
        for b, k in zip(batches, list(keys)):
            out, _ = model.apply(
                {"params": params, **({"buffers": state.buffers}
                                      if state.buffers else {}),
                 **({"batch_stats": state.batch_stats}
                    if state.batch_stats else {})},
                b, train=True, rngs={"dropout": k}, mutable=["batch_stats"])
            tot = tot + loss_of_output(out, b)
        return tot / len(batches)

    want_loss, want_grads = jax.value_and_grad(loss_fn)(state.params)
    np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-5)
    upd, _ = tx.update(want_grads, state.opt_state, state.params)
    want_params = optax.apply_updates(state.params, upd)
    got = jax.tree.leaves(new_state.params)
    want = jax.tree.leaves(want_params)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-6)


def test_mesh_shapes():
    mesh = make_mesh((2, 4), ("data", "graph"))
    assert mesh.shape == {"data": 2, "graph": 4}
    mesh1 = make_mesh(None, ("data",), devices=jax.devices()[:3])
    assert mesh1.shape == {"data": 3}
