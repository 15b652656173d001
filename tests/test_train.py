"""Training-loop tests: losses, early stopping, end-to-end learning."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from kagnn_tpu.data.synthetic import (community_node_graph,
                                      random_molecule_graphs)
from kagnn_tpu.graphs import batch_graphs, pad_spec_for, single_graph
from kagnn_tpu.models import GraphClassifier, NodeClassifier
from kagnn_tpu.train import losses
from kagnn_tpu.train.loops import (EarlyStopper, TrainState,
                                   create_train_state, make_graph_cls_steps,
                                   make_node_steps, train_graph_epochs)


def test_early_stopper_matches_reference_semantics():
    es = EarlyStopper(patience=2)
    assert es.early_stop(1.0) == (True, False)   # improvement -> save
    assert es.early_stop(1.5) == (False, False)  # worse, counter 1
    # counter reaches patience -> stop (reference utils.py:81-85)
    assert es.early_stop(1.4) == (False, True)
    es2 = EarlyStopper(patience=2)
    es2.early_stop(1.0)
    es2.early_stop(1.5)
    # improvement resets the counter
    assert es2.early_stop(0.5) == (True, False)
    assert es2.early_stop(0.9) == (False, False)


def test_masked_losses(rng):
    logits = jnp.asarray(rng.normal(size=(6, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, 6))
    mask = jnp.asarray([True, True, True, True, False, False])
    ce = losses.masked_softmax_cross_entropy(logits, labels, mask)
    want = float(optax.softmax_cross_entropy_with_integer_labels(
        logits[:4], labels[:4]).mean())
    np.testing.assert_allclose(float(ce), want, rtol=1e-6)

    lp = jax.nn.log_softmax(logits)
    nll = losses.masked_nll(lp, labels, mask)
    np.testing.assert_allclose(float(nll), want, rtol=1e-6)


def test_node_training_learns(rng):
    d = community_node_graph(n_nodes=120, n_classes=2, num_features=8, seed=3)
    g = single_graph(d["senders"], d["receivers"], nodes=d["nodes"], y=d["y"])
    model = NodeClassifier(conv_type="gcn", architecture="fastkan",
                           mp_layers=2, num_features=8, hidden_channels=16,
                           num_classes=2, grid_size=4)
    tx = optax.adam(1e-2)
    state, _ = create_train_state(model, jax.random.key(0), g, tx)
    train_step, evaluate = make_node_steps(model, tx)
    pad = g.n_node_pad - d["n_node"]
    mask = jnp.asarray(np.concatenate([d["masks"]["train"],
                                       np.zeros(pad, bool)]))
    key = jax.random.key(1)
    first = None
    for i in range(60):
        key, sub = jax.random.split(key)
        state, loss = train_step(state, g, mask, sub)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.1 * first, (first, float(loss))
    logits = evaluate(state, g)
    test_mask = jnp.asarray(np.concatenate([d["masks"]["test"],
                                            np.zeros(pad, bool)]))
    acc = float(losses.masked_accuracy(logits, g.y, test_mask))
    assert acc > 0.8, acc


def test_graph_classification_epoch_loop(rng):
    graphs = random_molecule_graphs(n_graphs=40, seed=5)
    for gr in graphs:
        onehot = np.zeros((gr["n_node"], 21), np.float32)
        onehot[np.arange(gr["n_node"]), gr["nodes"][:, 0]] = 1
        gr["nodes"] = onehot
        del gr["edges"]
    spec = pad_spec_for(graphs, 8)
    tr, va = graphs[:24], graphs[24:]

    def loader(gs):
        def it():
            for i in range(0, len(gs) - len(gs) % 8 or len(gs), 8):
                chunk = gs[i:i + 8]
                if chunk:
                    yield batch_graphs(chunk, spec)
        return it

    model = GraphClassifier(conv_type="gin", architecture="fastkan",
                            gnn_layers=2, num_features=21, hidden_dim=16,
                            num_classes=2, grid_size=4)
    tx = optax.adam(3e-3)
    ex = batch_graphs(tr[:8], spec)
    ex = ex.replace(y=ex.y.astype(jnp.int32))

    def intify(it):
        def run():
            for b in it():
                yield b.replace(y=b.y.astype(jnp.int32))
        return run

    state, _ = create_train_state(model, jax.random.key(0), ex, tx)
    train_step, evaluate = make_graph_cls_steps(model, tx)
    res = train_graph_epochs(state, train_step, evaluate,
                             intify(loader(tr)), intify(loader(va)),
                             epochs=12, patience=5, key=jax.random.key(2),
                             test_batches=intify(loader(va)))
    assert res["best_val_loss"] < 0.8
    assert res["test_metric"] is not None and res["test_metric"] >= 0.5


def test_node_multi_step_matches_sequential(rng):
    """make_node_multi_step (lax.scan epoch fusion) must produce exactly the
    same TrainState trajectory as n sequential make_node_steps calls when
    the per-step dropout keys match (here dropout=0, keys irrelevant)."""
    from kagnn_tpu.train.loops import make_node_multi_step

    d = community_node_graph(n_nodes=96, n_classes=2, num_features=8, seed=5)
    g = single_graph(d["senders"], d["receivers"], nodes=d["nodes"], y=d["y"])
    model = NodeClassifier(conv_type="gin", architecture="kan", mp_layers=2,
                           num_features=8, hidden_channels=12, num_classes=2,
                           grid_size=4, dropout=0.0)
    tx = optax.adam(5e-3)
    state, _ = create_train_state(model, jax.random.key(0), g, tx)
    pad = g.n_node_pad - d["n_node"]
    mask = jnp.asarray(np.concatenate([d["masks"]["train"],
                                       np.zeros(pad, bool)]))

    K = 7
    multi = make_node_multi_step(model, tx, K)
    s_scan, ls = multi(state, g, mask, jax.random.key(3))
    assert ls.shape == (K,)

    train_step, _ = make_node_steps(model, tx)
    s_seq = state
    seq_losses = []
    for i in range(K):
        s_seq, loss = train_step(s_seq, g, mask, jax.random.key(9))
        seq_losses.append(float(loss))

    np.testing.assert_allclose(np.asarray(ls), np.asarray(seq_losses),
                               rtol=2e-5, atol=2e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_scan.params),
                    jax.tree_util.tree_leaves(s_seq.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
