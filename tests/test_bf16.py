"""Mixed-precision (bf16 compute) path: close to f32 outputs, still learns."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from kagnn_tpu.data.synthetic import community_node_graph
from kagnn_tpu.graphs import single_graph
from kagnn_tpu.models import NodeClassifier
from kagnn_tpu.train import create_train_state, losses, make_node_steps


def _setup(conv, arch, cd):
    d = community_node_graph(n_nodes=120, n_classes=2, num_features=8,
                             seed=3)
    g = single_graph(d["senders"], d["receivers"], nodes=d["nodes"],
                     y=d["y"])
    model = NodeClassifier(conv_type=conv, architecture=arch, mp_layers=2,
                           num_features=8, hidden_channels=16, num_classes=2,
                           grid_size=4, skip=False, compute_dtype=cd)
    return d, g, model


def test_bf16_close_to_f32():
    for conv in ["gcn", "gin"]:
        for arch in ["kan", "fastkan"]:
            d, g, m32 = _setup(conv, arch, None)
            _, _, m16 = _setup(conv, arch, jnp.bfloat16)
            vs = m32.init(jax.random.key(0), g)
            o32 = np.asarray(m32.apply(vs, g))[: d["n_node"]]
            o16 = np.asarray(m16.apply(vs, g))[: d["n_node"]]
            assert o16.dtype == np.float32  # logits come back f32
            scale = np.abs(o32).mean() + 1e-6
            rel = np.abs(o16 - o32).mean() / scale
            assert rel < 0.1, (conv, arch, rel)


def test_bf16_graph_models_close_to_f32(rng):
    from kagnn_tpu.data.synthetic import random_molecule_graphs
    from kagnn_tpu.graphs import batch_graphs, pad_spec_for
    from kagnn_tpu.models import GraphClassifier, GraphRegressor

    graphs = random_molecule_graphs(n_graphs=8, seed=4)
    spec = pad_spec_for(graphs, 8)
    gb = batch_graphs(graphs, spec)

    m32 = GraphRegressor(conv_type="gin", architecture="kan", gnn_layers=2,
                         num_node_features=1, num_edge_features=1,
                         hidden_dim=8, grid_size=3, spline_order=2)
    m16 = GraphRegressor(conv_type="gin", architecture="kan", gnn_layers=2,
                         num_node_features=1, num_edge_features=1,
                         hidden_dim=8, grid_size=3, spline_order=2,
                         compute_dtype=jnp.bfloat16)
    vs = m32.init(jax.random.key(0), gb)
    o32 = np.asarray(m32.apply(vs, gb))
    o16 = np.asarray(m16.apply(vs, gb))
    assert o16.dtype == np.float32
    assert np.abs(o16 - o32).mean() / (np.abs(o32).mean() + 1e-6) < 0.1

    onehot = [dict(g, nodes=np.eye(21, dtype=np.float32)[g["nodes"][:, 0]])
              for g in graphs]
    for g in onehot:
        g.pop("edges")
    gb2 = batch_graphs(onehot, pad_spec_for(onehot, 8))
    gb2 = gb2.replace(y=gb2.y.astype(jnp.int32))
    c32 = GraphClassifier(conv_type="gin", architecture="fastkan",
                          gnn_layers=2, num_features=21, hidden_dim=8,
                          num_classes=2, grid_size=4)
    c16 = GraphClassifier(conv_type="gin", architecture="fastkan",
                          gnn_layers=2, num_features=21, hidden_dim=8,
                          num_classes=2, grid_size=4,
                          compute_dtype=jnp.bfloat16)
    vs = c32.init(jax.random.key(0), gb2)
    o32 = np.asarray(c32.apply(vs, gb2))
    o16 = np.asarray(c16.apply(vs, gb2))
    assert np.abs(np.exp(o16) - np.exp(o32)).max() < 0.1  # prob-scale close


def test_bf16_training_learns():
    d, g, model = _setup("gcn", "fastkan", jnp.bfloat16)
    tx = optax.adam(1e-2)
    state, _ = create_train_state(model, jax.random.key(0), g, tx)
    train_step, evaluate = make_node_steps(model, tx)
    pad = g.n_node_pad - d["n_node"]
    mask = jnp.asarray(np.concatenate([d["masks"]["train"],
                                       np.zeros(pad, bool)]))
    key = jax.random.key(1)
    first = None
    for _ in range(50):
        key, sub = jax.random.split(key)
        state, loss = train_step(state, g, mask, sub)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.2 * first
    # params remain f32 (mixed precision: f32 master weights)
    assert all(x.dtype == jnp.float32
               for x in jax.tree.leaves(state.params))
