"""In-training grid adaptation (VERDICT round-2 item 9): the reference's
`KAN.forward(update_grid=True)` training-time mode (ekan.py:270-275)
exposed as `update_grid=N` in the node training loop, generalized to every
KANLinear in a grafted model via sown 'kan_in' intermediates
(kan/adapt.adapt_model_grids)."""
import jax
import jax.numpy as jnp
import numpy as np

from kagnn_tpu.data.synthetic import community_node_graph
from kagnn_tpu.graphs import single_graph
from kagnn_tpu.kan.adapt import adapt_model_grids, update_kan_linear
from kagnn_tpu.models import NodeClassifier
from kagnn_tpu.train.experiments import train_node_total


def _setup(seed=3):
    d = community_node_graph(n_nodes=120, n_classes=3, num_features=8,
                             avg_degree=6, seed=seed)
    g = single_graph(d["senders"], d["receivers"], nodes=d["nodes"],
                     y=d["y"])
    return d, g


def test_adapt_model_grids_matches_per_layer_refit():
    """The first adapted layer's (grid, spline_weight) equal the direct
    update_kan_linear refit on that layer's captured input."""
    d, g = _setup()
    model = NodeClassifier(conv_type="gcn", architecture="kan", mp_layers=2,
                           num_features=8, hidden_channels=8, num_classes=3,
                           skip=False, grid_size=4, spline_order=3,
                           dropout=0.0)
    variables = model.init({"params": jax.random.key(0)}, g)

    # capture the first conv's KANLinear input directly
    _, mut = model.apply(variables, g, mutable=["intermediates"])

    def first_path(tree, prefix=()):
        if "kan_in" in tree:
            return prefix
        for k in sorted(tree):
            r = first_path(tree[k], prefix + (k,))
            if r is not None:
                return r
        return None

    path = first_path(mut["intermediates"])
    assert path is not None

    def get(tree, path):
        for k in path:
            tree = tree[k]
        return tree

    x = get(mut["intermediates"], path)["kan_in"][0]
    p = get(variables["params"], path)
    b = get(variables["buffers"], path)
    exp_p, exp_b = update_kan_linear(p, b, x, grid_size=4, spline_order=3)

    new_vars = adapt_model_grids(model, variables, g)
    got_p = get(new_vars["params"], path)
    got_b = get(new_vars["buffers"], path)
    np.testing.assert_allclose(np.asarray(got_b["grid"]),
                               np.asarray(exp_b["grid"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_p["spline_weight"]),
                               np.asarray(exp_p["spline_weight"]),
                               rtol=1e-4, atol=1e-5)
    # every KANLinear's grid was adapted (grids differ from init)
    flat_old = jax.tree_util.tree_leaves_with_path(variables["buffers"])
    flat_new = dict(jax.tree_util.tree_leaves_with_path(new_vars["buffers"]))
    changed = 0
    for k, v in flat_old:
        if not np.allclose(np.asarray(v), np.asarray(flat_new[k])):
            changed += 1
    assert changed >= 3  # 2 convs + head


def test_training_with_update_grid_still_learns():
    d, g = _setup()
    model = NodeClassifier(conv_type="gcn", architecture="kan", mp_layers=2,
                           num_features=8, hidden_channels=8, num_classes=3,
                           skip=False, grid_size=4, spline_order=3,
                           dropout=0.0)
    masks = d["masks"]

    def pad(m):
        return jnp.asarray(np.concatenate(
            [m, np.zeros(g.n_node_pad - m.shape[0], bool)]))

    cfg = {"lr": 5e-3, "epochs": 60, "patience": 60, "update_grid": 20}
    res = train_node_total(model, g, cfg, pad(masks["train"]),
                           pad(masks["val"]), pad(masks["test"]),
                           jax.random.key(0))
    assert np.isfinite(res["val_loss"])
    assert res["train_acc"] > 0.7, res