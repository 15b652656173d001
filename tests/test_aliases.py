"""Reference-named constructors must equal their compositional counterparts,
and the prefetch pipeline must preserve order and propagate errors."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kagnn_tpu.graphs import single_graph
from kagnn_tpu.kan.layers import KANLinear
from kagnn_tpu.nn import (GCNConv, KAGCNConv, kan_transform, make_kan,
                          make_mlp)


def test_kagcn_alias_equals_composition(rng):
    g = single_graph(rng.integers(0, 12, 40), rng.integers(0, 12, 40),
                     nodes=rng.normal(size=(12, 5)).astype(np.float32))
    a = KAGCNConv(5, 3, grid_size=4, spline_order=2)
    b = GCNConv(5, 3, transform=kan_transform(4, 2))
    vs = a.init(jax.random.key(7), g, g.nodes)
    oa = a.apply(vs, g, g.nodes)
    ob = b.apply(vs, g, g.nodes)
    np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))


def test_make_kan_structure(rng):
    m = make_kan(6, 8, 3, hidden_layers=3, grid_size=4, spline_order=2)
    vs = m.init(jax.random.key(0), jnp.zeros((2, 6)))
    # 3 layers: 6->8, 8->8, 8->3
    assert set(vs["params"]) == {"layers_0", "layers_1", "layers_2"}
    assert vs["params"]["layers_2"]["base_weight"].shape == (3, 8)


def test_prefetch_to_device(rng):
    from kagnn_tpu.train.prefetch import prefetch_to_device

    data = [jnp.full((4,), i) for i in range(10)]
    out = list(prefetch_to_device(iter(data), size=3))
    assert len(out) == 10
    for i, o in enumerate(out):
        assert int(o[0]) == i

    def gen():
        yield jnp.zeros(3)
        raise ValueError("boom")

    it = prefetch_to_device(gen(), size=2)
    next(it)
    with pytest.raises(ValueError, match="boom"):
        next(it)
