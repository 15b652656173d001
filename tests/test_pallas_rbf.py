"""Fused RBF kernel vs the XLA reference path (interpret mode on CPU),
forward and gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kagnn_tpu.kan import rbf
from kagnn_tpu.pallas.rbf_fused import fastkan_fused, rbf_spline_matmul


def xla_ref(xs, spline_weight, gmin, gmax, G, h):
    grid = rbf.make_rbf_grid(gmin, gmax, G)
    basis = rbf.rbf_basis(xs, grid, h)
    return basis.reshape(xs.shape[0], -1) @ spline_weight.T


@pytest.mark.parametrize("n,d,o,g", [(100, 16, 8, 8), (256, 64, 64, 4),
                                     (37, 5, 3, 6)])
def test_forward_matches_xla(rng, n, d, o, g):
    xs = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(o, d * g)).astype(np.float32) * 0.1)
    h = 4.0 / (g - 1)
    want = xla_ref(xs, w, -2.0, 2.0, g, h)
    got = fastkan_fused(xs, w, -2.0, 2.0, g, h, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_gradients_match_xla(rng):
    n, d, o, g = 64, 8, 6, 5
    xs = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(o, d * g)).astype(np.float32) * 0.1)
    h = 4.0 / (g - 1)
    t = jnp.asarray(rng.normal(size=(n, o)).astype(np.float32))

    def loss_fused(xs, w):
        out = fastkan_fused(xs, w, -2.0, 2.0, g, h, interpret=True)
        return ((out - t) ** 2).sum()

    def loss_xla(xs, w):
        return ((xla_ref(xs, w, -2.0, 2.0, g, h) - t) ** 2).sum()

    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(xs, w)
    gx_x, gw_x = jax.grad(loss_xla, argnums=(0, 1))(xs, w)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_x), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_x), rtol=1e-4,
                               atol=1e-4)


def test_fused_layer_matches_unfused(rng):
    """FastKANLayer(fused=True) == FastKANLayer(fused=False) on CPU
    (interpret mode auto-selected off-TPU)."""
    from kagnn_tpu.kan.layers import FastKANLayer

    x = jnp.asarray(rng.normal(size=(40, 12)).astype(np.float32))
    m0 = FastKANLayer(12, 7, num_grids=6, fused=False)
    vs = m0.init(jax.random.key(0), x)
    m1 = FastKANLayer(12, 7, num_grids=6, fused=True)
    o0 = m0.apply(vs, x)
    o1 = m1.apply(vs, x)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0), rtol=1e-5,
                               atol=1e-5)


def unfused_layer_ref(x, vs, num_grids):
    """Plain-JAX FastKANLayer forward (fused=False path) for grad parity."""
    from kagnn_tpu.kan import rbf

    p = vs["params"]
    mu = x.mean(axis=1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=1, keepdims=True)
    xs = (x - mu) * jax.lax.rsqrt(var + 1e-5)
    xs = xs * p["layernorm"]["scale"] + p["layernorm"]["bias"]
    h = 4.0 / (num_grids - 1)
    grid = rbf.make_rbf_grid(-2.0, 2.0, num_grids)
    basis = rbf.rbf_basis(xs, grid, h)
    ret = basis.reshape(x.shape[0], -1) @ p["spline_weight"].T
    return ret + jax.nn.silu(x) @ p["base_weight"].T + p["base_bias"]


@pytest.mark.parametrize("n,d,o,g", [(100, 16, 8, 8), (256, 64, 64, 4),
                                     (37, 12, 3, 6)])
def test_layer_fused_forward(rng, n, d, o, g):
    """Fully-fused layer kernel (layernorm+RBF+GEMMs+bias) == unfused."""
    from kagnn_tpu.kan.layers import FastKANLayer

    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    m0 = FastKANLayer(d, o, num_grids=g, fused=False)
    vs = m0.init(jax.random.key(1), x)
    want = m0.apply(vs, x)
    got = FastKANLayer(d, o, num_grids=g, fused=True).apply(vs, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(want),
                               np.asarray(unfused_layer_ref(x, vs, g)),
                               rtol=2e-5, atol=2e-5)


def test_layer_fused_gradients(rng):
    from kagnn_tpu.kan.layers import FastKANLayer

    n, d, o, g = 70, 10, 6, 5
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(n, o)).astype(np.float32))
    m1 = FastKANLayer(d, o, num_grids=g, fused=True)
    vs = FastKANLayer(d, o, num_grids=g, fused=False).init(jax.random.key(2),
                                                           x)

    def loss_fused(vs, x):
        return ((m1.apply(vs, x) - t) ** 2).sum()

    def loss_ref(vs, x):
        return ((unfused_layer_ref(x, vs, g) - t) ** 2).sum()

    (gv_f, gx_f) = jax.grad(loss_fused, argnums=(0, 1))(vs, x)
    (gv_r, gx_r) = jax.grad(loss_ref, argnums=(0, 1))(vs, x)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), rtol=1e-4,
                               atol=1e-4)
    for k in ("spline_weight", "base_weight", "base_bias"):
        np.testing.assert_allclose(np.asarray(gv_f["params"][k]),
                                   np.asarray(gv_r["params"][k]),
                                   rtol=1e-4, atol=1e-4, err_msg=k)
    for k in ("scale", "bias"):
        np.testing.assert_allclose(
            np.asarray(gv_f["params"]["layernorm"][k]),
            np.asarray(gv_r["params"]["layernorm"][k]),
            rtol=1e-4, atol=1e-4, err_msg=f"layernorm/{k}")
