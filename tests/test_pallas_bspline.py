"""Fused B-spline kernel vs the XLA reference path (interpret mode on CPU),
forward and gradients, including non-uniform (update_grid-adapted) knots."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kagnn_tpu.kan import bspline
from kagnn_tpu.kan.layers import KANLinear
from kagnn_tpu.pallas.bspline_fused import kan_linear_fused


def xla_ref(x, grid, wb, ws_scaled, k):
    base = jax.nn.silu(x) @ wb.T
    bases = bspline.b_splines(x, grid, k)
    w = ws_scaled.reshape(ws_scaled.shape[0], -1)
    return base + bases.reshape(x.shape[0], -1) @ w.T


@pytest.mark.parametrize("n,d,o,G,k", [(64, 8, 6, 5, 3), (100, 16, 8, 4, 2),
                                       (33, 5, 3, 3, 1)])
def test_forward_matches_xla(rng, n, d, o, G, k):
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    grid = bspline.make_grid(d, G, k)
    wb = jnp.asarray(rng.normal(size=(o, d)).astype(np.float32) * 0.3)
    ws = jnp.asarray(rng.normal(size=(o, d, G + k)).astype(np.float32) * 0.1)
    want = xla_ref(x, grid, wb, ws, k)
    got = kan_linear_fused(x, grid, wb, ws, k, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-5)


def test_forward_nonuniform_grid(rng):
    n, d, o, G, k = 50, 4, 3, 5, 3
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    # jitter the knots per-feature (monotonic)
    g0 = np.asarray(bspline.make_grid(d, G, k))
    jit_ = rng.uniform(0.0, 0.15, g0.shape).cumsum(axis=1) * 0.05
    grid = jnp.asarray((g0 + jit_).astype(np.float32))
    wb = jnp.asarray(rng.normal(size=(o, d)).astype(np.float32) * 0.3)
    ws = jnp.asarray(rng.normal(size=(o, d, G + k)).astype(np.float32) * 0.1)
    want = xla_ref(x, grid, wb, ws, k)
    got = kan_linear_fused(x, grid, wb, ws, k, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-5)


def test_gradients_match_xla(rng):
    n, d, o, G, k = 48, 6, 5, 4, 3
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    grid = bspline.make_grid(d, G, k)
    wb = jnp.asarray(rng.normal(size=(o, d)).astype(np.float32) * 0.3)
    ws = jnp.asarray(rng.normal(size=(o, d, G + k)).astype(np.float32) * 0.1)
    t = jnp.asarray(rng.normal(size=(n, o)).astype(np.float32))

    def loss_f(x, wb, ws):
        out = kan_linear_fused(x, grid, wb, ws, k, interpret=True)
        return ((out - t) ** 2).sum()

    def loss_x(x, wb, ws):
        return ((xla_ref(x, grid, wb, ws, k) - t) ** 2).sum()

    gf = jax.grad(loss_f, argnums=(0, 1, 2))(x, wb, ws)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(x, wb, ws)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-4)


def test_fused_kanlinear_module_matches_unfused(rng):
    x = jnp.asarray(rng.normal(size=(30, 9)).astype(np.float32))
    m0 = KANLinear(9, 4, grid_size=5, spline_order=3, fused=False)
    vs = m0.init(jax.random.key(0), x)
    m1 = KANLinear(9, 4, grid_size=5, spline_order=3, fused=True)
    o0 = m0.apply(vs, x)
    o1 = m1.apply(vs, x)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0), rtol=1e-4,
                               atol=1e-5)
