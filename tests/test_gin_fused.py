"""Fused GIN-aggregate + KANLinear kernel (pallas/gin_fused.py): value and
gradient parity with the unfused composition, plus the module-level wiring
through GINConv -> KAN -> KANLinear."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kagnn_tpu.graphs import single_graph
from kagnn_tpu.ops import segment


def _graph(rng, n=40, e=160, f=8):
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    nodes = rng.normal(size=(n, f)).astype(np.float32) * 0.5
    return single_graph(senders, receivers, nodes=nodes,
                        node_pad_multiple=8, edge_pad_multiple=128)


def test_gin_kan_fused_value_and_grads(rng):
    from kagnn_tpu.kan import bspline
    from kagnn_tpu.pallas.gin_fused import gin_kan_fused

    f_in, f_out, gs, k = 8, 6, 4, 3
    g = _graph(rng, f=f_in)
    x = jnp.asarray(rng.normal(size=(g.n_node_pad, f_in)), jnp.float32) * 0.5
    grid = bspline.make_grid(f_in, gs, k, (-1.0, 1.0))
    wb = jnp.asarray(rng.normal(size=(f_out, f_in)), jnp.float32) * 0.3
    ws = jnp.asarray(rng.normal(size=(f_out, f_in, gs + k)), jnp.float32) * 0.3
    eps = 0.25

    def ref(x, wb, ws):
        msgs = jnp.take(x, g.senders, axis=0) * g.edge_mask[:, None]
        agg = jax.ops.segment_sum(msgs, g.receivers,
                                  num_segments=g.n_node_pad)
        z = (1.0 + eps) * x + agg
        base = jax.nn.silu(z) @ wb.T
        bases = bspline.b_splines(z, grid, k)
        return base + bases.reshape(z.shape[0], -1) @ ws.reshape(f_out, -1).T

    def fused(x, wb, ws):
        return gin_kan_fused(x, g, eps, grid, wb, ws, k, interpret=True)

    out_r = ref(x, wb, ws)
    out_f = fused(x, wb, ws)
    # VALID rows only + masked test loss — contract: conv outputs at
    # masked rows are unspecified (gin_fused._gin_kan docstring)
    nm = np.asarray(g.node_mask)
    np.testing.assert_allclose(np.asarray(out_f)[nm], np.asarray(out_r)[nm],
                               rtol=2e-4, atol=2e-4)

    def loss_of(fn):
        def l(x, wb, ws):
            o = fn(x, wb, ws)
            return jnp.sum(jnp.where(g.node_mask[:, None],
                                     o * jnp.sin(o), 0.0))
        return l

    gr = jax.grad(loss_of(ref), argnums=(0, 1, 2))(x, wb, ws)
    gf = jax.grad(loss_of(fused), argnums=(0, 1, 2))(x, wb, ws)
    for a, b, name in zip(gf, gr, ("dx", "dwb", "dws")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3,
                                   atol=5e-4, err_msg=name)


def test_ginconv_kan_fused_module_path(rng):
    """GINConv(update=KAN, fused) equals the unfused module forward."""
    import optax

    from kagnn_tpu.kan.layers import KAN
    from kagnn_tpu.nn.convs import GINConv

    g = _graph(rng, f=8)
    x = jnp.asarray(rng.normal(size=(g.n_node_pad, 8)), jnp.float32) * 0.5

    def build(fused):
        return GINConv(KAN([8, 16, 6], grid_size=4, spline_order=3,
                           fused=fused))

    m_ref = build(False)
    vars_ref = m_ref.init({"params": jax.random.key(0)}, g, x)
    out_ref = m_ref.apply(vars_ref, g, x)
    with segment.use_pallas_spmm(True, interpret=True):
        m_f = build(True)
        out_f = m_f.apply(vars_ref, g, x)
    # VALID rows only: conv outputs at masked rows are unspecified by
    # contract (the fused path skips the edge-mask multiply because every
    # framework consumer masks them — gin_fused._gin_kan docstring)
    nm = np.asarray(g.node_mask)
    np.testing.assert_allclose(np.asarray(out_f)[nm], np.asarray(out_ref)[nm],
                               rtol=2e-4, atol=2e-4)

    # gradient parity through the module; the loss masks, as every
    # framework loss does (same contract)
    def loss(m, variables):
        def l(params):
            v = dict(variables, params=params)
            o = m.apply(v, g, x)
            return jnp.sum(jnp.where(g.node_mask[:, None],
                                     o * jnp.cos(o), 0.0))
        return l

    gr = jax.grad(loss(m_ref, vars_ref))(vars_ref["params"])
    with segment.use_pallas_spmm(True, interpret=True):
        gf = jax.grad(loss(m_f, vars_ref))(vars_ref["params"])
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(gf)[0],
            jax.tree_util.tree_flatten_with_path(gr)[0]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4,
            err_msg=jax.tree_util.keystr(pa))


def test_gin_fused_halo_mode_falls_back(rng):
    """In halo mode the fusion must defer to the exchange-aware path (the
    halo tests assert numerical parity; here: no crash + finite output)."""
    # structural check only: fusable=False branch taken when halo state set
    from kagnn_tpu.kan.layers import KANLinear

    # halo_state() is None in this test context; assert the flag logic via
    # the public API instead: fused=False + gin_graph -> unfused aggregate
    g = _graph(rng, f=8)
    x = jnp.asarray(rng.normal(size=(g.n_node_pad, 8)), jnp.float32)
    layer = KANLinear(8, 4, grid_size=4, spline_order=3, fused=False)
    variables = layer.init({"params": jax.random.key(0)}, x)
    out = layer.apply(variables, x, gin_graph=(g, 0.0))
    assert np.isfinite(np.asarray(out)).all()
