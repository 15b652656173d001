"""Fused GIN-aggregate + FastKANLayer kernel (pallas/gin_fastkan.py): value
and gradient parity with the unfused composition, plus the module wiring
GINConv -> FastKAN -> FastKANLayer (reference GIFASTKAN,
node_classification_clean/models.py:85-92)."""
import jax
import jax.numpy as jnp
import numpy as np

from kagnn_tpu.graphs import single_graph
from kagnn_tpu.ops import segment


def _graph(rng, n=40, e=160, f=8):
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    nodes = rng.normal(size=(n, f)).astype(np.float32) * 0.5
    return single_graph(senders, receivers, nodes=nodes,
                        node_pad_multiple=8, edge_pad_multiple=128)


def test_gin_fastkan_fused_value_and_grads(rng):
    from kagnn_tpu.kan import rbf
    from kagnn_tpu.pallas.gin_fastkan import gin_fastkan_fused

    f_in, f_out, G = 8, 6, 5
    gmin, gmax = -2.0, 2.0
    denom = (gmax - gmin) / (G - 1)
    g = _graph(rng, f=f_in)
    x = jnp.asarray(rng.normal(size=(g.n_node_pad, f_in)), jnp.float32) * 0.5
    lng = jnp.asarray(rng.normal(size=(f_in,)), jnp.float32) * 0.2 + 1.0
    lnb = jnp.asarray(rng.normal(size=(f_in,)), jnp.float32) * 0.1
    sw = jnp.asarray(rng.normal(size=(f_out, f_in * G)), jnp.float32) * 0.3
    wb = jnp.asarray(rng.normal(size=(f_out, f_in)), jnp.float32) * 0.3
    bb = jnp.asarray(rng.normal(size=(f_out,)), jnp.float32) * 0.1
    eps = 0.25

    def ref(x, lng, lnb, sw, wb, bb):
        msgs = jnp.take(x, g.senders, axis=0) * g.edge_mask[:, None]
        agg = jax.ops.segment_sum(msgs, g.receivers,
                                  num_segments=g.n_node_pad)
        z = (1.0 + eps) * x + agg
        mu = jnp.mean(z, axis=1, keepdims=True)
        var = jnp.mean((z - mu) ** 2, axis=1, keepdims=True)
        xs = (z - mu) * jax.lax.rsqrt(var + 1e-5) * lng + lnb
        grid = rbf.make_rbf_grid(gmin, gmax, G)
        basis = rbf.rbf_basis(xs, grid, denom)  # (N, D, G)
        out = basis.reshape(z.shape[0], -1) @ sw.reshape(
            f_out, f_in, G).transpose(1, 2, 0).reshape(f_in * G, f_out)
        return out + jax.nn.silu(z) @ wb.T + bb

    def fused(x, lng, lnb, sw, wb, bb):
        return gin_fastkan_fused(x, g, eps, lng, lnb, sw, wb, bb, gmin,
                                 gmax, G, denom, interpret=True)

    out_r = ref(x, lng, lnb, sw, wb, bb)
    out_f = fused(x, lng, lnb, sw, wb, bb)
    # VALID rows only + masked test loss: conv outputs at masked rows are
    # unspecified by contract (the fused path skips the edge-mask multiply
    # because every framework consumer masks them — gin_fused._gin_kan)
    nm = np.asarray(g.node_mask)
    np.testing.assert_allclose(np.asarray(out_f)[nm], np.asarray(out_r)[nm],
                               rtol=2e-4, atol=2e-4)

    def loss_of(fn):
        def l(*args):
            o = fn(*args)
            return jnp.sum(jnp.where(g.node_mask[:, None],
                                     o * jnp.sin(o), 0.0))
        return l

    gr = jax.grad(loss_of(ref), argnums=tuple(range(6)))(
        x, lng, lnb, sw, wb, bb)
    gf = jax.grad(loss_of(fused), argnums=tuple(range(6)))(
        x, lng, lnb, sw, wb, bb)
    for a, b, name in zip(gf, gr, ("dx", "dlng", "dlnb", "dsw", "dwb",
                                   "dbb")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3,
                                   atol=5e-4, err_msg=name)


def test_ginconv_fastkan_fused_module_path(rng):
    """GINConv(update=FastKAN, fused) equals the unfused module forward and
    gradients."""
    from kagnn_tpu.kan.layers import FastKAN
    from kagnn_tpu.nn.convs import GINConv

    g = _graph(rng, f=8)
    x = jnp.asarray(rng.normal(size=(g.n_node_pad, 8)), jnp.float32) * 0.5

    def build(fused):
        return GINConv(FastKAN([8, 16, 6], num_grids=4, fused=fused))

    m_ref = build(False)
    vars_ref = m_ref.init({"params": jax.random.key(0)}, g, x)
    out_ref = m_ref.apply(vars_ref, g, x)
    with segment.use_pallas_spmm(True, interpret=True):
        m_f = build(True)
        out_f = m_f.apply(vars_ref, g, x)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_ref),
                               rtol=2e-4, atol=2e-4)

    def loss(m, variables):
        def l(params):
            v = dict(variables, params=params)
            o = m.apply(v, g, x)
            return jnp.sum(o * jnp.cos(o))
        return l

    gr = jax.grad(loss(m_ref, vars_ref))(vars_ref["params"])
    with segment.use_pallas_spmm(True, interpret=True):
        gf = jax.grad(loss(m_f, vars_ref))(vars_ref["params"])
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(gf)[0],
            jax.tree_util.tree_flatten_with_path(gr)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4,
                                   err_msg=jax.tree_util.keystr(pa))
