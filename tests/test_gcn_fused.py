"""Fused GCN aggregate kernel (pallas/gcn_agg.py): value and gradient parity
with the unfused composition, plus module-level wiring through GCNConv for
both KAN families (VERDICT round-3 item 3's interpret-mode grad-parity)."""
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


def test_gcn_aggregate_value_and_grads(rng):
    from kagnn_tpu.pallas.gcn_agg import gcn_aggregate

    f = 8
    g = _graph(rng, f=f)
    hs = jnp.asarray(rng.normal(size=(g.n_node_pad, f)), jnp.float32)
    dinv = jnp.asarray(rng.uniform(0.2, 1.0, g.n_node_pad), jnp.float32)

    def ref(hs):
        msgs = jnp.take(hs, g.senders, axis=0)
        agg = jax.ops.segment_sum(msgs, g.receivers,
                                  num_segments=g.n_node_pad)
        return (agg + hs) * dinv[:, None]

    def fused(hs):
        return gcn_aggregate(hs, g, dinv, interpret=True)

    np.testing.assert_allclose(np.asarray(fused(hs)), np.asarray(ref(hs)),
                               rtol=2e-4, atol=2e-4)

    def loss_of(fn):
        return lambda hs: jnp.sum(jnp.sin(fn(hs)))

    gr = jax.grad(loss_of(ref))(hs)
    gf = jax.grad(loss_of(fused))(hs)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=5e-3,
                               atol=5e-4)


@pytest.mark.parametrize("arch", ["kan", "fastkan"])
def test_gcnconv_fused_matches_fallback(rng, arch):
    """GCNConv routed through the fused kernel (interpret) must match the
    XLA fallback path in value AND parameter gradients."""
    from kagnn_tpu.nn.convs import GCNConv, fastkan_transform, kan_transform

    f_in, f_out = 8, 6
    g = _graph(rng, f=f_in)
    tf = (kan_transform(fused=True) if arch == "kan"
          else fastkan_transform(fused=True))
    conv = GCNConv(f_in, f_out, transform=tf)
    with segment.use_pallas_spmm(False):
        variables = conv.init({"params": jax.random.key(0)}, g, g.nodes)

    def run(pallas: bool):
        def fwd(params):
            ctx = (segment.use_pallas_spmm(True, interpret=True) if pallas
                   else segment.use_pallas_spmm(False))
            with ctx:
                return conv.apply(
                    {"params": params,
                     "buffers": variables.get("buffers", {})}, g, g.nodes)

        out = fwd(variables["params"])
        grads = jax.grad(
            lambda p: jnp.sum(jnp.sin(fwd(p))))(variables["params"])
        return out, grads

    out_f, grads_f = run(True)
    out_x, grads_x = run(False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               rtol=2e-4, atol=2e-4)
    flat_f = jax.tree_util.tree_leaves_with_path(grads_f)
    flat_x = dict(jax.tree_util.tree_leaves_with_path(grads_x))
    for path, leaf in flat_f:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_x[path]), rtol=5e-3,
            atol=1e-4, err_msg=jax.tree_util.keystr(path))
