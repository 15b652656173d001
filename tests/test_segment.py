"""Unit tests for segment ops against plain-numpy references."""
import jax.numpy as jnp
import numpy as np

from kagnn_tpu.ops import segment


def test_segment_sum(rng):
    data = rng.normal(size=(50, 4)).astype(np.float32)
    ids = rng.integers(0, 10, 50)
    out = segment.segment_sum(jnp.asarray(data), jnp.asarray(ids), 10)
    ref = np.zeros((10, 4), np.float32)
    for i, s in enumerate(ids):
        ref[s] += data[i]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_segment_mean_masked(rng):
    data = rng.normal(size=(30, 3)).astype(np.float32)
    ids = rng.integers(0, 5, 30)
    mask = rng.random(30) > 0.3
    out = segment.segment_mean(jnp.asarray(data), jnp.asarray(ids), 5,
                               mask=jnp.asarray(mask))
    ref = np.zeros((5, 3), np.float32)
    cnt = np.zeros(5, np.float32)
    for i, s in enumerate(ids):
        if mask[i]:
            ref[s] += data[i]
            cnt[s] += 1
    ref = ref / np.maximum(cnt, 1)[:, None]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_segment_softmax_masked(rng):
    logits = rng.normal(size=(40, 2)).astype(np.float32)
    ids = rng.integers(0, 8, 40)
    mask = rng.random(40) > 0.25
    w, _ = segment.segment_softmax(jnp.asarray(logits), jnp.asarray(ids), 8,
                                   mask=jnp.asarray(mask))
    w = np.asarray(w)
    # invalid edges get zero weight
    assert np.all(w[~mask] == 0)
    # per segment, weights of valid edges sum to 1 (where any exist)
    for s in range(8):
        sel = (ids == s) & mask
        if sel.any():
            np.testing.assert_allclose(w[sel].sum(0), np.ones(2), rtol=1e-5)


def test_segment_softmax_with_self_logit(rng):
    logits = rng.normal(size=(20,)).astype(np.float32)
    ids = rng.integers(0, 4, 20)
    mask = np.ones(20, bool)
    self_logits = rng.normal(size=(4,)).astype(np.float32)
    w_e, w_s = segment.segment_softmax(
        jnp.asarray(logits), jnp.asarray(ids), 4, mask=jnp.asarray(mask),
        extra_logits=jnp.asarray(self_logits))
    w_e, w_s = np.asarray(w_e), np.asarray(w_s)
    for s in range(4):
        sel = ids == s
        total = w_e[sel].sum() + w_s[s]
        np.testing.assert_allclose(total, 1.0, rtol=1e-5)
        # matches explicit softmax over [edges..., self]
        all_logits = np.concatenate([logits[sel], [self_logits[s]]])
        expect = np.exp(all_logits - all_logits.max())
        expect /= expect.sum()
        np.testing.assert_allclose(w_s[s], expect[-1], rtol=1e-4)


def _random_sorted_graph(rng, n=40, e=120):
    from kagnn_tpu.graphs import single_graph
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    nodes = rng.normal(size=(n, 8)).astype(np.float32)
    return single_graph(senders, receivers, nodes=nodes,
                        node_pad_multiple=8, edge_pad_multiple=128)


def test_neighbor_sum_attn_value_and_grads(rng):
    """Value + dx + dw parity of the scatter-free attention aggregation
    (fallback path and the Pallas-routed custom-VJP path, interpret mode)
    against plain XLA autodiff."""
    import jax

    g = _random_sorted_graph(rng)
    heads, c = 2, 64
    x = jnp.asarray(rng.normal(size=(g.n_node_pad, heads * c)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(g.n_edge_pad, heads)), jnp.float32)
    w = w * g.edge_mask[:, None]

    def ref_loss(x, w):
        e = g.senders.shape[0]
        msgs = jnp.take(x, g.senders, axis=0)
        msgs = (msgs.reshape(e, heads, -1) * w[:, :, None]).reshape(e, -1)
        out = jax.ops.segment_sum(msgs, g.receivers,
                                  num_segments=g.n_node_pad)
        return jnp.sum(out * jnp.cos(out)), out

    def attn_loss(x, w):
        out = segment.neighbor_sum_attn(x, g, w)
        return jnp.sum(out * jnp.cos(out)), out

    (lr, outr), (dxr, dwr) = jax.value_and_grad(ref_loss, (0, 1),
                                                has_aux=True)(x, w)
    for mode_kw in ({"enabled": False}, {"enabled": True, "interpret": True}):
        with segment.use_pallas_spmm(**mode_kw):
            (l2, out2), (dx2, dw2) = jax.value_and_grad(
                attn_loss, (0, 1), has_aux=True)(x, w)
        # hi/lo-split bf16 MXU passes carry ~1e-3-scale absolute error
        np.testing.assert_allclose(np.asarray(out2), np.asarray(outr),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(dx2), np.asarray(dxr),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(dw2), np.asarray(dwr),
                                   rtol=2e-3, atol=2e-3)


def test_gat_conv_grads_match_fallback(rng):
    """GATConv end-to-end gradients identical between the routed
    (interpret-mode kernel) and fallback aggregation paths."""
    import jax
    from kagnn_tpu.nn.convs import GATConv

    g = _random_sorted_graph(rng)
    model = GATConv(in_features=8, out_features=32, heads=2)
    params = model.init({"params": jax.random.key(0)}, g, g.nodes)

    def loss(p):
        return jnp.sum(jnp.tanh(model.apply(p, g, g.nodes)))

    with segment.use_pallas_spmm(False):
        l0, g0 = jax.value_and_grad(loss)(params)
    with segment.use_pallas_spmm(True, interpret=True):
        l1, g1 = jax.value_and_grad(loss)(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)
