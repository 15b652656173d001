"""Parity tests for the fused GAT attention kernel (pallas/gat_fused.py,
interpret mode) against the unfused segment_softmax composition and a dense
numpy softmax reference.

Covers: implicit self-loops, isolated nodes (w_self == 1), masked padded
edges, lane-padding (H*C not a 128 multiple), multi-group graphs
(n > G_BLOCKS*128), and gradients w.r.t. h / asrc / adst.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kagnn_tpu.graphs import single_graph
from kagnn_tpu.ops import segment

SLOPE = 0.2


def _leaky(x):
    return np.where(x >= 0, x, SLOPE * x)


def _dense_reference(g, h, asrc, adst, heads):
    """Dense per-destination softmax over [incoming edges..., self]."""
    n, hc = h.shape
    c = hc // heads
    senders = np.asarray(g.senders)
    receivers = np.asarray(g.receivers)
    mask = np.asarray(g.edge_mask)
    out = np.zeros((n, hc), np.float64)
    h64 = np.asarray(h, np.float64).reshape(n, heads, c)
    asrc64 = np.asarray(asrc, np.float64)
    adst64 = np.asarray(adst, np.float64)
    for r in range(n):
        sel = np.where((receivers == r) & mask)[0]
        for hd in range(heads):
            logits = _leaky(asrc64[senders[sel], hd] + adst64[r, hd])
            self_l = _leaky(asrc64[r, hd] + adst64[r, hd])
            allg = np.concatenate([logits, [self_l]])
            w = np.exp(allg - allg.max())
            w /= w.sum()
            acc = (w[:-1, None] * h64[senders[sel], hd, :]).sum(0)
            acc += w[-1] * h64[r, hd, :]
            out[r, hd * c:(hd + 1) * c] = acc
    return out.astype(np.float32)


def _graph(rng, n, e, f=8):
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n // 2, e).astype(np.int32)  # isolated tail
    nodes = rng.normal(size=(n, f)).astype(np.float32)
    return single_graph(senders, receivers, nodes=nodes,
                        node_pad_multiple=8, edge_pad_multiple=128)


@pytest.mark.parametrize("heads,c", [(2, 8), (4, 64), (1, 32)])
def test_gat_attention_value_vs_dense(rng, heads, c):
    g = _graph(rng, n=60, e=200)
    n = g.n_node_pad
    h = jnp.asarray(rng.normal(size=(n, heads * c)), jnp.float32)
    asrc = jnp.asarray(rng.normal(size=(n, heads)), jnp.float32)
    adst = jnp.asarray(rng.normal(size=(n, heads)), jnp.float32)

    ref = _dense_reference(g, h, asrc, adst, heads)
    with segment.use_pallas_spmm(True, interpret=True):
        out = segment.gat_attention(h, asrc, adst, g, SLOPE)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)
    with segment.use_pallas_spmm(False):
        out_fb = segment.gat_attention(h, asrc, adst, g, SLOPE)
    np.testing.assert_allclose(np.asarray(out_fb), ref, rtol=1e-4, atol=1e-4)


def test_gat_attention_isolated_nodes_pass_self(rng):
    """Receivers with no incoming edges output exactly h (w_self == 1)."""
    heads, c = 2, 16
    g = _graph(rng, n=64, e=64)
    n = g.n_node_pad
    h = jnp.asarray(rng.normal(size=(n, heads * c)), jnp.float32)
    asrc = jnp.asarray(rng.normal(size=(n, heads)), jnp.float32)
    adst = jnp.asarray(rng.normal(size=(n, heads)), jnp.float32)
    recv = np.asarray(g.receivers)[np.asarray(g.edge_mask)]
    isolated = np.setdiff1d(np.arange(n), recv)
    assert isolated.size > 0
    with segment.use_pallas_spmm(True, interpret=True):
        out = segment.gat_attention(h, asrc, adst, g, SLOPE)
    np.testing.assert_allclose(np.asarray(out)[isolated],
                               np.asarray(h)[isolated], rtol=2e-3, atol=2e-3)


def test_gat_attention_multigroup_grads(rng):
    """n > G_BLOCKS*128 exercises several grid groups; grads for h, asrc,
    adst match the unfused composition."""
    heads, c = 2, 32
    g = _graph(rng, n=1100, e=4000)
    n = g.n_node_pad
    h = jnp.asarray(rng.normal(size=(n, heads * c)), jnp.float32)
    asrc = jnp.asarray(rng.normal(size=(n, heads)), jnp.float32)
    adst = jnp.asarray(rng.normal(size=(n, heads)), jnp.float32)

    def loss(h, asrc, adst):
        out = segment.gat_attention(h, asrc, adst, g, SLOPE)
        return jnp.sum(out * jnp.cos(out))

    with segment.use_pallas_spmm(False):
        l0, grads0 = jax.value_and_grad(loss, (0, 1, 2))(h, asrc, adst)
    with segment.use_pallas_spmm(True, interpret=True):
        l1, grads1 = jax.value_and_grad(loss, (0, 1, 2))(h, asrc, adst)
    np.testing.assert_allclose(float(l0), float(l1), rtol=2e-4)
    for a, b, name in zip(grads0, grads1, ("dh", "dasrc", "dadst")):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=3e-3, atol=3e-3, err_msg=name)


def test_gat_attention_bf16_path(rng):
    """bf16 messages run the single-matmul path and stay within bf16
    tolerance of the f32 fallback."""
    heads, c = 2, 32
    g = _graph(rng, n=80, e=300)
    n = g.n_node_pad
    h = jnp.asarray(rng.normal(size=(n, heads * c)), jnp.float32)
    asrc = jnp.asarray(rng.normal(size=(n, heads)), jnp.float32)
    adst = jnp.asarray(rng.normal(size=(n, heads)), jnp.float32)
    with segment.use_pallas_spmm(False):
        ref = segment.gat_attention(h, asrc, adst, g, SLOPE)
    with segment.use_pallas_spmm(True, interpret=True):
        out = segment.gat_attention(h.astype(jnp.bfloat16),
                                    asrc.astype(jnp.bfloat16),
                                    adst.astype(jnp.bfloat16), g, SLOPE)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=5e-2, atol=5e-2)


def test_gat_attention_large_logits_stable(rng):
    """Large-magnitude attention terms exercise the online-softmax shift,
    the bf16 rounding chain and the backward's clamped exp: values and
    grads must stay finite and match the fallback composition."""
    heads, c = 2, 32
    g = _graph(rng, n=80, e=300)
    n = g.n_node_pad
    h = jnp.asarray(rng.normal(size=(n, heads * c)), jnp.float32)
    asrc = jnp.asarray(rng.normal(size=(n, heads)) * 30.0, jnp.float32)
    adst = jnp.asarray(rng.normal(size=(n, heads)) * 30.0, jnp.float32)

    def loss(h, asrc, adst):
        out = segment.gat_attention(h, asrc, adst, g, SLOPE)
        return jnp.sum(out * jnp.cos(out))

    with segment.use_pallas_spmm(False):
        l0, g0 = jax.value_and_grad(loss, (0, 1, 2))(h, asrc, adst)
    with segment.use_pallas_spmm(True, interpret=True):
        l1, g1 = jax.value_and_grad(loss, (0, 1, 2))(h, asrc, adst)
    assert np.isfinite(float(l1))
    # bf16-rounded shifts move large logits by up to ~0.2 absolute, so the
    # comparison is loose — the check is stability + rough agreement
    np.testing.assert_allclose(float(l1), float(l0), rtol=2e-2)
    for a, b in zip(g1, g0):
        assert np.all(np.isfinite(np.asarray(a)))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-2,
                                   atol=5e-2)
