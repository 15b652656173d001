"""Conv-layer semantic parity against independent dense/numpy references.

PyG is not installed here, so each conv's semantics (documented in SURVEY.md
§2.2: gcn_norm self-loop normalization, GAT per-destination edge softmax, GIN
(1+eps) sum aggregation, GINE ReLU(x_j + e) messages) is re-derived as a
straightforward dense-adjacency numpy implementation and compared against the
padded segment-op implementation.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kagnn_tpu.graphs import single_graph
from kagnn_tpu.nn.convs import GATConv, GCNConv, GINConv, GINEConv
from kagnn_tpu.nn.mlp import MLP


def random_graph(rng, n=11, e=30, f=6):
    snd = rng.integers(0, n, e).astype(np.int32)
    rcv = rng.integers(0, n, e).astype(np.int32)
    x = rng.normal(size=(n, f)).astype(np.float32)
    return snd, rcv, x


def dense_adj(snd, rcv, n):
    A = np.zeros((n, n), np.float32)
    for s, r in zip(snd, rcv):
        A[r, s] += 1.0  # A[i, j] = multiplicity of edge j->i
    return A


def test_gcn_parity(rng):
    snd, rcv, x = random_graph(rng)
    n = x.shape[0]
    g = single_graph(snd, rcv, nodes=x)
    conv = GCNConv(x.shape[1], 4)
    vs = conv.init(jax.random.key(0), g, g.nodes)
    out = np.asarray(conv.apply(vs, g, g.nodes))[:n]

    # dense reference: D^-1/2 (A + I) D^-1/2 @ (x W) + b
    W = np.asarray(vs["params"]["Dense_0"]["kernel"])
    b = np.asarray(vs["params"]["bias"])
    A = dense_adj(snd, rcv, n) + np.eye(n, dtype=np.float32)
    d = A.sum(1)
    Dinv = np.diag(1.0 / np.sqrt(d))
    want = Dinv @ A @ Dinv @ (x @ W) + b
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_gat_parity(rng):
    snd, rcv, x = random_graph(rng, n=9, e=25, f=5)
    n = x.shape[0]
    H, C = 3, 4
    g = single_graph(snd, rcv, nodes=x)
    conv = GATConv(x.shape[1], C, heads=H)
    vs = conv.init(jax.random.key(1), g, g.nodes)
    out = np.asarray(conv.apply(vs, g, g.nodes))[:n]

    W = np.asarray(vs["params"]["Dense_0"]["kernel"])
    a_src = np.asarray(vs["params"]["att_src"])[0]  # (H, C)
    a_dst = np.asarray(vs["params"]["att_dst"])[0]
    bias = np.asarray(vs["params"]["bias"])
    h = (x @ W).reshape(n, H, C)
    al_s = (h * a_src).sum(-1)  # (n, H)
    al_d = (h * a_dst).sum(-1)

    def lrelu(v):
        return np.where(v >= 0, v, 0.2 * v)

    want = np.zeros((n, H, C), np.float32)
    # edges + one self-loop per node, per-destination softmax
    for i in range(n):
        js = [snd[k] for k in range(len(snd)) if rcv[k] == i] + [i]
        logits = np.array([lrelu(al_s[j] + al_d[i]) for j in js])  # (deg, H)
        e = np.exp(logits - logits.max(0))
        alpha = e / e.sum(0)
        for w_, j in zip(alpha, js):
            want[i] += w_[:, None] * h[j]
    want = want.reshape(n, H * C) + bias
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


class _Identityish(MLP):
    pass


def test_gin_parity(rng):
    snd, rcv, x = random_graph(rng)
    n = x.shape[0]
    g = single_graph(snd, rcv, nodes=x)
    update = MLP(x.shape[1], 8, 4, 2, batch_norm=False)
    conv = GINConv(update)
    vs = conv.init(jax.random.key(2), g, g.nodes)
    out = np.asarray(conv.apply(vs, g, g.nodes))[:n]

    A = dense_adj(snd, rcv, n)
    z = x + A @ x  # (1+0)*x_i + sum_j x_j
    p = vs["params"]["update"]
    k0, b0 = np.asarray(p["TorchLinear_0"]["kernel"]), np.asarray(p["TorchLinear_0"]["bias"])
    k1, b1 = np.asarray(p["TorchLinear_1"]["kernel"]), np.asarray(p["TorchLinear_1"]["bias"])
    want = np.maximum(z @ k0 + b0, 0) @ k1 + b1
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_gine_parity(rng):
    snd, rcv, x = random_graph(rng, n=8, e=20, f=6)
    n, e = x.shape[0], len(snd)
    ea = rng.normal(size=(e, 6)).astype(np.float32)
    g = single_graph(snd, rcv, nodes=x, edges=ea)
    update = MLP(6, 8, 4, 2, batch_norm=False)
    conv = GINEConv(update)
    vs = conv.init(jax.random.key(3), g, g.nodes, g.edges)
    out = np.asarray(conv.apply(vs, g, g.nodes, g.edges))[:n]

    # NB: single_graph sorts edges by receiver; g.edges is permuted alongside
    agg = np.zeros_like(x)
    snd_s = np.asarray(g.senders)[:e]
    rcv_s = np.asarray(g.receivers)[:e]
    ea_s = np.asarray(g.edges)[:e]
    for k in range(e):
        agg[rcv_s[k]] += np.maximum(x[snd_s[k]] + ea_s[k], 0)
    z = x + agg
    p = vs["params"]["update"]
    k0, b0 = np.asarray(p["TorchLinear_0"]["kernel"]), np.asarray(p["TorchLinear_0"]["bias"])
    k1, b1 = np.asarray(p["TorchLinear_1"]["kernel"]), np.asarray(p["TorchLinear_1"]["bias"])
    want = np.maximum(z @ k0 + b0, 0) @ k1 + b1
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_padding_invariance(rng):
    """Results on valid nodes must not depend on pad sizes."""
    snd, rcv, x = random_graph(rng)
    n = x.shape[0]
    g1 = single_graph(snd, rcv, nodes=x, node_pad_multiple=8, edge_pad_multiple=32)
    g2 = single_graph(snd, rcv, nodes=x, node_pad_multiple=64, edge_pad_multiple=512)
    conv = GCNConv(x.shape[1], 4)
    vs = conv.init(jax.random.key(4), g1, g1.nodes)
    o1 = np.asarray(conv.apply(vs, g1, g1.nodes))[:n]
    o2 = np.asarray(conv.apply(vs, g2, g2.nodes))[:n]
    np.testing.assert_allclose(o1, o2, rtol=1e-5, atol=1e-6)
