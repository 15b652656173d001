"""Parity of the gather-minimal GAT backward kernels (pallas/gat_bwd.py,
interpret mode) against the XLA composition gradients."""
import jax
import jax.numpy as jnp
import numpy as np

from kagnn_tpu.graphs import single_graph
from kagnn_tpu.ops import segment
from kagnn_tpu.pallas.gat_bwd import gat_bwd_dadst, gat_bwd_sender
from kagnn_tpu.pallas.gat_fused import IMAX, _dleaky, _head_expand, _leaky

SLOPE = 0.2


def _graph(rng, n=300, e=1200, f=8):
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n - 40, e).astype(np.int32)
    nodes = rng.normal(size=(n, f)).astype(np.float32)
    return single_graph(senders, receivers, nodes=nodes,
                        node_pad_multiple=8, edge_pad_multiple=128)


def test_gat_bwd_kernels_match_xla_composition(rng):
    heads, c = 2, 32
    hc = heads * c
    g = _graph(rng)
    n = g.n_node_pad
    h = jnp.asarray(rng.normal(size=(n, hc)), jnp.float32)
    att = jnp.asarray(rng.normal(size=(heads, c)), jnp.float32) * 0.3
    amat = (att[:, :, None] * jnp.eye(heads)[:, None, :]).reshape(hc, heads)
    asrc = h @ amat
    adst = jnp.asarray(rng.normal(size=(n, heads)), jnp.float32)
    dout = jnp.asarray(rng.normal(size=(n, hc)), jnp.float32)

    # forward pieces (fused kernel, interpret) for alpha/out
    from kagnn_tpu.pallas.gat_fused import _gat_fwd_parts

    out, (msgs, alpha) = _gat_fwd_parts(
        h, asrc, adst, amat, g.senders, g.receivers, g.edge_mask, heads,
        SLOPE, True)

    # XLA reference edge-space backward quantities
    f32 = jnp.float32
    S = jnp.sum((dout * out).reshape(n, heads, c), axis=2)
    z = jnp.take(asrc, g.senders, axis=0) + jnp.take(adst, g.receivers,
                                                     axis=0)
    lg = jnp.where(g.edge_mask[:, None], _leaky(z, SLOPE), -1e30)
    w = jnp.exp(lg - jnp.take(alpha, g.receivers, axis=0))
    douted = jnp.take(dout, g.receivers, axis=0)
    # the saved msgs residual is lane-prepadded (gather_rows_padded)
    dw = jnp.sum((douted * msgs[:, :heads * c]).reshape(-1, heads, c),
                 axis=2)
    dl = w * (dw - jnp.take(S, g.receivers, axis=0))
    dz = dl * _dleaky(z, SLOPE)
    dadst_ref = jax.ops.segment_sum(dz, g.receivers, num_segments=n)
    dasrc_ref = jax.ops.segment_sum(dz, g.senders, num_segments=n)
    cot = _head_expand(w, c) * douted
    dh_ref = jax.ops.segment_sum(cot, g.senders, num_segments=n)

    # kernel 1: receiver-oriented dadst (zero gathers)
    recv_m = jnp.where(g.edge_mask, g.receivers, IMAX)
    dadst_k = gat_bwd_dadst(msgs, recv_m, dout, adst, alpha, S, amat,
                            heads, hc, SLOPE, interpret=True)
    np.testing.assert_allclose(np.asarray(dadst_k), np.asarray(dadst_ref),
                               rtol=3e-3, atol=3e-3)

    # kernel 2: sender-oriented dh + dasrc (one gather)
    def hilo(x):
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(f32)).astype(jnp.bfloat16)
        return hi.astype(f32), lo.astype(f32)

    ah, al = hilo(adst)
    lh, ll = hilo(alpha)
    sh, sl_ = hilo(S)
    NRW = jnp.concatenate([ah, al, lh, ll, sh, sl_], axis=1)
    rbs = jnp.take(g.receivers, g.senders_perm)
    # two column parts exercises the multi-stream (n_parts=2) kernel path
    t_parts = (jnp.take(dout[:, :32], rbs, axis=0),
               jnp.take(dout[:, 32:], rbs, axis=0))
    nrw_table = jnp.take(NRW, rbs, axis=0)
    snd_sorted_m = jnp.where(
        jnp.take(g.edge_mask, g.senders_perm), g.senders_sorted, IMAX)
    dh_k, dasrc_k = gat_bwd_sender(t_parts, nrw_table, snd_sorted_m, h,
                                   amat, heads, hc, SLOPE, interpret=True,
                                   part_widths=(32, 32))
    np.testing.assert_allclose(np.asarray(dasrc_k), np.asarray(dasrc_ref),
                               rtol=3e-3, atol=3e-3)
    np.testing.assert_allclose(np.asarray(dh_k), np.asarray(dh_ref),
                               rtol=3e-3, atol=3e-3)
