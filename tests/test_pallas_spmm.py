"""Sorted-segment-sum Pallas kernel vs jax.ops.segment_sum (interpret mode),
forward and backward, including empty segments and padded edges."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kagnn_tpu.pallas.spmm import sorted_segment_sum


def _case(rng, e, n, d, skew=False):
    if skew:
        recv = np.floor(n * rng.random(e) ** 3).astype(np.int32)
    else:
        recv = rng.integers(0, n, e).astype(np.int32)
    recv = np.sort(recv)
    msgs = rng.normal(size=(e, d)).astype(np.float32)
    return jnp.asarray(msgs), jnp.asarray(recv)


@pytest.mark.parametrize("e,n,d,skew", [
    (1000, 256, 16, False),
    (5000, 300, 64, True),      # power-law skew, non-multiple-of-128 rows
    (513, 129, 8, False),       # awkward sizes
])
def test_forward_matches_xla(rng, e, n, d, skew):
    msgs, recv = _case(rng, e, n, d, skew)
    want = jax.ops.segment_sum(msgs, recv, num_segments=n,
                               indices_are_sorted=True)
    got = sorted_segment_sum(msgs, recv, n, True)
    # bf16 hi/lo-split matmul: ~f32 fidelity, not bit-exact
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=5e-4)


def test_empty_segments_and_all_one_segment(rng):
    d = 8
    # every edge to segment 3 of 140
    msgs = jnp.asarray(rng.normal(size=(700, d)).astype(np.float32))
    recv = jnp.full((700,), 3, jnp.int32)
    got = sorted_segment_sum(msgs, recv, 140, True)
    want = jax.ops.segment_sum(msgs, recv, num_segments=140)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-4)


def test_backward_is_gather(rng):
    msgs, recv = _case(rng, 800, 200, 12)
    t = jnp.asarray(rng.normal(size=(200, 12)).astype(np.float32))

    def loss_p(m):
        return ((sorted_segment_sum(m, recv, 200, True) - t) ** 2).sum()

    def loss_x(m):
        return ((jax.ops.segment_sum(m, recv, num_segments=200) - t) ** 2
                ).sum()

    gp = jax.grad(loss_p)(msgs)
    gx = jax.grad(loss_x)(msgs)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), rtol=1e-4,
                               atol=1e-4)


def test_integrated_segment_sum_dispatch(rng):
    """ops.segment.segment_sum routes to the kernel when enabled."""
    from kagnn_tpu.ops import segment

    msgs, recv = _case(rng, 1200, 256, 16)
    want = segment.segment_sum(msgs, recv, 256, indices_are_sorted=True)
    with segment.use_pallas_spmm(True, interpret=True):
        got = segment.segment_sum(msgs, recv, 256, indices_are_sorted=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-4)


def test_neighbor_sum_routed_matches_fallback(rng):
    """Fused gather+aggregate: forward and gradient equal the XLA path."""
    from kagnn_tpu.graphs import single_graph
    from kagnn_tpu.ops import segment

    n, e, d = 50, 200, 8
    g = single_graph(rng.integers(0, n, e), rng.integers(0, n, e),
                     nodes=rng.normal(size=(n, d)).astype(np.float32))
    x = g.nodes
    w = jnp.asarray(rng.random(g.n_edge_pad).astype(np.float32))
    w = jnp.where(g.edge_mask, w, 0.0)

    def f_ref(x):
        msgs = jnp.take(x, g.senders, axis=0) * w[:, None]
        return jax.ops.segment_sum(msgs, g.receivers,
                                   num_segments=g.n_node_pad,
                                   indices_are_sorted=True)

    def f_routed(x):
        with segment.use_pallas_spmm(True, interpret=True):
            return segment.neighbor_sum(x, g, edge_weight=w)

    np.testing.assert_allclose(np.asarray(f_routed(x)),
                               np.asarray(f_ref(x)), rtol=1e-4, atol=5e-4)
    t = jnp.asarray(rng.normal(size=(g.n_node_pad, d)).astype(np.float32))
    g_routed = jax.grad(lambda x: ((f_routed(x) - t) ** 2).sum())(x)
    g_ref = jax.grad(lambda x: ((f_ref(x) - t) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g_routed), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-3)


def test_bf16_narrow_pack2_default_matches_xla(rng):
    """bf16 rows <=64 wide default to the PACK-2 lane-packed layout
    (round-5 device-time sweep); the packed kernel must match the dense
    reference within bf16 accumulation noise."""
    import jax.numpy as jnp

    from kagnn_tpu.pallas.spmm import sorted_segment_sum

    e, n, d = 4096, 512, 64
    recv = np.sort(rng.integers(0, n, e)).astype(np.int32)
    msgs = jnp.asarray(rng.normal(size=(e, d)).astype(np.float32)
                       ).astype(jnp.bfloat16)
    out = sorted_segment_sum(msgs, jnp.asarray(recv), n, True)
    assert out.shape == (n, d) and out.dtype == jnp.bfloat16
    want = jax.ops.segment_sum(msgs.astype(jnp.float32), jnp.asarray(recv),
                               num_segments=n)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(want),
                               rtol=2e-2, atol=2e-1)
    # gradient stays the plain gather
    f = lambda m: sorted_segment_sum(m, jnp.asarray(recv), n, True).astype(
        jnp.float32).sum()
    g = jax.grad(f)(msgs)
    np.testing.assert_allclose(np.asarray(g, np.float32), 1.0)
