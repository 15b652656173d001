"""Structural guard for the round-5 gather-class design (GATHER_CLASS.json,
PERFORMANCE.md "Chip calibration"): the chip's fast gather path requires
rows <= 512 B, so NO node-table gather in the GAT forward+backward may
exceed that — the round-4 (E, 384)-lane bf16 t-table gather (768 B/row)
ran ~6x slower than its split form. This test walks the jaxpr of the full
GAT attention VJP and asserts every gather's table stays within the fast
class's byte budget."""
import jax
import jax.numpy as jnp
import numpy as np

from kagnn_tpu.graphs import single_graph
from kagnn_tpu.pallas.gat_fused import gat_attention_fused

FAST_CLASS_ROW_BYTES = 512


def _gather_tables(jaxpr, out):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "gather":
            out.append(eqn.invars[0].aval)
        for v in eqn.params.values():
            if hasattr(v, "jaxpr"):
                _gather_tables(v.jaxpr, out)
            if isinstance(v, (list, tuple)):
                for x in v:
                    if hasattr(x, "jaxpr"):
                        _gather_tables(x.jaxpr, out)
    return out


def test_gat_vjp_gathers_stay_in_fast_class(rng):
    n, e, H, C = 512, 4000, 4, 64
    hc = H * C
    g = single_graph(rng.integers(0, n, e).astype(np.int32),
                     rng.integers(0, n, e).astype(np.int32), n_node=n,
                     edge_pad_multiple=1024)
    h = jnp.asarray(rng.normal(size=(g.n_node_pad, hc)), jnp.bfloat16)
    amat = jnp.asarray(rng.normal(size=(hc, H)), jnp.float32)
    asrc = (h.astype(jnp.float32) @ amat)
    adst = jnp.asarray(rng.normal(size=(g.n_node_pad, H)), jnp.float32)

    def loss(h, asrc, adst):
        out = gat_attention_fused(h, asrc, adst, g, 0.2, True,
                                  att_src_matrix=amat)
        return out.astype(jnp.float32).sum()

    jx = jax.make_jaxpr(jax.grad(loss, argnums=(0, 1, 2)))(h, asrc, adst)
    tables = [t for t in _gather_tables(jx.jaxpr, [])
              if len(t.shape) == 2 and t.shape[0] >= g.n_node_pad]
    # fwd msgs (N, 256) bf16 + three 128-lane backward part/narrow gathers
    assert len(tables) >= 4, [t.shape for t in tables]
    for t in tables:
        row_bytes = t.shape[1] * t.dtype.itemsize
        assert row_bytes <= FAST_CLASS_ROW_BYTES, (
            f"gather table {t.shape} {t.dtype} = {row_bytes} B/row exceeds "
            f"the {FAST_CLASS_ROW_BYTES} B fast gather class "
            "(GATHER_CLASS.json; round-4 regression)")
