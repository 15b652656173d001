"""Comm/compute overlap STRUCTURE of the halo partition (VERDICT round-3
item 4): the pre-split internal-edge aggregation must be data-INDEPENDENT
of the boundary all_to_all, so XLA is free to overlap them. Actual overlap
needs real ICI hardware (one chip here); what CAN be verified anywhere is
the dependency structure, at the jaxpr level: taint everything reachable
from the all_to_all outputs and check the internal segment reduction is
untainted while the halo-side reduction is tainted."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kagnn_tpu.data.synthetic import community_node_graph
from kagnn_tpu.dist.halo import (_local_graph_and_state, _stack_arrays,
                                 build_halo_plan)
from kagnn_tpu.graphs import single_graph
from kagnn_tpu.ops import segment

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")

REDUCE_PRIMS = {"scatter-add", "scatter_add", "segment_sum", "reduce_sum"}


def _taint_analysis(jaxpr):
    """Returns (tainted_varset, reduction_eqns) where taint flows forward
    from every all_to_all output through all equations (recursing into
    sub-jaxprs conservatively)."""
    tainted = set()
    reductions = []

    def run(jpr, env_tainted):
        local_tainted = set(env_tainted)
        for eqn in jpr.eqns:
            in_tainted = any(
                (not isinstance(v, jax.extend.core.Literal))
                and v in local_tainted for v in eqn.invars)
            name = eqn.primitive.name
            if name == "all_to_all":
                for v in eqn.outvars:
                    local_tainted.add(v)
                continue
            # recurse into call/closed jaxprs (param may be a Jaxpr, a
            # ClosedJaxpr, or a pytree-free object)
            for param in eqn.params.values():
                inner = (param if hasattr(param, "eqns")
                         else getattr(param, "jaxpr", None))
                if inner is not None and hasattr(inner, "eqns"):
                    sub_env = {
                        iv for iv, ov in zip(inner.invars, eqn.invars)
                        if (not isinstance(ov, jax.extend.core.Literal))
                        and ov in local_tainted}
                    sub_taint = run(inner, sub_env)
                    if sub_taint & set(inner.outvars) or in_tainted:
                        in_tainted = True
            if "scatter" in name or name == "segment_sum":
                reductions.append((eqn, in_tainted))
            if in_tainted:
                for v in eqn.outvars:
                    local_tainted.add(v)
        return local_tainted

    run(jaxpr, set())
    return reductions


def test_internal_aggregation_independent_of_all_to_all():
    d = community_node_graph(n_nodes=96, n_classes=3, num_features=6,
                             seed=5)
    g = single_graph(d["senders"], d["receivers"], nodes=d["nodes"],
                     y=d["y"], edge_pad_multiple=128)
    plan = build_halo_plan(g, 4)
    assert plan.s_int is not None, "plan must pre-split internal/halo edges"
    arrs = _stack_arrays(plan, g, np.asarray(g.node_mask))

    def body(loc):
        loc = {k: v[0] for k, v in loc.items()}
        g_loc, hs = _local_graph_and_state(plan, loc, "graph")
        with segment.halo_mode(hs):
            # force the XLA (split) path: neighbor_sum under halo_mode with
            # the pre-split plan issues the internal segment-sum from local
            # rows only, then the exchange + halo segment-sum
            return segment.neighbor_sum(loc["nodes"], g_loc)

    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("graph",))
    specs = {k: P("graph") for k in arrs}
    fn = shard_map(body, mesh=mesh, in_specs=(specs,), out_specs=P("graph"),
                   check_vma=False)
    jaxpr = jax.make_jaxpr(fn)(arrs)
    reductions = _taint_analysis(jaxpr.jaxpr)
    assert reductions, "expected segment reductions in the halo body"
    untainted = [e for e, t in reductions if not t]
    tainted = [e for e, t in reductions if t]
    # the INTERNAL aggregation must not depend on the collective...
    assert untainted, (
        "no segment reduction is independent of all_to_all — the "
        "internal-edge aggregation cannot overlap the exchange")
    # ...while the halo-side aggregation necessarily does
    assert tainted, "expected a halo-side reduction consuming the exchange"
