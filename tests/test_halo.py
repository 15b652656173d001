"""Halo-exchange node partition (dist/halo.py): the node-sharded,
boundary-only-communication training path must reproduce the single-device
computation, with comm volume proportional to boundary nodes (SURVEY.md
§2.4 N9, VERDICT round-1 item 3)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh

from kagnn_tpu.data.synthetic import community_node_graph
from kagnn_tpu.dist.halo import build_halo_plan, make_halo_node_step
from kagnn_tpu.graphs import single_graph
from kagnn_tpu.models import NodeClassifier
from kagnn_tpu.ops import segment
from kagnn_tpu.train import create_train_state
from kagnn_tpu.train import losses as L

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def _graph(n=96, seed=5):
    d = community_node_graph(n_nodes=n, n_classes=3, num_features=6,
                             seed=seed)
    return single_graph(d["senders"], d["receivers"], nodes=d["nodes"],
                        y=d["y"], edge_pad_multiple=128)


def test_plan_reconstructs_aggregation(rng):
    """neighbor_sum through the plan's shard/exchange bookkeeping (numpy
    replay, no mesh) equals the global segment-sum."""
    g = _graph(80, seed=7)
    D = 4
    plan = build_halo_plan(g, D, block_multiple=8)
    x = rng.normal(size=(plan.n_total, 5)).astype(np.float32)
    s = np.asarray(g.senders)[np.asarray(g.edge_mask)]
    r = np.asarray(g.receivers)[np.asarray(g.edge_mask)]
    want = np.zeros((plan.n_total, 5), np.float32)
    np.add.at(want, r, x[s])

    B, H = plan.block, plan.halo
    for d in range(D):
        # recv_flat replay: what each peer p sends to d
        recv = np.zeros((D * H, 5), np.float32)
        for p in range(D):
            rows = plan.send_idx[p, d][plan.send_mask[p, d]]
            recv[p * H:p * H + rows.size] = x[p * B + rows]
        ext = np.concatenate([x[d * B:(d + 1) * B], recv])
        got = np.zeros((B, 5), np.float32)
        em = plan.edge_mask[d]
        np.add.at(got, plan.receivers[d][em], ext[plan.senders[d][em]])
        np.testing.assert_allclose(got, want[d * B:(d + 1) * B], rtol=1e-5,
                                   atol=1e-5)
        # the internal/halo split covers exactly the same edges
        got2 = np.zeros((B, 5), np.float32)
        im = plan.int_mask[d]
        np.add.at(got2, plan.r_int[d][im], ext[plan.s_int[d][im]])
        hm = plan.halo_mask[d]
        np.add.at(got2, plan.r_halo[d][hm], recv[plan.s_halo[d][hm]])
        np.testing.assert_allclose(got2, got, rtol=1e-5, atol=1e-5)


def test_comm_volume_tracks_boundary():
    """Comm volume is proportional to boundary rows, NOT to N (the failure
    mode of the allreduce edge partition this replaces). Uses a graph with
    block locality — 4 node clusters with a handful of cross-cluster edges
    (what graphs/reorder.py produces at scale)."""
    rng = np.random.default_rng(0)
    n_per, D = 80, 4
    sizes = [n_per, n_per, n_per, n_per - 10]  # last cluster absorbs padding
    snd, rcv = [], []
    for c in range(D):
        base = c * n_per
        a = rng.integers(base, base + sizes[c], 300)
        b = rng.integers(base, base + sizes[c], 300)
        snd += list(a) + list(b)
        rcv += list(b) + list(a)
    for c in range(D - 1):  # 6 boundary nodes per adjacent-cluster pair
        a = rng.integers(c * n_per, c * n_per + 6, 6)
        b = rng.integers((c + 1) * n_per, (c + 1) * n_per + 6, 6)
        snd += list(a) + list(b)
        rcv += list(b) + list(a)
    n = 3 * n_per + sizes[-1]
    g = single_graph(np.asarray(snd, np.int32), np.asarray(rcv, np.int32),
                     nodes=rng.normal(size=(n, 4)).astype(np.float32),
                     y=np.zeros(n, np.int32), edge_pad_multiple=128)
    plan = build_halo_plan(g, D, block=n_per)
    # every shard exchanges only the ~6-node boundaries, not its 64-row block
    assert plan.halo <= 8  # 6 boundary senders rounded up to halo_multiple
    assert plan.comm_rows_per_device() * 4 <= plan.n_total
    # true boundary accounting matches the constructed graph: at most
    # 2 directions x (D-1) adjacent pairs x 6 nodes
    assert plan.boundary_rows <= 2 * (D - 1) * 6


@pytest.mark.parametrize("conv", ["gcn", "gin", "gat"])
@pytest.mark.parametrize("arch", ["fastkan", "kan"])
def test_matches_single_device(conv, arch):
    """Loss + gradients of the halo-partitioned step must match the
    unpartitioned full-graph computation (same tolerance discipline as
    test_partition.py: compare grads, not post-Adam params)."""
    if arch == "kan" and conv != "gcn":
        pytest.skip("one KAN config suffices; others covered by fastkan")
    g = _graph(96, seed=5)
    model = NodeClassifier(conv_type=conv, architecture=arch, mp_layers=2,
                           num_features=6, hidden_channels=8, num_classes=3,
                           skip=True, grid_size=4, dropout=0.0)
    tx = optax.adam(1e-2)
    state, _ = create_train_state(model, jax.random.key(0), g, tx)
    mask = np.asarray(g.node_mask)

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("graph",))
    plan = build_halo_plan(g, 4)
    step, evaluate = make_halo_node_step(model, tx, mesh, plan, g, mask)
    key = jax.random.key(3)
    new_state, loss_halo = step(state, key)

    def loss_fn(params):
        variables = {"params": params, **(
            {"buffers": state.buffers} if state.buffers else {}), **(
            {"batch_stats": state.batch_stats} if state.batch_stats else {})}
        out, _ = model.apply(variables, g, train=True,
                             rngs={"dropout": key}, mutable=["batch_stats"])
        return L.masked_softmax_cross_entropy(out, g.y, g.node_mask)

    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(state.params)
    np.testing.assert_allclose(float(loss_halo), float(loss_ref), rtol=1e-5)

    # gradient parity: replay the halo loss for grads
    arrs_step = step  # step caches internally; re-derive grads via evaluate?
    # simplest: one more step from the same state with SGD lr so params move
    # exactly by grads — instead compare losses after one step of plain SGD
    tx2 = optax.sgd(1e-1)
    state2, _ = create_train_state(model, jax.random.key(0), g, tx2)
    step2, _ = make_halo_node_step(model, tx2, mesh, plan, g, mask)
    s2_halo, _ = step2(state2, key)

    upd_ref = jax.tree.map(lambda p, dg: p - 1e-1 * dg, state2.params,
                           grads_ref)
    flat_h, _ = jax.tree_util.tree_flatten(s2_halo.params)
    flat_r, _ = jax.tree_util.tree_flatten(upd_ref)
    for a, b in zip(flat_h, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_eval_matches_single_device():
    g = _graph(96, seed=11)
    model = NodeClassifier(conv_type="gcn", architecture="fastkan",
                           mp_layers=2, num_features=6, hidden_channels=8,
                           num_classes=3, skip=False, grid_size=4,
                           dropout=0.0)
    tx = optax.adam(1e-2)
    state, _ = create_train_state(model, jax.random.key(0), g, tx)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("graph",))
    plan = build_halo_plan(g, 4)
    _, evaluate = make_halo_node_step(model, tx, mesh, plan, g,
                                      np.asarray(g.node_mask))
    loss_h, acc_h = evaluate(state, np.asarray(g.node_mask))

    out = model.apply(state.variables(), g, train=False)
    loss_r = L.masked_softmax_cross_entropy(out, g.y, g.node_mask)
    acc_r = L.masked_accuracy(out, g.y.astype(jnp.int32), g.node_mask)
    np.testing.assert_allclose(float(loss_h), float(loss_r), rtol=1e-5)
    np.testing.assert_allclose(float(acc_h), float(acc_r), rtol=1e-6)


@pytest.mark.parametrize("arch", ["kan", "fastkan"])
def test_fused_gin_matches_single_device_in_halo(arch):
    """The fused GIN kernels (gin_kan_fused_halo / gin_fastkan_fused_halo)
    running INSIDE shard_map over the halo partition reproduce the
    unsharded fused computation — loss and one-SGD-step params (VERDICT
    round-2 item 7: halo mode and the Pallas kernels compose)."""
    g = _graph(96, seed=5)
    model = NodeClassifier(conv_type="gin", architecture=arch, mp_layers=2,
                           num_features=6, hidden_channels=8, num_classes=3,
                           skip=False, grid_size=4, dropout=0.0, fused=True)
    key = jax.random.key(3)
    tx = optax.sgd(1e-1)
    state, _ = create_train_state(model, jax.random.key(0), g, tx)
    mask = np.asarray(g.node_mask)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("graph",))
    plan = build_halo_plan(g, 4)
    assert plan.senders_perm is not None
    step, _ = make_halo_node_step(model, tx, mesh, plan, g, mask)
    s_halo, loss_halo = step(state, key)

    def loss_fn(params):
        variables = {"params": params, **(
            {"buffers": state.buffers} if state.buffers else {}), **(
            {"batch_stats": state.batch_stats} if state.batch_stats else {})}
        out, _ = model.apply(variables, g, train=True,
                             rngs={"dropout": key}, mutable=["batch_stats"])
        return L.masked_softmax_cross_entropy(out, g.y, g.node_mask)

    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(state.params)
    np.testing.assert_allclose(float(loss_halo), float(loss_ref), rtol=2e-5)
    upd_ref = jax.tree.map(lambda p, dg: p - 1e-1 * dg, state.params,
                           grads_ref)
    flat_h, _ = jax.tree_util.tree_flatten(s_halo.params)
    flat_r, _ = jax.tree_util.tree_flatten(upd_ref)
    for a, b in zip(flat_h, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-6)


def test_singleton_specialization_matches_full():
    """n_shards=1 takes the specialized plain-step path (no shard_map, no
    all_to_all); it must match the full halo machinery (force_full=True)
    loss-for-loss over several steps, and eval must agree too."""
    g = _graph(96, seed=11)
    model = NodeClassifier(conv_type="gin", architecture="fastkan",
                           mp_layers=2, num_features=6, hidden_channels=8,
                           num_classes=3, skip=False, grid_size=4,
                           dropout=0.0)
    tx = optax.sgd(1e-2)
    state, _ = create_train_state(model, jax.random.key(0), g, tx)
    mask = np.asarray(g.node_mask)
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("graph",))
    plan = build_halo_plan(g, 1)
    assert plan.boundary_rows == 0

    step_s, eval_s = make_halo_node_step(model, tx, mesh, plan, g, mask)
    step_f, eval_f = make_halo_node_step(model, tx, mesh, plan, g, mask,
                                         force_full=True)
    key = jax.random.key(3)
    ss, sf = state, state
    for _ in range(3):
        ss, loss_s = step_s(ss, key)
        sf, loss_f = step_f(sf, key)
        np.testing.assert_allclose(float(loss_s), float(loss_f), rtol=1e-5)
    em = np.asarray(g.node_mask)
    ls, accs = eval_s(ss, em)
    lf, accf = eval_f(sf, em)
    np.testing.assert_allclose(float(ls), float(lf), rtol=1e-5)
    np.testing.assert_allclose(float(accs), float(accf), rtol=1e-6)


@pytest.mark.slow
def test_large_block_dominant_halo_matches_single_device():
    """Arxiv-shaped (well, CPU-sized: 20k nodes / ~170k edges / 8 shards)
    halo equivalence in the regime the overlap design targets — block >>
    halo (round-4 verdict item 8: every prior equivalence test ran at toy
    shapes where halo ~ block). The graph has 8 index-local clusters with
    ~1.5% cross-cluster edges (what graphs/reorder.py produces at scale),
    so each 2.5k-row block exchanges only a few hundred boundary rows.
    Asserts loss parity and one-SGD-step parameter parity (i.e. gradient
    parity) vs the unsharded step."""
    rng = np.random.default_rng(42)
    D, n_per = 8, 2560
    n = D * n_per
    snd, rcv = [], []
    for c in range(D):
        base = c * n_per
        a = rng.integers(base, base + n_per, 10_000)
        b = rng.integers(base, base + n_per, 10_000)
        snd.append(a)
        rcv.append(b)
    # sparse cross-cluster boundary (adjacent blocks only, ~150 edges/pair)
    xs = rng.integers(0, n, 1200)
    xr = np.clip(xs + rng.integers(-n_per, n_per, 1200), 0, n - 1)
    snd.append(xs.astype(np.int64))
    rcv.append(xr.astype(np.int64))
    snd = np.concatenate(snd).astype(np.int32)
    rcv = np.concatenate(rcv).astype(np.int32)
    nodes = rng.normal(size=(n, 6)).astype(np.float32)
    y = rng.integers(0, 3, n).astype(np.int32)
    g = single_graph(snd, rcv, nodes=nodes, y=y, edge_pad_multiple=128)

    model = NodeClassifier(conv_type="gcn", architecture="fastkan",
                           mp_layers=2, num_features=6, hidden_channels=8,
                           num_classes=3, skip=False, grid_size=4,
                           dropout=0.0)
    tx = optax.sgd(1e-1)
    state, _ = create_train_state(model, jax.random.key(0), g, tx)
    mask = np.asarray(g.node_mask)

    mesh = Mesh(np.asarray(jax.devices()[:D]).reshape(D), ("graph",))
    plan = build_halo_plan(g, D)
    # the target regime: per-pair halo is a small fraction of the block
    # (~10% here: the partition blocks deliberately straddle the cluster
    # boundaries, as a real partition would), and total exchanged rows per
    # device stay below one block
    assert plan.halo < plan.block // 8, (plan.halo, plan.block)
    assert plan.halo * D < plan.block, (plan.halo, plan.block)
    step, _ = make_halo_node_step(model, tx, mesh, plan, g, mask)
    key = jax.random.key(3)
    s_halo, loss_halo = step(state, key)

    def loss_fn(params):
        variables = {"params": params, **(
            {"buffers": state.buffers} if state.buffers else {}), **(
            {"batch_stats": state.batch_stats} if state.batch_stats else {})}
        out, _ = model.apply(variables, g, train=True,
                             rngs={"dropout": key}, mutable=["batch_stats"])
        return L.masked_softmax_cross_entropy(out, g.y, g.node_mask)

    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(state.params)
    np.testing.assert_allclose(float(loss_halo), float(loss_ref), rtol=1e-5)
    upd_ref = jax.tree.map(lambda p, dg: p - 1e-1 * dg, state.params,
                           grads_ref)
    flat_h, _ = jax.tree_util.tree_flatten(s_halo.params)
    flat_r, _ = jax.tree_util.tree_flatten(upd_ref)
    for a, b in zip(flat_h, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)
