"""Halo-exchange graph partition: node-sharded full-graph training.

This is the scalable replacement for `dist/partition.py`'s allreduce-style
edge partition (which replicates the (N, F) node arrays and psums the FULL
array per segment reduction). Here

  * nodes are sharded into contiguous blocks of B rows — device d owns
    global rows [d*B, (d+1)*B);
  * edges are partitioned by DESTINATION block, so every edge of a receiver
    lives on the receiver's owner: segment-sums, GAT edge-softmax and the
    GCN in-degree are all purely local;
  * the only cross-device traffic is ONE `all_to_all` of the *boundary*
    sender rows per aggregation (comm volume ∝ boundary nodes · F, not
    N · F), plus scalar psums for batch-norm/loss statistics;
  * the edge list is pre-split into internal edges (sender local) and halo
    edges (sender remote), so the internal segment-sum has no data
    dependency on the collective and XLA can overlap them.

The reference has no distributed path at all (SURVEY.md §2.4 N8/N9 —
single-GPU full-batch at node_classification_clean/utils.py:125); this is
the GNN analogue of context parallelism, built on `shard_map` + ICI
collectives per the TPU scaling recipe.

All partition planning is host-side numpy (`build_halo_plan`); the device
step consumes statically-shaped stacked arrays sharded over the mesh axis.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from kagnn_tpu.graphs.batch import GraphBatch
from kagnn_tpu.ops import segment
from kagnn_tpu.train.loops import TrainState

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class HaloPlan:
    """Host-built partition plan. Every per-device array is stacked along a
    leading device axis of size `n_shards` and consumed by shard_map with
    in_specs P(axis) so each device sees only its slice."""

    n_shards: int
    block: int        # B — node rows per shard (static)
    halo: int         # H — max boundary rows exchanged per (owner, dest) pair
    e_loc: int        # padded edges per shard
    boundary_rows: int  # true number of (owner, dest, node) boundary entries
    # --- per-device edge topology (ext sender space: [0, B + D*H)) ---
    senders: np.ndarray      # (D, E_loc) int32
    receivers: np.ndarray    # (D, E_loc) int32, local [0, B), ascending
    edge_mask: np.ndarray    # (D, E_loc) bool
    n_edge: np.ndarray       # (D,) int32 valid edges per shard
    # --- halo exchange plan ---
    send_idx: np.ndarray     # (D, D, H) int32 — rows of shard d to send to p
    send_mask: np.ndarray    # (D, D, H) bool
    dinv_ext: np.ndarray     # (D, B + D*H) f32 — (deg+1)^-1/2, ext space
    # --- node shard ---
    node_mask: np.ndarray    # (D, B) bool
    n_node: np.ndarray       # (D,) int32
    # --- optional internal/halo edge split (comm/compute overlap) ---
    s_int: Optional[np.ndarray] = None    # (D, Ei) int32 local sender rows
    r_int: Optional[np.ndarray] = None    # (D, Ei) int32
    int_sel: Optional[np.ndarray] = None  # (D, Ei) int32 into full edge list
    int_mask: Optional[np.ndarray] = None # (D, Ei) bool
    s_halo: Optional[np.ndarray] = None   # (D, Eh) int32 rows into recv_flat
    r_halo: Optional[np.ndarray] = None   # (D, Eh) int32
    halo_sel: Optional[np.ndarray] = None # (D, Eh) int32
    halo_mask: Optional[np.ndarray] = None  # (D, Eh) bool
    # --- per-device sender-sort metadata (ext space): lets the fused GIN
    # kernels and scatter-free backwards run INSIDE shard_map ---
    senders_perm: Optional[np.ndarray] = None    # (D, E_loc) int32
    senders_sorted: Optional[np.ndarray] = None  # (D, E_loc) int32
    # host-side permuted views (receivers/edge_mask in sender-sorted order)
    # consumed by the scatter-free backwards — see graphs/batch.py
    receivers_by_sender: Optional[np.ndarray] = None  # (D, E_loc) int32
    edge_mask_by_sender: Optional[np.ndarray] = None  # (D, E_loc) bool

    # ------------------------------------------------------------------
    @property
    def n_total(self) -> int:
        return self.n_shards * self.block

    def comm_rows_per_device(self) -> int:
        """all_to_all rows moved per device per exchange (padded)."""
        return self.n_shards * self.halo

    def shard_nodes(self, arr: np.ndarray, fill=0) -> np.ndarray:
        """Pad a global per-node array (Np, ...) to (D*B, ...) and reshape to
        the stacked (D, B, ...) node-shard layout."""
        arr = np.asarray(arr)
        pad = self.n_total - arr.shape[0]
        if pad:
            widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
            arr = np.pad(arr, widths, constant_values=fill)
        return arr.reshape((self.n_shards, self.block) + arr.shape[1:])


def build_halo_plan(g: GraphBatch, n_shards: int, *, block_multiple: int = 8,
                    halo_multiple: int = 8, edge_multiple: int = 128,
                    split_edges: bool = True,
                    block: Optional[int] = None) -> HaloPlan:
    """Partition a single (full-batch) graph for halo-exchange training.

    Nodes go to contiguous blocks of B = ceil(Np/D) rows; edges go to the
    owner of their receiver (edges are receiver-sorted, so each shard's edge
    list is a contiguous slice of the global list). For every (dest d,
    owner p) pair the plan records the sorted unique boundary senders
    R(d,p); device p sends x[R(d,p)] to d in slot d of one all_to_all.
    """
    D = int(n_shards)
    senders = np.asarray(g.senders)
    receivers = np.asarray(g.receivers)
    emask = np.asarray(g.edge_mask)
    np_pad = g.n_node_pad
    if block is not None:
        B = int(block)
        assert B * D >= np_pad, (
            f"block={B} x {D} shards < {np_pad} padded nodes")
    else:
        B = _round_up(-(-np_pad // D), block_multiple)
    ntot = B * D

    s = senders[emask].astype(np.int64)
    r = receivers[emask].astype(np.int64)
    order = np.argsort(r, kind="stable")
    s, r = s[order], r[order]

    bounds = np.searchsorted(r, np.arange(D + 1) * B).astype(np.int64)
    n_edge_dev = np.diff(bounds).astype(np.int32)
    e_loc = _round_up(max(int(n_edge_dev.max(initial=0)), 1), edge_multiple)

    # symmetric-norm degrees (valid in-edges + self loop), data-independent
    deg = np.bincount(r, minlength=ntot).astype(np.float32) + 1.0
    dinv = 1.0 / np.sqrt(deg)

    # boundary sets R(d, p)
    rdp: dict[tuple[int, int], np.ndarray] = {}
    h_max = 0
    boundary_rows = 0
    for d in range(D):
        sd = s[bounds[d]:bounds[d + 1]]
        owner = sd // B
        for p in range(D):
            if p == d:
                continue
            uniq = np.unique(sd[owner == p])
            if uniq.size:
                rdp[(d, p)] = uniq
                h_max = max(h_max, int(uniq.size))
                boundary_rows += int(uniq.size)
    H = _round_up(max(h_max, 1), halo_multiple)

    send_idx = np.zeros((D, D, H), np.int32)
    send_mask = np.zeros((D, D, H), bool)
    for (d, p), uniq in rdp.items():
        send_idx[p, d, :uniq.size] = (uniq - p * B).astype(np.int32)
        send_mask[p, d, :uniq.size] = True

    ext_senders = np.zeros((D, e_loc), np.int32)
    loc_receivers = np.full((D, e_loc), B - 1, np.int32)
    edge_mask = np.zeros((D, e_loc), bool)
    dinv_ext = np.zeros((D, B + D * H), np.float32)
    is_internal = np.zeros((D, e_loc), bool)
    for d in range(D):
        sd = s[bounds[d]:bounds[d + 1]]
        rd = r[bounds[d]:bounds[d + 1]]
        ne = sd.size
        owner = sd // B
        ext = np.empty(ne, np.int64)
        local = owner == d
        ext[local] = sd[local] - d * B
        for p in range(D):
            sel = owner == p
            if p == d or not sel.any():
                continue
            uniq = rdp[(d, p)]
            pos = np.searchsorted(uniq, sd[sel])
            ext[sel] = B + p * H + pos
        ext_senders[d, :ne] = ext.astype(np.int32)
        loc_receivers[d, :ne] = (rd - d * B).astype(np.int32)
        edge_mask[d, :ne] = True
        is_internal[d, :ne] = local
        dinv_ext[d, :B] = dinv[d * B:(d + 1) * B]
        for p in range(D):
            if (d, p) in rdp:
                uniq = rdp[(d, p)]
                dinv_ext[d, B + p * H:B + p * H + uniq.size] = dinv[uniq]

    node_mask = np.asarray(g.node_mask)
    node_mask = np.pad(node_mask, (0, ntot - np_pad), constant_values=False)
    node_mask = node_mask.reshape(D, B)
    n_node = node_mask.sum(axis=1).astype(np.int32)

    kw: dict[str, Any] = {}
    if split_edges:
        # the split preserves receiver order inside each list, so both local
        # segment-sums still see ascending segment ids
        counts_i = (is_internal & edge_mask).sum(axis=1)
        counts_h = (~is_internal & edge_mask).sum(axis=1)
        ei = _round_up(max(int(counts_i.max(initial=0)), 1), edge_multiple)
        eh = _round_up(max(int(counts_h.max(initial=0)), 1), edge_multiple)
        s_int = np.zeros((D, ei), np.int32)
        r_int = np.full((D, ei), B - 1, np.int32)
        int_sel = np.zeros((D, ei), np.int32)
        int_mask = np.zeros((D, ei), bool)
        s_halo = np.zeros((D, eh), np.int32)
        r_halo = np.full((D, eh), B - 1, np.int32)
        halo_sel = np.zeros((D, eh), np.int32)
        halo_mask = np.zeros((D, eh), bool)
        for d in range(D):
            ii = np.where(is_internal[d] & edge_mask[d])[0]
            hh = np.where(~is_internal[d] & edge_mask[d])[0]
            s_int[d, :ii.size] = ext_senders[d, ii]
            r_int[d, :ii.size] = loc_receivers[d, ii]
            int_sel[d, :ii.size] = ii
            int_mask[d, :ii.size] = True
            s_halo[d, :hh.size] = ext_senders[d, hh] - B  # rows of recv_flat
            r_halo[d, :hh.size] = loc_receivers[d, hh]
            halo_sel[d, :hh.size] = hh
            halo_mask[d, :hh.size] = True
        kw = dict(s_int=s_int, r_int=r_int, int_sel=int_sel,
                  int_mask=int_mask, s_halo=s_halo, r_halo=r_halo,
                  halo_sel=halo_sel, halo_mask=halo_mask)

    # per-device sender sort (ext space); padded edges sort to the end with
    # an out-of-range key so the sorted-segment-sum kernel drops them
    senders_perm = np.zeros((D, e_loc), np.int32)
    senders_sorted = np.zeros((D, e_loc), np.int32)
    recv_by_sender = np.zeros((D, e_loc), np.int32)
    mask_by_sender = np.zeros((D, e_loc), bool)
    big = np.iinfo(np.int32).max
    for d in range(D):
        key = np.where(edge_mask[d], ext_senders[d], big)
        perm = np.argsort(key, kind="stable").astype(np.int32)
        senders_perm[d] = perm
        senders_sorted[d] = key[perm]
        recv_by_sender[d] = loc_receivers[d][perm]
        mask_by_sender[d] = edge_mask[d][perm]

    return HaloPlan(n_shards=D, block=B, halo=H, e_loc=e_loc,
                    boundary_rows=boundary_rows, senders=ext_senders,
                    receivers=loc_receivers, edge_mask=edge_mask,
                    n_edge=n_edge_dev, send_idx=send_idx,
                    send_mask=send_mask, dinv_ext=dinv_ext,
                    node_mask=node_mask, n_node=n_node,
                    senders_perm=senders_perm,
                    senders_sorted=senders_sorted,
                    receivers_by_sender=recv_by_sender,
                    edge_mask_by_sender=mask_by_sender, **kw)


# ---------------------------------------------------------------- step


_SPLIT_FIELDS = ("s_int", "r_int", "int_sel", "int_mask",
                 "s_halo", "r_halo", "halo_sel", "halo_mask")


def _stack_arrays(plan: HaloPlan, g: GraphBatch, mask: np.ndarray) -> dict:
    """Assemble the stacked (device-leading) array dict for the step."""
    arrs = {
        "senders": jnp.asarray(plan.senders),
        "receivers": jnp.asarray(plan.receivers),
        "edge_mask": jnp.asarray(plan.edge_mask),
        "n_edge": jnp.asarray(plan.n_edge),
        "send_idx": jnp.asarray(plan.send_idx),
        "send_mask": jnp.asarray(plan.send_mask),
        "dinv_ext": jnp.asarray(plan.dinv_ext),
        "node_mask": jnp.asarray(plan.node_mask),
        "n_node": jnp.asarray(plan.n_node),
        "nodes": jnp.asarray(plan.shard_nodes(np.asarray(g.nodes))),
        "y": jnp.asarray(plan.shard_nodes(np.asarray(g.y))),
        "loss_mask": jnp.asarray(plan.shard_nodes(np.asarray(mask),
                                                  fill=False)),
    }
    for f in _SPLIT_FIELDS + ("senders_perm", "senders_sorted",
                              "receivers_by_sender", "edge_mask_by_sender"):
        v = getattr(plan, f)
        if v is not None:
            arrs[f] = jnp.asarray(v)
    return arrs


def _local_graph_and_state(plan: HaloPlan, loc: dict, axis: str):
    B = plan.block
    g = GraphBatch(
        senders=loc["senders"], receivers=loc["receivers"],
        nodes=loc["nodes"], edges=None, y=loc["y"],
        node_mask=loc["node_mask"], edge_mask=loc["edge_mask"],
        graph_mask=jnp.ones((1,), bool),
        node_graph=jnp.zeros((B,), jnp.int32),
        n_node=loc["n_node"], n_edge=loc["n_edge"],
        n_graph=jnp.ones((), jnp.int32),
        senders_perm=loc.get("senders_perm"),
        senders_sorted=loc.get("senders_sorted"),
        receivers_by_sender=loc.get("receivers_by_sender"),
        edge_mask_by_sender=loc.get("edge_mask_by_sender"))
    hs = segment.HaloState(
        axis=axis, n_local=B, send_idx=loc["send_idx"],
        send_mask=loc["send_mask"], dinv_ext=loc["dinv_ext"],
        **{f: loc.get(f) for f in _SPLIT_FIELDS})
    return g, hs


def _psum_masked_ce(logits: Array, labels: Array, mask: Array,
                    axis: str) -> Array:
    """Global-mean masked cross entropy over node shards (matches
    train/losses.masked_softmax_cross_entropy on the unsharded graph —
    same gather-free one-hot label pick, losses._pick_label_column)."""
    from kagnn_tpu.train.losses import _pick_label_column

    logits = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    ll = lse - _pick_label_column(logits, labels.astype(jnp.int32))
    m = mask.astype(logits.dtype)
    num = jax.lax.psum((ll * m).sum(), axis)
    den = jax.lax.psum(m.sum(), axis)
    return num / jnp.maximum(den, 1.0)


def _make_singleton_step_direct(model, tx, g: GraphBatch, mask,
                                plan: HaloPlan):
    """n_shards=1 with matching node layout: train/eval on the ORIGINAL
    batch — zero repacking, no host round-trip of device-resident arrays."""
    import optax as _optax

    from kagnn_tpu.train.loops import make_node_steps

    if getattr(mask, "shape", None) and mask.shape[0] == g.n_node_pad:
        loss_mask = jnp.asarray(mask)  # already padded: no host round-trip
    else:
        m = np.asarray(mask)
        loss_mask = jnp.asarray(np.pad(
            m, (0, g.n_node_pad - m.shape[0]), constant_values=False))
    step_fn, _ = make_node_steps(model, tx)

    def step(state: TrainState, key):
        return step_fn(state, g, loss_mask, key)

    @jax.jit
    def _ev(state: TrainState, em):
        out = model.apply(state.variables(), g, train=False)
        y = g.y.astype(jnp.int32)
        ll = _optax.softmax_cross_entropy_with_integer_labels(out, y)
        m = em.astype(out.dtype)
        loss = (ll * m).sum() / jnp.maximum(m.sum(), 1.0)
        mf = em.astype(jnp.float32)
        correct = ((jnp.argmax(out, 1) == y).astype(jnp.float32) * mf).sum()
        acc = correct / jnp.maximum(mf.sum(), 1.0)
        return loss, acc

    def evaluate(state: TrainState, eval_mask):
        em = np.asarray(eval_mask)
        if em.shape[0] < g.n_node_pad:
            em = np.pad(em, (0, g.n_node_pad - em.shape[0]),
                        constant_values=False)
        return _ev(state, jnp.asarray(em[:g.n_node_pad]))

    return step, evaluate


def _make_singleton_step(model, tx, plan: HaloPlan, arrs: dict):
    """n_shards=1 specialization: the plain (unsharded) train/eval step on
    the plan's local layout. Same signatures as the shard_map version."""
    import optax as _optax

    from kagnn_tpu.train.loops import make_node_steps

    loc = {k: v[0] for k, v in arrs.items()}
    B = plan.block
    g_loc = GraphBatch(
        senders=loc["senders"], receivers=loc["receivers"],
        nodes=loc["nodes"], edges=None, y=loc["y"],
        node_mask=loc["node_mask"], edge_mask=loc["edge_mask"],
        graph_mask=jnp.ones((1,), bool),
        node_graph=jnp.zeros((B,), jnp.int32),
        n_node=loc["n_node"], n_edge=loc["n_edge"],
        n_graph=jnp.ones((), jnp.int32),
        senders_perm=loc.get("senders_perm"),
        senders_sorted=loc.get("senders_sorted"),
        receivers_by_sender=loc.get("receivers_by_sender"),
        edge_mask_by_sender=loc.get("edge_mask_by_sender"))
    loss_mask = loc["loss_mask"]
    step_fn, _ = make_node_steps(model, tx)

    def step(state: TrainState, key):
        return step_fn(state, g_loc, loss_mask, key)

    @jax.jit
    def _ev(state: TrainState, em):
        out = model.apply(state.variables(), g_loc, train=False)
        y = g_loc.y.astype(jnp.int32)
        ll = _optax.softmax_cross_entropy_with_integer_labels(out, y)
        m = em.astype(out.dtype)
        loss = (ll * m).sum() / jnp.maximum(m.sum(), 1.0)
        mf = em.astype(jnp.float32)
        correct = ((jnp.argmax(out, 1) == y).astype(jnp.float32) * mf).sum()
        acc = correct / jnp.maximum(mf.sum(), 1.0)
        return loss, acc

    def evaluate(state: TrainState, eval_mask):
        em = jnp.asarray(plan.shard_nodes(np.asarray(eval_mask),
                                          fill=False))[0]
        return _ev(state, em)

    return step, evaluate


def make_halo_node_step(model, tx: optax.GradientTransformation, mesh: Mesh,
                        plan: HaloPlan, g: GraphBatch, mask,
                        axis: str = "graph", force_full: bool = False):
    """Build a jitted halo-partitioned full-graph node-classification train
    step: (state, dropout_key) -> (state, loss). The graph/mask are baked
    into device-sharded arrays at build time (full-batch training reuses the
    same graph every step, reference node_classification_clean/utils.py:125).

    Also returns an eval fn (state, eval_mask_stacked) -> (loss, accuracy)
    computed with running statistics.
    """
    D = mesh.shape[axis]
    assert D == plan.n_shards, (D, plan.n_shards)

    if D == 1 and plan.boundary_rows == 0 and not force_full:
        # A 1-shard partition IS the whole graph: skip shard_map, the
        # (singleton) all_to_all, the extended-table indirection, and the
        # collective loss — the step is exactly the unsharded flagship step
        # (VERDICT round-3 item 4: the halo machinery must not tax the
        # degenerate partition). When the plan's node layout matches the
        # input batch, use `g` AS-IS — its (possibly device-resident)
        # arrays are never round-tripped through the host. The full
        # machinery stays reachable with force_full=True so the partition
        # tax remains measurable (experiments/ledger.py halo phases).
        if plan.block == g.n_node_pad:
            return _make_singleton_step_direct(model, tx, g, mask, plan)
        return _make_singleton_step(
            model, tx, plan, _stack_arrays(plan, g, np.asarray(mask)))

    arrs = _stack_arrays(plan, g, np.asarray(mask))
    specs = {k: P(axis) for k in arrs}

    def body(state: TrainState, loc: dict, key):
        loc = {k: v[0] for k, v in loc.items()}  # drop the device axis
        g_loc, hs = _local_graph_and_state(plan, loc, axis)
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        with segment.halo_mode(hs):
            def loss_fn(params):
                variables = {"params": params, **(
                    {"buffers": state.buffers} if state.buffers else {}), **(
                    {"batch_stats": state.batch_stats}
                    if state.batch_stats else {})}
                out, mut = model.apply(
                    variables, g_loc, train=True, rngs={"dropout": key},
                    mutable=["batch_stats"])
                return _psum_masked_ce(out, g_loc.y, loc["loss_mask"],
                                       axis), mut

            (loss, mut), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
        # legacy shard_map semantics (check_vma=False — pallas_call cannot
        # be traced under the vma checker yet, its scalar-prefetch indexing
        # trips the varying-manual-axes checker): with transpose(psum)=psum,
        # the loss collective scales every cotangent by D, so each shard
        # holds D x (its partial grad) of the replicated params; pmean
        # yields the exact global gradient (verified vs the unsharded
        # reference in tests/test_halo.py). Custom-VJP kernels return
        # per-shard partials and compose identically.
        grads = jax.lax.pmean(grads, axis)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        return state.replace(
            params=optax.apply_updates(state.params, updates),
            batch_stats=mut.get("batch_stats", state.batch_stats)
            if state.batch_stats else state.batch_stats,
            opt_state=new_opt, step=state.step + 1), loss

    def eval_body(state: TrainState, loc: dict, eval_mask):
        loc = {k: v[0] for k, v in loc.items()}
        eval_mask = eval_mask[0]
        g_loc, hs = _local_graph_and_state(plan, loc, axis)
        with segment.halo_mode(hs):
            out = model.apply(state.variables(), g_loc, train=False)
        loss = _psum_masked_ce(out, g_loc.y, eval_mask, axis)
        m = eval_mask.astype(jnp.float32)
        correct = ((jnp.argmax(out, 1) == g_loc.y.astype(jnp.int32))
                   .astype(jnp.float32) * m).sum()
        acc = jax.lax.psum(correct, axis) / jnp.maximum(
            jax.lax.psum(m.sum(), axis), 1.0)
        return loss, acc

    cache: dict[str, Any] = {}
    # explicit global placement: shard the baked arrays over the mesh ONCE
    # (not per call), and replicate state/key. With a multi-PROCESS mesh
    # (jax.distributed) this is required — jit only accepts globally-sharded
    # jax.Arrays there — and on a single process it is a no-op-cost
    # device_put that removes a per-call transfer.
    from jax.sharding import NamedSharding

    shard = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def _to_global(x, sharding):
        """Place `x` (host or single-device array) as a global array with
        `sharding`. Unlike device_put this works when the mesh spans
        multiple processes (each process contributes its addressable
        shards); already-correctly-sharded arrays pass through."""
        if isinstance(x, jax.core.Tracer):
            # under tracing (make_jaxpr / nested jit) placement is a no-op
            # concern; the tracer passes through
            return x
        if isinstance(x, jax.Array):
            try:
                if x.sharding.is_equivalent_to(sharding, x.ndim):
                    return x
            except Exception:
                pass
        shape = tuple(x.shape)
        idx_map = sharding.addressable_devices_indices_map(shape)
        bufs = [jax.device_put(x[idx], d) for d, idx in idx_map.items()]
        return jax.make_array_from_single_device_arrays(shape, sharding,
                                                        bufs)

    arrs = {k: _to_global(v, shard) for k, v in arrs.items()}

    def _rep(tree):
        return jax.tree.map(lambda a: _to_global(a, rep), tree)

    def step(state: TrainState, key):
        if "fn" not in cache:
            st_spec = jax.tree.map(lambda _: P(), state)
            cache["fn"] = jax.jit(shard_map(
                body, mesh=mesh, in_specs=(st_spec, specs, P()),
                out_specs=(st_spec, P()), check_vma=False))
        return cache["fn"](_rep(state), arrs, _rep(key))

    def evaluate(state: TrainState, eval_mask):
        """eval_mask: global (Np,) bool — sharded internally."""
        em = _to_global(plan.shard_nodes(np.asarray(eval_mask), fill=False),
                        shard)
        if "ev" not in cache:
            st_spec = jax.tree.map(lambda _: P(), state)
            cache["ev"] = jax.jit(shard_map(
                eval_body, mesh=mesh, in_specs=(st_spec, specs, P(axis)),
                out_specs=(P(), P()), check_vma=False))
        return cache["ev"](_rep(state), arrs, em)

    return step, evaluate


def halo_scaling_report(model_fn, n_devices_list=(1, 2, 4, 8),
                        iters: int = 5) -> list:
    """edges/s of the halo-partitioned step at several shard counts (the
    1-chip/1-host/N-host scaling harness, BASELINE.md; run on a real pod
    slice for meaningful numbers). model_fn() -> (model, state, g, mask, tx).
    """
    import time

    rows = []
    for n in n_devices_list:
        if n > len(jax.devices()):
            continue
        mesh = Mesh(np.asarray(jax.devices()[:n]).reshape(n), ("graph",))
        model, state, g, mask, tx = model_fn()
        plan = build_halo_plan(g, n)
        step, _ = make_halo_node_step(model, tx, mesh, plan, g,
                                      np.asarray(mask))
        key = jax.random.key(0)
        state, loss = step(state, key)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(iters):
            state, loss = step(state, key)
        jax.block_until_ready(loss)
        sec = (time.perf_counter() - t0) / iters
        rows.append({"n_devices": n, "sec_per_step": sec,
                     "edges_per_s": int(g.n_edge) / sec,
                     "halo_rows_per_dev": plan.comm_rows_per_device(),
                     "boundary_rows": plan.boundary_rows,
                     "block": plan.block})
    if rows:
        base = rows[0]["edges_per_s"]
        for r in rows:
            r["scaling_efficiency"] = r["edges_per_s"] / (
                base * r["n_devices"])
    return rows
