"""ctypes bindings for the native (C++) batch assembler.

The device side of this framework consumes statically-padded `GraphBatch`es
(graphs/batch.py); for mini-batch graph tasks the host must assemble a fresh
padded batch every step. That collation is the role PyG's C++ `DataLoader`
collate plays in the reference (graph_classification_utils.py:109-110,
SURVEY.md §2.4 N5). Here it is `native/batcher.cpp` — one pass over
preconcatenated dataset arrays doing block-diagonal relabeling, counting-sort
by receiver (so device segment-sums can claim sorted indices), sender-sort
metadata, masks and feature gathering — exposed over a C ABI (no pybind11 in
this image; ctypes is sufficient and dependency-free).

`NativeBatchAssembler.assemble(idx)` is bit-identical to the numpy
`batch_graphs` path (tests/test_native_batcher.py) and ~2x faster per batch,
which matters because host assembly is on the critical path of every
training step (see train/prefetch.py, which overlaps it with device compute).
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from kagnn_tpu.graphs.batch import GraphBatch, PadSpec

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SRC = _NATIVE_DIR / "batcher.cpp"
_SO = _NATIVE_DIR / "batcher.so"

_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build_if_needed() -> bool:
    """(Re)compile batcher.so when missing or older than the source."""
    if not _SRC.exists():
        return _SO.exists()
    if _SO.exists() and _SO.stat().st_mtime >= _SRC.stat().st_mtime:
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", str(_SO), str(_SRC)],
            check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return _SO.exists()


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not _build_if_needed():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        _load_failed = True
        return None

    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.assemble_batch.restype = ctypes.c_int
    lib.assemble_batch.argtypes = [
        i32p, i32p,                          # senders, receivers
        i64p, i64p,                          # edge_offsets, node_counts
        f32p, i64p, ctypes.c_int64,          # node_feat, offsets, feat_dim
        i64p, ctypes.c_int64,                # sel, n_sel
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # pads
        i32p, i32p, u8p,                     # out_snd, out_rcv, out_edge_mask
        u8p, i32p, f32p,                     # node_mask, node_graph, feat
        i32p, i32p,                          # out_perm, out_snd_sorted
        i64p,                                # out_counts
    ]
    lib.degree_onehot.restype = None
    lib.degree_onehot.argtypes = [i32p, i64p, i64p, i64p,
                                  ctypes.c_int64, ctypes.c_int64, f32p]
    _lib = lib
    return _lib


def native_available() -> bool:
    """True when batcher.so is loadable (building it from source if needed)."""
    return _load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


class NativeBatchAssembler:
    """Assemble padded `GraphBatch`es natively from a fixed dataset.

    Mirrors `batch_graphs` (graphs/batch.py) exactly — same receiver-sorted
    COO, masks, padding-graph conventions and sender-sort metadata — but the
    per-batch work runs in one C++ pass over dataset arrays concatenated once
    at construction.

    `graphs`: sequence of dicts with 'senders'/'receivers'/'n_node', optional
    'nodes' (float32 features) and 'y'. Edge features are not supported on
    the native path (the receiver sort happens in C++ and would need a
    returned permutation); use `batch_graphs` for GINE-style datasets.
    """

    def __init__(self, graphs: Sequence[dict], spec: PadSpec):
        lib = _load()
        if lib is None:
            raise RuntimeError("native batcher unavailable (no toolchain?)")
        self._lib = lib
        self.spec = spec
        n_graphs = len(graphs)
        if any(g.get("edges") is not None for g in graphs):
            raise ValueError("edge features unsupported natively; "
                             "use batch_graphs")

        self._node_counts = np.fromiter(
            (int(g["n_node"]) for g in graphs), np.int64, n_graphs)
        snd = [np.asarray(g["senders"], np.int32) for g in graphs]
        rcv = [np.asarray(g["receivers"], np.int32) for g in graphs]
        self._edge_offsets = np.zeros(n_graphs + 1, np.int64)
        np.cumsum([s.shape[0] for s in snd], out=self._edge_offsets[1:])
        self._senders = (np.concatenate(snd) if snd
                         else np.zeros(0, np.int32))
        self._receivers = (np.concatenate(rcv) if rcv
                           else np.zeros(0, np.int32))

        self._node_feat_offsets = np.zeros(n_graphs + 1, np.int64)
        np.cumsum(self._node_counts, out=self._node_feat_offsets[1:])
        if graphs and graphs[0].get("nodes") is not None:
            self._feat = np.ascontiguousarray(
                np.concatenate([np.asarray(g["nodes"]) for g in graphs]),
                np.float32)
            self._feat_dim = int(self._feat.shape[1])
        else:
            self._feat = np.zeros((int(self._node_feat_offsets[-1]), 0),
                                  np.float32)
            self._feat_dim = 0

        self._ys = ([np.asarray(g["y"]).reshape(1, -1) for g in graphs]
                    if graphs and graphs[0].get("y") is not None else None)

    def assemble(self, sel: Sequence[int]) -> GraphBatch:
        spec = self.spec
        sel_arr = np.asarray(sel, np.int64)
        out_snd = np.empty(spec.n_edge, np.int32)
        out_rcv = np.empty(spec.n_edge, np.int32)
        out_edge_mask = np.empty(spec.n_edge, np.uint8)
        out_node_mask = np.empty(spec.n_node, np.uint8)
        out_node_graph = np.empty(spec.n_node, np.int32)
        out_feat = np.empty((spec.n_node, self._feat_dim), np.float32)
        out_perm = np.empty(spec.n_edge, np.int32)
        out_snd_sorted = np.empty(spec.n_edge, np.int32)
        out_counts = np.empty(3, np.int64)

        rc = self._lib.assemble_batch(
            _ptr(self._senders, ctypes.c_int32),
            _ptr(self._receivers, ctypes.c_int32),
            _ptr(self._edge_offsets, ctypes.c_int64),
            _ptr(self._node_counts, ctypes.c_int64),
            _ptr(self._feat, ctypes.c_float),
            _ptr(self._node_feat_offsets, ctypes.c_int64),
            self._feat_dim,
            _ptr(sel_arr, ctypes.c_int64), sel_arr.shape[0],
            spec.n_node, spec.n_edge, spec.n_graph,
            _ptr(out_snd, ctypes.c_int32), _ptr(out_rcv, ctypes.c_int32),
            _ptr(out_edge_mask, ctypes.c_uint8),
            _ptr(out_node_mask, ctypes.c_uint8),
            _ptr(out_node_graph, ctypes.c_int32),
            _ptr(out_feat, ctypes.c_float),
            _ptr(out_perm, ctypes.c_int32),
            _ptr(out_snd_sorted, ctypes.c_int32),
            _ptr(out_counts, ctypes.c_int64))
        if rc != 0:
            raise ValueError(
                f"selection of {sel_arr.shape[0]} graphs exceeds PadSpec {spec}")

        y = None
        if self._ys is not None:
            yv = np.concatenate([self._ys[i] for i in sel_arr])
            pad = np.zeros((spec.n_graph - yv.shape[0],) + yv.shape[1:],
                           yv.dtype)
            y = np.concatenate([yv, pad])
            if y.shape[-1] == 1:
                y = y[..., 0]

        graph_mask = np.arange(spec.n_graph) < sel_arr.shape[0]
        return GraphBatch(
            senders=jnp.asarray(out_snd),
            receivers=jnp.asarray(out_rcv),
            nodes=jnp.asarray(out_feat) if self._feat_dim else None,
            edges=None,
            y=None if y is None else jnp.asarray(y),
            node_mask=jnp.asarray(out_node_mask.astype(bool)),
            edge_mask=jnp.asarray(out_edge_mask.astype(bool)),
            graph_mask=jnp.asarray(graph_mask),
            node_graph=jnp.asarray(out_node_graph),
            n_node=jnp.asarray(int(out_counts[0]), jnp.int32),
            n_edge=jnp.asarray(int(out_counts[1]), jnp.int32),
            n_graph=jnp.asarray(int(out_counts[2]), jnp.int32),
            senders_perm=jnp.asarray(out_perm),
            senders_sorted=jnp.asarray(out_snd_sorted),
            receivers_by_sender=jnp.asarray(out_rcv[out_perm]),
            edge_mask_by_sender=jnp.asarray(
                out_edge_mask[out_perm].astype(bool)),
            in_degrees=jnp.asarray(np.bincount(
                out_rcv[:int(out_counts[1])],
                minlength=spec.n_node).astype(np.int32)),
        )


def degree_onehot_features(graphs: Sequence[dict], max_degree: int = 35
                           ) -> None:
    """Attach one-hot (clipped out-)degree node features natively, in place.

    Native counterpart of the reference's `Degree` transform
    (graph_classification_utils.py:31-36): dim = max_degree + 1.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native batcher unavailable")
    n_graphs = len(graphs)
    node_counts = np.fromiter((int(g["n_node"]) for g in graphs),
                              np.int64, n_graphs)
    snd = [np.asarray(g["senders"], np.int32) for g in graphs]
    edge_offsets = np.zeros(n_graphs + 1, np.int64)
    np.cumsum([s.shape[0] for s in snd], out=edge_offsets[1:])
    senders = np.concatenate(snd) if snd else np.zeros(0, np.int32)
    feat_offsets = np.zeros(n_graphs + 1, np.int64)
    np.cumsum(node_counts, out=feat_offsets[1:])
    dim = max_degree + 1
    out = np.zeros((int(feat_offsets[-1]), dim), np.float32)
    lib.degree_onehot(
        _ptr(senders, ctypes.c_int32), _ptr(edge_offsets, ctypes.c_int64),
        _ptr(node_counts, ctypes.c_int64), _ptr(feat_offsets, ctypes.c_int64),
        n_graphs, max_degree, _ptr(out, ctypes.c_float))
    for g, lo, hi in zip(graphs, feat_offsets[:-1], feat_offsets[1:]):
        g["nodes"] = out[int(lo):int(hi)]
