"""Dataset parsers against synthetic raw files written to disk in the real
formats (TU text, ZINC pickles, geom-gcn text + npz splits)."""
import json
import os
import pickle

import numpy as np
import pytest

from kagnn_tpu.data.planetoid import load_geom_gcn
from kagnn_tpu.data.tu import load_tu_dataset
from kagnn_tpu.data.zinc import load_zinc


def test_tu_parser(tmp_path, rng):
    raw = tmp_path / "FAKE" / "raw"
    raw.mkdir(parents=True)
    # two graphs: triangle (3 nodes) and edge pair (2 nodes), 1-based ids
    edges = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1), (4, 5), (5, 4)]
    (raw / "FAKE_A.txt").write_text(
        "\n".join(f"{a}, {b}" for a, b in edges) + "\n")
    (raw / "FAKE_graph_indicator.txt").write_text("1\n1\n1\n2\n2\n")
    (raw / "FAKE_graph_labels.txt").write_text("1\n-1\n")
    (raw / "FAKE_node_labels.txt").write_text("0\n1\n0\n2\n1\n")
    graphs = load_tu_dataset("FAKE", str(tmp_path))
    assert len(graphs) == 2
    g0, g1 = graphs
    assert g0["n_node"] == 3 and g1["n_node"] == 2
    assert len(g0["senders"]) == 6 and len(g1["senders"]) == 2
    # labels remapped to 0..C-1 by sorted order: -1 -> 0, 1 -> 1
    assert int(g0["y"][0]) == 1 and int(g1["y"][0]) == 0
    # node labels one-hot over 3 classes
    assert g0["nodes"].shape == (3, 3)
    np.testing.assert_array_equal(g0["nodes"][1], [0, 1, 0])
    # second graph's edges are local ids
    assert g1["senders"].max() < 2


def test_tu_parser_degree_features(tmp_path):
    raw = tmp_path / "NOLAB" / "raw"
    raw.mkdir(parents=True)
    (raw / "NOLAB_A.txt").write_text("1, 2\n2, 1\n")
    (raw / "NOLAB_graph_indicator.txt").write_text("1\n1\n")
    (raw / "NOLAB_graph_labels.txt").write_text("0\n")
    graphs = load_tu_dataset("NOLAB", str(tmp_path))
    # degree one-hot, 36-dim (reference Degree transform)
    assert graphs[0]["nodes"].shape == (2, 36)
    np.testing.assert_array_equal(np.argmax(graphs[0]["nodes"], 1), [1, 1])


def test_zinc_parser(tmp_path):
    raw = tmp_path / "ZINC" / "raw"
    raw.mkdir(parents=True)
    for split, n in (("train", 4), ("val", 2), ("test", 2)):
        mols = []
        for i in range(n):
            nn_ = 3 + i
            adj = np.zeros((nn_, nn_), np.int64)
            for a in range(nn_ - 1):
                adj[a, a + 1] = adj[a + 1, a] = 1 + (a % 3)
            mols.append({"atom_type": np.arange(nn_) % 5,
                         "bond_type": adj,
                         "logP_SA_cycle_normalized": float(i) / 2})
        with open(raw / f"{split}.pickle", "wb") as f:
            pickle.dump(mols, f)
        (raw / f"{split}.index").write_text(
            ",".join(str(j) for j in range(min(2, n))))
    tr, va, te = load_zinc(str(tmp_path))
    assert len(tr) == 2 and len(va) == 2 and len(te) == 2  # subset indices
    g = tr[1]
    assert g["nodes"].shape[1] == 1 and g["edges"].shape[1] == 1
    assert g["senders"].shape[0] == 2 * (g["n_node"] - 1)
    assert float(g["y"][0]) == 0.5


def test_geom_gcn_parser(tmp_path, rng):
    raw = tmp_path / "Texas" / "raw"
    raw.mkdir(parents=True)
    n = 6
    lines = ["id\tfeat\tlabel"]
    for i in range(n):
        feats = ",".join(str(v) for v in rng.integers(0, 2, 4))
        lines.append(f"{i}\t{feats}\t{i % 3}")
    (raw / "out1_node_feature_label.txt").write_text("\n".join(lines) + "\n")
    (raw / "out1_graph_edges.txt").write_text(
        "src\tdst\n0\t1\n1\t2\n2\t3\n3\t4\n4\t5\n")
    for i in range(10):
        m = np.zeros(n, bool)
        m[i % n] = True
        np.savez(raw / f"texas_split_0.6_0.2_{i}.npz",
                 train_mask=m, val_mask=~m & (np.arange(n) < 3),
                 test_mask=~m & (np.arange(n) >= 3))
    d = load_geom_gcn("Texas", str(tmp_path))
    assert d["n_node"] == n and d["num_classes"] == 3
    assert d["train_masks"].shape == (10, n)
    # undirected + deduped, no self loops
    assert (d["senders"] != d["receivers"]).all()
    # row-normalized features
    sums = d["nodes"].sum(1)
    np.testing.assert_allclose(sums[sums > 0], 1.0, rtol=1e-5)


def test_planetoid_parser(tmp_path, rng):
    """ind.* pickle format incl. latin1 pickles, the permuted test.index
    reorder, graph-dict edges with duplicates/self-loops (VERDICT round-1
    item 5; reference format node_classification_clean/utils.py:44-47 via
    PyG Planetoid)."""
    import scipy.sparse as sp

    from kagnn_tpu.data.planetoid import load_planetoid

    raw = tmp_path / "Fake" / "raw"
    raw.mkdir(parents=True)
    n_allx, n_test, F, C = 560, 40, 8, 2
    n = n_allx + n_test
    allx = (rng.random((n_allx, F)) < 0.3).astype(np.float32)
    tx = (rng.random((n_test, F)) < 0.3).astype(np.float32)
    tx[:, 0] = 1.0  # no all-zero rows so normalization is deterministic
    allx[:, 0] = 1.0
    ally = np.eye(C)[rng.integers(0, C, n_allx)]
    ty = np.eye(C)[rng.integers(0, C, n_test)]
    x_tr = allx[:40]
    y_tr = ally[:40]
    # test ids are the contiguous tail but LISTED PERMUTED in test.index
    test_idx = rng.permutation(np.arange(n_allx, n)).astype(np.int64)
    graph = {0: [1, 1, 2, 0], 1: [0], 2: [0], 5: [599]}

    def dump(suf, obj):
        with open(raw / f"ind.fake.{suf}", "wb") as f:
            pickle.dump(obj, f, protocol=2)

    dump("x", sp.csr_matrix(x_tr))
    dump("y", y_tr)
    dump("allx", sp.csr_matrix(allx))
    dump("ally", ally)
    dump("tx", sp.csr_matrix(tx))
    dump("ty", ty)
    dump("graph", graph)
    (raw / "ind.fake.test.index").write_text(
        "\n".join(str(i) for i in test_idx) + "\n")

    d = load_planetoid("Fake", str(tmp_path))
    assert d["n_node"] == n
    # test.index reorder: node test_idx[i] carries tx[i] (row-normalized)
    want = tx / tx.sum(1, keepdims=True)
    np.testing.assert_allclose(d["nodes"][test_idx], want, rtol=1e-6)
    np.testing.assert_array_equal(d["y"][test_idx], ty.argmax(1))
    np.testing.assert_array_equal(d["y"][:n_allx], ally.argmax(1))
    # graph dict -> undirected, deduplicated, self-loops dropped
    e = set(zip(d["senders"].tolist(), d["receivers"].tolist()))
    assert e == {(0, 1), (1, 0), (0, 2), (2, 0), (5, 599), (599, 5)}
    # standard split: 20/class train, next 500 val, test at test.index
    assert d["train_masks"].shape == (10, n)
    np.testing.assert_array_equal(np.flatnonzero(d["train_masks"][0]),
                                  np.arange(C * 20))
    np.testing.assert_array_equal(np.flatnonzero(d["val_masks"][0]),
                                  np.arange(C * 20, C * 20 + 500))
    np.testing.assert_array_equal(np.sort(np.flatnonzero(d["test_masks"][0])),
                                  np.sort(test_idx))


def test_citeseer_isolated_test_nodes(tmp_path, rng):
    """CiteSeer's tx omits isolated test nodes; the parser re-densifies over
    the sorted test-index span (PyG read_planetoid_data parity)."""
    import scipy.sparse as sp

    from kagnn_tpu.data.planetoid import load_planetoid

    raw = tmp_path / "CiteSeer" / "raw"
    raw.mkdir(parents=True)
    F, C = 4, 2
    n_allx = 530
    # full test span is [530, 540) but only 7 test nodes exist in tx
    present = np.asarray([530, 531, 533, 535, 536, 538, 539])
    tx = rng.random((7, F)).astype(np.float32) + 0.5
    ty = np.eye(C)[rng.integers(0, C, 7)]
    allx = rng.random((n_allx, F)).astype(np.float32) + 0.5
    ally = np.eye(C)[rng.integers(0, C, n_allx)]

    def dump(suf, obj):
        with open(raw / f"ind.citeseer.{suf}", "wb") as f:
            pickle.dump(obj, f, protocol=2)

    dump("x", sp.csr_matrix(allx[:40]))
    dump("y", ally[:40])
    dump("allx", sp.csr_matrix(allx))
    dump("ally", ally)
    dump("tx", sp.csr_matrix(tx))
    dump("ty", ty)
    dump("graph", {0: [1], 1: [0]})
    perm = rng.permutation(7)
    (raw / "ind.citeseer.test.index").write_text(
        "\n".join(str(i) for i in present[perm]) + "\n")

    d = load_planetoid("CiteSeer", str(tmp_path))
    assert d["n_node"] == 540
    want = tx / tx.sum(1, keepdims=True)
    # Kipf/PyG semantics: after densify+reorder, tx row j lands on the node
    # listed j-th in test.index (file order)
    np.testing.assert_allclose(d["nodes"][present[perm]], want, rtol=1e-6)
    # isolated (absent) test nodes got zero features
    absent = np.asarray([532, 534, 537])
    np.testing.assert_array_equal(d["nodes"][absent], 0.0)


def test_ogbn_arxiv_parser(tmp_path, rng):
    """OGB directory layout: gzipped csvs + time split (VERDICT item 5;
    reference loads via PygNodePropPredDataset, utils.py:31-43)."""
    import gzip

    from kagnn_tpu.data.planetoid import load_ogbn_arxiv

    base = tmp_path / "ogbn-arxiv" / "arxiv"
    (base / "raw").mkdir(parents=True)
    (base / "split" / "time").mkdir(parents=True)
    n, F = 12, 5
    feats = rng.normal(size=(n, F)).astype(np.float32)
    labels = rng.integers(0, 3, n)
    edges = np.asarray([[0, 1], [1, 2], [2, 3], [3, 0], [4, 5]])

    def wcsv(path, arr, fmt):
        with gzip.open(path, "wt") as f:
            np.savetxt(f, arr, delimiter=",", fmt=fmt)

    wcsv(base / "raw" / "edge.csv.gz", edges, "%d")
    wcsv(base / "raw" / "node-feat.csv.gz", feats, "%.6f")
    wcsv(base / "raw" / "node-label.csv.gz", labels, "%d")
    wcsv(base / "split" / "time" / "train.csv.gz", np.arange(0, 6), "%d")
    wcsv(base / "split" / "time" / "valid.csv.gz", np.arange(6, 9), "%d")
    wcsv(base / "split" / "time" / "test.csv.gz", np.arange(9, 12), "%d")

    d = load_ogbn_arxiv(str(tmp_path))
    assert d["n_node"] == n and d["nodes"].shape == (n, F)
    np.testing.assert_allclose(d["nodes"], feats, rtol=1e-4)
    np.testing.assert_array_equal(d["y"], labels)
    e = set(zip(d["senders"].tolist(), d["receivers"].tolist()))
    for a, b in edges:
        assert (a, b) in e and (b, a) in e
    assert d["train_masks"][0, :6].all() and not d["train_masks"][0, 6:].any()
    assert d["test_masks"][0, 9:].all() and not d["test_masks"][0, :9].any()


def test_qm9_sdf_parser(tmp_path):
    """gdb9.sdf V2000 fixed-width blocks + gdb9.sdf.csv targets (VERDICT
    item 5; reference protocol optuna_qm9.py:144-150)."""
    from kagnn_tpu.data.zinc import load_qm9

    raw = tmp_path / "QM9" / "raw"
    raw.mkdir(parents=True)
    # methane-like (5 atoms, 4 bonds) + water-like (3 atoms, 2 bonds)
    sdf = """gdb_1
     RDKit          3D

  5  4  0  0  0  0  0  0  0  0999 V2000
    0.0000    0.0000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
    0.6300    0.6300    0.6300 H   0  0  0  0  0  0  0  0  0  0  0  0
   -0.6300   -0.6300    0.6300 H   0  0  0  0  0  0  0  0  0  0  0  0
   -0.6300    0.6300   -0.6300 H   0  0  0  0  0  0  0  0  0  0  0  0
    0.6300   -0.6300   -0.6300 H   0  0  0  0  0  0  0  0  0  0  0  0
  1  2  1  0
  1  3  1  0
  1  4  1  0
  1  5  1  0
M  END
$$$$
gdb_2
     RDKit          3D

  3  2  0  0  0  0  0  0  0  0999 V2000
    0.0000    0.0000    0.1173 O   0  0  0  0  0  0  0  0  0  0  0  0
    0.0000    0.7572   -0.4692 H   0  0  0  0  0  0  0  0  0  0  0  0
    0.0000   -0.7572   -0.4692 H   0  0  0  0  0  0  0  0  0  0  0  0
  1  2  1  0
  1  3  2  0
M  END
$$$$
"""
    (raw / "gdb9.sdf").write_text(sdf)
    hdr = ",".join(["mol_id"] + [f"t{i}" for i in range(19)])
    rows = ["gdb_1," + ",".join(str(float(i)) for i in range(19)),
            "gdb_2," + ",".join(str(float(i + 100)) for i in range(19))]
    (raw / "gdb9.sdf.csv").write_text(hdr + "\n" + "\n".join(rows) + "\n")

    graphs = load_qm9(str(tmp_path))
    assert len(graphs) == 2
    g0, g1 = graphs
    assert g0["n_node"] == 5 and g1["n_node"] == 3
    # atom types: C + 4H / O + 2H
    assert g0["nodes"][:, 0].tolist().count(g0["nodes"][0, 0]) == 1
    assert len(g0["senders"]) == 8  # 4 bonds, both directions
    assert len(g1["senders"]) == 4
    # bond types 0-indexed; water has a double bond -> type 1 present
    assert set(np.asarray(g1["edges"]).reshape(-1).tolist()) == {0, 1}
    np.testing.assert_allclose(g0["y"], np.arange(19, dtype=np.float32))
    np.testing.assert_allclose(g1["y"], np.arange(19, dtype=np.float32) + 100)
