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
