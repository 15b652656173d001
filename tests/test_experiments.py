"""Experiment-runner protocol tests (run_node_experiment,
graph_classification_protocol) on synthetic data with tiny budgets."""
import warnings

import numpy as np
import pytest

from kagnn_tpu.train.experiments import (graph_classification_protocol,
                                         run_node_experiment)


def test_run_node_experiment(tmp_path):
    warnings.simplefilter("ignore")
    params = {"conv_type": "gcn", "architecture": "fastkan",
              "hidden_channels": 16, "grid_size": 4, "lr": 5e-3,
              "dropout": 0.0, "epochs": 25, "patience": 10, "skip": True,
              "heads": 1, "hidden_layers": 2, "spline_order": 3}
    res = run_node_experiment(params, "Cora", data_root=str(tmp_path),
                              log_dir=str(tmp_path / "logs"), max_splits=2,
                              seed=0)
    assert 0.0 <= res["test_acc_mean"] <= 1.0
    assert len(res["test_accs"]) == 2
    assert res["test_acc_mean"] > 0.5  # synthetic communities are learnable
    # log file written
    logs = list((tmp_path / "logs").iterdir())
    assert len(logs) == 1


def test_graph_classification_protocol(tmp_path):
    calls = {"trials": 0, "retrains": 0}

    def trainer(params, fold):
        calls["retrains"] += 1
        return 0.8 + 0.01 * params["x"], 1234

    def objective(trial, fold):
        calls["trials"] += 1
        x = trial.suggest_float("x", 0, 1)
        return (x - 0.6) ** 2

    res = graph_classification_protocol(
        "FAKE", trainer, objective, str(tmp_path / "log"),
        n_outer_folds=2, n_trials=5, n_retrains=3, seed=0)
    assert calls["trials"] == 10 and calls["retrains"] == 6
    assert len(res["fold_accs"]) == 2
    assert res["best_hyperparams"][0]["x"] == pytest.approx(0.6, abs=0.4)


def test_run_node_experiment_reorder_and_sampling(tmp_path):
    """The reorder and neighbor-sampling paths wired into the node driver
    (VERDICT round-1 items 2a/4) run end-to-end and still learn."""
    warnings.simplefilter("ignore")
    base = {"conv_type": "gcn", "architecture": "fastkan",
            "hidden_channels": 16, "grid_size": 4, "lr": 5e-3,
            "dropout": 0.0, "epochs": 25, "patience": 10, "skip": True,
            "heads": 1, "hidden_layers": 2, "spline_order": 3}
    res = run_node_experiment({**base, "reorder": "rcm"}, "Cora",
                              data_root=str(tmp_path),
                              log_dir=None, max_splits=1, seed=0)
    assert res["test_acc_mean"] > 0.5

    res = run_node_experiment(
        {**base, "sampling": [8, 4], "sampling_batch": 32, "epochs": 10},
        "Cora", data_root=str(tmp_path), log_dir=None, max_splits=1, seed=0)
    assert res["test_acc_mean"] > 0.5


def test_batch_loader_native_prefetch_equivalence(rng):
    """batch_loader's native-assembler and prefetch paths must yield
    bit-identical batches to the pure-python path (VERDICT item 4)."""
    import jax
    import numpy as np

    from kagnn_tpu.data.native import native_available
    from kagnn_tpu.data.synthetic import random_molecule_graphs
    from kagnn_tpu.graphs import pad_spec_for
    from kagnn_tpu.train.experiments import batch_loader

    graphs = random_molecule_graphs(n_graphs=20, seed=4)
    for g in graphs:  # native path requires no edge features
        g["edges"] = None
    spec = pad_spec_for(graphs, 8)
    py = list(batch_loader(graphs, spec, 8, native=False)())
    pf = list(batch_loader(graphs, spec, 8, native=False, prefetch=2)())
    for a, b in zip(py, pf):
        for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    if native_available():
        nat = list(batch_loader(graphs, spec, 8, native=True, prefetch=2)())
        assert len(nat) == len(py)
        for a, b in zip(py, nat):
            for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
                np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
