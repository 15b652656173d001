"""HPO subsystem: API compatibility and TPE convergence sanity."""
import math

import numpy as np

from kagnn_tpu.train.hpo import RandomSampler, TPESampler, create_study


def quadratic(trial):
    x = trial.suggest_float("x", -5.0, 5.0)
    y = trial.suggest_int("y", 0, 10)
    return (x - 1.7) ** 2 + (y - 4) ** 2


def test_api_surface():
    study = create_study(direction="minimize", sampler=RandomSampler(seed=0))
    study.optimize(quadratic, n_trials=30)
    assert len(study.trials) == 30
    assert set(study.best_params) == {"x", "y"}
    assert study.best_value == min(t.value for t in study.trials)


def test_tpe_beats_random():
    results = {}
    for name, sampler in [("rand", RandomSampler(seed=1)),
                          ("tpe", TPESampler(seed=1, n_startup_trials=10))]:
        vals = []
        for seed in range(5):
            s = create_study(sampler=type(sampler)(seed=seed))
            s.optimize(quadratic, n_trials=60)
            vals.append(s.best_value)
        results[name] = np.mean(vals)
    # TPE should find better optima than pure random on average
    assert results["tpe"] <= results["rand"] * 1.05, results


def test_log_scale_and_categorical():
    def obj(trial):
        lr = trial.suggest_float("lr", 1e-5, 1e-1, log=True)
        kind = trial.suggest_categorical("kind", ["a", "b", "c"])
        bonus = {"a": 0.0, "b": 1.0, "c": 2.0}[kind]
        return abs(math.log10(lr) + 3) + bonus

    s = create_study(sampler=TPESampler(seed=3))
    s.optimize(obj, n_trials=80)
    assert s.best_params["kind"] == "a"
    assert 1e-4 < s.best_params["lr"] < 1e-2


def test_maximize_direction():
    def obj(trial):
        x = trial.suggest_float("x", 0, 1)
        return -(x - 0.5) ** 2

    s = create_study(direction="maximize", sampler=TPESampler(seed=0))
    s.optimize(obj, n_trials=50)
    assert abs(s.best_params["x"] - 0.5) < 0.2
