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


def test_tpe_beats_random_on_quadratic():
    """TPE quality gate (VERDICT round-1 item 9): on a seeded 2-D quadratic
    with the reference's search-space shapes (log lr + int width), TPE's
    best-of-50 must beat random's best-of-50 in >= 8/10 seeds."""
    from kagnn_tpu.train.hpo import RandomSampler, TPESampler, create_study

    def make_objective():
        def objective(trial):
            lr = trial.suggest_float("lr", 1e-5, 1e-2, log=True)
            hidden = trial.suggest_int("hidden", 2, 128)
            drop = trial.suggest_float("dropout", 0.0, 0.9)
            # smooth bowl with optimum at lr=1e-3, hidden=64, dropout=0.3
            return ((np.log10(lr) + 3.0) ** 2
                    + ((hidden - 64) / 64.0) ** 2
                    + (drop - 0.3) ** 2)
        return objective

    wins = 0
    for seed in range(10):
        s_tpe = create_study(sampler=TPESampler(seed=seed))
        s_tpe.optimize(make_objective(), n_trials=50)
        s_rnd = create_study(sampler=RandomSampler(seed=seed))
        s_rnd.optimize(make_objective(), n_trials=50)
        if s_tpe.best_value < s_rnd.best_value:
            wins += 1
    assert wins >= 8, f"TPE won only {wins}/10 seeds against random search"
