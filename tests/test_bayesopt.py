"""From-scratch GP-UCB Bayesian optimization (functions/bayesopt.py) —
numpy-only, no Spark session needed."""

import math

import numpy as np

from didtool_spark.functions.bayesopt import BayesOpt, _GP, maximize


def test_gp_interpolates_observations():
    rng = np.random.RandomState(0)
    X = rng.rand(12, 2)
    y = np.sin(3 * X[:, 0]) + X[:, 1] ** 2
    gp = _GP().fit(X, y)
    mu, sd = gp.predict(X)
    assert np.allclose(mu, y, atol=1e-3)
    assert (sd < 0.05).all()


def test_gp_uncertainty_grows_away_from_data():
    X = np.array([[0.5, 0.5]])
    y = np.array([1.0])
    gp = _GP().fit(np.vstack([X, X + 1e-3]), np.array([1.0, 1.0]))
    _, sd_near = gp.predict(np.array([[0.5, 0.5]]))
    _, sd_far = gp.predict(np.array([[0.0, 0.0]]))
    assert sd_far[0] > sd_near[0]


def test_maximize_finds_quadratic_optimum():
    """Smooth 2-d bowl: GP-UCB must land within 5% of the optimum with
    a budget where grid resolution alone can't (5 init + 15 guided)."""
    def f(x, y):
        return -((x - 3.2) ** 2) - 2 * (y + 1.4) ** 2

    res = maximize(f, {"x": (0.0, 10.0), "y": (-5.0, 5.0)}, n_iter=15, seed=1)
    assert res["target"] > -0.15
    assert abs(res["params"]["x"] - 3.2) < 0.4
    assert abs(res["params"]["y"] + 1.4) < 0.4


def test_guided_probes_beat_own_random_inits():
    """The GP-guided phase must improve on the best of the 5 random
    init probes — otherwise the surrogate is adding nothing."""
    def f(x, y):
        return -((x - 0.123) ** 2) - (y - 0.789) ** 2

    bo = BayesOpt({"x": (0.0, 1.0), "y": (0.0, 1.0)}, seed=3)
    bo.maximize(f, n_iter=12)
    init_best = max(bo._y[: bo.init_points])
    assert bo.max["target"] > init_best


def test_register_and_suggest_roundtrip():
    bo = BayesOpt({"a": (2.0, 8.0)}, seed=0)
    for v in (2.5, 4.0, 7.5, 3.0, 6.0):
        bo.register({"a": v}, -abs(v - 5.0))
    s = bo.suggest()
    assert 2.0 <= s["a"] <= 8.0


def test_degenerate_constant_bounds_do_not_crash():
    res = maximize(lambda a: a, {"a": (3.0, 3.0)}, n_iter=3, seed=0)
    assert res["params"]["a"] == 3.0
