"""From-scratch Bayesian optimization (numpy only) for hyperparameter
search — the runtime has no ``bayes_opt``/sklearn, so this reimplements
the standard GP-UCB loop the reference drives through the public
BayesianOptimization package (reference didtool/model.py:306-370):
a Gaussian-process surrogate with a Matern-5/2 kernel over the
unit-scaled search box, lengthscale fitted by log-marginal-likelihood,
and an upper-confidence-bound acquisition (kappa=2.576, the package's
default), seeded with ``init_points`` random probes.

Everything here is DRIVER-side math on the handful of evaluated
hyperparameter points (n_iter + init_points rows, d <= ~10 columns) —
the expensive part of each iteration is the caller's objective (a
cross-validated model fit), never this surrogate. Nothing Spark-side
scales with it.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import numpy as np

__all__ = ["BayesOpt", "maximize"]

_SQRT5 = math.sqrt(5.0)


def _matern52(d: np.ndarray, ls: float) -> np.ndarray:
    """Matern nu=5/2 kernel on pairwise distances ``d``."""
    r = d / ls
    return (1.0 + _SQRT5 * r + 5.0 / 3.0 * r * r) * np.exp(-_SQRT5 * r)


def _cdist(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    d2 = (
        np.sum(a * a, axis=1)[:, None]
        + np.sum(b * b, axis=1)[None, :]
        - 2.0 * a @ b.T
    )
    return np.sqrt(np.maximum(d2, 0.0))


class _GP:
    """Minimal exact GP: zero mean over standardized targets, Matern-5/2,
    lengthscale chosen from a log-grid by marginal likelihood. Cubic in
    the number of OBSERVED points (tens), irrelevant next to the
    objective's cost."""

    def __init__(self, noise: float = 1e-6):
        self.noise = noise

    def fit(self, X: np.ndarray, y: np.ndarray) -> "_GP":
        self.X = X
        self.y_mean = float(np.mean(y))
        self.y_std = float(np.std(y)) or 1.0
        self.y = (y - self.y_mean) / self.y_std
        d = _cdist(X, X)
        best_ll, best = -np.inf, None
        for ls in np.geomspace(0.05, 3.0, 12):
            K = _matern52(d, ls) + (self.noise + 1e-10) * np.eye(len(X))
            try:
                L = np.linalg.cholesky(K)
            except np.linalg.LinAlgError:
                continue
            alpha = np.linalg.solve(L.T, np.linalg.solve(L, self.y))
            ll = (
                -0.5 * float(self.y @ alpha)
                - float(np.sum(np.log(np.diag(L))))
                - 0.5 * len(X) * math.log(2 * math.pi)
            )
            if ll > best_ll:
                best_ll, best = ll, (ls, L, alpha)
        if best is None:  # all-degenerate inputs: flat prior fallback
            self.ls, self.L, self.alpha = 1.0, None, None
            return self
        self.ls, self.L, self.alpha = best
        return self

    def predict(self, Xs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        if self.L is None:
            return (
                np.full(len(Xs), self.y_mean),
                np.full(len(Xs), self.y_std),
            )
        Ks = _matern52(_cdist(Xs, self.X), self.ls)
        mu = Ks @ self.alpha
        v = np.linalg.solve(self.L, Ks.T)
        var = np.maximum(1.0 - np.sum(v * v, axis=0), 1e-12)
        return mu * self.y_std + self.y_mean, np.sqrt(var) * self.y_std


class BayesOpt:
    """GP-UCB over a box ``{name: (lo, hi)}``. Same loop contract as the
    package the reference calls: ``maximize(f, n_iter)`` runs
    ``init_points`` seeded-random probes then ``n_iter`` GP-guided
    ones; ``max`` holds the best (params, target)."""

    def __init__(
        self,
        bounds: dict[str, tuple[float, float]],
        seed: int = 0,
        init_points: int = 5,
        kappa: float = 2.576,
        n_candidates: int = 2000,
    ):
        self.names: Sequence[str] = list(bounds)
        self.lo = np.array([bounds[k][0] for k in self.names], dtype=float)
        self.hi = np.array([bounds[k][1] for k in self.names], dtype=float)
        self.rng = np.random.RandomState(seed)
        self.init_points = init_points
        self.kappa = kappa
        self.n_candidates = n_candidates
        self._X: list[np.ndarray] = []  # unit-cube coords
        self._y: list[float] = []

    # ------------------------------------------------------------- api

    def _to_params(self, u: np.ndarray) -> dict:
        x = self.lo + u * (self.hi - self.lo)
        return dict(zip(self.names, map(float, x)))

    def register(self, params: dict, target: float) -> None:
        x = np.array([params[k] for k in self.names], dtype=float)
        span = np.where(self.hi > self.lo, self.hi - self.lo, 1.0)
        self._X.append((x - self.lo) / span)
        self._y.append(float(target))

    def suggest(self) -> dict:
        d = len(self.names)
        if len(self._y) < max(self.init_points, 2):
            return self._to_params(self.rng.rand(d))
        X = np.vstack(self._X)
        y = np.array(self._y)
        gp = _GP().fit(X, y)
        # global random candidates + local perturbations of the incumbent
        cand = self.rng.rand(self.n_candidates, d)
        best = X[int(np.argmax(y))]
        local = np.clip(
            best + self.rng.randn(self.n_candidates // 4, d) * 0.05, 0.0, 1.0
        )
        cand = np.vstack([cand, local])
        mu, sd = gp.predict(cand)
        return self._to_params(cand[int(np.argmax(mu + self.kappa * sd))])

    def maximize(self, f: Callable[..., float], n_iter: int = 10) -> dict:
        for _ in range(self.init_points + n_iter):
            params = self.suggest()
            self.register(params, f(**params))
        i = int(np.argmax(self._y))
        span = np.where(self.hi > self.lo, self.hi - self.lo, 1.0)
        x = self.lo + np.vstack(self._X)[i] * span
        self.max = {
            "params": dict(zip(self.names, map(float, x))),
            "target": float(self._y[i]),
        }
        return self.max


def maximize(
    f: Callable[..., float],
    bounds: dict[str, tuple[float, float]],
    n_iter: int = 10,
    seed: int = 0,
    init_points: int = 5,
) -> dict:
    """One-shot helper mirroring ``BayesianOptimization(f, space)
    .maximize(n_iter)``: returns ``{"params": ..., "target": ...}``."""
    return BayesOpt(bounds, seed=seed, init_points=init_points).maximize(
        f, n_iter=n_iter
    )
