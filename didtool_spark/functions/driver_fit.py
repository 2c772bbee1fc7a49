"""Driver-side binning fits over Spark-aggregated (value, count0, count1)
tables — pure numpy, no sklearn/lightgbm/scipy dependency.

The distributed part of every supervised binning fit is ONE aggregation
(``groupBy(x).agg(sum(1-y), sum(y))``); the sequential split search then
runs on the driver over distinct values (<< rows). Semantics replicate
the reference exactly (citations per function):

- cart_thresholds  ~ sklearn DecisionTreeClassifier(min_samples_leaf,
  max_leaf_nodes) as used by reference cut.py:142-151 (dt_cut): gini,
  best-first growth by weighted impurity decrease, midpoint thresholds,
  first-best tie-break.
- lgb_thresholds   ~ LGBMClassifier(n_estimators=1, num_leaves,
  min_child_samples) as used by cut.py:200-221 (lgb_cut): histogram
  boundaries with the zero-as-one-bin rule + min_data_in_bin=3,
  constant-hessian logloss gradients from boost_from_average init,
  leaf-wise growth by split gain.
- chimerge_edges   ~ cut.py:253-354 (chi_square_cut): ChiMerge with the
  chi2.isf(cf, n_bins-1) stop threshold (chi2_isf below).
"""

from __future__ import annotations

import heapq
import math

import numpy as np

# ------------------------------------------------------------------ chi2

def _gammainc_upper_reg(a: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(a, x) via series/continued
    fraction (standard Numerical-Recipes-style formulas)."""
    if x < 0 or a <= 0:
        raise ValueError
    if x == 0:
        return 1.0
    if x < a + 1.0:
        # P via series, Q = 1 - P
        ap, summ, delta = a, 1.0 / a, 1.0 / a
        for _ in range(500):
            ap += 1.0
            delta *= x / ap
            summ += delta
            if abs(delta) < abs(summ) * 1e-16:
                break
        p = summ * math.exp(-x + a * math.log(x) - math.lgamma(a))
        return 1.0 - p
    # Q via continued fraction (Lentz)
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-16:
            break
    return h * math.exp(-x + a * math.log(x) - math.lgamma(a))


def chi2_isf(p: float, df: int) -> float:
    """Inverse survival function of the chi-square distribution:
    x such that Q(df/2, x/2) = p. Bisection to ~1e-12 relative."""
    a = df / 2.0
    lo, hi = 0.0, 1.0
    while _gammainc_upper_reg(a, hi / 2.0) > p:
        hi *= 2.0
        if hi > 1e9:
            break
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if _gammainc_upper_reg(a, mid / 2.0) > p:
            lo = mid
        else:
            hi = mid
        if hi - lo <= 1e-12 * max(1.0, hi):
            break
    return 0.5 * (lo + hi)


# --------------------------------------------- weighted unsupervised cuts

def step_edges_weighted(
    values: np.ndarray, counts: np.ndarray, n_bins: int, remove_empty: bool = True
) -> list[float]:
    """pd.cut equal-width interior edges over a weighted distinct-value
    sample (cut.py:43-54 semantics incl. empty-bin merge)."""
    order = np.argsort(values, kind="mergesort")
    v, c = values[order].astype(float), counts[order].astype(float)
    mn, mx = v[0], v[-1]
    edges = np.linspace(mn, mx, n_bins + 1)
    interior = list(edges[1:-1])
    if not remove_empty:
        return [float(e) for e in interior]
    # occupancy: bin i = count of interior edges < x (right-closed)
    bidx = np.searchsorted(np.array(interior), v, side="left")
    present = set(int(b) for b, w in zip(bidx, c) if w > 0)
    return [float(interior[i - 1]) for i in range(1, n_bins) if i in present]


def _weighted_order_stat(v: np.ndarray, cum: np.ndarray, pos: float) -> float:
    """Order statistic (0-indexed, linear interpolation) of the expanded
    weighted sample — bit-identical to numpy percentile 'linear'
    (two-sided lerp: interpolate from the right when gamma >= 0.5)."""
    lo_i = int(math.floor(pos))
    hi_i = int(math.ceil(pos))
    gamma = pos - lo_i

    def order_stat(i: int) -> float:
        k = int(np.searchsorted(cum, i, side="left"))  # first k: cum[k] >= i
        return float(v[k])

    lo_v = order_stat(lo_i)
    if hi_i == lo_i:
        return lo_v
    hi_v = order_stat(hi_i)
    diff = hi_v - lo_v
    if gamma >= 0.5:  # numpy _lerp computes from the right for t >= 0.5
        return hi_v - diff * (1.0 - gamma)
    return lo_v + diff * gamma


def quantile_edges_weighted(
    values: np.ndarray, counts: np.ndarray, n_bins: int
) -> list[float]:
    """pd.qcut interior edges (duplicates dropped, cut.py:94-95) over a
    weighted distinct-value sample. Positions replicate pandas exactly:
    Series.quantile routes through nanpercentile(q * 100), and the
    *100/100 round-trip shifts the virtual index by an ulp — enough to
    flip the duplicate-drop at run boundaries."""
    order = np.argsort(values, kind="mergesort")
    v, c = values[order].astype(float), counts[order].astype(float)
    n = c.sum()
    cum = np.cumsum(c) - 1  # cum[k] = last expanded index of value k
    qs = np.linspace(0, 1, n_bins + 1)
    edges = [
        _weighted_order_stat(v, cum, (float(q) * 100.0 / 100.0) * (n - 1.0))
        for q in qs
    ]
    uniq: list[float] = []
    for e in edges:
        if not uniq or e > uniq[-1]:
            uniq.append(e)
    return uniq[1:-1]


# ------------------------------------------------------------------ CART

def _gini_cost(c0: float, c1: float) -> float:
    """n * gini(node) — the weighted child cost term."""
    n = c0 + c1
    if n <= 0:
        return 0.0
    return n * (1.0 - (c0 / n) ** 2 - (c1 / n) ** 2)


def cart_thresholds(
    values: np.ndarray,
    c0: np.ndarray,
    c1: np.ndarray,
    max_leaf_nodes: int,
    min_samples_leaf: int = 1,
) -> list[float]:
    """1-D CART (gini) split thresholds, sklearn-equivalent best-first
    growth (cf. reference cut.py:142-151). Exact for 1-D because splits
    depend only on sorted distinct values + class counts."""
    order = np.argsort(values, kind="mergesort")
    v, a0, a1 = values[order].astype(float), c0[order].astype(float), c1[order].astype(float)
    p0 = np.concatenate([[0.0], np.cumsum(a0)])
    p1 = np.concatenate([[0.0], np.cumsum(a1)])

    def best_split(lo: int, hi: int):
        """Best split of distinct-value range [lo, hi); returns
        (cost_decrease_like, split_index k, threshold) or None.
        k: left = [lo, k), right = [k, hi)."""
        n0, n1 = p0[hi] - p0[lo], p1[hi] - p1[lo]
        node_cost = _gini_cost(n0, n1)
        if hi - lo < 2 or node_cost <= 1e-12 or (n0 + n1) < 2:
            return None
        best = None
        for k in range(lo + 1, hi):
            l0, l1 = p0[k] - p0[lo], p1[k] - p1[lo]
            r0, r1 = n0 - l0, n1 - l1
            if (l0 + l1) < min_samples_leaf or (r0 + r1) < min_samples_leaf:
                continue
            cost = _gini_cost(l0, l1) + _gini_cost(r0, r1)
            if best is None or cost < best[0] - 1e-12:
                thr = (v[k - 1] + v[k]) / 2.0
                if thr == v[k]:
                    thr = v[k - 1]
                best = (cost, k, thr)
        if best is None:
            return None
        improvement = node_cost - best[0]
        if improvement <= 1e-12:
            return None
        return (improvement, best[1], best[2])

    thresholds: list[float] = []
    counter = 0
    heap: list = []
    root = best_split(0, len(v))
    if root:
        heapq.heappush(heap, (-root[0], counter, 0, len(v), root))
        counter += 1
    n_leaves = 1
    while heap and n_leaves < max_leaf_nodes:
        _, _, lo, hi, (imp, k, thr) = heapq.heappop(heap)
        thresholds.append(thr)
        n_leaves += 1
        for clo, chi_ in ((lo, k), (k, hi)):
            s = best_split(clo, chi_)
            if s:
                heapq.heappush(heap, (-s[0], counter, clo, chi_, s))
                counter += 1
    return sorted(thresholds)


# --------------------------------------------------------------- LightGBM

_K_ZERO = 1e-35  # LightGBM kZeroThreshold


def _greedy_find_bin(
    v: np.ndarray, cnt: np.ndarray, max_bin: int, total_cnt: int, min_data_in_bin: int
) -> list[float]:
    """LightGBM GreedyFindBin upper bounds for one sign-side of the data
    (distinct-values <= max_bin path, with min_data_in_bin merging; the
    >max_bin path approximates with mean-size greedy accumulation)."""
    bounds: list[float] = []
    if len(v) <= max_bin:
        cur = 0
        for i in range(len(v) - 1):
            cur += int(cnt[i])
            if cur >= min_data_in_bin:
                val = float(np.nextafter((v[i] + v[i + 1]) / 2.0, np.inf))
                if not bounds or val > bounds[-1]:
                    bounds.append(val)
                    cur = 0
    else:
        mean_size = max(float(total_cnt) / max_bin, float(min_data_in_bin))
        cur = 0
        for i in range(len(v) - 1):
            cur += int(cnt[i])
            if cur >= mean_size:
                val = float(np.nextafter((v[i] + v[i + 1]) / 2.0, np.inf))
                if not bounds or val > bounds[-1]:
                    bounds.append(val)
                    cur = 0
    bounds.append(float("inf"))
    return bounds


def _lgb_bin_bounds(
    values: np.ndarray, cnt: np.ndarray, max_bin: int = 255, min_data_in_bin: int = 3
) -> list[float]:
    """FindBinWithZeroAsOneBin: zero gets its own bin
    (-kZero, kZero]; each sign side binned independently."""
    total = int(cnt.sum())
    left = values < -_K_ZERO
    right = values > _K_ZERO
    bounds: list[float] = []
    if left.any():
        lb = _greedy_find_bin(values[left], cnt[left], max_bin, total, min_data_in_bin)
        lb[-1] = -_K_ZERO
        bounds.extend(lb)
    if right.any():
        bounds.append(_K_ZERO)
        bounds.extend(
            _greedy_find_bin(values[right], cnt[right], max_bin, total, min_data_in_bin)
        )
    else:
        bounds.append(float("inf"))
    return bounds


def lgb_thresholds(
    values: np.ndarray,
    c0: np.ndarray,
    c1: np.ndarray,
    num_leaves: int,
    min_child_samples: int = 1,
    min_sum_hessian: float = 1e-3,
    lambda_l2: float = 0.0,
    max_bin: int = 255,
    min_data_in_bin: int = 3,
) -> list[float]:
    """Single-tree LightGBM split thresholds (cf. reference
    cut.py:200-221): boost_from_average init makes per-row gradients
    g = p̄ - y, h = p̄(1-p̄) constant, so the first tree is a leaf-wise
    regression tree over histogram bins with gain G²/(H+λ)."""
    order = np.argsort(values, kind="mergesort")
    v = values[order].astype(float)
    a0, a1 = c0[order].astype(float), c1[order].astype(float)
    cnt = a0 + a1
    n, n1 = cnt.sum(), a1.sum()
    if n <= 0 or n1 <= 0 or n1 >= n:
        return []
    p = n1 / n
    # per-distinct-value gradient/hessian sums (g0 = p for y=0, g1 = p-1)
    G = a0 * p + a1 * (p - 1.0)
    H = cnt * (p * (1.0 - p))

    bounds = _lgb_bin_bounds(v, cnt, max_bin, min_data_in_bin)
    # histogram: bin index of each distinct value = count of bounds < v
    nb = len(bounds)
    bidx = np.searchsorted(np.array(bounds), v, side="left")
    hG = np.zeros(nb)
    hH = np.zeros(nb)
    hC = np.zeros(nb)
    np.add.at(hG, bidx, G)
    np.add.at(hH, bidx, H)
    np.add.at(hC, bidx, cnt)
    cG = np.concatenate([[0.0], np.cumsum(hG)])
    cH = np.concatenate([[0.0], np.cumsum(hH)])
    cC = np.concatenate([[0.0], np.cumsum(hC)])

    def leaf_gain(g: float, h: float) -> float:
        return g * g / (h + lambda_l2) if (h + lambda_l2) > 0 else 0.0

    def best_split(lo: int, hi: int):
        """Best bin-boundary split of bin range [lo, hi)."""
        g, h, c = cG[hi] - cG[lo], cH[hi] - cH[lo], cC[hi] - cC[lo]
        parent = leaf_gain(g, h)
        best = None
        for k in range(lo + 1, hi):
            lg, lh, lc = cG[k] - cG[lo], cH[k] - cH[lo], cC[k] - cC[lo]
            rg, rh, rc = g - lg, h - lh, c - lc
            if lc < min_child_samples or rc < min_child_samples:
                continue
            if lh < min_sum_hessian or rh < min_sum_hessian:
                continue
            gain = leaf_gain(lg, lh) + leaf_gain(rg, rh) - parent
            if gain > 1e-12 and (best is None or gain > best[0] + 1e-12):
                best = (gain, k, bounds[k - 1])
        return best

    leaves: list[tuple[int, int]] = [(0, nb)]
    splits: list[tuple] = [best_split(0, nb)]
    thresholds: list[float] = []
    while len(leaves) < num_leaves:
        cand = [(s[0], i) for i, s in enumerate(splits) if s is not None]
        if not cand:
            break
        _, i = max(cand, key=lambda t: (t[0], -t[1]))
        lo, hi = leaves[i]
        gain, k, thr = splits[i]
        thresholds.append(thr)
        leaves[i] = (lo, k)
        splits[i] = best_split(lo, k)
        leaves.append((k, hi))
        splits.append(best_split(k, hi))
    return sorted(thresholds)


# --------------------------------------------------------------- ChiMerge

def chimerge_edges(
    values: np.ndarray,
    c0: np.ndarray,
    c1: np.ndarray,
    n_bins: int,
    cf: float = 0.1,
) -> list[float]:
    """ChiMerge over pre-aggregated distinct values (cf. reference
    cut.py:276-345). The reference runs the merge over per-sample rows;
    equal-value adjacent rows have chi==0 and merge first, so the
    distinct-value aggregation is equivalent in practice (golden-test
    verified) and is the only scalable form.

    Returns finite edges [min-1e-4, ..., max+1e-4] like the reference
    (outer edges later replaced by ±inf by the caller when needed)."""
    order = np.argsort(values, kind="mergesort")
    v = values[order].astype(float)
    cnt0 = list(c0[order].astype(float))
    cnt1 = list(c1[order].astype(float))
    max_val = list(v)
    feature_min = float(v[0])

    threshold = chi2_isf(cf, n_bins - 1)

    def chi_pair(i: int) -> float:
        if max_val[i] == max_val[i + 1]:
            return 0.0
        a0, a1, b0, b1 = cnt0[i], cnt1[i], cnt0[i + 1], cnt1[i + 1]
        total = a0 + a1 + b0 + b1
        r0, r1 = (a0 + b0) / total, (a1 + b1) / total
        i1c, i0c = (a0 + a1) * r1, (a0 + a1) * r0
        j1c, j0c = (b0 + b1) * r1, (b0 + b1) * r0
        s = 0.0
        if i0c != 0:
            s += (a0 - i0c) ** 2 / i0c
        if i1c != 0:
            s += (a1 - i1c) ** 2 / i1c
        if j0c != 0:
            s += (b0 - j0c) ** 2 / j0c
        if j1c != 0:
            s += (b1 - j1c) ** 2 / j1c
        return s

    # Adjacent-pair chi values are maintained incrementally: a merge at
    # i only changes chi[i-1] and chi[i], so each iteration is one C
    # argmin + two scalar recomputes instead of an O(n) python rescan
    # (the rescan form is O(n^2) python calls — ~15s at 4k distinct
    # values). The vectorized initializer mirrors chi_pair's operation
    # order exactly, so values (and argmin tie-breaks: both take the
    # FIRST minimum) are bit-identical to the scalar loop.
    def chi_all() -> np.ndarray:
        a0 = np.array(cnt0[:-1])
        a1 = np.array(cnt1[:-1])
        b0 = np.array(cnt0[1:])
        b1 = np.array(cnt1[1:])
        total = a0 + a1 + b0 + b1
        r0, r1 = (a0 + b0) / total, (a1 + b1) / total
        i1c, i0c = (a0 + a1) * r1, (a0 + a1) * r0
        j1c, j0c = (b0 + b1) * r1, (b0 + b1) * r0
        with np.errstate(divide="ignore", invalid="ignore"):
            s = np.where(i0c != 0, (a0 - i0c) ** 2 / i0c, 0.0)
            s = s + np.where(i1c != 0, (a1 - i1c) ** 2 / i1c, 0.0)
            s = s + np.where(j0c != 0, (b0 - j0c) ** 2 / j0c, 0.0)
            s = s + np.where(j1c != 0, (b1 - j1c) ** 2 / j1c, 0.0)
        mv = np.array(max_val)
        return np.where(mv[:-1] == mv[1:], 0.0, s)

    chi = chi_all() if len(max_val) > 1 else np.empty(0)
    while len(max_val) > n_bins:
        min_i = int(np.argmin(chi))
        if chi[min_i] < threshold:
            cnt0[min_i] += cnt0[min_i + 1]
            cnt1[min_i] += cnt1[min_i + 1]
            max_val[min_i] = max_val[min_i + 1]
            del cnt0[min_i + 1], cnt1[min_i + 1], max_val[min_i + 1]
            chi = np.delete(chi, min_i)
            if min_i > 0:
                chi[min_i - 1] = chi_pair(min_i - 1)
            if min_i < len(max_val) - 1:
                chi[min_i] = chi_pair(min_i)
        else:
            break

    edges = [feature_min - 0.0001]
    for m in max_val:
        if m > edges[-1]:
            edges.append(m)
    edges[-1] = edges[-1] + 0.0001
    return edges


# ------------------------------------------------------ GBM importance

class NumpyGBM:
    """From-scratch histogram gradient-boosting binary classifier —
    the no-lightgbm driver-side model for Selector.drop_low_importance
    and the GBMModelSingle/Stacking wrappers (reference model.py trains
    lgb.LGBMClassifier; this reproduces the shape: logistic loss,
    quantile-binned features with a NaN bucket, greedy depth-limited
    trees, split-count feature_importances_, logloss early stopping on
    an eval set). RANKING/behavioral parity is the contract, not
    bit-parity with LightGBM.

    sklearn-ish surface: fit(X, y, eval_set=..., early_stopping_rounds),
    predict_proba(X) -> (n, 2), feature_importances_, best_iteration_.
    """

    def __init__(
        self,
        n_estimators: int = 100,
        learning_rate: float = 0.1,
        max_depth: int = 3,
        min_child_samples: int = 20,
        reg_lambda: float = 1.0,
        max_bins: int = 64,
        random_state: int = 0,
    ):
        self.n_estimators = int(n_estimators)
        self.learning_rate = float(learning_rate)
        self.max_depth = int(max_depth)
        self.min_child_samples = int(min_child_samples)
        self.reg_lambda = float(reg_lambda)
        self.max_bins = int(max_bins)
        self.random_state = int(random_state)
        self._qs: list[np.ndarray] = []
        self._trees: list = []
        self._tree_splits: list[np.ndarray] = []
        self._base: float = 0.0
        self.feature_importances_: np.ndarray | None = None
        self.best_iteration_: int | None = None

    # ------------------------------------------------------- binning
    def _fit_codes(self, X: np.ndarray) -> np.ndarray:
        self._qs = []
        codes = np.empty(X.shape, dtype=np.int16)
        for j in range(X.shape[1]):
            x = X[:, j]
            nan_mask = np.isnan(x)
            finite = x[~nan_mask]
            qs = (
                np.unique(
                    np.quantile(finite, np.linspace(0, 1, self.max_bins + 1)[1:-1])
                )
                if len(finite)
                else np.array([])
            )
            self._qs.append(qs)
            c = np.searchsorted(qs, x, side="left")
            c[nan_mask] = len(qs) + 1  # NaN bucket
            codes[:, j] = c
        return codes

    def _transform_codes(self, X: np.ndarray) -> np.ndarray:
        codes = np.empty(X.shape, dtype=np.int16)
        for j, qs in enumerate(self._qs):
            x = X[:, j]
            nan_mask = np.isnan(x)
            c = np.searchsorted(qs, x, side="left")
            c[nan_mask] = len(qs) + 1
            codes[:, j] = c
        return codes

    # ---------------------------------------------------------- trees
    def _grow_tree(self, codes, g, h, n_codes, rng, importance):
        """One greedy depth-limited tree; returns (tree, leaf_update)."""
        n = len(g)
        leaf_update = np.zeros(n)

        def build(rows, depth):
            G, H = g[rows].sum(), h[rows].sum()
            if depth >= self.max_depth or len(rows) < 2 * self.min_child_samples:
                v = -G / (H + self.reg_lambda)
                leaf_update[rows] = v
                return {"v": float(v)}
            parent_gain = G * G / (H + self.reg_lambda)
            best = None
            for j in rng.permutation(codes.shape[1]):
                cb = codes[rows, j]
                gb = np.bincount(cb, weights=g[rows], minlength=n_codes[j])
                hb = np.bincount(cb, weights=h[rows], minlength=n_codes[j])
                nb = np.bincount(cb, minlength=n_codes[j])
                gl, hl, nl = np.cumsum(gb)[:-1], np.cumsum(hb)[:-1], np.cumsum(nb)[:-1]
                gr, hr, nr = G - gl, H - hl, len(rows) - nl
                ok = (nl >= self.min_child_samples) & (nr >= self.min_child_samples)
                if not ok.any():
                    continue
                gain = np.where(
                    ok,
                    gl * gl / (hl + self.reg_lambda)
                    + gr * gr / (hr + self.reg_lambda),
                    -np.inf,
                )
                k = int(np.argmax(gain))
                if gain[k] > parent_gain + 1e-12 and (
                    best is None or gain[k] > best[0]
                ):
                    best = (float(gain[k]), int(j), k)
            if best is None:
                v = -G / (H + self.reg_lambda)
                leaf_update[rows] = v
                return {"v": float(v)}
            _, j, k = best
            importance[j] += 1.0
            mask = codes[rows, j] <= k
            return {
                "f": j,
                "k": int(k),
                "l": build(rows[mask], depth + 1),
                "r": build(rows[~mask], depth + 1),
            }

        tree = build(np.arange(n), 0)
        return tree, leaf_update

    @staticmethod
    def _apply_tree(tree, codes):
        out = np.empty(len(codes))

        def walk(node, rows):
            if "v" in node:
                out[rows] = node["v"]
                return
            mask = codes[rows, node["f"]] <= node["k"]
            walk(node["l"], rows[mask])
            walk(node["r"], rows[~mask])

        walk(tree, np.arange(len(codes)))
        return out

    # ------------------------------------------------------------ fit
    def fit(self, X, y, eval_set=None, early_stopping_rounds=None):
        X = np.asarray(X, dtype=float)
        y = np.asarray(y, dtype=float)
        rng = np.random.RandomState(self.random_state)
        codes = self._fit_codes(X)
        n_codes = np.array([len(q) + 2 for q in self._qs], dtype=np.int32)
        base = float(np.clip(y.mean(), 1e-6, 1 - 1e-6))
        self._base = float(np.log(base / (1 - base)))
        score = np.full(len(y), self._base)

        if eval_set is not None:
            Xv, yv = eval_set
            Xv = np.asarray(Xv, dtype=float)
            yv = np.asarray(yv, dtype=float)
            codes_v = self._transform_codes(Xv)
            score_v = np.full(len(yv), self._base)

        self._trees, self._tree_splits = [], []
        importance_total = np.zeros(X.shape[1])
        best_loss, best_iter, stall = np.inf, 0, 0
        for t in range(self.n_estimators):
            p = 1.0 / (1.0 + np.exp(-score))
            g = p - y
            h = p * (1.0 - p)
            imp_t = np.zeros(X.shape[1])
            tree, leaf_update = self._grow_tree(codes, g, h, n_codes, rng, imp_t)
            self._trees.append(tree)
            self._tree_splits.append(imp_t)
            importance_total += imp_t
            score = score + self.learning_rate * leaf_update
            if eval_set is not None:
                score_v = score_v + self.learning_rate * self._apply_tree(
                    tree, codes_v
                )
                pv = np.clip(1.0 / (1.0 + np.exp(-score_v)), 1e-12, 1 - 1e-12)
                loss = float(-(yv * np.log(pv) + (1 - yv) * np.log(1 - pv)).mean())
                if loss < best_loss - 1e-9:
                    best_loss, best_iter, stall = loss, t + 1, 0
                else:
                    stall += 1
                    if early_stopping_rounds and stall >= early_stopping_rounds:
                        break
        if eval_set is not None and early_stopping_rounds and best_iter:
            self.best_iteration_ = best_iter
            self._trees = self._trees[:best_iter]
            importance_total = np.sum(self._tree_splits[:best_iter], axis=0)
        else:
            self.best_iteration_ = len(self._trees)
        self.feature_importances_ = importance_total
        return self

    def predict_proba(self, X) -> np.ndarray:
        X = np.asarray(X, dtype=float)
        codes = self._transform_codes(X)
        score = np.full(len(X), self._base)
        for tree in self._trees:
            score = score + self.learning_rate * self._apply_tree(tree, codes)
        p1 = 1.0 / (1.0 + np.exp(-score))
        return np.column_stack([1.0 - p1, p1])


def gbm_split_importance(
    X: np.ndarray,
    y: np.ndarray,
    n_trees: int = 40,
    max_depth: int = 3,
    learning_rate: float = 0.1,
    max_bins: int = 64,
    min_child: int = 20,
    reg_lambda: float = 1.0,
    seed: int = 0,
) -> np.ndarray:
    """Split-count feature importance from NumpyGBM — the no-lightgbm
    fallback for Selector.drop_low_importance (reference
    selector.py:194-283 reads LGBMClassifier.feature_importances_,
    split count by default)."""
    m = NumpyGBM(
        n_estimators=n_trees, learning_rate=learning_rate,
        max_depth=max_depth, min_child_samples=min_child,
        reg_lambda=reg_lambda, max_bins=max_bins, random_state=seed,
    ).fit(np.asarray(X, dtype=float), np.asarray(y, dtype=float))
    return m.feature_importances_
