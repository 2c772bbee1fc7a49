"""didtool-parity diagnostic plots rendered as SVG.

Mirrors the reference's matplotlib plot API (didtool/metric.py:313-756)
over Spark DataFrames: each function computes its curve with the
distributed operators in ``operators.metrics`` (one or two Spark jobs
over aggregated score tables — never a row-level collect), then renders
the already-tiny driver-side table with the dependency-free SVG writer
in ``functions.svgplot``. Returns the SVG string; pass
``out_path``/``file_name`` (the reference's save contract,
metric.py:346-348) to also write ``<out_path>/<file_name>``.

``n_score_bins`` on every score-curve plot selects the bounded-grid
curve path (chunk-partitioned prefix sums — no global sort window),
which is the form to use at the 100 TB scale; the exact path is the
small-data default, same contract as metrics.auc/ks.

Divergence from the reference, by design: files are .svg not .png
(no matplotlib in a cluster driver), and plot_layer_stability returns
its two panels (sample share / positive rate) as two charts instead of
one twin-axis figure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators import metrics as M
from . import svgplot as sp


def _maybe_save(svg: str, out_path: str | None, file_name: str) -> str:
    if out_path:
        sp.save(svg, out_path, file_name)
    return svg


def _score_axis(thresholds: list[float]) -> tuple[float, float]:
    """Threshold axis covering [0, 1] for probability scores and the
    actual data range otherwise (e.g. 300-700 scorecard scores or raw
    margins must not be drawn against a hard-coded unit axis)."""
    lo = min([t for t in thresholds if not _isnan(t)], default=0.0)
    hi = max([t for t in thresholds if not _isnan(t)], default=1.0)
    return (min(0.0, lo), max(1.0, hi))


def _isnan(v: float) -> bool:
    return v != v


def _auc_ks_of(curve) -> tuple[float, float]:
    """Trapezoid AUC + max(tpr-fpr) from a (fpr, tpr) table ordered by
    threshold desc — same derivation the reference applies to its
    sklearn curve (metric.py:332-334)."""
    fpr = [0.0] + [float(v) for v in curve["fpr"]]
    tpr = [0.0] + [float(v) for v in curve["tpr"]]
    auc = sum(
        (fpr[i] - fpr[i - 1]) * (tpr[i] + tpr[i - 1]) / 2.0
        for i in range(1, len(fpr))
    )
    ks = max(t - f for t, f in zip(tpr, fpr))
    return auc, ks


def plot_roc(
    df: DataFrame, label: str, score: str, out_path: str | None = None,
    file_name: str = "roc.svg", n_score_bins: int | None = None,
) -> str:
    """ROC curve with AUC/KS in the title (metric.py:313-348)."""
    curve = M.roc_curve(df, label, score, n_score_bins=n_score_bins)
    auc, ks = _auc_ks_of(curve)
    svg = sp.line_chart(
        [{"name": "ROC", "x": list(curve["fpr"]), "y": list(curve["tpr"])}],
        title="ROC curve (AUC=%.3f,KS=%.3f)" % (auc, ks),
        xlabel="False positive rate", ylabel="True positive rate",
        xlim=(0.0, 1.0), ylim=(0.0, 1.0), diagonal=True, legend=False,
    )
    return _maybe_save(svg, out_path, file_name)


def compare_roc(
    dfs: list[DataFrame], model_names: list[str], label: str, score: str,
    out_path: str | None = None, file_name: str = "roc_cmp.svg",
    n_score_bins: int | None = None,
) -> str:
    """Overlayed ROC per input frame, legend labelled
    name-AUC(x)-KS(y) like metric.py:351-392."""
    series = []
    for df, name in zip(dfs, model_names):
        curve = M.roc_curve(df, label, score, n_score_bins=n_score_bins)
        auc, ks = _auc_ks_of(curve)
        series.append({
            "name": "%s-AUC(%.3f)-KS(%.3f)" % (name, auc, ks),
            "x": list(curve["fpr"]), "y": list(curve["tpr"]),
        })
    svg = sp.line_chart(
        series, xlabel="False positive rate", ylabel="True positive rate",
        xlim=(0.0, 1.0), ylim=(0.0, 1.0), diagonal=True,
    )
    return _maybe_save(svg, out_path, file_name)


def plot_pr_curve(
    df: DataFrame, label: str, score: str, out_path: str | None = None,
    file_name: str = "pr.svg", n_score_bins: int | None = None,
) -> str:
    """Precision-recall curve; AP in the title is the step-sum
    sum((R_i - R_{i-1}) * P_i) over the curve points, the same estimator
    sklearn's average_precision_score applies (metric.py:413-416)."""
    curve = M.pr_curve(df, label, score, n_score_bins=n_score_bins)
    rec = [float(v) for v in curve["recall"]]
    prec = [float(v) for v in curve["precision"]]
    ap, prev_r = 0.0, 0.0
    for r, p in sorted(zip(rec, prec)):
        ap += (r - prev_r) * p
        prev_r = r
    svg = sp.line_chart(
        [{"name": "PR", "x": rec, "y": prec}],
        title="Precision-Recall curve: AP=%.3f" % ap,
        xlabel="Recall", ylabel="Precision",
        xlim=(0.0, 1.0), ylim=(0.0, 1.0), legend=False,
    )
    return _maybe_save(svg, out_path, file_name)


def plot_pr_threshold(
    df: DataFrame, label: str, score: str, out_path: str | None = None,
    file_name: str = "pr_threshold.svg", n_score_bins: int | None = None,
) -> str:
    """Precision and recall as functions of threshold
    (metric.py:430-467)."""
    curve = M.pr_curve(df, label, score, n_score_bins=n_score_bins)
    thr = [float(v) for v in curve["threshold"]]
    svg = sp.line_chart(
        [
            {"name": "Precision", "x": thr, "y": list(curve["precision"])},
            {"name": "Recall", "x": thr, "y": list(curve["recall"])},
        ],
        title="Precision and Recall Rate", xlabel="Thresholds",
        ylabel="Rate", xlim=_score_axis(thr), ylim=(0.0, 1.0),
    )
    return _maybe_save(svg, out_path, file_name)


def plot_ks(
    df: DataFrame, label: str, score: str, out_path: str | None = None,
    file_name: str = "pr_ks.svg", cal_method: str = "plot_ks_in_cum",
    n_score_bins: int | None = None,
) -> str:
    """KS plot, either cumulative-share form or tpr/fpr form
    (dispatcher parity with metric.py:470-501)."""
    if cal_method not in ("plot_ks_in_cum", "plot_ks_in_tpr_fpr"):
        raise ValueError("Invalid plot_ks mode!")
    if cal_method == "plot_ks_in_cum":
        return plot_ks_in_cum(
            df, label, score, out_path=out_path, file_name=file_name,
            n_score_bins=n_score_bins,
        )
    return plot_ks_in_tpr_fpr(
        df, label, score, out_path=out_path, file_name=file_name,
        n_score_bins=n_score_bins,
    )


def plot_ks_in_cum(
    df: DataFrame, label: str, score: str, out_path: str | None = None,
    file_name: str = "pr_ks.svg", n_points: int = 100,
    n_score_bins: int | None = None,
) -> str:
    """Cumulative bad/good share over the score-ranked population, KS
    annotated at its argmax (metric.py:504-586)."""
    curve = M.ks_curve(
        df, label, score, n_points=n_points, n_score_bins=n_score_bins
    )
    pop = [float(b) / n_points for b in curve["bucket"]]
    ks_vals = [float(v) for v in curve["ks"]]
    i_max = max(range(len(ks_vals)), key=ks_vals.__getitem__)
    series = [
        {"name": "cum_bad", "x": pop, "y": list(curve["cum_bad"])},
        {"name": "cum_good", "x": pop, "y": list(curve["cum_good"])},
        {"name": "ks", "x": pop, "y": ks_vals, "dashed": True},
    ]
    svg = sp.line_chart(
        series, title="KS=%.3f at pop=%.2f" % (ks_vals[i_max], pop[i_max]),
        xlabel="Population share (score desc)", ylabel="Cumulative share",
        xlim=(0.0, 1.0), ylim=(0.0, 1.0),
    )
    return _maybe_save(svg, out_path, file_name)


def plot_ks_in_tpr_fpr(
    df: DataFrame, label: str, score: str, out_path: str | None = None,
    file_name: str = "pr_ks.svg", n_score_bins: int | None = None,
) -> str:
    """KS as max vertical gap between tpr and fpr over thresholds
    (metric.py:589-628)."""
    curve = M.roc_curve(df, label, score, n_score_bins=n_score_bins)
    thr = [float(v) for v in curve["threshold"]]
    tpr = [float(v) for v in curve["tpr"]]
    fpr = [float(v) for v in curve["fpr"]]
    gaps = [t - f for t, f in zip(tpr, fpr)]
    i_max = max(range(len(gaps)), key=gaps.__getitem__)
    svg = sp.line_chart(
        [
            {"name": "tpr", "x": thr, "y": tpr},
            {"name": "fpr", "x": thr, "y": fpr},
        ],
        title="KS=%.3f at threshold=%.3f" % (gaps[i_max], thr[i_max]),
        xlabel="Threshold", ylabel="Rate",
        xlim=_score_axis(thr), ylim=(0.0, 1.0),
    )
    return _maybe_save(svg, out_path, file_name)


def plot_distribution(
    df: DataFrame, col: str, out_path: str | None = None,
    file_name: str | None = None, n_bins: int = 10,
) -> str:
    """Step-binned histogram of a column (metric.py:263-310 data via
    operators.metrics.distribution, bars per bin label)."""
    table = M.distribution(df, col, n_bins=n_bins)
    svg = sp.bar_chart(
        [str(r) for r in table["range"]],
        [float(c) for c in table["count"]],
        title=f"Distribution of {col}", ylabel="Count",
        width=max(640, 70 * len(table)),
    )
    return _maybe_save(svg, out_path, file_name or f"dist_{col}.svg")


def plot_psi(
    expected: DataFrame, actual: DataFrame, col: str, n_bins: int = 10,
    is_continuous: bool = True, out_path: str | None = None,
    file_name: str | None = None,
) -> str:
    """The reference's psi(plot=True) figure (metric.py:227-260):
    expected vs actual rate per bin as grouped bars, PSI in the
    title."""
    value, detail = M.psi(
        expected, actual, col, n_bins=n_bins,
        is_continuous=is_continuous, detail=True,
    )
    svg = sp.grouped_bar_chart(
        [str(i) for i in detail.index],
        [
            {"name": "expected", "values": [float(v) for v in detail["expect"]]},
            {"name": "actual", "values": [float(v) for v in detail["actual"]]},
        ],
        title="PSI=%.4f for %s" % (value, col), ylabel="Rate",
        width=max(640, 56 * len(detail)),
    )
    return _maybe_save(svg, out_path, file_name or f"psi_{col}.svg")


def plot_layer_stability(
    df: DataFrame, prob_col: str, group_col: str, label_col: str,
    n_bins: int = 10, fig_title: str = "prob",
    out_path: str | None = None,
) -> dict[str, str]:
    """The two panels behind metric.py:701-756 — per prob-bin sample
    share and positive rate by group — as two SVGs keyed 'share' /
    'pos_rate' (saved as <fig_title>_share.svg / <fig_title>_pos_rate.svg)."""
    share, pos_rate = M.layer_stability_tables(
        df, prob_col, group_col, label_col, n_bins=n_bins
    )
    out = {}
    for key, table, ylab in (
        ("share", share, "Sample share"),
        ("pos_rate", pos_rate, "Positive rate"),
    ):
        series = [
            {
                "name": str(g),
                "x": [float(b) for b in table.index],
                "y": [float(v) for v in table[g]],
            }
            for g in table.columns
        ]
        svg = sp.line_chart(
            series, title=f"{fig_title} {ylab} by {group_col}",
            xlabel=f"{prob_col} quantile bin", ylabel=ylab,
        )
        out[key] = _maybe_save(svg, out_path, f"{fig_title}_{key}.svg")
    return out
