"""SVG rendering layer: primitives (pure Python) + the didtool-parity
plot functions over Spark curve operators (reference metric.py:313-756,
selector.py:285-418 — rendered without matplotlib)."""

from __future__ import annotations

import math
import re
import xml.etree.ElementTree as ET

import pytest

from didtool_spark.functions import svgplot as sp

SVG_NS = "{http://www.w3.org/2000/svg}"


def _parse(svg: str) -> ET.Element:
    return ET.fromstring(svg)


def _polylines(root: ET.Element) -> list[ET.Element]:
    return root.findall(f".//{SVG_NS}polyline")


class TestPrimitives:
    def test_line_chart_maps_data_to_pixels(self):
        svg = sp.line_chart(
            [{"name": "a", "x": [0.0, 0.5, 1.0], "y": [0.0, 0.5, 1.0]}],
            xlim=(0.0, 1.0), ylim=(0.0, 1.0), legend=False,
        )
        root = _parse(svg)
        (pl,) = _polylines(root)
        pts = [
            tuple(map(float, p.split(",")))
            for p in pl.attrib["points"].split()
        ]
        assert len(pts) == 3
        # identity data on identical [0,1] axes: pixel midpoint of the
        # segment must be the midpoint of the endpoints (linear scales)
        mx = (pts[0][0] + pts[2][0]) / 2
        my = (pts[0][1] + pts[2][1]) / 2
        assert pts[1] == pytest.approx((mx, my), abs=0.05)
        # y axis points up: larger y -> smaller pixel y
        assert pts[2][1] < pts[0][1]
        # x axis points right
        assert pts[2][0] > pts[0][0]

    def test_line_chart_skips_nan_and_draws_diagonal_and_legend(self):
        svg = sp.line_chart(
            [
                {"name": "a", "x": [0, 1, 2], "y": [1.0, float("nan"), 3.0]},
                {"name": "b", "x": [0, 2], "y": [2.0, 0.0], "dashed": True},
            ],
            diagonal=True,
        )
        root = _parse(svg)
        pls = _polylines(root)
        assert len(pls) == 2
        assert len(pls[0].attrib["points"].split()) == 2  # NaN dropped
        assert pls[1].attrib.get("stroke-dasharray")
        texts = [t.text for t in root.findall(f".//{SVG_NS}text")]
        assert "a" in texts and "b" in texts  # legend entries

    def test_bar_chart_horizontal_labels_and_proportions(self):
        svg = sp.bar_chart(
            ["feat_one", "f2"], [0.6, 0.3], horizontal=True, title="IV"
        )
        root = _parse(svg)
        rects = [
            r for r in root.findall(f".//{SVG_NS}rect")
            if r.attrib.get("stroke") == "#333"
        ]
        assert len(rects) == 2
        w0, w1 = float(rects[0].attrib["width"]), float(rects[1].attrib["width"])
        assert w0 / w1 == pytest.approx(2.0, rel=0.01)
        texts = [t.text for t in root.findall(f".//{SVG_NS}text")]
        assert "feat_one" in texts and "IV" in texts

    def test_histogram_bar_heights_scale_with_counts(self):
        svg = sp.histogram([0.0, 0.1, 0.2], [2, 6])
        root = _parse(svg)
        rects = [
            r for r in root.findall(f".//{SVG_NS}rect")
            if r.attrib.get("fill-opacity")
        ]
        h0, h1 = float(rects[0].attrib["height"]), float(rects[1].attrib["height"])
        assert h1 / h0 == pytest.approx(3.0, rel=0.01)

    def test_heatmap_cells_blank_nan_and_sign_colors(self):
        svg = sp.heatmap(
            [[1.0, -1.0], [float("nan"), 0.0]], ["r1", "r2"], ["c1", "c2"]
        )
        root = _parse(svg)
        cells = [
            r for r in root.findall(f".//{SVG_NS}rect")
            if r.attrib.get("fill", "").startswith("rgb")
        ]
        assert len(cells) == 3  # NaN cell not drawn
        fills = [c.attrib["fill"] for c in cells]
        assert "rgb(255,0,0)" in fills      # +1 -> full red
        assert "rgb(0,0,255)" in fills      # -1 -> full blue
        assert "rgb(255,255,255)" in fills  # 0 -> white

    def test_escaping_of_labels(self):
        svg = sp.line_chart(
            [
                {"name": "a<b&c", "x": [0, 1], "y": [0, 1]},
                {"name": "d", "x": [0, 1], "y": [1, 0]},
            ],
            title="x<y & z",
        )
        _parse(svg)  # would raise on raw < / &
        assert "a&lt;b&amp;c" in svg

    def test_ticks_are_inside_range(self):
        for lo, hi in [(0.0, 1.0), (-3.0, 7.0), (0.0, 0.003), (5.0, 5.0)]:
            ts = sp._ticks(lo, hi)
            assert ts, (lo, hi)
            assert all(t >= lo - 1e-9 for t in ts)

    def test_save_writes_file(self, tmp_path):
        svg = sp.histogram([0, 1], [1])
        full = sp.save(svg, str(tmp_path / "plots"), "h.svg")
        assert open(full).read() == svg


@pytest.fixture(scope="module")
def scored_df(spark):
    import pyspark.sql.functions as F

    df = spark.range(500).select(
        F.col("id"),
        (F.xxhash64("id", F.lit(1)) % 2 == 0).cast("int").alias("y"),
    )
    # score correlated with label -> AUC well above 0.5
    return df.withColumn(
        "p",
        (
            F.col("y") * 0.4
            + (F.abs(F.xxhash64("id", F.lit(2))) % 1000) / 1000.0 * 0.6
        ),
    )


class TestMetricPlots:
    def test_plot_roc_title_matches_metrics_auc(self, scored_df):
        from didtool_spark.functions.plots import plot_roc
        from didtool_spark.operators.metrics import auc

        svg = plot_roc(scored_df, "y", "p")
        root = _parse(svg)
        title = next(
            t.text for t in root.findall(f".//{SVG_NS}text")
            if t.text and t.text.startswith("ROC curve")
        )
        auc_in_title = float(re.search(r"AUC=([\d.]+)", title).group(1))
        assert auc_in_title == pytest.approx(
            auc(scored_df, "y", "p"), abs=2e-3
        )
        assert len(_polylines(root)) == 1

    def test_compare_roc_two_series(self, scored_df):
        from didtool_spark.functions.plots import compare_roc

        svg = compare_roc(
            [scored_df, scored_df.limit(200)], ["m1", "m2"], "y", "p"
        )
        root = _parse(svg)
        assert len(_polylines(root)) == 2
        assert "m1-AUC(" in svg and "m2-AUC(" in svg

    def test_plot_pr_and_threshold(self, scored_df):
        from didtool_spark.functions.plots import (
            plot_pr_curve, plot_pr_threshold,
        )

        svg = plot_pr_curve(scored_df, "y", "p")
        assert "Precision-Recall curve: AP=" in svg
        _parse(svg)
        svg2 = plot_pr_threshold(scored_df, "y", "p")
        assert len(_polylines(_parse(svg2))) == 2

    def test_plot_ks_both_methods_agree_on_ks(self, scored_df):
        from didtool_spark.functions.plots import plot_ks
        from didtool_spark.operators.metrics import ks

        ks_ref = ks(scored_df, "y", "p")
        for method in ("plot_ks_in_cum", "plot_ks_in_tpr_fpr"):
            svg = plot_ks(scored_df, "y", "p", cal_method=method)
            shown = float(re.search(r"KS=([\d.]+)", svg).group(1))
            assert shown == pytest.approx(ks_ref, abs=5e-3), method
        with pytest.raises(ValueError):
            plot_ks(scored_df, "y", "p", cal_method="nope")

    def test_binned_path_bounds_points(self, scored_df):
        from didtool_spark.functions.plots import plot_roc

        svg = plot_roc(scored_df, "y", "p", n_score_bins=16)
        (pl,) = _polylines(_parse(svg))
        assert len(pl.attrib["points"].split()) <= 17

    def test_non_probability_scores_stay_inside_canvas(self, scored_df):
        """Scorecard-scale scores (hundreds) must widen the threshold
        axis instead of spilling pixels past the plot frame."""
        import pyspark.sql.functions as F

        from didtool_spark.functions.plots import (
            plot_ks_in_tpr_fpr, plot_pr_threshold,
        )

        df = scored_df.withColumn("s", F.col("p") * 400 + 300)
        for fn in (plot_pr_threshold, plot_ks_in_tpr_fpr):
            svg = fn(df, "y", "s")
            root = _parse(svg)
            for pl in _polylines(root):
                for pt in pl.attrib["points"].split():
                    x, y = map(float, pt.split(","))
                    assert -5 <= x <= 700 and -5 <= y <= 700, fn.__name__

    def test_plot_distribution(self, scored_df):
        from didtool_spark.functions.plots import plot_distribution

        svg = plot_distribution(scored_df, "p", n_bins=5)
        _parse(svg)
        assert "Distribution of p" in svg

    def test_plot_layer_stability_two_panels(self, scored_df, tmp_path):
        import pyspark.sql.functions as F

        from didtool_spark.functions.plots import plot_layer_stability

        df = scored_df.withColumn(
            "g", (F.col("id") % 2).cast("string")
        )
        out = plot_layer_stability(
            df, "p", "g", "y", n_bins=4, fig_title="prob",
            out_path=str(tmp_path),
        )
        assert set(out) == {"share", "pos_rate"}
        for key, svg in out.items():
            assert len(_polylines(_parse(svg))) == 2  # one line per group
            assert (tmp_path / f"prob_{key}.svg").exists()

    def test_files_saved_with_reference_contract(self, scored_df, tmp_path):
        from didtool_spark.functions.plots import plot_roc

        plot_roc(scored_df, "y", "p", out_path=str(tmp_path))
        assert (tmp_path / "roc.svg").exists()


class TestSelectorPlots:
    def test_selector_plot_methods(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from didtool_spark.operators.selector import Selector

        df = spark.range(300).select(
            ((F.abs(F.xxhash64("id", F.lit(3))) % 100) / 100.0).alias("x1"),
            ((F.abs(F.xxhash64("id", F.lit(4))) % 100) / 100.0).alias("x2"),
            (F.xxhash64("id", F.lit(5)) % 2 == 0).cast("int").alias("y"),
        ).withColumn("x3", F.col("x1") * 0.99 + 0.001)  # correlated pair
        sel = Selector(df, "y")
        with pytest.raises(RuntimeError):
            sel.plot_missing()
        sel.drop_missing().drop_low_iv(0.0).drop_correlated(0.9)
        for svg in (
            sel.plot_missing(out_path=str(tmp_path)),
            sel.plot_iv(top_n=2),
            sel.plot_correlated(plot_all=True),
            sel.plot_correlated(),
        ):
            _parse(svg)
        assert (tmp_path / "missing.svg").exists()
        # missing histogram: 3 features, all complete -> last-bin count 0,
        # first bin 3 -> exactly one visible full-height bar
        svg = sel.plot_missing()
        rects = [
            r for r in _parse(svg).findall(f".//{SVG_NS}rect")
            if r.attrib.get("fill-opacity")
        ]
        heights = sorted(float(r.attrib["height"]) for r in rects)
        assert heights[-1] > 0 and math.isclose(sum(heights[:-1]), 0.0)


class TestScorecardPlot:
    def test_plot_bins_two_panels(self, tmp_path):
        import pandas as pd

        from didtool_spark.operators.scorecard import ScoreCardTransformer

        sc = ScoreCardTransformer(n_bins=4)
        with pytest.raises(RuntimeError):
            sc.plot_bins()
        sc.binning_df = pd.DataFrame({
            "hits": [10.0, 20.0, 30.0, 40.0],
            "bad_hits": [1.0, 4.0, 9.0, 20.0],
            "good_hits": [9.0, 16.0, 21.0, 20.0],
            "mean_prob": [0.1, 0.3, 0.5, 0.8],
            "score": [620.0, 560.0, 510.0, 450.0],
        })
        out = sc.plot_bins(out_path=str(tmp_path))
        assert set(out) == {"score", "rates"}
        for svg in out.values():
            _parse(svg)
        assert len(_polylines(_parse(out["rates"]))) == 2
        assert (tmp_path / "scorecard_bins_score.svg").exists()
        assert (tmp_path / "scorecard_bins_rates.svg").exists()


class TestGroupedBars:
    def test_grouped_bar_chart_geometry(self):
        svg = sp.grouped_bar_chart(
            ["a", "b"],
            [
                {"name": "expected", "values": [0.5, 0.25]},
                {"name": "actual", "values": [0.25, 0.5]},
            ],
        )
        root = _parse(svg)
        bars = [
            r for r in root.findall(f".//{SVG_NS}rect")
            if r.attrib.get("fill-opacity") == "0.85"
            and r.attrib.get("stroke") == "#333"
        ]
        assert len(bars) == 4
        # tallest bars are twice the short ones
        hs = sorted(float(r.attrib["height"]) for r in bars)
        assert hs[-1] / hs[0] == pytest.approx(2.0, rel=0.01)

    def test_plot_psi(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from didtool_spark.functions.plots import plot_psi
        from didtool_spark.operators.metrics import psi

        e = spark.range(400).select(
            ((F.abs(F.xxhash64("id", F.lit(9))) % 100) / 100.0).alias("v")
        )
        a = spark.range(400).select(
            ((F.abs(F.xxhash64("id", F.lit(10))) % 100) / 130.0).alias("v")
        )
        svg = plot_psi(e, a, "v", n_bins=4, out_path=str(tmp_path))
        _parse(svg)
        want = psi(e, a, "v", n_bins=4)
        shown = float(re.search(r"PSI=([\d.]+)", svg).group(1))
        assert shown == pytest.approx(want, abs=1e-4)
        assert (tmp_path / "psi_v.svg").exists()


class TestProperties:
    """Property-based invariants of the scale/tick math."""

    def test_ticks_properties(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=200, deadline=None)
        @given(
            st.floats(-1e6, 1e6, allow_nan=False),
            st.floats(1e-6, 1e6, allow_nan=False),
        )
        def check(lo, span):
            hi = lo + span
            ts = sp._ticks(lo, hi)
            assert 1 <= len(ts) <= 12
            assert all(b > a for a, b in zip(ts, ts[1:]))  # increasing
            assert all(lo - span <= t <= hi + span for t in ts)

        check()

    def test_points_inside_plot_box(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=100, deadline=None)
        @given(
            st.lists(
                st.floats(-1e3, 1e3, allow_nan=False), min_size=2, max_size=30
            )
        )
        def check(ys):
            xs = list(range(len(ys)))
            svg = sp.line_chart(
                [{"name": "s", "x": xs, "y": ys}], legend=False
            )
            root = _parse(svg)
            (pl,) = _polylines(root)
            f = sp.Frame(560, 560, (0, 1), (0, 1))
            for p in pl.attrib["points"].split():
                x, y = map(float, p.split(","))
                assert f.px0 - 1 <= x <= f.px1 + 1
                assert f.py0 - 30 <= y <= f.py1 + 1  # 5% headroom pad

        check()
