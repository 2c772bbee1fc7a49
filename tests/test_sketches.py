"""Count-min sketch units: one-sided error guarantee, exactness at
width >> cardinality, distributive merge, hash-backend agreement,
weighted counts, readability expression spot-check."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from didtool_spark.operators.sketches import cms_build, cms_merge, cms_query


def _items(spark, freqs: dict[str, int]):
    rows = [(t,) for t, n in freqs.items() for _ in range(n)]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["item"]))


FREQS = {f"tok{i:03d}": (i % 17) + 1 for i in range(200)}


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5_60"])
def test_cms_one_sided_and_exact_when_wide(spark, hash_fn):
    df = _items(spark, FREQS)
    probe = spark.createDataFrame(
        pd.DataFrame({"item": list(FREQS)})
    )
    # narrow sketch: estimates may overshoot but never undershoot
    narrow = cms_build(df, "item", width=32, depth=3, hash_fn=hash_fn)
    est = cms_query(
        narrow, probe, "item", width=32, depth=3, hash_fn=hash_fn
    ).toPandas()
    exact = est.item.map(FREQS)
    assert (est.est >= exact).all()
    # wide sketch: 4096 cells for 200 items -> collisions vanish at
    # depth 4 with overwhelming probability under both hash families
    wide = cms_build(df, "item", width=4096, depth=4, hash_fn=hash_fn)
    est_w = cms_query(
        wide, probe, "item", width=4096, depth=4, hash_fn=hash_fn
    ).toPandas()
    assert (est_w.est == est_w.item.map(FREQS)).all()


def test_cms_unknown_item_estimates_small(spark):
    df = _items(spark, FREQS)
    sketch = cms_build(df, "item", width=2048, depth=4)
    probe = spark.createDataFrame(pd.DataFrame({"item": ["never-seen"]}))
    est = cms_query(sketch, probe, "item", width=2048, depth=4).toPandas()
    assert est.est.iloc[0] <= 2  # collisions only


def test_cms_merge_equals_union_build(spark):
    a = _items(spark, {k: v for k, v in FREQS.items() if v % 2 == 0})
    b = _items(spark, {k: v for k, v in FREQS.items() if v % 2 == 1})
    merged = cms_merge(
        cms_build(a, "item", width=64, depth=3),
        cms_build(b, "item", width=64, depth=3),
    )
    direct = cms_build(a.unionByName(b), "item", width=64, depth=3)
    m = merged.toPandas().sort_values(["j", "bucket"]).reset_index(drop=True)
    d = direct.toPandas().sort_values(["j", "bucket"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(m, d)


def test_cms_weighted(spark):
    pdf = pd.DataFrame({"item": ["a", "a", "b"], "w": [2, 3, 10]})
    df = spark.createDataFrame(pdf)
    sketch = cms_build(df, "item", width=512, depth=4, weight_col="w")
    probe = spark.createDataFrame(pd.DataFrame({"item": ["a", "b"]}))
    est = (
        cms_query(sketch, probe, "item", width=512, depth=4)
        .toPandas()
        .set_index("item")
    )
    assert est.loc["a", "est"] == 5
    assert est.loc["b", "est"] == 10


def test_cms_null_items_skipped(spark):
    pdf = pd.DataFrame({"item": ["a", None, "a"]})
    sketch = cms_build(
        spark.createDataFrame(pdf), "item", width=128, depth=2
    ).toPandas()
    assert sketch.n.sum() == 2 * 2  # two occurrences x depth


def test_readability_hand_check(spark):
    from didtool_spark.operators.text import with_readability

    text = "The cat sat. The dog ran away! Did it?"
    df = spark.createDataFrame(pd.DataFrame({"text": [text]}))
    out = with_readability(df, "text").toPandas().iloc[0]
    assert out.n_sentences == 3
    assert out.n_words == 9
    # vowel groups: e,a,a,e,o,a,a,ay,i,i -> 10
    assert out.n_syllables == 10
    wps, spw = 9 / 3, 10 / 9
    assert abs(out.flesch - (206.835 - 1.015 * wps - 84.6 * spw)) < 1e-9
    assert abs(out.fk_grade - (0.39 * wps + 11.8 * spw - 15.59)) < 1e-9


def test_readability_degenerate_doc(spark):
    from didtool_spark.operators.text import with_readability

    df = spark.createDataFrame(pd.DataFrame({"text": ["", "zzz"]}))
    out = with_readability(df, "text").toPandas()
    assert np.isfinite(out.flesch).all()
    assert (out.n_sentences == 1).all()


def test_cms_query_preserves_duplicates_and_odd_columns(spark):
    df = _items(spark, {"a": 3, "b": 1})
    sketch = cms_build(df, "item", width=128, depth=3)
    # duplicate probe rows + columns named like the sketch's internals
    probe = spark.createDataFrame(
        pd.DataFrame(
            {"item": ["a", "a", "b", None], "n": [9, 9, 9, 9],
             "j": [0, 0, 0, 0]}
        )
    )
    est = cms_query(sketch, probe, "item", width=128, depth=3).toPandas()
    assert len(est) == 4  # duplicates preserved
    assert set(est.columns) == {"item", "n", "j", "est"}
    a = est[est.item == "a"]
    assert len(a) == 2 and (a.est == 3).all()
    assert est[est.item.isna()].est.isna().all()
    with pytest.raises(ValueError):
        cms_query(sketch, probe.withColumnRenamed("n", "est"), "item")


def test_cms_query_rejects_mismatched_parameters(spark):
    # ADVICE r4: probing with the wrong width/depth/hash_fn re-hashes
    # items into the wrong cells and can UNDER-estimate — the sketch
    # carries its build parameters as column metadata and the probe
    # must agree
    df = _items(spark, {"a": 3, "b": 5})
    sketch = cms_build(df, "item", width=128, depth=3)
    probe = spark.createDataFrame(pd.DataFrame({"item": ["a"]}))
    with pytest.raises(ValueError, match="disagree"):
        cms_query(sketch, probe, "item", width=64, depth=3)
    with pytest.raises(ValueError, match="disagree"):
        cms_query(sketch, probe, "item", width=128, depth=4)
    with pytest.raises(ValueError, match="disagree"):
        cms_query(sketch, probe, "item", width=128, depth=3, hash_fn="md5_60")
    # matching parameters still fine
    est = cms_query(sketch, probe, "item", width=128, depth=3).toPandas()
    assert est.est.iloc[0] == 3


def test_cms_merge_rejects_mismatched_sketches(spark):
    df = _items(spark, {"a": 3})
    with pytest.raises(ValueError, match="disagree"):
        cms_merge(
            cms_build(df, "item", width=64, depth=3),
            cms_build(df, "item", width=128, depth=3),
        )
    # merge preserves the metadata so the guard survives a rollup
    merged = cms_merge(
        cms_build(df, "item", width=64, depth=3),
        cms_build(df, "item", width=64, depth=3),
    )
    probe = spark.createDataFrame(pd.DataFrame({"item": ["a"]}))
    with pytest.raises(ValueError, match="disagree"):
        cms_query(merged, probe, "item", width=128, depth=3)
    est = cms_query(merged, probe, "item", width=64, depth=3).toPandas()
    assert est.est.iloc[0] == 6
