"""Units for deterministic negative sampling: reproducibility across
partitionings, no-accidental-positive invariant, and the <=k contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from didtool_spark.operators.negatives import negative_samples


def _fixture(spark):
    pos = spark.createDataFrame(
        [(u, f"i{u % 4}") for u in range(30)] + [(0, "i3"), (1, "i2")],
        "user_id long, item_id string",
    )
    items = spark.createDataFrame(
        [(f"i{j}",) for j in range(10)], "item_id string"
    )
    return pos, items


def test_negatives_invariants(spark):
    pos, items = _fixture(spark)
    out = negative_samples(pos, items, k=3, item_col="item_id").collect()
    pos_set = {(r["user_id"], r["item_id"]) for r in pos.collect()}
    per_pair = {}
    for r in out:
        assert (r["user_id"], r["neg_item"]) not in pos_set  # never a positive
        per_pair.setdefault((r["user_id"], r["pos_item"]), []).append(r["j"])
    for js in per_pair.values():
        assert len(js) <= 3 and len(set(js)) == len(js)
    assert len(out) > 0


def test_negatives_deterministic_across_partitioning(spark):
    pos, items = _fixture(spark)
    a = negative_samples(pos, items, k=2, item_col="item_id").collect()
    b = negative_samples(
        pos.repartition(7), items.repartition(3), k=2, item_col="item_id"
    ).collect()
    key = lambda r: (r["user_id"], r["pos_item"], r["j"], r["neg_item"])
    assert sorted(map(key, a)) == sorted(map(key, b))
    # different seed -> different draw (overwhelmingly)
    c = negative_samples(pos, items, k=2, item_col="item_id", seed=7).collect()
    assert sorted(map(key, a)) != sorted(map(key, c))


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5_60"])
def test_negatives_engines_share_structure(spark, hash_fn):
    pos, items = _fixture(spark)
    out = negative_samples(
        pos, items, k=2, item_col="item_id", hash_fn=hash_fn
    )
    assert out.where(F.col("neg_item").isNull()).count() == 0
    assert out.count() > 0


def test_negatives_broadcast_plan(spark):
    import re

    from tests.test_plan_shape import plan_str

    pos, items = _fixture(spark)
    p = plan_str(negative_samples(pos, items, k=2, item_col="item_id"))
    assert "BroadcastHashJoin" in p  # the dim-index join
    assert "PythonUDF" not in p