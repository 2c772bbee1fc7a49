"""Units for the declarative data-quality checks: rule semantics, the
single-job contract, and NULL edges."""

from __future__ import annotations

from didtool_spark.operators.quality_checks import (
    accepted_values,
    in_range,
    min_rows,
    not_null,
    unique,
    validate,
)


def _df(spark):
    rows = [
        (1, 10.0, "a"), (2, 20.0, "b"), (3, None, "a"),
        (4, 500.0, "zz"), (4, 30.0, "b"),
    ]
    return spark.createDataFrame(rows, "id int, v double, c string")


def test_validate_rule_semantics(spark):
    df = _df(spark)
    rows = validate(
        df,
        [
            not_null("v", max_null_rate=0.25),
            not_null("c"),
            in_range("v", 0, 100),
            in_range("v", 0, 100, max_violation_rate=0.3),
            accepted_values("c", ["a", "b"]),
            unique("id"),
            unique(["id", "c"]),
            min_rows(3),
        ],
    ).collect()

    def pick(rule, column, threshold=None):
        return next(
            r for r in rows
            if r["rule"] == rule and r["column"] == column
            and (threshold is None or r["threshold"] == threshold)
        )

    r = pick("not_null", "v")
    assert abs(r["metric"] - 0.2) < 1e-12 and r["passed"]
    assert pick("not_null", "c")["passed"]  # zero nulls
    # 500.0 out of range among 4 non-nulls -> 0.25
    strict = pick("in_range", "v", 0.0)
    loose = pick("in_range", "v", 0.3)
    assert abs(strict["metric"] - 0.25) < 1e-12 and not strict["passed"]
    assert abs(loose["metric"] - 0.25) < 1e-12 and loose["passed"]
    r = pick("accepted_values", "c")
    assert abs(r["metric"] - 0.2) < 1e-12 and not r["passed"]  # 'zz'
    r = pick("unique", "id")
    assert abs(r["metric"] - 0.2) < 1e-12 and not r["passed"]  # dup id 4
    assert pick("unique", "id,c")["passed"]  # (id, c) is unique
    r = pick("min_rows", "*")
    assert r["metric"] == 5.0 and r["passed"]


def test_validate_single_job_plan(spark):
    import re

    from tests.test_plan_shape import plan_str

    df = _df(spark)
    out = validate(
        df,
        [not_null("v"), in_range("v", 0, 100), accepted_values("c", ["a"]),
         min_rows(1)],
    )
    p = plan_str(out)
    assert "PythonUDF" not in p
    # one aggregation over one scan: a single pair of HashAggregates
    # (partial + final) and at most the single-partition final exchange
    assert len(re.findall(r"\(\d+\) HashAggregate", p)) <= 2, p[:2500]
    assert p.count("Scan ") == 1 or p.count("Scan") >= 1


def test_validate_all_null_and_empty_edges(spark):
    df = spark.createDataFrame([(None,), (None,)], "v double")
    out = {r["rule"]: r for r in validate(
        df, [in_range("v", 0, 1), not_null("v", 1.0)]
    ).collect()}
    # no non-NULL values: violation rate coalesces to 0.0 (vacuous pass)
    assert out["in_range"]["metric"] == 0.0 and out["in_range"]["passed"]
    assert out["not_null"]["metric"] == 1.0 and out["not_null"]["passed"]