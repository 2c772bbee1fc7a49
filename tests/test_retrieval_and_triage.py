"""Unit + plan-shape tests for the round-4 curation additions: BM25
retrieval (operators/retrieval.py), length-bucket batch shaping
(curate.length_bucket_stats), text normalization and n-gram diversity
(operators/text.py). Values pinned against hand-computed oracles; the
gate queries add the full DuckDB replays at sf0.01."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from didtool_spark.operators.curate import length_bucket_stats
from didtool_spark.operators.retrieval import bm25_topk
from didtool_spark.operators.text import (
    ngram_diversity,
    normalize_text,
    normalize_text_expr,
)


def plan_str(df) -> str:
    from io import StringIO
    import contextlib

    buf = StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ------------------------------------------------------------------ bm25
def _bm25_hand(corpus, query, k1=1.2, b=0.75):
    """Row-at-a-time reference implementation."""
    toks = [d.strip().lower().split() for d in corpus]
    n = float(len(toks))
    avgdl = sum(len(t) for t in toks) / n
    terms = list(dict.fromkeys(query.lower().split()))
    df_ = {t: sum(1 for d in toks if t in d) for t in terms}
    out = []
    for i, d in enumerate(toks):
        s = 0.0
        for t in terms:
            tf = float(d.count(t))
            if tf == 0:
                continue
            idf = math.log(1 + (n - df_[t] + 0.5) / (df_[t] + 0.5))
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * len(d) / avgdl))
        if s > 0:
            out.append((i, round(s, 6)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


def test_bm25_matches_hand_reference(spark):
    corpus = [
        "spark join hash join window",
        "the quick brown fox",
        "hash hash hash table scan",
        "window functions in spark sql",
        "join order and broadcast join strategy",
        "completely unrelated words here",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    got = [
        (r.doc_id, r.score, r.rank)
        for r in bm25_topk(df, "spark hash join window", top_k=10).collect()
    ]
    want = [(i, s, r + 1) for r, (i, s) in
            enumerate(_bm25_hand(corpus, "spark hash join window"))]
    assert got == want
    # doc 5 matches nothing -> excluded
    assert all(i != 5 for i, _, _ in got)


def test_bm25_empty_query_raises(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(df, "   ")


def test_bm25_plan_is_scan_shaped(spark):
    """Scale contract: no corpus-keyed hash exchange — the only
    ordering work is TakeOrderedAndProject, the stats side is a scalar
    aggregate joined back by broadcast."""
    df = spark.createDataFrame(
        [(i, "spark join x") for i in range(100)], "doc_id long, text string"
    )
    p = plan_str(
        df.select("doc_id", F.col("text")).transform(
            lambda d: bm25_topk(d, "spark join", top_k=5)
        )
    )
    assert "TakeOrderedAndProject" in p
    assert not re.search(r"Exchange hashpartitioning\((?:doc_id|text)", p)
    assert "SortMergeJoin" not in p


# --------------------------------------------------------- length buckets
def test_length_buckets_hand_oracle(spark):
    rows = [(0, 1), (1, 16), (2, 17), (3, 1000), (4, 9000), (5, 0)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    got = {
        r.bucket: (r.n_docs, r.sum_tokens, r.padded_tokens, r.waste_frac)
        for r in length_bucket_stats(df, "n").collect()
    }
    # n=1 -> 16 (min clamp, n=0 treated as 1), 16 -> 16, 17 -> 32,
    # 1000 -> 1024, 9000 -> 8192 (max clamp; waste can go negative)
    assert set(got) == {16, 32, 1024, 8192}
    assert got[16] == (3, 17, 48, round(1 - 17 / 48, 6))
    assert got[32] == (1, 17, 32, round(1 - 17 / 32, 6))
    assert got[1024] == (1, 1000, 1024, round(1 - 1000 / 1024, 6))
    assert got[8192] == (1, 9000, 8192, round(1 - 9000 / 8192, 6))


def test_length_buckets_exact_powers(spark):
    df = spark.createDataFrame(
        [(i, 2 ** i) for i in range(4, 14)], "doc_id long, n long"
    )
    got = {r.bucket: r.n_docs for r in length_bucket_stats(df, "n").collect()}
    # every exact power maps to itself (no off-by-one from float log2),
    # 2^13 = 8192 stays at the cap
    assert got == {2 ** i: 1 for i in range(4, 14)}


# -------------------------------------------------------------- normalize
def test_normalize_text_folds_cruft(spark):
    rows = [
        (0, "“hi” — there friend"),
        (1, "a​bc\t\td  e"),
        (2, "x \n \n\n\n\n y  "),
        (3, "already clean"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.text_norm, r.changed)
           for r in normalize_text(df).collect()}
    assert got[0] == ('"hi" - there friend', True)
    assert got[1] == ("abc d e", True)
    # newline-adjacent spaces die, 3+ blank-line runs collapse to one
    assert got[2] == ("x\n\ny", True)
    assert got[3] == ("already clean", False)
    assert got[4] == ("", False)


def test_normalize_text_idempotent(spark):
    df = spark.createDataFrame(
        [(0, "‘q’​  x\n\n\n\ny")], "doc_id long, text string"
    )
    once = normalize_text(df).select(
        "doc_id", F.col("text_norm").alias("text")
    )
    twice = normalize_text(once).collect()[0]
    assert twice.text_norm == "'q' x\n\ny"
    assert not twice.changed


def test_normalize_plan_no_exchange(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    p = plan_str(df.select(normalize_text_expr("text")))
    assert "Exchange" not in p


# -------------------------------------------------------------- diversity
def test_ngram_diversity_values(spark):
    rows = [
        (0, "a b c d e"),          # 3 trigrams, all distinct
        (1, "a b a b a b a b"),    # 6 trigrams, 2 distinct -> flagged
        (2, "a b"),                # < 3 tokens -> no ngram, diversity 1
        (3, ""),                   # empty -> 1 token ('') -> diversity 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_ngrams, r.n_distinct, r.diversity,
                   r.is_repetitive)
        for r in ngram_diversity(df).collect()
    }
    assert got[0] == (5, 3, 3, 1.0, False)
    assert got[1] == (8, 6, 2, round(2 / 6, 6), True)
    assert got[2] == (2, 0, 0, 1.0, False)
    assert got[3] == (1, 0, 0, 1.0, False)


def test_ngram_diversity_plan_no_exchange(spark):
    df = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    assert "Exchange" not in plan_str(ngram_diversity(df))
