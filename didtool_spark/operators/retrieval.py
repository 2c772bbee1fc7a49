"""BM25 keyword retrieval over a document corpus.

A training-data pipeline needs keyword search constantly — pulling
benchmark-adjacent documents for decontamination review, sampling
topic slices for quality audits, building retrieval baselines for
eval sets. ``bm25_topk`` scores every document against one query with
the Lucene/Okapi BM25 ranking function and returns the global top-k.

Scale design (the 100 TB answer): the query is a handful of terms, so
there is NO inverted index, NO explode and NO (doc, token) shuffle —
per-document term frequencies are computed as pure column expressions
(``F.size(F.filter(tokens, t == term))`` per query term, codegen'd),
document length is ``F.size(tokens)`` on the same row, and the corpus
statistics the formula needs (N, avgdl, per-term document frequency)
reduce to ONE scalar aggregate (a single row: count + avg + one
conditional sum per term) that is broadcast back with a cross join.
The only ordering work is the final top-k, which Spark executes as
TakeOrderedAndProject — per-partition heaps of size k, never a global
sort.  Scoring 100 TB is therefore exactly one scan plus one scan-
shaped aggregate; nothing materializes more than k rows.

For repeated-query / index-style workloads, build the (doc, token, tf)
table once with ``tfidf_keywords``-style aggregation instead; this
operator is the ad-hoc single-query path.

BM25 (Lucene practical scoring, the k1/b parametrization of
Robertson et al., TREC-3):

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    score   = sum_t idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))

Reference scope note: didtool itself has no retrieval operator — this
extends the engine for LLM-corpus curation (same family as
operators/text.py tfidf_keywords).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .text import tokens_expr


def _query_terms(query: str) -> list[str]:
    """Driver-side tokenization of the (tiny) query string — same
    normalization as the document side (trim/lower/whitespace split),
    de-duplicated with first-occurrence order kept."""
    seen: dict[str, None] = {}
    for t in query.strip().lower().split():
        if t and t not in seen:
            seen[t] = None
    return list(seen)


def bm25_topk(
    df: DataFrame,
    query: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """Global top-k documents for ``query`` by BM25.

    Returns (id_col, score, rank), rank 1-based, ties broken by id
    ascending (deterministic). Documents matching no query term are
    never materialized (filtered before the top-k heap).
    """
    terms = _query_terms(query)
    if not terms:
        raise ValueError("bm25_topk: empty query")

    toks = tokens_expr(text_col)

    def tf_expr(term: str) -> Column:
        # one-param lambda: a two-param lambda would be given the
        # element INDEX as its second argument by Spark's HOF binding
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    base = df.select(
        F.col(id_col),
        F.size(toks).alias("__dl"),
        *[tf_expr(t).alias(f"__tf_{i}") for i, t in enumerate(terms)],
    )

    # one scalar row: N, avgdl, df per term — broadcast back
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg("__dl").alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("int"))
            .cast("double")
            .alias(f"__df_{i}")
            for i in range(len(terms))
        ],
    )

    def term_score(i: int) -> Column:
        tf = F.col(f"__tf_{i}").cast("double")
        idf = F.log(
            1.0
            + (F.col("__n") - F.col(f"__df_{i}") + 0.5)
            / (F.col(f"__df_{i}") + 0.5)
        )
        norm = tf + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl"))
        return F.when(tf > 0, idf * tf * (k1 + 1.0) / norm).otherwise(F.lit(0.0))

    score = None
    for i in range(len(terms)):
        s = term_score(i)
        score = s if score is None else score + s

    topk = (
        base.join(F.broadcast(stats))
        .select(F.col(id_col), F.round(score, 6).alias("score"))
        .where(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(top_k)
    )
    # rank over the k surviving rows only (k-row window, one partition
    # of size k — NOT a corpus-scale global window)
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return topk.select(id_col, "score", F.row_number().over(w).alias("rank"))
