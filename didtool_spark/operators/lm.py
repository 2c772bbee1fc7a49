"""N-gram language-model perplexity scoring — the CCNet-style quality
filter (Wenzek et al. 2020: score web documents by the perplexity of a
small LM trained on a trusted corpus; low perplexity ~ fluent text).

The didtool reference has no LM scorer (its quality signals are the
IV/PSI family over tabular features); this operator extends the
training-data curation family (curate.py / decontam.py) with the one
standard filter they still lacked. Spark-first design:

- ``NgramLM.fit``: TWO distributed aggregations over the reference
  corpus — unigram counts and bigram counts (both with map-side
  combine; only (hashable token, count) rows shuffle, never text).
  The fitted state is a pair of SMALL DataFrames (vocab-sized), the
  didtool fit-state shape (SURVEY §1.1) at corpus scale.
- ``NgramLM.score``: pure JVM column expressions — per-position
  bigrams explode, the LM tables join in (broadcast by default: a
  pruned LM is MBs; corpora are TBs — zero shuffle of the corpus), and
  one ``groupBy(doc_id)`` with partial aggregation re-folds the
  positions. No Python in the row path.

Model (deterministic, SQL-replayable — every constant is a literal):
  P_uni(w)     = (c(w) + k) / (N + k * (V + 1))      add-k smoothing,
                 one reserved unknown-word slot in the vocab size
  P(w2 | w1)   = lam * c(w1 w2)/c(w1) + (1 - lam) * P_uni(w2)
                 (Jelinek-Mercer interpolation; the bigram term is 0
                 when w1 is unseen or the bigram was pruned)
  first token  = P_uni alone (no begin-of-sentence context)
  avg_nll(doc) = -(log P(t1) + sum_i log P(t_i | t_{i-1})) / n_tokens
  perplexity   = exp(avg_nll)

Scale path (10^12 turns / 100 TB): ``min_count`` prunes both tables at
fit time — pruned unigrams fall into the shared unknown slot and pruned
bigrams back off to (1-lam)*P_uni, so the score stays well-defined and
the broadcast stays bounded (top-V vocab + surviving bigrams). The
pruning changes scores (documented divergence knob, default off) the
same way KenLM pruning does in the reference pipeline.

Caching note: fit() caches the two vocab-sized count tables (see the
comment there — score() references them across non-reusable
exchanges); like the dedup family's eager caches they stay pinned
until the session evicts them — call ``spark.catalog.clearCache()``
between corpora in a long-lived session loop (bench.py does).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from .decontam import _norm_tokens

__all__ = ["NgramLM", "lm_perplexity"]


def _bigram_structs(toks):
    """array<struct<w1,w2>> of adjacent token pairs (positions 2..n).
    The index lambda reads the BOUND ``toks`` attribute (callers alias
    the token array first), so tokenization runs once per row, not per
    position — see window_concat_expr (text.py) for the failure mode."""
    return F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.struct(
            F.element_at(toks, i).alias("w1"),
            F.element_at(toks, i + 1).alias("w2"),
        ),
    )


@dataclass
class NgramLM:
    """Fitted bigram LM: two small DataFrames + the scalar constants.

    ``uni``:  (w, c)      unigram counts over the reference corpus
    ``bi``:   (w1, w2, c) bigram counts
    ``n_total``: total token count N;  ``v``: distinct vocab size V.
    """

    uni: DataFrame
    bi: DataFrame
    n_total: int
    v: int
    k: float
    lam: float

    @classmethod
    def fit(
        cls,
        corpus: DataFrame,
        col: str = "text",
        k: float = 0.5,
        lam: float = 0.8,
        min_count: int = 1,
    ) -> "NgramLM":
        """Fit unigram + bigram counts on ``corpus``. ``min_count``
        prunes both tables AFTER N/V are fixed from the unpruned
        counts, so pruning only moves probability into the backoff
        terms — it never changes the normalizer."""
        toks = corpus.select(_norm_tokens(F.col(col)).alias("__toks")).where(
            F.size("__toks") > 0
        )
        # Cache both fitted tables: they are vocab-sized, but their
        # PLANS each contain a full corpus scan — score() references
        # ``uni`` three times (three separate broadcast exchanges, the
        # selects under them differ so ReuseExchange cannot kick in),
        # and without the cache every reference re-scans the corpus.
        # The collect below doubles as the materializing action for uni.
        uni = (
            toks.select(F.explode("__toks").alias("w"))
            .groupBy("w")
            .agg(F.count("*").alias("c"))
            .cache()
        )
        bi = (
            toks.where(F.size("__toks") > 1)
            .select(F.explode(_bigram_structs(F.col("__toks"))).alias("p"))
            .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
            .agg(F.count("*").alias("c"))
            .cache()
        )
        # one tiny action for the two scalars (vocab-sized input)
        tot = uni.agg(
            F.sum("c").alias("n"), F.count("*").alias("v")
        ).collect()[0]
        if min_count > 1:
            uni = uni.where(F.col("c") >= min_count)
            bi = bi.where(F.col("c") >= min_count)
        return cls(
            uni=uni, bi=bi, n_total=int(tot["n"]), v=int(tot["v"]),
            k=float(k), lam=float(lam),
        )

    def _p_uni(self, c_col):
        denom = float(self.n_total) + self.k * (self.v + 1)
        return (F.coalesce(c_col, F.lit(0.0)) + F.lit(self.k)) / F.lit(denom)

    def score(
        self,
        df: DataFrame,
        col: str = "text",
        id_col: str = "doc_id",
        broadcast: bool = True,
    ) -> DataFrame:
        """(id_col, n_tokens, avg_nll, perplexity) per document with at
        least one token. ``broadcast=False`` switches the LM joins to
        shuffle equi-joins for LMs too large to broadcast (then only
        (doc_id, token) pairs shuffle, never text)."""
        hint = F.broadcast if broadcast else (lambda d: d)
        uni = hint(self.uni.select("w", F.col("c").cast("double").alias("__cu")))
        bi = hint(
            self.bi.select("w1", "w2", F.col("c").cast("double").alias("__cb"))
        )

        toks = df.select(
            F.col(id_col), _norm_tokens(F.col(col)).alias("__toks")
        ).where(F.size("__toks") > 0)

        # first token: unigram-only
        first = (
            toks.select(
                id_col,
                F.size("__toks").alias("n_tokens"),
                F.element_at("__toks", 1).alias("w"),
            )
            .join(uni, "w", "left")
            .select(
                id_col, "n_tokens", F.log(self._p_uni(F.col("__cu"))).alias("__lp0")
            )
        )

        # positions 2..n: interpolated bigram term. Join order puts the
        # w1-count join last so both unigram lookups share one table.
        pos = (
            toks.where(F.size("__toks") > 1)
            .select(F.col(id_col), F.explode(_bigram_structs(F.col("__toks"))).alias("p"))
            .select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
            .join(bi, ["w1", "w2"], "left")
            .join(uni.select(F.col("w").alias("w2"), F.col("__cu").alias("__cu2")), "w2", "left")
            .join(uni.select(F.col("w").alias("w1"), F.col("__cu").alias("__cu1")), "w1", "left")
        )
        lp = F.log(
            F.lit(self.lam)
            * F.coalesce(F.col("__cb") / F.col("__cu1"), F.lit(0.0))
            + F.lit(1.0 - self.lam) * self._p_uni(F.col("__cu2"))
        )
        folded = pos.groupBy(id_col).agg(F.sum(lp).alias("__lps"))

        return (
            first.join(folded, id_col, "left")
            .select(
                id_col,
                "n_tokens",
                (
                    -(F.col("__lp0") + F.coalesce(F.col("__lps"), F.lit(0.0)))
                    / F.col("n_tokens")
                ).alias("avg_nll"),
            )
            .withColumn("perplexity", F.exp("avg_nll"))
        )


def lm_perplexity(
    df: DataFrame,
    corpus: DataFrame | None = None,
    col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
    lam: float = 0.8,
    min_count: int = 1,
    broadcast: bool = True,
) -> DataFrame:
    """One-call form: fit on ``corpus`` (default: ``df`` itself — the
    self-scored form used for relative quality ranking), score ``df``."""
    lm = NgramLM.fit(corpus if corpus is not None else df, col, k, lam, min_count)
    return lm.score(df, col, id_col, broadcast)
