"""Curation operators: PII scrub, chunking, stratified sampling,
sequence packing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from didtool_spark.operators.curate import (
    chunk_documents,
    pack_sequences,
    scrub_pii,
    stratified_sample,
)


def test_scrub_pii_counts_and_redaction(spark):
    rows = [
        (0, "mail me at a.b+c@foo-bar.org or visit https://x.io/a?b=1 now"),
        (1, "server 192.168.0.1 and phone +1 555-0100 42"),
        (2, "no pii here at all"),
        (3, "url with userinfo https://user@host.example/x stays one URL"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = scrub_pii(df, "text", out_col="s").orderBy("doc_id").collect()
    r0, r1, r2, r3 = out
    assert (r0["n_email"], r0["n_url"]) == (1, 1)
    assert "[EMAIL]" in r0["s"] and "[URL]" in r0["s"]
    assert "a.b+c@foo-bar.org" not in r0["s"]
    assert r1["n_ipv4"] == 1 and r1["n_phone"] == 1
    assert "[IP]" in r1["s"] and "[PHONE]" in r1["s"]
    assert (r2["n_email"], r2["n_url"], r2["n_ipv4"], r2["n_phone"]) == (0, 0, 0, 0)
    assert r2["s"] == "no pii here at all"
    # URL scrubs first, so its userinfo never double-counts as an email
    assert r3["n_url"] == 1 and r3["n_email"] == 0


def test_chunk_documents_coverage_and_overlap(spark):
    text = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(1, text), (2, "short doc"), (3, "x")],
                               "doc_id int, text string")
    out = (
        chunk_documents(df, "text", chunk_tokens=32, overlap=8)
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: starts 0,24,48,72,96 -> 5 chunks; tail has 4 tokens
    c1 = by_doc[1]
    assert [r["chunk_id"] for r in c1] == [0, 1, 2, 3, 4]
    assert [r["n_tokens"] for r in c1] == [32, 32, 32, 28, 4]
    assert c1[0]["chunk_text"].split()[:2] == ["w0", "w1"]
    # consecutive chunks overlap by 8 tokens
    assert c1[0]["chunk_text"].split()[-8:] == c1[1]["chunk_text"].split()[:8]
    # every token covered in order
    seen = c1[0]["chunk_text"].split()
    for r in c1[1:]:
        seen.extend(r["chunk_text"].split()[8:])
    assert seen == text.split()
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_tokens"] == 2
    assert len(by_doc[3]) == 1 and by_doc[3][0]["chunk_text"] == "x"


def test_stratified_sample_fractions_and_determinism(spark):
    df = spark.range(20000).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("zz")),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("lang"),
    )
    fr = {"en": 0.5, "de": 0.2, "fr": 0.05}
    out = stratified_sample(df, "lang", fr, id_col="doc_id", seed=9,
                            default_fraction=0.0)
    got = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert "zz" not in got
    for lang, f in fr.items():
        assert abs(got.get(lang, 0) / 5000.0 - f) < 0.03, (lang, got)
    # invariant under repartitioning (DataFrame.sample is not)
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in stratified_sample(
            df.repartition(13), "lang", fr, id_col="doc_id", seed=9
        ).collect()
    )
    assert a == b


def test_pack_sequences_quota_and_balance(spark):
    df = spark.range(5000).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id"), 200) + 1).cast("int").alias("n_tok"),
    )
    out = pack_sequences(df, "n_tok", id_col="doc_id", budget=1024,
                         n_shards=16, seed=2)
    pdf = out.toPandas()
    assert set(pdf["shard"].unique()) <= set(range(16))
    g = pdf.groupby(["shard", "pack_no"])["n_tok"].sum()
    # quota packing: every pack's tokens < budget + max single doc
    assert (g < 1024 + 200).all()
    # all but each shard's last pack reach at least the budget minus one doc
    last = pdf.groupby("shard")["pack_no"].max()
    full = g[
        [not (pack == last[shard]) for shard, pack in g.index]
    ]
    assert (full >= 1024 - 200).all()
    # shards reasonably balanced (hash distribution)
    sizes = pdf.groupby("shard").size()
    assert sizes.min() > 0.5 * sizes.mean()


# ------------------------------------------------ DSIR importance resampling

def test_importance_resample_prefers_target_like_docs(spark):
    from didtool_spark.operators.dsir import importance_resample

    t_words = "medical clinical patient dosage symptom diagnosis".split()
    r_words = "football referee goalkeeper stadium penalty midfield".split()
    import itertools
    def mk(words, doc_id, n=30):
        gen = itertools.cycle(words)
        return (doc_id, " ".join(next(gen) for _ in range(n)))
    target = spark.createDataFrame(
        [mk(t_words, i) for i in range(10)], ["doc_id", "text"]
    )
    # raw pool: 10 target-like docs (ids 100+), 30 off-domain (200+)
    raw = spark.createDataFrame(
        [mk(t_words, 100 + i) for i in range(10)]
        + [mk(r_words, 200 + i) for i in range(30)],
        ["doc_id", "text"],
    )
    out = importance_resample(
        raw, target, frac=0.25, n_buckets=512, seed=3, threshold="exact"
    ).toPandas().set_index("doc_id").sort_index()
    assert len(out) == 40
    # every target-like doc outweighs every off-domain doc
    assert out.loc[100:109, "log_weight"].min() > out.loc[200:229, "log_weight"].max()
    # ~25% kept, and the kept set is exactly the target-like docs
    assert out["keep"].sum() == 10
    assert set(out[out["keep"] == 1].index) == {100 + i for i in range(10)}


def test_importance_resample_hash_fn_parity(spark):
    """Engine default (xxhash64 buckets) and oracle-portable md5_60
    select the SAME docs on a clear-signal fixture: the bucket hash is
    an implementation detail of the feature space, not the statistic."""
    import itertools

    from didtool_spark.operators.dsir import importance_resample

    t_words = "medical clinical patient dosage symptom diagnosis".split()
    r_words = "football referee goalkeeper stadium penalty midfield".split()

    def mk(words, doc_id, n=30):
        gen = itertools.cycle(words)
        return (doc_id, " ".join(next(gen) for _ in range(n)))

    target = spark.createDataFrame(
        [mk(t_words, i) for i in range(10)], ["doc_id", "text"]
    )
    raw = spark.createDataFrame(
        [mk(t_words, 100 + i) for i in range(10)]
        + [mk(r_words, 200 + i) for i in range(30)],
        ["doc_id", "text"],
    )
    kw = dict(frac=0.25, n_buckets=512, seed=3, threshold="exact")
    xx = importance_resample(raw, target, hash_fn="xxhash64", **kw).toPandas()
    md = importance_resample(raw, target, hash_fn="md5_60", **kw).toPandas()
    kept_xx = set(xx[xx["keep"] == 1]["doc_id"])
    kept_md = set(md[md["keep"] == 1]["doc_id"])
    assert kept_xx == kept_md == {100 + i for i in range(10)}


def test_importance_resample_approx_matches_exact_here(spark):
    """At unit scale the approx_percentile threshold lands on the same
    selected set as the exact percentile (sanity that the scale path
    computes the same statistic, not a different rule)."""
    from didtool_spark.operators.dsir import importance_resample
    from pyspark.sql import functions as F

    docs = spark.range(80).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.when(F.pmod(F.xxhash64("id", F.lit(i)), 3) == 0, F.lit("alpha"))
                .when(F.pmod(F.xxhash64("id", F.lit(i)), 3) == 1, F.lit("beta"))
                .otherwise(F.lit("gamma"))
                for i in range(20)
            ],
        ).alias("text"),
    )
    target = docs.where(F.col("doc_id") % 5 == 0)
    raw = docs.where(F.col("doc_id") % 5 != 0)
    kw = dict(frac=0.4, n_buckets=256, seed=1)
    a = importance_resample(raw, target, threshold="exact", **kw).toPandas()
    b = importance_resample(raw, target, threshold="approx", **kw).toPandas()
    m = a.merge(b, on="doc_id", suffixes=("_e", "_a"))
    assert (m["log_weight_e"] == m["log_weight_a"]).all()
    assert (m["keep_e"] == m["keep_a"]).all()


def test_c4_rules_line_and_doc_semantics(spark):
    from didtool_spark.operators.decontam import c4_rules

    rows = [
        # 3 keepable lines -> kept document
        (1, "the first sentence is long enough.\nshort\n"
            "another full sentence right here!\nthis one asks a question?"),
        # lorem ipsum anywhere drops the doc (lines still counted)
        (2, "a good sentence stands here tall.\nsecond proper sentence here too!\n"
            "third full sentence present now.\nlorem ipsum dolor sit"),
        # curly brace drops the doc
        (3, "a good sentence stands here tall.\nsecond proper sentence here too!\n"
            "third full sentence present now.\nvar x = { a: 1 }"),
        # javascript line is cut but doc can survive on the others
        (4, "enable javascript to continue reading.\n"
            "one real sentence sits right here.\n"
            "two real sentences sit right here!\n"
            "three real sentences sit right here?"),
        # too few keepable lines -> dropped
        (5, "just one good sentence lives here.\nand nothing else"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in c4_rules(df).collect()}
    assert out[1]["keep"] == 1 and out[1]["n_kept_lines"] == 3
    assert "short" not in out[1]["clean_text"]
    assert out[2]["keep"] == 0 and out[3]["keep"] == 0
    assert out[4]["keep"] == 1 and out[4]["n_kept_lines"] == 3
    assert "javascript" not in out[4]["clean_text"]
    assert out[5]["keep"] == 0 and out[5]["n_kept_lines"] == 1


def test_pack_conversations_never_splits_a_conv(spark):
    from didtool_spark.operators.curate import pack_conversations

    turns = spark.range(3000).select(
        F.col("id").alias("turn_id"),
        (F.col("id") % 300).alias("conv_id"),
        (F.pmod(F.xxhash64("id"), 50) + 1).cast("int").alias("n_tok"),
    )
    out = pack_conversations(
        turns, "n_tok", conv_col="conv_id", budget=256, n_shards=8, seed=3
    ).toPandas()
    assert len(out) == 3000  # every turn retained
    # one (shard, pack_no) per conversation — never split
    per_conv = out.groupby("conv_id")[["shard", "pack_no"]].nunique()
    assert (per_conv == 1).all().all()
    # conv_tokens is the conversation total, oversize iff > budget
    tot = out.groupby("conv_id")["n_tok"].sum()
    got = out.groupby("conv_id")["conv_tokens"].first()
    assert (tot == got).all()
    assert (out["oversize"] == (out["conv_tokens"] > 256)).all()
    # quota rule holds at the conversation level
    g = out.groupby(["conv_id", "shard", "pack_no"])["n_tok"].sum().groupby(
        ["shard", "pack_no"]
    ).sum()
    assert (g < 256 + tot.max()).all()
