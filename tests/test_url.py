"""URL canonicalization + URL-level dedup (operators/url.py)."""

from pyspark.sql import functions as F

from didtool_spark.operators.url import (
    canonical_url_expr, canonicalize_urls, url_dedup)


CASES = [
    # (raw, canonical)
    ("https://example.com/a/b?b=2&a=1", "example.com/a/b?a=1&b=2"),
    # scheme case + www + default port + trailing slash + tracking +
    # fragment all collapse
    ("HTTP://WWW.Example.COM:80/a/b/?a=1&b=2&utm_source=feed#top",
     "example.com/a/b?a=1&b=2"),
    # userinfo + :443 + fbclid
    ("https://crawler@example.com:443/a/b?fbclid=xyz&b=2&a=1",
     "example.com/a/b?a=1&b=2"),
    # schemeless + bare ref param
    ("example.com/a/b?a=1&b=2&ref", "example.com/a/b?a=1&b=2"),
    # root path collapses to bare host; empty query disappears
    ("https://www.example.com/", "example.com"),
    ("https://example.com?utm_campaign=x", "example.com"),
    # NON-default port is kept (a different origin)
    ("https://example.com:8443/x", "example.com:8443/x"),
    # path case and percent-encoding are preserved (documented)
    ("https://example.com/A%2Fb", "example.com/A%2Fb"),
    # utm_ prefix filters valued AND bare forms; 'reference' is NOT 'ref'
    ("https://example.com/x?utm_&reference=1&z=9",
     "example.com/x?reference=1&z=9"),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CASES)],
                               "i int, url string")
    got = {r["i"]: r["c"] for r in
           df.select("i", canonical_url_expr(F.col("url")).alias("c")).collect()}
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"


def test_canonicalize_null_and_plan(spark):
    df = spark.createDataFrame([(1, None), (2, "https://a.com/x")],
                               "id int, url string")
    out = canonicalize_urls(df, "url")
    rows = {r["id"]: r["canon_url"] for r in out.collect()}
    assert rows[1] is None and rows[2] == "a.com/x"
    # per-row canonicalization must not shuffle
    from io import StringIO
    import contextlib

    buf = StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_url_dedup_keeps_min_id(spark):
    rows = [
        (10, "https://www.site.com/p?b=2&a=1"),
        (11, "HTTP://site.com:80/p/?a=1&b=2&utm_x=1"),
        (12, "https://other.com/p"),
        (13, "site.com/p?a=1&b=2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = url_dedup(df, "url", "doc_id").orderBy("doc_id").collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[10]["canonical_id"] == 10 and by_id[10]["is_dup"] == 0
    assert by_id[11]["canonical_id"] == 10 and by_id[11]["is_dup"] == 1
    assert by_id[13]["canonical_id"] == 10 and by_id[13]["is_dup"] == 1
    assert by_id[12]["canonical_id"] == 12 and by_id[12]["is_dup"] == 0
