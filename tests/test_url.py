"""URL canonicalization + URL-level dedup (operators/url.py)."""

from pyspark.sql import functions as F

from didtool_spark.operators.url import (
    canonical_url_expr, canonicalize_urls, domain_filter,
    registered_domain_expr, url_dedup)


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


DOMAIN_CASES = [
    ("https://news.bbc.co.uk/story", "bbc.co.uk"),
    ("http://www.example.com/x", "example.com"),
    ("https://a.b.c.example.org:8080/", "example.org"),
    ("https://user@sub.shop.com.au/x?q=1", "shop.com.au"),
    ("localhost/x", "localhost"),
    ("https://co.uk/", "co.uk"),  # bare suffix: nothing above it to take
    ("EXAMPLE.COM", "example.com"),
]


def test_registered_domain_cases(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(DOMAIN_CASES)], "i int, url string"
    )
    got = {r["i"]: r["d"] for r in
           df.select("i", registered_domain_expr(F.col("url")).alias("d")).collect()}
    for i, (raw, want) in enumerate(DOMAIN_CASES):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"


def test_domain_filter_blocks_and_keeps(spark):
    rows = [
        (1, "https://spam.bad-site.com/win"),
        (2, "https://www.bad-site.com/free"),
        (3, "https://good.org/a"),
        (4, "https://news.bbc.co.uk/x"),
    ]
    df = spark.createDataFrame(rows, "id int, url string")
    kept = sorted(r["id"] for r in domain_filter(df, ["bad-site.com"]).collect())
    assert kept == [3, 4]  # both bad-site subdomain forms dropped
    only = sorted(
        r["id"] for r in domain_filter(df, ["bbc.co.uk"], keep=True).collect()
    )
    assert only == [4]
    # broadcast anti-join, no corpus shuffle
    from tests.test_plan_shape import plan_str

    p = plan_str(domain_filter(df, ["bad-site.com"]))
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p


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
