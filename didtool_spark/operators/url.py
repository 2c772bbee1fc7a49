"""URL canonicalization and URL-level dedup for web-corpus curation.

Every large-scale web pipeline (C4, CCNet, RefinedWeb) dedups fetched
pages by canonical URL before any content-level pass — the same page
arrives under `http://` vs `https://`, with/without `www.`, with
tracking parameters (`utm_*`, `fbclid`, ...), fragments, default
ports, and shuffled query-parameter order. This module normalizes
those variants with pure ``pyspark.sql`` expressions (whole-stage
codegen — one projection, zero shuffles) so URL dedup reduces to the
same hash-groupBy shape as content dedup (`dedup.exact_dupes`).

Canonical form (documented, deliberately conservative):
- strip the fragment (`#...`) and the scheme (http/https/... — scheme
  variants of one page are one page);
- host: drop userinfo (`user@`), lowercase, drop a leading `www.`,
  drop an explicit default port (`:80` / `:443`);
- path: drop trailing slashes (`/a/b/` == `/a/b`; the root path
  collapses to the bare host);
- query: drop empty and tracking parameters (``tracking_pattern``),
  SORT the survivors (order never carries meaning in practice), and
  re-join; an emptied query disappears entirely.
Percent-encoding is NOT normalized (`%2F` can be semantic) — a
documented divergence from full RFC 3986 normalization.

All regexes avoid lookaround/backreferences so the Spark (Java regex)
and DuckDB-oracle (RE2) engines agree — the `curate.PII_PATTERNS`
convention.

Scale: canonicalization is per-row codegen; ``url_dedup`` adds one
groupBy on the canonical string (map-side combined, the shuffle
carries one row per DISTINCT canonical URL) and the join back — the
``exact_dupes`` plan shape, which is the 10^12-row-safe one.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "TRACKING_PARAM_PATTERN",
    "TWO_LEVEL_SUFFIXES",
    "canonical_url_expr",
    "canonicalize_urls",
    "domain_filter",
    "registered_domain_expr",
    "url_dedup",
]

# anchored per-parameter pattern: utm_* family, bare/valued ref,
# facebook/google click ids
TRACKING_PARAM_PATTERN = r"^(utm_[^=]*|ref|fbclid|gclid)(=.*)?$"


def canonical_url_expr(
    url: Column, tracking_pattern: str = TRACKING_PARAM_PATTERN
) -> Column:
    """Canonical-form expression for one URL column (NULL in -> NULL
    out). Pure built-in functions; see the module docstring for the
    exact rule set."""
    u = F.regexp_replace(F.trim(url), r"#.*$", "")  # fragment
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")  # scheme
    authority = F.regexp_extract(rest, r"^([^/?]+)", 1)
    host = F.lower(F.regexp_replace(authority, r"^[^@]*@", ""))  # userinfo
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r":(80|443)$", "")
    path = F.regexp_extract(rest, r"^[^/?]+([^?]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&", -1),
        lambda p: (p != F.lit("")) & ~p.rlike(tracking_pattern),
    )
    kept = F.array_join(F.array_sort(params), "&")
    return F.concat(
        host,
        path,
        F.when(kept == F.lit(""), F.lit("")).otherwise(F.concat(F.lit("?"), kept)),
    )


def canonicalize_urls(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "canon_url",
    tracking_pattern: str = TRACKING_PARAM_PATTERN,
) -> DataFrame:
    """Add ``out_col`` = canonical form of ``url_col``. One projection,
    no shuffle."""
    return df.withColumn(
        out_col, canonical_url_expr(F.col(url_col), tracking_pattern)
    )


# the common two-level public suffixes; a deliberate, documented subset
# of the Public Suffix List (the full PSL is a data file, not an
# algorithm — swap in a broadcast PSL table for exactness at ingest)
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "com.tw", "co.za", "com.ar", "com.tr", "com.sg",
)


def registered_domain_expr(url: Column) -> Column:
    """Registrable domain (eTLD+1 heuristic) of a URL column: the host
    is extracted with the canonicalization rules, then reduced to its
    last two labels — three when the two-label tail is a known
    two-level public suffix (``TWO_LEVEL_SUFFIXES``). Pure codegen
    (split + slice + array_join), no UDF, NULL-safe."""
    rest = F.regexp_replace(
        F.trim(url), r"^[A-Za-z][A-Za-z0-9+.\-]*://", ""
    )
    host = F.lower(
        F.regexp_replace(
            F.regexp_replace(F.regexp_extract(rest, r"^([^/?#]+)", 1), r"^[^@]*@", ""),
            r":\d+$",
            "",
        )
    )
    labels = F.split(host, r"\.", -1)
    n = F.size(labels)
    tail2 = F.array_join(F.slice(labels, F.greatest(n - 1, F.lit(1)), 2), ".")
    take = F.when(
        tail2.isin(*TWO_LEVEL_SUFFIXES) & (n >= F.lit(3)), F.lit(3)
    ).otherwise(F.least(n, F.lit(2)))
    return F.array_join(F.slice(labels, F.greatest(n - take + 1, F.lit(1)), take), ".")


def domain_filter(
    df: DataFrame,
    blocklist: DataFrame | Sequence[str],
    url_col: str = "url",
    keep: bool = False,
) -> DataFrame:
    """Drop (or keep, with ``keep=True``) rows whose URL's registrable
    domain appears in ``blocklist`` — the standard adult/spam domain
    blocklist pass of web-corpus curation (C4/RefinedWeb run it before
    any content filter because it is the cheapest).

    ``blocklist`` is a one-column DataFrame (or a literal list, for
    tests/small lists) of registrable domains. Plan: per-row domain
    extraction (codegen) + ONE broadcast left-anti (or semi) join —
    blocklists are millions of rows at most, far under the broadcast
    threshold; no corpus shuffle."""
    if not isinstance(blocklist, DataFrame):
        spark = df.sparkSession
        blocklist = spark.createDataFrame(
            [(d,) for d in blocklist], "domain string"
        )
    bcol = blocklist.columns[0]
    bl = F.broadcast(
        blocklist.select(F.lower(F.col(bcol)).alias("__bl_domain")).distinct()
    )
    out = df.withColumn("__dom", registered_domain_expr(F.col(url_col)))
    how = "left_semi" if keep else "left_anti"
    return out.join(
        bl, out["__dom"] == bl["__bl_domain"], how
    ).drop("__dom")


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    tracking_pattern: str = TRACKING_PARAM_PATTERN,
) -> DataFrame:
    """URL-level exact dedup: canonical row = min ``id_col`` per
    canonical URL. Returns the input plus (canon_url, canonical_id,
    is_dup) — the ``exact_dupes`` contract, keyed on the canonical URL
    instead of the content hash, so callers filter ``is_dup = 0`` to
    keep one fetch per page.

    Plan: per-row canonicalization (codegen) -> groupBy(canon_url)
    min(id) (map-side combined; the shuffle is one row per distinct
    canonical URL) -> equi-join back. No window, no driver state."""
    canon = canonicalize_urls(df, url_col, "canon_url", tracking_pattern)
    first = canon.groupBy("canon_url").agg(F.min(id_col).alias("canonical_id"))
    return canon.join(first, "canon_url").withColumn(
        "is_dup", (F.col(id_col) != F.col("canonical_id")).cast("int")
    )
