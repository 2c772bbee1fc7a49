"""Graph analytics over edge tables: PageRank by iterative
message-passing joins.

The dedup family already ships alternating-star connected components
(dedup.py); PageRank is the other graph primitive a curation pipeline
reaches for (authority weighting of domains/URLs by their link graph,
influence scoring of entities by co-occurrence).

Distributed shape per iteration (the standard Pregel-as-joins plan):

    contribs = edges JOIN ranks ON src   (shuffle on src)
               -> (dst, rank/out_degree)
    sums     = contribs.groupBy(dst)     (shuffle on dst; map-side
                                          combined — the message sum
                                          never materializes per edge
                                          at the reducer)
    ranks    = nodes LEFT JOIN sums      + teleport & dangling mass

Ranks/nodes are one row per node; edges are the only big table and
are scanned once per iteration from cache.  Dangling mass (nodes with
no out-edges) is redistributed uniformly — the textbook correction,
one tiny agg per round.  The loop localCheckpoints every few rounds
to truncate lineage (the dedup_clusters convergence-loop pattern,
dedup.py:721).  Fixed iteration count: deterministic, and exactly
replayable by the DuckDB oracle as a chain of per-iteration CTEs
(plans/pipeline_queries._pagerank_oracle_sql).

At 10^12 edges: partition edges by src (the join key both shuffles
reuse), broadcast nothing (ranks are |V| rows — co-partitioned joins),
AQE handles the skewed high-degree hubs; hub fan-IN is absorbed by
the map-side combine on dst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def _driver_pagerank(
    e_raw: DataFrame,
    damping: float,
    iterations: int,
    checkpoint_every: int,
    tol: float | None,
    dedupe: bool,
) -> DataFrame:
    """Driver path for graphs whose edge list fits the bounded pull
    (the connected_components ``_numpy_union_find`` pattern): one Arrow
    collect of the materialized (src, dst) pairs, then the identical
    power iteration as vectorized numpy kernels — bincount fan-in
    instead of a per-round broadcast join.  The update expression tree
    mirrors the distributed plan term for term (``tele + d * (contrib
    + mass / n)``; zero-in-degree nodes get contrib == +0.0, which is
    bit-transparent in the sum), and the tol early-stop runs on the
    same ``checkpoint_every`` cadence, so both paths land on identical
    ranks (asserted in tests/test_graph.py on dangling/zero-in
    graphs)."""
    import numpy as np
    import pandas as pd

    spark = e_raw.sparkSession
    pdf = e_raw.toPandas()
    if pdf.empty:
        # same empty contract as the distributed path: zero rows,
        # (node, rank) schema with the input's id dtype
        return (
            e_raw.select(F.col("src").alias("node"))
            .limit(0)
            .withColumn("rank", F.lit(0.0))
        )
    u = pdf["src"].to_numpy()
    v = pdf["dst"].to_numpy()
    # hash-based factorize (no 2E-element sort); codes index the node
    # side arrays below
    codes, uniques = pd.factorize(np.concatenate([u, v]))
    n = len(uniques)
    m = len(u)
    si = codes[:m]
    di = codes[m:]
    if dedupe:
        # distinct edges via packed codes: n <= 2 * max_driver_edges
        # (60M), so si * n + di < n^2 ~ 3.6e15 stays well inside int64
        packed = pd.unique(si * n + di)
        si, di = np.divmod(packed, n)
    deg = np.bincount(si, minlength=n).astype(np.float64)
    dang = deg == 0.0
    has_dangling = bool(dang.any())
    d = float(damping)
    tele = (1.0 - d) / n
    rank = np.full(n, 1.0 / n)
    prev_ck = rank
    per_edge_deg = deg[si]  # > 0 by construction (si nodes have out-edges)
    for i in range(int(iterations)):
        contrib = np.bincount(di, weights=rank[si] / per_edge_deg, minlength=n)
        mass = float(rank[dang].sum()) if has_dangling else 0.0
        rank = tele + d * (contrib + mass / n)
        if (
            checkpoint_every
            and (i + 1) % checkpoint_every == 0
            and tol is not None
        ):
            delta = float(np.max(np.abs(rank - prev_ck)))
            prev_ck = rank
            if delta < tol:
                break
    out = pd.DataFrame({"node": uniques, "rank": rank})
    return spark.createDataFrame(out)


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 8,
    checkpoint_every: int = 3,
    tol: float | None = 1e-6,
    broadcast_nodes: int = 8_000_000,
    max_driver_edges: int | None = 30_000_000,
    dedupe: bool = False,
) -> DataFrame:
    """One row per node with its PageRank (uniform 1/N start, uniform
    teleport, dangling mass redistributed uniformly).  Ranks over all
    nodes sum to 1.

    ``tol`` (default 1e-6) enables convergence early-stop: the loop
    ends as soon as max\\|Δrank\\| < tol between consecutive
    checkpoints, with ``iterations`` as the cap.  The delta check
    piggy-backs on the eager ``checkpoint_every`` materialization (one
    small co-partitioned join + max agg per checkpoint, never per
    round).  Pass ``tol=None`` for a fixed, deterministic round count
    (what the oracle-checked gate query does — the DuckDB oracle
    replays exactly ``iterations`` CTE rounds).

    ``broadcast_nodes`` (guide §3.1 — broadcast the side that fits):
    when the measured node count ``n`` is at or below it, each round
    joins the edge table against a BROADCAST of the rank vector and
    the edge table is cached partitioned by ``dst`` — so the per-round
    contribution join needs no exchange at all and the ``dst``
    aggregation is partition-local: ZERO shuffles per iteration (the
    rank vector is |V| rows of (key, double) — a few MB up to the
    default 8M nodes).  Above the bound the original co-partitioned
    shuffle plan runs unchanged — at 10^9+ nodes a broadcast would not
    fit, which is exactly the regime the shuffle plan is for."""
    e_in = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    # Bounded driver short-circuit (the connected_components pattern,
    # dedup.py): materialize the pair stream once, ONE cheap count on
    # the checkpointed table, and when it fits ``max_driver_edges``
    # (~480 MB of longs) the whole power iteration runs as numpy
    # kernels on the driver — no edge cache fill, no per-round
    # broadcast build.  Above the bound (the 100 TB regime) the
    # materialized table feeds the distributed plan below unchanged.
    # ``dedupe=True`` declares the input a MULTISET whose duplicates
    # must not count (driver: vectorized unique; distributed:
    # .distinct()) — callers that already deduplicate keep the
    # default and both paths use their rows as-is.
    if max_driver_edges and e_in.count() <= max_driver_edges:
        # two passes over the pair stream (count gate, then the Arrow
        # collect) beat materializing it: checkpointing tens of
        # millions of rows through the block manager costs more than
        # re-running a map-side pair build (measured at sf1.0:
        # checkpoint+collect 23s vs count+collect ~16s)
        return _driver_pagerank(
            e_in, damping, iterations, checkpoint_every, tol, dedupe
        )
    if dedupe:
        e_in = e_in.distinct()
    # persist the edge table FIRST: it feeds nodes, degrees, the join
    # relation and the dangling set — without this the caller's edge
    # construction (often a self-join + distinct) re-executes for each
    e = e_in.persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    ej = dangling = zero_in = None
    try:
        n = nodes.count()
        if n == 0:
            # empty edge table: no nodes, no ranks — return the empty
            # (node, rank) frame instead of dividing by zero below
            return nodes.withColumn("rank", F.lit(0.0)).localCheckpoint(
                eager=True
            )
        bcast = n <= int(broadcast_nodes)
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        ej = e.join(deg, "src")
        if bcast:
            # partition the cached edge table by the AGGREGATION key:
            # with ranks broadcast, the src join imposes no
            # partitioning requirement, so laying edges out by dst
            # makes the per-round groupBy(dst) exchange-free
            ej = ej.repartition(
                e.sparkSession.sparkContext.defaultParallelism, F.col("dst")
            )
        ej = ej.persist()
        dangling = nodes.join(
            deg.select(F.col("src").alias("node")), "node", "left_anti"
        ).persist()
        # a graph with no dangling nodes (every co-occurrence graph,
        # any symmetrized graph) skips the per-round dangling-mass
        # subplan entirely — one fit-time count saves an agg +
        # crossJoin stage in every iteration
        has_dangling = dangling.limit(1).count() > 0
        # nodes nobody links to: their new rank has no contribution
        # term, so each round UNIONS them in (exchange-free) instead
        # of left-joining the full node table against the
        # contributions — one exchange per round saved
        zero_in = nodes.join(
            e.select(F.col("dst").alias("node")).distinct(),
            "node", "left_anti",
        ).persist()

        d = float(damping)
        tele = (1.0 - d) / n
        ranks = nodes.withColumn("rank", F.lit(1.0 / n))
        prev_checkpoint = ranks if tol is not None else None
        for i in range(int(iterations)):
            rk = ranks.withColumnRenamed("node", "src")
            if bcast:
                rk = F.broadcast(rk)
            contribs = (
                ej.join(rk, "src")
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum(F.col("rank") / F.col("deg")).alias("c"))
            )
            if has_dangling:
                rks = F.broadcast(ranks) if bcast else ranks
                dm = (
                    dangling.join(rks, "node")
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m"))
                )
                linked = contribs.crossJoin(F.broadcast(dm)).select(
                    "node",
                    (
                        F.lit(tele)
                        + F.lit(d) * (F.col("c") + F.col("m") / n)
                    ).alias("rank"),
                )
                isolated = zero_in.crossJoin(F.broadcast(dm)).select(
                    "node",
                    (F.lit(tele) + F.lit(d) * (F.col("m") / n)).alias(
                        "rank"
                    ),
                )
            else:
                linked = contribs.select(
                    "node",
                    (F.lit(tele) + F.lit(d) * F.col("c")).alias("rank"),
                )
                isolated = zero_in.select(
                    "node", F.lit(tele).alias("rank")
                )
            ranks = linked.unionByName(isolated)
            if checkpoint_every and (i + 1) % checkpoint_every == 0:
                ranks = ranks.localCheckpoint(eager=True)
                if tol is not None:
                    delta = (
                        ranks.withColumnRenamed("rank", "r_new")
                        .join(
                            prev_checkpoint.withColumnRenamed(
                                "rank", "r_old"
                            ),
                            "node",
                        )
                        .agg(
                            F.max(
                                F.abs(F.col("r_new") - F.col("r_old"))
                            ).alias("d")
                        )
                        .collect()[0]["d"]
                    )
                    prev_checkpoint = ranks
                    # delta is across checkpoint_every rounds; the
                    # per-round delta is smaller still, so this is a
                    # conservative (never-premature) stop
                    if delta is not None and delta < tol:
                        break
        # one final eager checkpoint makes the result independent of
        # the cached helper tables, so they can be released
        # immediately — a long-lived session calling pagerank
        # repeatedly must not accumulate five cached relations per
        # call
        return ranks.localCheckpoint(eager=True)
    finally:
        # unpersist unconditionally — an exception mid-iteration must
        # not leak five cached relations into a long-lived session
        for cached in (e, nodes, ej, dangling, zero_in):
            if cached is not None:
                cached.unpersist()
