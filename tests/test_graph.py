"""pagerank units: numpy power-iteration differential (same fixed
round count), mass conservation, dangling-node redistribution,
lineage checkpointing smoke at a higher iteration count."""

from __future__ import annotations

import numpy as np
import pandas as pd

from didtool_spark.operators.graph import pagerank


def _pr_numpy(edges, n_nodes, d=0.85, iters=8):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for a, _ in edges:
        deg[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        c = np.zeros(n)
        for a, b in edges:
            c[idx[b]] += r[idx[a]] / deg[idx[a]]
        dangling = sum(r[i] for i in range(n) if deg[i] == 0)
        r = (1 - d) / n + d * (c + dangling / n)
    return {v: r[idx[v]] for v in nodes}


EDGES = [
    (1, 2), (2, 1), (2, 3), (3, 1), (4, 3), (1, 4),
    (5, 1),  # 5 has out-degree but no in-edges
    (3, 6),  # 6 is dangling (no out-edges)
]


def _df(spark, edges):
    return spark.createDataFrame(
        pd.DataFrame(edges, columns=["src", "dst"])
    )


def test_pagerank_matches_numpy(spark):
    out = pagerank(
        _df(spark, EDGES), damping=0.85, iterations=8
    ).toPandas()
    ref = _pr_numpy(EDGES, 6, d=0.85, iters=8)
    got = dict(zip(out.node, out["rank"]))
    assert set(got) == set(ref)
    for v in ref:
        assert abs(got[v] - ref[v]) < 1e-12, v
    # total mass conserved
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # the hub (1) outranks the never-linked source (5)
    assert got[1] > got[5]


def test_pagerank_dangling_mass_redistributed(spark):
    # two nodes, one edge a->b: b is dangling; without redistribution
    # total mass decays below 1
    out = pagerank(
        _df(spark, [(10, 20)]), damping=0.85, iterations=12
    ).toPandas()
    assert abs(out["rank"].sum() - 1.0) < 1e-9
    ref = _pr_numpy([(10, 20)], 2, iters=12)
    got = dict(zip(out.node, out["rank"]))
    for v in ref:
        assert abs(got[v] - ref[v]) < 1e-12


def test_pagerank_checkpoint_path(spark):
    # iterations > checkpoint_every exercises the localCheckpoint
    out = pagerank(
        _df(spark, EDGES), iterations=7, checkpoint_every=2
    ).toPandas()
    assert len(out) == 6
    assert abs(out["rank"].sum() - 1.0) < 1e-9
