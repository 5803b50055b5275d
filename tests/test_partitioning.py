"""Skew handling: salted repartition balance, skew stats, hub-split
equivalence (hub path must not change PageRank scores)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ps_pagerank_spark.operators.pagerank import pagerank
from ps_pagerank_spark.operators.partitioning import (
    partition_sizes,
    salted_repartition,
    skew_stats,
)
from ps_pagerank_spark.sources.edgelist import edges_from_pairs


def hub_graph(spark):
    """One mega-hub (vertex 0 → 2000 targets) + a sparse ring."""
    pairs = [(0, i) for i in range(1, 2001)]
    pairs += [(i, (i % 2000) + 1) for i in range(1, 2001)]
    return edges_from_pairs(spark, pairs)


def test_salted_repartition_balances_hub(spark):
    edges = hub_graph(spark)
    plain = edges.repartition(8, "src_id")
    salted = salted_repartition(edges, "src_id", 8, salt=8)
    pmax = max(r["n_rows"] for r in partition_sizes(plain).collect())
    smax = max(r["n_rows"] for r in partition_sizes(salted).collect())
    # hub's 2000 rows hit one partition unsalted; salted spreads them
    assert pmax >= 2000
    assert smax < 1200
    assert salted.count() == edges.count()
    assert salted.columns == edges.columns


def test_skew_stats(spark):
    edges = hub_graph(spark)
    st = skew_stats(edges)
    assert st.n_edges == 4000
    assert st.max_out_deg == 2000
    assert st.n_hubs >= 1
    assert 0 < st.hub_edge_fraction <= 1


def test_hub_split_matches_plain_pagerank(spark):
    edges = hub_graph(spark)
    base = pagerank(spark, edges, fixed_iterations=10, dangling_mode="redistribute")
    split = pagerank(
        spark,
        edges,
        fixed_iterations=10,
        dangling_mode="redistribute",
        hub_threshold=100,
    )
    a = {r["vertex_id"]: r["rank"] for r in base.ranks.collect()}
    b = {r["vertex_id"]: r["rank"] for r in split.ranks.collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert math.isclose(a[k], b[k], rel_tol=1e-12, abs_tol=1e-15)
