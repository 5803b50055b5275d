"""PageRank correctness vs the NumPy oracle on the reference's golden
micro-graphs (FIXTURES.md §3) + the per-row fixed-point equation check
ported from matlab-reference-implementation/verify_pagerank.m:16-34."""

from __future__ import annotations

import numpy as np
import pytest

from ps_pagerank_spark.operators.graph import vertices_id_range
from ps_pagerank_spark.operators.pagerank import pagerank, top_k_ranks
from tests.conftest import BIG_EDGES, BIG_N, SMALL_EDGES, SMALL_N
from tests.oracle import pagerank_ref, verify_pagerank_equation


def _ranks_np(res, n):
    rows = res.ranks.collect()
    out = np.zeros(n)
    for r in rows:
        out[r["vertex_id"]] = r["rank"]
    return out


@pytest.mark.parametrize("dangling_mode", ["none", "redistribute"])
@pytest.mark.parametrize("kernel", ["join", "csr_block"])
def test_small_graph(spark, small_edges_df, dangling_mode, kernel):
    verts = vertices_id_range(spark, small_edges_df)
    res = pagerank(
        spark,
        small_edges_df,
        vertices=verts,
        dangling_mode=dangling_mode,
        kernel=kernel,
        num_partitions=4,
    )
    got = _ranks_np(res, SMALL_N)
    want, want_iters = pagerank_ref(SMALL_EDGES, SMALL_N, dangling_mode=dangling_mode)
    assert np.allclose(got, want, atol=1e-6)
    assert res.iterations == want_iters
    assert verify_pagerank_equation(got, SMALL_EDGES, dangling_mode=dangling_mode)
    if dangling_mode == "redistribute":
        assert abs(got.sum() - 1.0) < 1e-9
    else:
        assert got.sum() < 1.0  # dangling mass leaks (pagerank.c:359-368)


@pytest.mark.parametrize("dangling_mode", ["none", "redistribute"])
def test_big_graph_ghost_vertex(spark, big_edges_df, dangling_mode):
    """Vertex 0 never appears in an edge but exists by the id-range rule
    (pagerank.c:88): rank == (1−d)/N in mode 'none'."""
    verts = vertices_id_range(spark, big_edges_df)
    res = pagerank(
        spark, big_edges_df, vertices=verts, dangling_mode=dangling_mode,
        num_partitions=4,
    )
    got = _ranks_np(res, BIG_N)
    want, want_iters = pagerank_ref(BIG_EDGES, BIG_N, dangling_mode=dangling_mode)
    assert np.allclose(got, want, atol=1e-6)
    assert res.iterations == want_iters
    if dangling_mode == "none":
        assert abs(got[0] - 0.15 / BIG_N) < 1e-12


def test_fixed_iterations(spark, big_edges_df):
    verts = vertices_id_range(spark, big_edges_df)
    res = pagerank(
        spark, big_edges_df, vertices=verts, fixed_iterations=7, num_partitions=4
    )
    got = _ranks_np(res, BIG_N)
    want, _ = pagerank_ref(BIG_EDGES, BIG_N, fixed_iterations=7)
    assert res.iterations == 7
    assert np.allclose(got, want, atol=1e-12)


def test_hub_split_same_scores(spark, big_edges_df):
    verts = vertices_id_range(spark, big_edges_df)
    res = pagerank(
        spark, big_edges_df, vertices=verts, hub_threshold=2, num_partitions=4
    )
    got = _ranks_np(res, BIG_N)
    want, _ = pagerank_ref(BIG_EDGES, BIG_N)
    assert np.allclose(got, want, atol=1e-6)


def test_topk(spark, big_edges_df):
    verts = vertices_id_range(spark, big_edges_df)
    res = pagerank(spark, big_edges_df, vertices=verts, num_partitions=4)
    want, _ = pagerank_ref(BIG_EDGES, BIG_N)
    top = top_k_ranks(res.ranks, 3).collect()
    want_order = np.argsort(-want)[:3]
    assert [r["vertex_id"] for r in top] == list(want_order)


def test_metrics_monotone_delta(spark, big_edges_df):
    verts = vertices_id_range(spark, big_edges_df)
    res = pagerank(spark, big_edges_df, vertices=verts, num_partitions=4)
    deltas = [m["l2_delta"] for m in res.metrics]
    assert all(b <= a * 1.0000001 for a, b in zip(deltas[1:], deltas[2:]))
