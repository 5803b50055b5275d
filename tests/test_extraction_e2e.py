"""SURVEY §5.2 items 3/4/6: end-to-end page-table pipeline with the
byte-identity contract, randomized-graph oracles, partition invariance.

The input_hint's per-row invariant — extracted text byte-identical per url
between the engine's pandas-UDF path and the single-process oracle path —
is asserted here verbatim.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from ps_pagerank_spark.functions.extract import (
    extract_links,
    extract_links_py,
    extract_text_py,
    extract_texts,
    normalize_links,
)
from ps_pagerank_spark.operators.graph import (
    encode_edges,
    encode_vertices,
    vertices_from_links,
)
from ps_pagerank_spark.operators.pagerank import pagerank
from ps_pagerank_spark.sources.edgelist import edges_from_pairs
from ps_pagerank_spark.sources.pages import (
    pages_df_from_edges,
    pages_pdf_from_edges,
    synth_powerlaw_edges,
    url_of,
)
from tests.oracle import pagerank_ref, verify_pagerank_equation


@pytest.fixture(scope="module")
def graph():
    edges = [(int(s), int(d)) for s, d in synth_powerlaw_edges(150, 700, seed=9)]
    return 150, edges


@pytest.fixture(scope="module")
def pages(spark, graph):
    n, edges = graph
    return pages_df_from_edges(spark, n, edges).cache()


def test_text_byte_identical_per_url(spark, pages, graph):
    """Engine (distributed pandas UDF) vs oracle (single process): the
    UTF-8 bytes of the extracted text must match per url, byte for byte."""
    n, edges = graph
    got = {
        r["url"]: r["text"] for r in extract_texts(pages).collect()
    }
    oracle_pdf = pages_pdf_from_edges(n, edges)
    for url, html in zip(oracle_pdf["url"], oracle_pdf["html"]):
        assert got[url].encode("utf-8") == extract_text_py(html).encode("utf-8")
    assert len(got) == n


def test_links_match_oracle(spark, pages, graph):
    n, edges = graph
    got = {
        (r["src_url"], r["dst_url"])
        for r in normalize_links(extract_links(pages)).collect()
    }
    oracle_pdf = pages_pdf_from_edges(n, edges)
    want = set()
    for url, html in zip(oracle_pdf["url"], oracle_pdf["html"]):
        for dst in extract_links_py(url, html):
            want.add((url, dst))
    assert got == want


def test_pages_to_pagerank_end_to_end(spark, pages, graph):
    """Full pipeline: pages → links → dictionary → edges → PageRank; the
    converged per-vertex scores must match the NumPy oracle run on the
    oracle-extracted edge list (allclose 1e-6, the north-star criterion),
    and satisfy the per-row fixed-point equation (verify_pagerank.m)."""
    n, edges = graph
    links = normalize_links(extract_links(pages))
    vertices = encode_vertices(vertices_from_links(links), mode="zip")
    enc = encode_edges(links, vertices)
    res = pagerank(spark, enc, eps=1e-10, dangling_mode="redistribute")
    url2id = {r["url"]: r["vertex_id"] for r in vertices.collect()}
    got = {r["vertex_id"]: r["rank"] for r in res.ranks.collect()}

    # oracle graph in the engine's id space
    dedup = sorted({(s, d) for s, d in edges if s != d})
    oedges = [(url2id[url_of(s)], url2id[url_of(d)]) for s, d in dedup]
    n_o = len(url2id)
    want, _ = pagerank_ref(
        oedges, n_o, eps=1e-10, dangling_mode="redistribute"
    )
    assert len(got) == n_o
    assert np.allclose(
        np.array([got[i] for i in range(n_o)]), want, atol=1e-6, rtol=0
    )
    assert verify_pagerank_equation(
        np.array([got[i] for i in range(n_o)]),
        oedges,
        dangling_mode="redistribute",
    )


@pytest.mark.parametrize("dangling_mode", ["none", "redistribute"])
def test_random_graph_vs_oracle(spark, dangling_mode):
    """Seeded random digraph (hubs, dangling, isolated ids) vs NumPy oracle
    (SURVEY §5.2 item 4)."""
    rng = np.random.default_rng(123)
    n = 80
    src = rng.integers(0, n, 400)
    dst = rng.integers(0, n, 400)
    edges = sorted({(int(s), int(d)) for s, d in zip(src, dst) if s != d})
    df = edges_from_pairs(spark, edges)
    verts = spark.range(n).selectExpr("id AS vertex_id")
    res = pagerank(
        spark, df, vertices=verts, eps=1e-10, dangling_mode=dangling_mode
    )
    got = np.array(
        [r["rank"] for r in res.ranks.orderBy("vertex_id").collect()]
    )
    want, _ = pagerank_ref(edges, n, eps=1e-10, dangling_mode=dangling_mode)
    assert np.allclose(got, want, atol=1e-6, rtol=0)


def test_url_expr_no_truncation_above_1m(spark):
    """Regression: the distributed synthesizer once built urls with
    ``F.lpad(..., 6, '0')``, which TRUNCATES ids longer than 6 digits —
    above 1M vertices distinct pages collided onto one url. The column
    expression must match ``url_of`` exactly at any id."""
    from ps_pagerank_spark.sources.pages import _url_expr

    ids = [0, 7, 999_999, 1_000_000, 1_234_567, 4_000_000]
    df = spark.createDataFrame([(i,) for i in ids], "v long").select(
        "v", _url_expr(F.col("v")).alias("url")
    )
    got = {r["v"]: r["url"] for r in df.collect()}
    assert got == {i: url_of(i) for i in ids}


def test_synth_pages_distributed_extracts_generator_edges(spark):
    """synth_pages_distributed → extract_links must reproduce EXACTLY the
    generator's distinct (src, dst) pairs (the expected-count contract the
    large-scale E2E benchmark asserts, BENCH/e2e_pages.py)."""
    from ps_pagerank_spark.sources.pages import (
        synth_edges_distributed,
        synth_pages_distributed,
    )

    n = 400
    pages = synth_pages_distributed(spark, n, avg_out_degree=5, seed=11)
    links = extract_links(pages)
    got = {
        (r["src_url"], r["dst_url"]) for r in links.collect()
    }
    want = {
        (url_of(r["v"]), url_of(r["dst_v"]))
        for r in synth_edges_distributed(spark, n, 5, 11)
        .dropDuplicates(["v", "dst_v"])
        .collect()
    }
    assert got == want
    # per-page first-occurrence dedupe means counts match too (no dupes)
    assert links.count() == len(want)


def test_partition_invariance(spark):
    """SURVEY §5.2 item 6: identical scores at 2 / 8 / 32 partitions."""
    rng = np.random.default_rng(7)
    edges = sorted(
        {
            (int(s), int(d))
            for s, d in zip(rng.integers(0, 60, 300), rng.integers(0, 60, 300))
            if s != d
        }
    )
    df = edges_from_pairs(spark, edges)
    results = []
    for p in (2, 8, 32):
        res = pagerank(
            spark,
            df,
            fixed_iterations=12,
            dangling_mode="redistribute",
            num_partitions=p,
        )
        results.append(
            {r["vertex_id"]: r["rank"] for r in res.ranks.collect()}
        )
    base = results[0]
    for other in results[1:]:
        assert base.keys() == other.keys()
        for k in base:
            assert math.isclose(base[k], other[k], rel_tol=0, abs_tol=1e-12)
