"""Shared fixtures: one SparkSession per test session; golden graphs
transcribed from the reference (FIXTURES.md §3)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from ps_pagerank_spark import get_spark  # noqa: E402

# matlab-reference-implementation/small-input.txt:1-7 (1-indexed → 0-indexed)
SMALL_EDGES = [(0, 1), (1, 0), (2, 0), (2, 3), (2, 4), (4, 3), (4, 0)]
SMALL_N = 5

# matlab-reference-implementation/big-input.txt:1-17 (used 0-based as-is;
# vertex 0 is a ghost: exists by the id-range rule, pagerank.c:88)
BIG_EDGES = [
    (1, 2), (2, 1), (4, 1), (4, 5), (4, 11), (5, 1), (5, 4), (6, 4),
    (7, 4), (8, 1), (8, 4), (9, 1), (9, 4), (10, 1), (10, 4), (11, 1), (11, 3),
]
BIG_N = 12


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", app_name="ps_pagerank_spark_tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def small_edges_df(spark):
    from ps_pagerank_spark.sources.edgelist import edges_from_pairs

    return edges_from_pairs(spark, SMALL_EDGES).cache()


@pytest.fixture(scope="session")
def big_edges_df(spark):
    from ps_pagerank_spark.sources.edgelist import edges_from_pairs

    return edges_from_pairs(spark, BIG_EDGES).cache()
