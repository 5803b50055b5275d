"""Edge sources.

S1 in SURVEY.md §2.1: the reference's only scan is a whitespace-separated
integer-pair text file read with ``fscanf("%d %d")``
(c-single-threaded/pagerank.c:64-88), optionally with Matrix-Market ``%``
header lines (README.md:92). Here that becomes a declarative text scan —
split/cast stay inside whole-stage codegen; malformed rows are counted, not
crashed on (P3 analog, pagerank.c:82-86).

Also: derivation of a deterministic directed graph from the sandbox's
TPC-H-ish tables (part → supplier from lineitem) so correctness queries have
a DuckDB-checkable edge table with realistic skew (suppliers are natural
high-in-degree hubs and are all dangling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EDGES_COLS = ("src_id", "dst_id")


def read_edge_list(
    spark: SparkSession, path: str, one_indexed: bool = False
) -> DataFrame:
    """Text edge list → edges(src_id long, dst_id long).

    Keeps reference semantics: duplicate lines are kept (dedup is a separate,
    explicit step — SURVEY.md §2.4 semantic note); ``%``-prefixed
    Matrix-Market headers are skipped; malformed lines are dropped.
    """
    shift = 1 if one_indexed else 0
    toks = F.split(F.trim(F.col("value")), r"\s+")
    return (
        spark.read.text(path)
        .filter(~F.col("value").startswith("%"))
        .filter(F.trim(F.col("value")) != "")
        .select(
            # try_cast: malformed tokens → NULL → filtered (not a crash);
            # Spark 4 ANSI mode makes plain cast throw on bad input
            (F.element_at(toks, 1).try_cast("long") - shift).alias("src_id"),
            (F.element_at(toks, 2).try_cast("long") - shift).alias("dst_id"),
        )
        .filter(F.col("src_id").isNotNull() & F.col("dst_id").isNotNull())
    )


def edges_from_pairs(spark: SparkSession, pairs) -> DataFrame:
    """Driver-side (test-sized) pair list → edges DataFrame."""
    return spark.createDataFrame(
        [(int(s), int(d)) for s, d in pairs], "src_id long, dst_id long"
    )


def tpch_graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic digraph over the sandbox testdata:
      * part → supplier edges (suppliers become dangling high-in-degree
        hubs: skew + dangling-mass exercise), plus
      * part → part edges between lineitems of the same order (linenumber
        ascending), which create per-order cliques → triangles.
    Deduplicated, self-loops dropped. Mirrors ``TPCH_GRAPH_SQL`` exactly.
    """
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    ps = li.select(
        F.col("l_partkey").alias("src_id"), F.col("l_suppkey").alias("dst_id")
    )
    a = li.select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln_a"),
        F.col("l_partkey").alias("src_id"),
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln_b"),
        F.col("l_partkey").alias("dst_id"),
    )
    pp = (
        a.join(b, "ok")
        .filter(F.col("ln_a") < F.col("ln_b"))
        .select("src_id", "dst_id")
    )
    return (
        ps.unionByName(pp)
        .filter(F.col("src_id") != F.col("dst_id"))
        .dropDuplicates(["src_id", "dst_id"])
    )


TPCH_GRAPH_SQL = """
    SELECT DISTINCT src_id, dst_id FROM (
        SELECT l_partkey AS src_id, l_suppkey AS dst_id FROM lineitem
        UNION ALL
        SELECT a.l_partkey AS src_id, b.l_partkey AS dst_id
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
    ) WHERE src_id <> dst_id
"""
