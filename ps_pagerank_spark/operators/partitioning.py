"""Salted src-hash partitioning and skew diagnostics (north rule:
"partitions edges by salted src-hash with explicit high-degree-hub
splitting to tame skew").

The reference handles row skew with OpenMP guided scheduling
(openmp/pagerank.c:289 ``schedule(guided,1024)``) and the hybrid ELL+COO
format split (README.md:80-88). In Spark the equivalents are:

  * AQE skew-join splitting (enabled in session defaults) — runtime fix;
  * **salted repartition** (here) — plan-time fix: spread one heavy hash
    bucket across ``salt`` sub-partitions so no single task owns a hub's
    whole edge list;
  * **hub split** (operators/pagerank._split_hubs) — algebraic fix: route
    high-out-degree sources through a broadcast join so their fan-out
    never concentrates in one shuffle partition.

Salting trades one extra shuffle column for bounded task size; the
aggregation side is unaffected because groupBy(dst) re-shuffles anyway
and Spark's partial (map-side) aggregation pre-collapses each salted
sub-partition's contribution — the same partial+final pattern as the
reference's chunk accumulators (openmp/pagerank.c:341-394).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(
    df: DataFrame, key: str, num_partitions: int, salt: int = 8
) -> DataFrame:
    """Repartition by ``pmod(hash(key) * salt + salt_bucket, P)``: rows of
    one key land in ``salt`` different partitions instead of one. Use for
    skewed build sides whose downstream op is key-agnostic or re-aggregates
    (map-side partial aggregation absorbs the split)."""
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(*df.columns), F.lit(salt))
    ).repartition(num_partitions, F.col(key), F.col("_salt")).drop("_salt")


@dataclass
class SkewStats:
    n_edges: int
    n_src: int
    max_out_deg: int
    p99_out_deg: int
    hub_threshold: int
    n_hubs: int
    hub_edge_fraction: float


def skew_stats(edges: DataFrame, *, hub_quantile: float = 0.999) -> SkewStats:
    """Degree-skew diagnostics feeding the hub-split threshold (the Spark
    analog of the reference's ELL-width tuning, matrix-formats.c:164-165).

    Hubs = sources with out-degree ≥ the `hub_quantile` quantile;
    `hub_threshold` is reported as (quantile − 1) so that passing it to
    ``pagerank(hub_threshold=...)`` (which splits strictly-greater) selects
    exactly this hub set.
    """
    deg = edges.groupBy("src_id").agg(F.count("*").alias("deg")).persist()
    try:
        n_src = deg.count()
        n_edges = int(deg.agg(F.sum("deg")).collect()[0][0] or 0)
        qs = deg.approxQuantile("deg", [0.99, hub_quantile], 0.001)
        p99, thr = int(qs[0]), int(qs[1]) - 1
        hub_agg = deg.filter(F.col("deg") > thr).agg(
            F.count("*").alias("n"), F.coalesce(F.sum("deg"), F.lit(0)).alias("e")
        ).collect()[0]
        mx = int(deg.agg(F.max("deg")).collect()[0][0] or 0)
        return SkewStats(
            n_edges=n_edges,
            n_src=n_src,
            max_out_deg=mx,
            p99_out_deg=p99,
            hub_threshold=thr,
            n_hubs=int(hub_agg["n"]),
            hub_edge_fraction=(int(hub_agg["e"]) / n_edges) if n_edges else 0.0,
        )
    finally:
        deg.unpersist()


def partition_sizes(df: DataFrame) -> DataFrame:
    """(partition_id, n_rows) — direct evidence of balance for tests and
    the metrics table's per-partition lineage."""
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.count("*").alias("n_rows"))
    )
