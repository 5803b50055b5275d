"""Benchmark harness — prints ONE JSON line.

Headline metric (BASELINE.json): edges-processed/sec per PageRank
iteration to 1e-6 convergence, on the deterministic TPC-H-derived link
graph at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), running
local[$SPARK_GRAFT_CPUS].

Stall robustness: this box exhibits random multi-second stalls, so every
query runs $SPARK_GRAFT_REPS times (default 3) and the recorded number is
the MEDIAN wall; per-kernel throughput uses the best rep's median
per-iteration time. One stalled run can no longer write the round record.

`queries` maps each headline operator to wall seconds. Extra context
(edge count, iteration counts, per-kernel throughput, all rep walls) rides
along in non-contract fields. Scaling-efficiency evidence (local[8] vs
local[32]) lives in BENCH/scaling.py → BENCH/BASELINE.md, not here, so the
per-round bench stays fast.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

from ps_pagerank_spark import get_spark  # noqa: E402
from ps_pagerank_spark.sources.edgelist import tpch_graph_edges  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EPS = 1e-6
REPS = max(1, int(os.environ.get("SPARK_GRAFT_REPS", "3")))


def _sf_of(path: str) -> float:
    try:
        return float(Path(path).name.replace("sf", ""))
    except ValueError:
        return -1.0


_PINNED: list = []  # DataFrames whose cache must survive rep-to-rep clearing


def median_of(fn, reps: int = REPS, spark=None):
    """Run fn() reps times; return (median_wall, [walls], last_result).

    Between reps, every cached DataFrame except the deliberately pinned
    ones (the shared `edges` input) is dropped, so reps 2..N measure real
    work instead of a leaked cache from rep 1 (the round-3
    minhash_lsh_dedup=0.55s record was exactly that artifact)."""
    walls, result = [], None
    for i in range(reps):
        t0 = time.perf_counter()
        result = fn()
        walls.append(round(time.perf_counter() - t0, 3))
        if spark is not None and i < reps - 1:
            spark.catalog.clearCache()
            for df in _PINNED:
                df.persist()
                df.count()
    return round(statistics.median(walls), 3), walls, result


def main() -> None:
    spark = get_spark(app_name="bench")
    queries: dict[str, float] = {}
    extra: dict[str, object] = {}
    rep_walls: dict[str, list[float]] = {}

    edges = tpch_graph_edges(spark, SF_DIR)

    def build_edges():
        edges.unpersist(blocking=True)
        edges.persist()
        return edges.count()

    queries["edges_build"], rep_walls["edges_build"], n_edges = median_of(build_edges)
    extra["n_edges"] = n_edges
    _PINNED.append(edges)  # downstream queries assume a warm edges cache

    from ps_pagerank_spark.operators.pagerank import pagerank

    def pr_detail(results):
        """Throughput from the best rep's median steady iteration (drop
        iteration 1 = warmup); iteration counts are deterministic.
        calc_s and phases come from THAT SAME rep — the round-4 record
        took them from rep 1, which on this box is the stall-prone one
        (a 147s block build rode into BENCH_r04 as the phase record
        while the headline used a different rep). rep_phases keeps every
        rep's phases so a stalled rep is visible in the artifact."""
        per_iter = [
            statistics.median(m["elapsed_s"] for m in r.metrics[1:] or r.metrics)
            for r in results
        ]
        i_best = per_iter.index(min(per_iter))
        rb = results[i_best]
        return {
            "iterations": rb.iterations,
            "best_rep": i_best,
            "calc_s": round(sum(m["elapsed_s"] for m in rb.metrics), 3),
            "median_iter_s_best_rep": round(min(per_iter), 3),
            "edges_per_sec_per_iter": round(n_edges / min(per_iter)),
            "phases": rb.phases,
            "rep_phases": [r.phases for r in results],
        }

    # headline: PageRank to 1e-6 as a user invokes it — kernel="auto"
    # (the engine default) resolves join vs csr_block from the same
    # Catalyst-stats probe that sizes the loop partitions; at sf0.1 the
    # input is provably small so this measures the auto-selected kernel
    # end-to-end (probe included)
    runs_auto = []
    queries["pagerank_auto_1e6"], rep_walls["pagerank_auto_1e6"], _ = median_of(
        lambda: runs_auto.append(
            pagerank(spark, edges, eps=EPS, dangling_mode="redistribute")
        )
        or runs_auto[-1].ranks.count(),
        spark=spark,
    )
    extra["pagerank_auto"] = pr_detail(runs_auto)
    extra["pagerank_auto"]["kernel_selected"] = runs_auto[-1].kernel

    # explicit join-kernel PageRank to 1e-6, dangling redistribution
    runs_join = []
    queries["pagerank_join_1e6"], rep_walls["pagerank_join_1e6"], _ = median_of(
        lambda: runs_join.append(
            pagerank(spark, edges, eps=EPS, dangling_mode="redistribute",
                     kernel="join")
        )
        or runs_join[-1].ranks.count(),
        spark=spark,
    )
    extra["pagerank_join"] = pr_detail(runs_join)

    # CSR-block Arrow-UDF kernel (resident block store)
    runs_csr = []
    (
        queries["pagerank_csr_block_1e6"],
        rep_walls["pagerank_csr_block_1e6"],
        _,
    ) = median_of(
        lambda: runs_csr.append(
            pagerank(spark, edges, eps=EPS, dangling_mode="redistribute",
                     kernel="csr_block")
        )
        or runs_csr[-1].ranks.count(),
        spark=spark,
    )
    extra["pagerank_csr_block"] = pr_detail(runs_csr)

    from ps_pagerank_spark.operators.components import connected_components

    cc_res = []
    queries["connected_components"], rep_walls["connected_components"], _ = median_of(
        lambda: cc_res.append(connected_components(spark, edges))
        or cc_res[-1].components.count(),
        spark=spark,
    )
    extra["cc_rounds"] = cc_res[-1].rounds

    from ps_pagerank_spark.operators.triangles import triangle_counts

    queries["triangle_counts"], rep_walls["triangle_counts"], _ = median_of(
        lambda: triangle_counts(spark, edges).count(), spark=spark
    )

    from ps_pagerank_spark.operators.labelprop import label_propagation

    queries["label_propagation_3"], rep_walls["label_propagation_3"], _ = median_of(
        lambda: label_propagation(spark, edges, iterations=3).count(), spark=spark
    )

    # training-data pipeline ops over the documents table
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    extra["n_docs"] = docs.count()

    from pyspark.sql import functions as F

    from ps_pagerank_spark.functions.text import text_feature_columns

    feats = text_feature_columns(F.col("text"))
    queries["text_features"], rep_walls["text_features"], _ = median_of(
        lambda: docs.select(
            "doc_id", *[v.alias(k) for k, v in feats.items()]
        ).count(),
        spark=spark,
    )

    from ps_pagerank_spark.operators.dedup import (
        minhash_lsh_pairs,
        simhash_neardup_pairs,
    )

    queries["minhash_lsh_dedup"], rep_walls["minhash_lsh_dedup"], pairs = median_of(
        lambda: minhash_lsh_pairs(docs, threshold=0.5).count(), spark=spark
    )
    extra["minhash_pairs"] = pairs

    queries["simhash_neardup"], rep_walls["simhash_neardup"], _ = median_of(
        lambda: simhash_neardup_pairs(docs).count(), spark=spark
    )

    extra["reps"] = REPS
    extra["rep_walls"] = rep_walls

    # headline = the engine-default kernel="auto" run (join below the
    # measured block-store amortization point, csr_block at scale); the
    # explicit join/csr_block runs above stay in the record as the A/B
    out = {
        "metric": "pagerank_edges_per_sec_per_iter@1e-6",
        "value": extra["pagerank_auto"]["edges_per_sec_per_iter"],
        "unit": "edges/s",
        "queries": queries,
        "sf": _sf_of(SF_DIR),
        "total_sec": round(sum(queries.values()), 3),
        "detail": extra,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
