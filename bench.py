"""Benchmark harness — prints ONE JSON line.

Headline metric (BASELINE.json): edges-processed/sec per PageRank
iteration to 1e-6 convergence, on the deterministic TPC-H-derived link
graph at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), running
local[$SPARK_GRAFT_CPUS].

`queries` maps each headline operator to wall seconds. Extra context
(edge count, iteration counts, per-kernel throughput) rides along in
non-contract fields. Scaling-efficiency evidence (local[8] vs local[32])
lives in BENCH/scaling.py → BENCH/BASELINE.md, not here, so the per-round
bench stays fast.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

from ps_pagerank_spark import get_spark  # noqa: E402
from ps_pagerank_spark.sources.edgelist import tpch_graph_edges  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EPS = 1e-6


def _sf_of(path: str) -> float:
    try:
        return float(Path(path).name.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    spark = get_spark(app_name="bench")
    queries: dict[str, float] = {}
    extra: dict[str, object] = {}

    t0 = time.perf_counter()
    edges = tpch_graph_edges(spark, SF_DIR).persist()
    n_edges = edges.count()
    queries["edges_build"] = round(time.perf_counter() - t0, 3)
    extra["n_edges"] = n_edges

    from ps_pagerank_spark.operators.pagerank import pagerank

    # headline: join-kernel PageRank to 1e-6, dangling redistribution
    t0 = time.perf_counter()
    res = pagerank(
        spark, edges, eps=EPS, dangling_mode="redistribute", kernel="join"
    )
    res.ranks.count()
    t_join = time.perf_counter() - t0
    queries["pagerank_join_1e6"] = round(t_join, 3)
    calc_s = sum(m["elapsed_s"] for m in res.metrics)
    thr_join = n_edges * res.iterations / calc_s
    extra["pagerank_join"] = {
        "iterations": res.iterations,
        "calc_s": round(calc_s, 3),
        "edges_per_sec_per_iter": round(thr_join),
        "phases": res.phases,
    }

    # CSR-block Arrow-UDF kernel (pre-aggregated shuffle)
    t0 = time.perf_counter()
    res_c = pagerank(
        spark, edges, eps=EPS, dangling_mode="redistribute", kernel="csr_block"
    )
    res_c.ranks.count()
    queries["pagerank_csr_block_1e6"] = round(time.perf_counter() - t0, 3)
    calc_c = sum(m["elapsed_s"] for m in res_c.metrics)
    extra["pagerank_csr_block"] = {
        "iterations": res_c.iterations,
        "calc_s": round(calc_c, 3),
        "edges_per_sec_per_iter": round(n_edges * res_c.iterations / calc_c),
        "phases": res_c.phases,
    }

    from ps_pagerank_spark.operators.components import connected_components

    t0 = time.perf_counter()
    cc = connected_components(spark, edges)
    cc.components.count()
    queries["connected_components"] = round(time.perf_counter() - t0, 3)
    extra["cc_rounds"] = cc.rounds

    from ps_pagerank_spark.operators.triangles import triangle_counts

    t0 = time.perf_counter()
    triangle_counts(spark, edges).count()
    queries["triangle_counts"] = round(time.perf_counter() - t0, 3)

    from ps_pagerank_spark.operators.labelprop import label_propagation

    t0 = time.perf_counter()
    label_propagation(spark, edges, iterations=3).count()
    queries["label_propagation_3"] = round(time.perf_counter() - t0, 3)

    # training-data pipeline ops over the documents table
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    extra["n_docs"] = docs.count()

    from pyspark.sql import functions as F

    from ps_pagerank_spark.functions.text import text_feature_columns

    t0 = time.perf_counter()
    feats = text_feature_columns(F.col("text"))
    docs.select("doc_id", *[v.alias(k) for k, v in feats.items()]).count()
    queries["text_features"] = round(time.perf_counter() - t0, 3)

    from ps_pagerank_spark.operators.dedup import minhash_lsh_pairs

    t0 = time.perf_counter()
    extra["minhash_pairs"] = minhash_lsh_pairs(docs, threshold=0.5).count()
    queries["minhash_lsh_dedup"] = round(time.perf_counter() - t0, 3)

    # headline = csr_block, the north-star kernel (per-partition CSR-block
    # gather-scatter in Arrow UDFs); 2.3x over the join kernel at 32M edges
    out = {
        "metric": "pagerank_edges_per_sec_per_iter@1e-6",
        "value": extra["pagerank_csr_block"]["edges_per_sec_per_iter"],
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
