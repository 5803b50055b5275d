"""End-to-end extraction-path benchmark (round-5 evidence, VERDICT r4 #7).

The graph kernels have scaling numbers; this measures the mandated front
half of the input_hint pipeline at benchmark scale:

    synth_pages_distributed (Common-Crawl-style pages, written to parquet)
      -> extract_links (pandas-UDF regex extractor) -> normalize_links
      -> encode_vertices (zip dictionary) + encode_edges (two url joins)
      -> csr_block PageRank to 1e-6

and asserts the extracted edge set size matches the generator's exact
expectation (distinct (v, dst_v) pairs from synth_edges_distributed — the
same contract tests/test_extraction_e2e.py pins at small scale).

Usage:
  E2E_PAGES=4000000 E2E_DEG=18 E2E_CPUS=32 python BENCH/e2e_pages.py
Prints ONE JSON line; writes the pages parquet under $E2E_TMP (default
/tmp/e2e_pages, removed afterwards unless E2E_KEEP=1).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_PAGES = int(os.environ.get("E2E_PAGES", "4000000"))
AVG_DEG = int(os.environ.get("E2E_DEG", "18"))
CPUS = int(os.environ.get("E2E_CPUS", "32"))
SEED = int(os.environ.get("E2E_SEED", "42"))
TMP = os.environ.get("E2E_TMP", "/tmp/e2e_pages")


def main() -> None:
    from pyspark.sql import functions as F

    from ps_pagerank_spark import get_spark
    from ps_pagerank_spark.functions.extract import extract_links, normalize_links
    from ps_pagerank_spark.operators.graph import (
        encode_edges,
        encode_vertices,
        vertices_from_links,
    )
    from ps_pagerank_spark.operators.pagerank import pagerank
    from ps_pagerank_spark.sources.pages import (
        synth_edges_distributed,
        synth_pages_distributed,
    )

    spark = get_spark(master=f"local[{CPUS}]", app_name="e2e_pages")
    pages_dir = f"{TMP}/pages_{N_PAGES}_{AVG_DEG}_{SEED}"
    out: dict = {
        "n_pages": N_PAGES,
        "avg_out_degree": AVG_DEG,
        "cpus": CPUS,
        "phases_s": {},
    }

    # READ analog: materialize the pages table once, then run the pipeline
    # from the parquet scan (so extract reads columnar pages, not a
    # recomputed synthesizer plan).
    t0 = time.perf_counter()
    synth_pages_distributed(spark, N_PAGES, AVG_DEG, SEED).write.mode(
        "overwrite"
    ).parquet(pages_dir)
    out["phases_s"]["synth_write_pages"] = round(time.perf_counter() - t0, 3)
    pages = spark.read.parquet(pages_dir)

    # exact expectation: the generator's distinct (v, dst_v) pairs
    t0 = time.perf_counter()
    expected_links = (
        synth_edges_distributed(spark, N_PAGES, AVG_DEG, SEED)
        .dropDuplicates(["v", "dst_v"])
        .count()
    )
    out["expected_links"] = expected_links
    out["phases_s"]["expected_count"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    links = normalize_links(extract_links(pages)).persist()
    n_links = links.count()
    out["extracted_links"] = n_links
    out["phases_s"]["extract_links"] = round(time.perf_counter() - t0, 3)
    out["links_match_expected"] = n_links == expected_links

    t0 = time.perf_counter()
    vertices = encode_vertices(vertices_from_links(links), mode="zip").persist()
    n_vertices = vertices.count()
    edges = encode_edges(links, vertices).persist()
    n_edges = edges.count()
    out["n_vertices"] = n_vertices
    out["n_edges"] = n_edges
    out["phases_s"]["encode"] = round(time.perf_counter() - t0, 3)
    out["edges_match_expected"] = n_edges == expected_links
    links.unpersist()

    t0 = time.perf_counter()
    res = pagerank(
        spark,
        edges,
        eps=1e-6,
        dangling_mode="redistribute",
        kernel="csr_block",
    )
    res.ranks.count()
    out["phases_s"]["pagerank_wall"] = round(time.perf_counter() - t0, 3)
    out["pagerank"] = {
        "iterations": res.iterations,
        "converged": res.converged,
        "phases": res.phases,
        "iter_s": [round(m["elapsed_s"], 3) for m in res.metrics],
    }
    steady = [m["elapsed_s"] for m in res.metrics[1:]] or [
        m["elapsed_s"] for m in res.metrics
    ]
    med = statistics.median(steady)
    out["pagerank"]["median_iter_s"] = round(med, 3)
    out["pagerank"]["edges_per_sec_per_iter"] = round(n_edges / med)
    out["total_pipeline_s"] = round(
        sum(
            out["phases_s"][k]
            for k in ("extract_links", "encode", "pagerank_wall")
        ),
        3,
    )

    print(json.dumps(out))
    spark.stop()
    if os.environ.get("E2E_KEEP") != "1":
        shutil.rmtree(pages_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
