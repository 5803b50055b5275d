"""Controlled A/B of csr_block partial aggregation: rows vs blob (round 5).

The round-5 profiler (BENCH/BASELINE.md §5) attributes 57% of a steady
csr_block iteration at 64M edges to the partials shuffle + hash agg — the
Σ_b unique-dst(b) (bucket, dst) rows every iteration pushes through a JVM
exchange. The V1-V4 variants measured there are dead ends. V5 ("blob")
keeps the identical per-bucket gather but ships partials as ≤P packed
binary cells per bucket keyed by contiguous dst range, then combines them
densely (np.bincount) in a second Arrow stage — the per-key aggregation
never materializes as JVM rows.

Methodology matches BENCH/ab_loop.py: same session, same persisted input,
cells interleaved round-robin across reps so a sandbox stall window hits
every cell equally; statistic = best-rep median steady-iteration seconds
(iteration 1 dropped), the bench headline statistic.

Inputs (env): AB_SF_DIR / AB_EDGES / AB_CPUS / AB_REPS / AB_ITERS /
AB_NUM_PARTITIONS — same meanings as ab_loop.py; AB_PARTIALS (default
"rows,blob").
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")
N_EDGES = int(os.environ.get("AB_EDGES", "0"))  # 0 = use SF_DIR
CPUS = int(os.environ.get("AB_CPUS", "32"))
REPS = int(os.environ.get("AB_REPS", "3"))
ITERS = int(os.environ.get("AB_ITERS", "8"))  # 0 = eps=1e-6 convergence
MODES = os.environ.get("AB_PARTIALS", "rows,blob").split(",")
NUM_PARTITIONS = int(os.environ.get("AB_NUM_PARTITIONS", "0")) or None


def main() -> None:
    from ps_pagerank_spark import get_spark
    from ps_pagerank_spark.operators.pagerank import pagerank

    spark = get_spark(master=f"local[{CPUS}]", app_name="ab_partials")
    if N_EDGES:
        from BENCH.scaling import synthetic_edges

        edges = synthetic_edges(spark, N_EDGES, N_EDGES // 16).persist()
    else:
        from ps_pagerank_spark.sources.edgelist import tpch_graph_edges

        edges = tpch_graph_edges(spark, SF_DIR).persist()
    n_edges = edges.count()

    kw: dict = dict(dangling_mode="redistribute", kernel="csr_block")
    if ITERS:
        kw["fixed_iterations"] = ITERS
    else:
        kw["eps"] = 1e-6
    if NUM_PARTITIONS:
        kw["num_partitions"] = NUM_PARTITIONS

    cells: dict[str, dict] = {m: {"reps": []} for m in MODES}
    rank_sums = set()
    for rep in range(REPS):
        for m in MODES:
            spark.catalog.clearCache()
            edges.persist()
            edges.count()
            t0 = time.perf_counter()
            res = pagerank(spark, edges, partials=m, **kw)
            res.ranks.count()
            wall = time.perf_counter() - t0
            rank_sums.add(round(res.metrics[-1]["rank_sum"], 9))
            steady = [x["elapsed_s"] for x in res.metrics[1:]] or [
                x["elapsed_s"] for x in res.metrics
            ]
            cells[m]["reps"].append(
                {
                    "rep": rep,
                    "wall_s": round(wall, 3),
                    "iterations": res.iterations,
                    "iter_s": [round(s, 3) for s in steady],
                    "median_iter_s": round(statistics.median(steady), 3),
                    "phases": res.phases,
                }
            )
            print(
                f"rep{rep} partials={m}: wall={wall:.1f}s "
                f"median_iter={statistics.median(steady):.3f}s",
                file=sys.stderr,
            )

    for cell in cells.values():
        best = min(r["median_iter_s"] for r in cell["reps"])
        cell["best_rep_median_iter_s"] = best
        cell["edges_per_sec_per_iter"] = round(n_edges / best)

    out = {
        "input": f"synthetic_{N_EDGES}" if N_EDGES else SF_DIR,
        "n_edges": n_edges,
        "cpus": CPUS,
        "reps": REPS,
        "fixed_iterations": ITERS or None,
        "rank_sum_agrees": len(rank_sums) == 1,
        "cells": cells,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
