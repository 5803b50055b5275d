"""Controlled A/B of the iteration-loop AQE setting (round-5 evidence).

Round 4 disabled AQE around the PageRank iteration loop to remove two
rank-vector exchanges per iteration (plan-asserted) but shipped no timing
evidence; BENCH_r04's best-rep medians regressed 4.1x (csr_block) / 1.7x
(join) at sf0.1 vs round 3. This harness isolates the loop-AQE variable:
same session, same input, kernel x {loop_aqe on, off}, REPS reps each,
configs interleaved round-robin so a box stall window hits every config
equally instead of poisoning one cell.

Inputs:
  AB_SF_DIR=/root/testdata/sf0.1   TPC-H-derived link graph (default), OR
  AB_EDGES=64000000                deterministic synthetic skewed digraph
                                   (same generator as BENCH/scaling.py)
  AB_CPUS (default 32), AB_REPS (default 3), AB_ITERS (fixed iterations;
  default 0 = converge to 1e-6 like bench.py), AB_KERNELS, AB_AQE.

Output: one JSON line with, per config cell, every rep's steady-iteration
times, the best-rep median iteration seconds (the BENCH headline
statistic), and per-rep prep/blocks phases.
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
ITERS = int(os.environ.get("AB_ITERS", "0"))  # 0 = eps=1e-6 convergence
KERNELS = os.environ.get("AB_KERNELS", "join,csr_block").split(",")
AQE = os.environ.get("AB_AQE", "on,off").split(",")
NUM_PARTITIONS = int(os.environ.get("AB_NUM_PARTITIONS", "0")) or None


def main() -> None:
    from ps_pagerank_spark import get_spark
    from ps_pagerank_spark.operators.pagerank import pagerank

    spark = get_spark(master=f"local[{CPUS}]", app_name="ab_loop")
    if N_EDGES:
        from BENCH.scaling import synthetic_edges

        edges = synthetic_edges(spark, N_EDGES, N_EDGES // 16).persist()
    else:
        from ps_pagerank_spark.sources.edgelist import tpch_graph_edges

        edges = tpch_graph_edges(spark, SF_DIR).persist()
    n_edges = edges.count()

    kw: dict = dict(dangling_mode="redistribute")
    if ITERS:
        kw["fixed_iterations"] = ITERS
    else:
        kw["eps"] = 1e-6
    if NUM_PARTITIONS:
        kw["num_partitions"] = NUM_PARTITIONS

    cells: dict[str, dict] = {
        f"{k}_aqe_{a}": {"reps": []} for k in KERNELS for a in AQE
    }
    for rep in range(REPS):
        for k in KERNELS:
            for a in AQE:
                spark.catalog.clearCache()
                edges.persist()
                edges.count()
                t0 = time.perf_counter()
                res = pagerank(spark, edges, kernel=k, loop_aqe=a, **kw)
                res.ranks.count()
                wall = time.perf_counter() - t0
                steady = [m["elapsed_s"] for m in res.metrics[1:]] or [
                    m["elapsed_s"] for m in res.metrics
                ]
                cells[f"{k}_aqe_{a}"]["reps"].append(
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
                    f"rep{rep} {k} aqe={a}: wall={wall:.1f}s "
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
        "cells": cells,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
