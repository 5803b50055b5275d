"""Phase-level cost breakdown of one csr_block PageRank iteration.

Answers "where do the seconds of a steady csr_block iteration go?" by
running a LADDER of truncated variants of the per-iteration pipeline over
the SAME prepared state and block store, then differencing:

  A state_stream   JVM->Python Arrow stream of (pkey, vertex_id, rank)
                   (+ Python worker dispatch); kernel consumes and emits
                   nothing.
  B block_touch    A + fault every page of the bucket's block arrays into
                   the page cache reader (strided touch, no arithmetic).
  C kernel_compute A + the real gather/scatter arithmetic (searchsorted,
                   su_rank[sidx] gather, np.add.reduceat) — result dropped.
  D emit_partials  C + Arrow Python->JVM return of the per-bucket partial
                   (dst, sum) batches; .count() keeps rows out of a shuffle.
  E shuffle_agg    the REAL _gather_scatter_blocks: D + full shuffle of the
                   partials + groupBy(vertex_id).sum, reduced to one scalar.
  F full_iter      a steady in-loop iteration (update join + lazy
                   localCheckpoint + fused 3-scalar agg) from pagerank().

Deltas (B-A, C-A, D-C, E-D, F-E) attribute the iteration cost to block
I/O, NumPy arithmetic, partial-return serialization, the partials shuffle
+ aggregation, and the update join/checkpoint tail. Same synthetic input
as BENCH/scaling.py. Prints ONE JSON line.

Usage:
  PROF_EDGES=256000000 PROF_CPUS=32 python BENCH/profile_csr.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path
from typing import Iterator

import numpy as np
import pyarrow as pa

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "BENCH"))

N_EDGES = int(os.environ.get("PROF_EDGES", "64000000"))
CPUS = int(os.environ.get("PROF_CPUS", "32"))
REPS = int(os.environ.get("PROF_REPS", "3"))
DTYPE = os.environ.get("PROF_DTYPE", "float64")


def median_of(fn, reps: int = REPS) -> tuple[float, list[float]]:
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        walls.append(round(time.perf_counter() - t0, 3))
    return statistics.median(walls), walls


def main() -> None:
    from pyspark.sql import functions as F

    from ps_pagerank_spark import get_spark
    from ps_pagerank_spark.operators.graph import (
        out_degrees,
        vertices_from_edges,
        weighted_edges,
    )
    from ps_pagerank_spark.operators.pagerank import (
        _block_files,
        _bucket_set,
        _build_csr_blocks,
        _gather_scatter_blocks,
        _store_read_npy,
        pagerank,
    )
    from scaling import synthetic_edges

    P = max(CPUS * 2, 8)
    spark = get_spark(
        master=f"local[{CPUS}]",
        app_name="profile_csr",
        extra_conf={"spark.sql.shuffle.partitions": str(P)},
    )
    # mirror pagerank()'s pinned loop confs so ladder plans match in-loop ones
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    edges = synthetic_edges(spark, N_EDGES, N_EDGES // 16).persist()
    n_edges = edges.count()

    # --- prep exactly as _pagerank_impl does -------------------------------
    verts = vertices_from_edges(edges).select("vertex_id").repartition(
        P, "vertex_id"
    ).persist()
    n = verts.count()
    outdeg = out_degrees(edges)
    wedges = weighted_edges(edges).repartition(P, "src_id").persist()
    wedges.count()
    dang = verts.join(
        outdeg.select(F.col("src_id").alias("vertex_id")),
        "vertex_id",
        "left_anti",
    ).withColumn("dangling", F.lit(True))
    state = (
        verts.join(dang, "vertex_id", "left")
        .select(
            "vertex_id",
            F.coalesce(F.col("dangling"), F.lit(False)).alias("dangling"),
            (F.lit(1.0) / F.lit(float(n))).alias("rank"),
        )
        .repartition(P, "vertex_id")
        .localCheckpoint(eager=True)
    )
    state.count()

    t0 = time.perf_counter()
    store = _build_csr_blocks(wedges, P, None, DTYPE, aligned=True)
    t_block_build = round(time.perf_counter() - t0, 3)
    path, run_id, dtype = store.path, store.run_id, store.dtype

    # two wire formats for the JVM->Python state stream: the SHIPPING one
    # (long ids — the ladder's base) and the int32-narrowed variant, kept
    # as its own rung so the narrowing question stays answerable by
    # measurement. Measured at 64M/4M (round 5): the variant is flat to
    # slightly NEGATIVE (steady ~1.27s long vs ~1.37s int32) — the stream
    # is overhead-bound, not bandwidth-bound, at 32 MB/iter, so the
    # kernel ships long ids (BENCH/BASELINE.md §5 V4).
    keyed = state.select(
        F.pmod(F.hash("vertex_id"), F.lit(P)).cast("int").alias("pkey"),
        "vertex_id",
        "rank",
    )
    ids32 = (
        -(2**31) <= store.min_dst
        and store.max_dst < 2**31
        and -(2**31) <= store.min_src
        and store.max_src < 2**31
    )
    keyed32 = state.select(
        F.pmod(F.hash("vertex_id"), F.lit(P)).cast("int").alias("pkey"),
        (
            F.col("vertex_id").cast("int") if ids32 else F.col("vertex_id")
        ).alias("vertex_id"),
        "rank",
    )

    # --- ladder kernels -----------------------------------------------------
    def consume_only(batches: Iterator[pa.RecordBatch]):
        total = 0
        for b in batches:
            # touch the columns so Arrow actually materializes the batch
            total += len(b.column(0))
        if total < 0:
            yield pa.RecordBatch.from_arrays(
                [pa.array([0], type=pa.int64())], names=["x"]
            )
        return

    def _buckets_of(batches):
        got = list(batches)
        if not got:
            return None
        tbl = pa.Table.from_batches(got)
        if tbl.num_rows == 0:
            return None
        return tbl

    def touch_blocks(batches: Iterator[pa.RecordBatch]):
        tbl = _buckets_of(batches)
        if tbl is None:
            return
        have = _bucket_set(path, run_id)
        pk = tbl.column("pkey").to_numpy()
        acc = 0
        for key in np.unique(pk):
            if int(key) not in have:
                continue
            files = _block_files(path, int(key))
            for name in ("su", "sidx", "suw", "dst", "starts"):
                arr = _store_read_npy(files[name])
                if arr.size:
                    # one element per 4 KiB page; reduce() forces the reads
                    step = max(1, 4096 // arr.itemsize)
                    acc += int(
                        np.add.reduce(arr[::step], dtype=np.float64) % 7
                    )
        if acc < 0:
            yield None
        return

    def kernel_compute(emit: bool):
        def gen(batches: Iterator[pa.RecordBatch]):
            tbl = _buckets_of(batches)
            if tbl is None:
                return
            have = _bucket_set(path, run_id)
            pk = tbl.column("pkey").to_numpy()
            vid = tbl.column("vertex_id").to_numpy()
            rank = tbl.column("rank").to_numpy()
            for key in np.unique(pk):
                if int(key) not in have:
                    continue
                files = _block_files(path, int(key))
                su = _store_read_npy(files["su"])
                sidx = _store_read_npy(files["sidx"])
                suw = _store_read_npy(files["suw"])
                dst = _store_read_npy(files["dst"])
                starts = _store_read_npy(files["starts"])
                m = pk == key
                ids, rk = vid[m], rank[m]
                order = np.argsort(ids, kind="stable")
                ids, rk = ids[order], rk[order]
                pos = np.searchsorted(ids, su)
                pos_c = np.minimum(pos, len(ids) - 1)
                present = ids[pos_c] == su
                su_rank = np.where(present, rk[pos_c], 0.0).astype(
                    dtype, copy=False
                )
                vals = (su_rank * suw)[sidx]
                sums = np.add.reduceat(vals, starts)
                if emit:
                    yield pa.RecordBatch.from_arrays(
                        [
                            pa.array(np.asarray(dst), type=pa.int64()),
                            pa.array(
                                sums.astype(np.float64, copy=False),
                                type=pa.float64(),
                            ),
                        ],
                        names=["vertex_id", "_p"],
                    )
                elif sums.size and float(sums[0]) < -1.0:
                    yield None

        return gen

    phases: dict[str, float] = {"block_build_s": t_block_build}
    walls: dict[str, list[float]] = {}

    # Interleave the ladder rungs ROUND-ROBIN (rep 0 of every rung, then
    # rep 1 of every rung, ...) so a sandbox stall window degrades one rep
    # of each rung instead of every rep of one rung — the round-4 profile
    # run recorded E=50s / F=4.5s (a subset "costing" 11x its superset)
    # precisely because three consecutive E reps landed in a stall.
    sch = "vertex_id long, _p double"
    rungs = [
        ("A_state_stream", lambda: keyed.mapInArrow(consume_only, sch).count()),
        (
            "A32_state_stream_narrow",
            lambda: keyed32.mapInArrow(consume_only, sch).count(),
        ),
        ("B_block_touch", lambda: keyed.mapInArrow(touch_blocks, sch).count()),
        (
            "C_kernel_compute",
            lambda: keyed.mapInArrow(kernel_compute(False), sch).count(),
        ),
        (
            "D_emit_partials",
            lambda: keyed.mapInArrow(kernel_compute(True), sch).count(),
        ),
        (
            "E_shuffle_agg",
            lambda: _gather_scatter_blocks(state, store, P)
            .agg(F.sum("_c"))
            .collect(),
        ),
    ]
    for tag, _ in rungs:
        walls[tag] = []
    for _rep in range(REPS):
        for tag, fn in rungs:
            t0 = time.perf_counter()
            fn()
            walls[tag].append(round(time.perf_counter() - t0, 3))
    for tag, _ in rungs:
        phases[tag] = statistics.median(walls[tag])

    res = pagerank(
        spark,
        edges,
        fixed_iterations=4,
        dangling_mode="redistribute",
        kernel="csr_block",
        dtype=DTYPE,
        num_partitions=P,
    )
    steady = [m["elapsed_s"] for m in res.metrics[1:]]
    phases["F_full_iter"] = round(statistics.median(steady), 3)
    walls["F_full_iter"] = [round(s, 3) for s in steady]

    out = {
        "n_edges": n_edges,
        "n_vertices": n,
        "cpus": CPUS,
        "P": P,
        "dtype": DTYPE,
        "reps": REPS,
        "phases_s": phases,
        "ids32_variant_available": ids32,
        "deltas_s": {
            "jvm_to_python_state_stream": phases["A_state_stream"],
            "state_stream_narrowing_win": round(
                phases["A_state_stream"] - phases["A32_state_stream_narrow"], 3
            ),
            "block_io": round(phases["B_block_touch"] - phases["A_state_stream"], 3),
            "numpy_gather_scatter": round(
                phases["C_kernel_compute"] - phases["B_block_touch"], 3
            ),
            "partial_return_arrow": round(
                phases["D_emit_partials"] - phases["C_kernel_compute"], 3
            ),
            "partials_shuffle_agg": round(
                phases["E_shuffle_agg"] - phases["D_emit_partials"], 3
            ),
            "update_join_checkpoint_tail": round(
                phases["F_full_iter"] - phases["E_shuffle_agg"], 3
            ),
        },
        "rep_walls": walls,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
