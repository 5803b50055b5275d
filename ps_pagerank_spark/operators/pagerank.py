"""Power-method PageRank as DataFrame joins/aggregations.

Semantics contract (SURVEY.md §2.8, from the reference):
  * d = 0.85, R0[i] = 1/N (c-single-threaded/pagerank.c:18-19,194,204-206)
  * R_{t+1}[i] = (1−d)/N + d · Σ_{j: j→i} R_t[j]/L[j]   (pagerank.c:219-287)
  * stop when ‖R_{t+1} − R_t‖₂ ≤ ε, at least one iteration (do-while,
    pagerank.c:208-296)
  * dangling_mode="none" reproduces the reference exactly (rows with L=0
    contribute nothing; Σranks < 1, pagerank.c:359-368);
    dangling_mode="redistribute" (the north-star default for real runs)
    adds d·(Σ_{dangling} R_t)/N to every vertex so Σranks = 1.

Execution design (scale-first):
  * SpMV = join + aggregate (SURVEY.md §2.3): gather = equi-join of ranks
    to weighted edges on src_id; scatter = groupBy(dst_id).sum — Spark's
    hash aggregate does map-side partial sums (the OpenMP chunk-accumulator
    pattern, openmp/pagerank.c:341-394) and shuffle-merge (the atomics,
    opencl/kernel_coo.cl:37-60) automatically.
  * Weighted edges are computed once, hash-repartitioned on src_id and
    persisted — the iteration-invariant side of the join never reshuffles.
  * Lineage is truncated every iteration with localCheckpoint — the Spark
    analog of the reference's two-buffer pointer swap (pagerank.c:211-213).
  * One scalar action per iteration returns (‖Δ‖², Σrank, next dangling
    mass) fused, mirroring the fused SpMV+norm GPU kernel
    (opencl/kernel_csr.cl:24-36).
  * Skew: sources with out-degree > hub_threshold are split out of the
    shuffle join and handled by a broadcast join of their (few) rank rows —
    the role of the reference's hybrid ELL+COO split (README.md:80-88).
  * kernel="csr_block": per-partition CSR-style gather-scatter in a
    vectorized Arrow UDF — edges pre-sorted by dst within partitions; the
    previous rank vector is broadcast as a dense NumPy array; each partition
    emits pre-aggregated (dst, partial) pairs via np.add.reduceat, shrinking
    the shuffle to ≤ distinct-dst-per-partition rows. Requires dense
    dictionary-encoded ids and a rank vector that fits executor memory
    (~8 GB per 10^9 vertices) — the join kernel is the default beyond that.
"""

from __future__ import annotations

import math
import time
from collections.abc import Iterator
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ps_pagerank_spark.operators.graph import (
    out_degrees,
    vertices_from_edges,
    weighted_edges,
)

D_DEFAULT = 0.85
EPS_DEFAULT = 1e-8  # c-single-threaded/pagerank.c:19


@dataclass
class PageRankResult:
    ranks: DataFrame  # (vertex_id long, rank double)
    iterations: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def _prepare(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None,
    num_partitions: int,
    edge_part_key: str = "src_id",
):
    """Iteration-invariant state: vertex universe, N, weighted edges
    partitioned by `edge_part_key`, dangling flags.

    Partition key choice: "src_id" co-locates the shuffle gather join;
    "dst_id" makes the scatter groupBy exchange-free (used with the
    broadcast gather, where the join itself needs no co-location)."""
    verts = vertices if vertices is not None else vertices_from_edges(edges)
    verts = verts.select("vertex_id").repartition(num_partitions, "vertex_id")
    verts.persist()
    n = verts.count()
    outdeg = out_degrees(edges)
    wedges = (
        weighted_edges(edges)
        .repartition(num_partitions, edge_part_key)
        .persist()
    )
    wedges.count()  # materialize once; every iteration reuses these blocks
    # dangling flag per vertex (no out-edges)
    dang = verts.join(
        outdeg.select(F.col("src_id").alias("vertex_id")), "vertex_id", "left_anti"
    ).withColumn("dangling", F.lit(True))
    state0 = (
        verts.join(dang, "vertex_id", "left")
        .select(
            "vertex_id",
            F.coalesce(F.col("dangling"), F.lit(False)).alias("dangling"),
            (F.lit(1.0) / F.lit(float(n))).alias("rank"),
        )
        .repartition(num_partitions, "vertex_id")
        .localCheckpoint(eager=True)
    )
    return verts, n, outdeg, wedges, state0


def _split_hubs(wedges: DataFrame, outdeg: DataFrame, hub_threshold: int):
    """Split edges whose SOURCE is a super-emitter out of the shuffle join.

    hub rank rows are few (vertices with out-degree > threshold), so their
    ranks broadcast; everything else takes the normal co-partitioned path.
    """
    hubs = outdeg.filter(F.col("deg") > hub_threshold).select("src_id")
    hubs.persist()
    n_hubs = hubs.count()
    if n_hubs == 0:
        hubs.unpersist()
        return wedges, None
    w_hub = wedges.join(F.broadcast(hubs), "src_id").persist()
    w_rest = wedges.join(F.broadcast(hubs), "src_id", "left_anti").persist()
    w_hub.count(), w_rest.count()
    return w_rest, (w_hub, hubs)


def pagerank(
    spark: SparkSession,
    edges: DataFrame,
    *,
    vertices: DataFrame | None = None,
    d: float = D_DEFAULT,
    eps: float = EPS_DEFAULT,
    max_iter: int = 1000,
    fixed_iterations: int | None = None,
    dangling_mode: str = "none",
    kernel: str = "join",
    gather: str = "auto",
    num_partitions: int | None = None,
    hub_threshold: int | None = None,
    broadcast_max_vertices: int = 1_000_000,
    checkpoint: "object | None" = None,  # plans.catalog.Catalog
    checkpoint_every: int = 0,
    checkpoint_table: str = "pagerank_ranks",
) -> PageRankResult:
    """Run PageRank over edges(src_id, dst_id) [deduplicated upstream].

    Returns converged ranks plus per-iteration metrics. See module
    docstring for semantics and physical design.

    gather ("join" kernel only):
      * "shuffle"   — co-partitioned equi-join on src_id; the plan that
        holds at any vertex count (production default beyond
        broadcast_max_vertices).
      * "broadcast" — the rank vector is broadcast every iteration and
        edges stay persisted partitioned by dst_id, so BOTH the gather
        join and the scatter groupBy(dst) run without a shuffle of the
        edge table — one map-side stage per iteration. The per-iteration
        broadcast build is serial (~16 B/vertex), which caps strong
        scaling — hence the conservative default threshold. This is the
        reference's memory model (dense prevR[] visible to every thread,
        openmp/pagerank.c:285-301) lifted to Spark.
      * "auto"      — broadcast iff N ≤ broadcast_max_vertices.
    """
    if dangling_mode not in ("none", "redistribute"):
        raise ValueError(f"unknown dangling_mode {dangling_mode!r}")
    if kernel not in ("join", "csr_block"):
        raise ValueError(f"unknown kernel {kernel!r}")
    if gather not in ("auto", "shuffle", "broadcast"):
        raise ValueError(f"unknown gather {gather!r}")
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    # peek at vertex count cheaply to choose the edge partition key
    verts_probe = vertices if vertices is not None else vertices_from_edges(edges)
    n_probe = verts_probe.count() if gather == "auto" else 0
    use_bcast = kernel == "join" and (
        gather == "broadcast"
        or (gather == "auto" and n_probe <= broadcast_max_vertices)
    )
    verts, n, outdeg, wedges, state = _prepare(
        spark,
        edges,
        verts_probe if vertices is None else vertices,
        P,
        edge_part_key="dst_id" if use_bcast else "src_id",
    )

    hub_part = None
    if hub_threshold is not None and kernel == "join":
        wedges, hub_part = _split_hubs(wedges, outdeg, hub_threshold)

    csr_blocks = None
    csr_size = 0
    if kernel == "csr_block":
        csr_blocks = (
            wedges.repartition(P, "dst_id")
            .sortWithinPartitions("dst_id")
            .persist()
        )
        csr_blocks.count()
        # dense array is indexed by raw vertex_id, so size by max id + 1
        # (== N only when ids are dictionary-encoded dense 0..N−1)
        csr_size = verts.agg(F.max("vertex_id")).collect()[0][0] + 1

    # dangling mass of R0 = (#dangling)/N — fold into the first iteration
    dang_mass = (
        state.filter("dangling").count() / float(n) if dangling_mode == "redistribute" else 0.0
    )

    metrics: list[dict] = []
    it = 0
    converged = False
    target_iters = fixed_iterations if fixed_iterations is not None else max_iter
    while it < target_iters:
        it += 1
        t0 = time.perf_counter()
        base = (1.0 - d) / n + (d * dang_mass / n)

        if kernel == "join":
            contribs = _gather_scatter_join(
                state, wedges, hub_part, broadcast_ranks=use_bcast
            )
        else:
            contribs = _gather_scatter_csr(spark, state, csr_blocks, csr_size)

        new_state = (
            state.select("vertex_id", "dangling", F.col("rank").alias("_old"))
            .join(contribs, "vertex_id", "left")
            .select(
                "vertex_id",
                "dangling",
                (F.lit(base) + F.lit(d) * F.coalesce(F.col("_c"), F.lit(0.0))).alias(
                    "rank"
                ),
                "_old",
            )
            # no repartition: the update join streams the P-hash-partitioned
            # state, so its output (and the checkpoint) already carries
            # hash(vertex_id, P) — an explicit repartition would add a
            # full exchange of the rank vector every iteration
            .localCheckpoint(eager=True)
        )
        # one fused scalar action: ‖Δ‖², Σrank, next iteration's dangling mass
        agg = new_state.agg(
            F.sum(F.pow(F.col("rank") - F.col("_old"), F.lit(2.0))).alias("sq"),
            F.sum("rank").alias("rank_sum"),
            F.sum(F.when(F.col("dangling"), F.col("rank")).otherwise(0.0)).alias(
                "dmass"
            ),
        ).collect()[0]
        delta = math.sqrt(agg["sq"])
        dang_mass = agg["dmass"] if dangling_mode == "redistribute" else 0.0
        old_state = state
        state = new_state.select("vertex_id", "dangling", "rank")
        old_state.unpersist()
        elapsed = time.perf_counter() - t0
        metrics.append(
            {
                "iter": it,
                "l2_delta": delta,
                "rank_sum": float(agg["rank_sum"]),
                "dangling_mass": float(agg["dmass"]),
                "elapsed_s": elapsed,
            }
        )
        if checkpoint is not None and checkpoint_every and it % checkpoint_every == 0:
            _write_checkpoint(checkpoint, checkpoint_table, state, it, metrics)
        if fixed_iterations is None and delta <= eps:
            converged = True
            break

    if fixed_iterations is not None:
        converged = True
    ranks = state.select("vertex_id", "rank")
    for df in (wedges, verts):
        df.unpersist()
    if csr_blocks is not None:
        csr_blocks.unpersist()
    if hub_part is not None:
        hub_part[0].unpersist()
        hub_part[1].unpersist()
    return PageRankResult(ranks=ranks, iterations=it, converged=converged, metrics=metrics)


def _gather_scatter_join(
    state: DataFrame,
    wedges: DataFrame,
    hub_part,
    broadcast_ranks: bool = False,
) -> DataFrame:
    """J1-J6 analog: gather = equi-join on src, scatter = hash agg on dst.
    Returns (vertex_id, _c) where _c = Σ w·rank over in-edges.

    broadcast_ranks=True: BroadcastHashJoin probe over dst-partitioned
    persisted edges + exchange-free partial agg — no edge bytes move."""
    ranks = state.select(F.col("vertex_id").alias("src_id"), "rank")
    if broadcast_ranks:
        ranks = F.broadcast(ranks)
    else:
        # shuffled-hash, not sort-merge: both sides are already hash
        # co-partitioned (wedges persisted on src_id, state on vertex_id,
        # same P), so SHJ probes without re-sorting 10^? edges/iteration
        ranks = ranks.hint("shuffle_hash")
    joined = wedges.join(ranks, "src_id")
    if hub_part is not None:
        w_hub, hubs = hub_part
        hub_ranks = ranks.join(F.broadcast(hubs), "src_id")
        joined = joined.unionByName(w_hub.join(F.broadcast(hub_ranks), "src_id"))
    return joined.groupBy("dst_id").agg(
        F.sum(F.col("w") * F.col("rank")).alias("_c")
    ).select(F.col("dst_id").alias("vertex_id"), "_c")


def _gather_scatter_csr(
    spark: SparkSession, state: DataFrame, csr_blocks: DataFrame, size: int
) -> DataFrame:
    """Per-partition CSR-block gather-scatter (J3 analog,
    opencl/kernel_csr.cl:18-33): one partition ≈ one workgroup.

    The previous rank vector is broadcast dense; each edge partition is
    already sorted by dst_id, so the scatter is np.add.reduceat over run
    boundaries — emitting one pre-aggregated partial per (partition, dst).
    Requires dense vertex ids 0..N−1 (dictionary-encoded).
    """
    pdf = state.select("vertex_id", "rank").toPandas()
    prev = np.zeros(size, dtype=np.float64)
    prev[pdf["vertex_id"].to_numpy()] = pdf["rank"].to_numpy()
    bc = spark.sparkContext.broadcast(prev)

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pv = bc.value
        for batch in batches:
            dst = batch.column("dst_id").to_numpy(zero_copy_only=False)
            src = batch.column("src_id").to_numpy(zero_copy_only=False)
            w = batch.column("w").to_numpy(zero_copy_only=False)
            if len(dst) == 0:
                continue
            vals = w * pv[src]  # gather (J1: val[k]·prevR[col[k]])
            # rows sorted by dst: run-boundary scatter == CSR rowPtr walk
            bounds = np.flatnonzero(np.diff(dst)) + 1
            starts = np.concatenate(([0], bounds))
            sums = np.add.reduceat(vals, starts)
            uniq = dst[starts]
            yield pa.RecordBatch.from_arrays(
                [pa.array(uniq, type=pa.int64()), pa.array(sums, type=pa.float64())],
                names=["vertex_id", "_p"],
            )

    partials = csr_blocks.mapInArrow(gen, schema="vertex_id long, _p double")
    return partials.groupBy("vertex_id").agg(F.sum("_p").alias("_c"))


def _write_checkpoint(catalog, table: str, state: DataFrame, it: int, metrics):
    """Persist the rank vector + metrics for resume (plans.catalog)."""
    catalog.overwrite(
        table,
        state.select(
            F.lit(it).alias("iter"), "vertex_id", "dangling", "rank"
        ),
        props={"iter": it, "metrics": metrics},
    )


def resume_pagerank(
    spark: SparkSession,
    edges: DataFrame,
    catalog,
    *,
    checkpoint_table: str = "pagerank_ranks",
    **kwargs,
) -> PageRankResult:
    """Restart PageRank from the latest catalog checkpoint: reload the rank
    vector, continue iterating with identical semantics. Total iteration
    count (done-before + done-after) matches an uninterrupted run because
    the state is the exact per-iteration vector (tests/test_resume.py)."""
    snap = catalog.latest_snapshot(checkpoint_table)
    if snap is None:
        return pagerank(spark, edges, **kwargs)
    start_iter = snap["props"]["iter"]
    prev_metrics = snap["props"].get("metrics", [])
    state = catalog.read(spark, checkpoint_table).select(
        "vertex_id", "dangling", "rank"
    )
    res = _continue(spark, edges, state, start_iter, prev_metrics, **kwargs)
    return res


def _continue(
    spark: SparkSession,
    edges: DataFrame,
    state: DataFrame,
    start_iter: int,
    prev_metrics: list,
    *,
    vertices: DataFrame | None = None,
    d: float = D_DEFAULT,
    eps: float = EPS_DEFAULT,
    max_iter: int = 1000,
    dangling_mode: str = "none",
    num_partitions: int | None = None,
    **_: object,
) -> PageRankResult:
    """Continuation loop used by resume (join kernel only — checkpointed
    runs are the production path)."""
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    verts, n, outdeg, wedges, _ = _prepare(spark, edges, vertices, P)
    state = state.repartition(P, "vertex_id").localCheckpoint(eager=True)
    dang_mass = 0.0
    if dangling_mode == "redistribute":
        dang_mass = state.filter("dangling").agg(F.sum("rank")).collect()[0][0] or 0.0
    metrics = list(prev_metrics)
    it = start_iter
    converged = False
    while it < max_iter:
        it += 1
        base = (1.0 - d) / n + (d * dang_mass / n)
        contribs = _gather_scatter_join(state, wedges, None)
        new_state = (
            state.select("vertex_id", "dangling", F.col("rank").alias("_old"))
            .join(contribs, "vertex_id", "left")
            .select(
                "vertex_id",
                "dangling",
                (F.lit(base) + F.lit(d) * F.coalesce(F.col("_c"), F.lit(0.0))).alias(
                    "rank"
                ),
                "_old",
            )
            # already hash(vertex_id, P) via the streamed state side
            .localCheckpoint(eager=True)
        )
        agg = new_state.agg(
            F.sum(F.pow(F.col("rank") - F.col("_old"), F.lit(2.0))).alias("sq"),
            F.sum(F.when(F.col("dangling"), F.col("rank")).otherwise(0.0)).alias(
                "dmass"
            ),
        ).collect()[0]
        delta = math.sqrt(agg["sq"])
        dang_mass = agg["dmass"] if dangling_mode == "redistribute" else 0.0
        state.unpersist()
        state = new_state.select("vertex_id", "dangling", "rank")
        metrics.append({"iter": it, "l2_delta": delta})
        if delta <= eps:
            converged = True
            break
    ranks = state.select("vertex_id", "rank")
    wedges.unpersist()
    verts.unpersist()
    return PageRankResult(ranks=ranks, iterations=it, converged=converged, metrics=metrics)


def pagerank_block(
    spark: SparkSession,
    edges: DataFrame,
    *,
    d: float = D_DEFAULT,
    eps: float = EPS_DEFAULT,
    max_iter: int = 1000,
    fixed_iterations: int | None = None,
    dangling_mode: str = "redistribute",
    num_partitions: int | None = None,
) -> PageRankResult:
    """Block-row PageRank with a driver-held rank vector — the Spark analog
    of the reference's host-driven GPU loop (opencl/pagerank.c:456-531):
    the dense rank vector lives on the driver (host), each iteration
    broadcasts it (H2D upload), every partition computes its CSR-block
    partial y = A_block · x with vectorized NumPy (one partition ≈ one
    workgroup, kernel_csr.cl:18-33), and the partials come back in one
    Arrow collect (D2H of per-workgroup results). Damping, dangling mass,
    and the convergence norm are O(V) NumPy on the driver — exactly the
    host-side final reduction of opencl/pagerank.c:517-527.

    Physical properties (why this wins the mid-scale regime):
      * edges are range-partitioned by dst and sorted once, then NEVER
        move — zero shuffle bytes per iteration;
      * each dst row lives in exactly one partition, so per-partition
        partials are already final sums — collect size is ≤ V rows total;
      * the only serial costs are one ~8·V-byte broadcast and one ≤16·V-byte
        collect per iteration.
    Valid while the rank vector fits driver memory (~8 GB per 10^9
    vertices); beyond that use pagerank(kernel="join", gather="shuffle"),
    which holds at any V. Ids must be bounded (dense dictionary ids make
    the arrays tight; sparse ids waste array slots up to max_id).
    """
    if dangling_mode not in ("none", "redistribute"):
        raise ValueError(f"unknown dangling_mode {dangling_mode!r}")
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    wedges = weighted_edges(edges)
    blocks = (
        wedges.repartitionByRange(P, "dst_id")
        .sortWithinPartitions("dst_id")
        .persist()
    )
    blocks.count()

    # driver-side vertex universe / degree arrays (one pass)
    vstats = (
        vertices_from_edges(edges)
        .join(
            out_degrees(edges).select(
                F.col("src_id").alias("vertex_id"), "deg"
            ),
            "vertex_id",
            "left",
        )
        .select("vertex_id", F.coalesce("deg", F.lit(0)).alias("deg"))
        .toPandas()
    )
    vids = vstats["vertex_id"].to_numpy()
    size = int(vids.max()) + 1 if len(vids) else 0
    n = len(vids)
    exists = np.zeros(size, dtype=bool)
    exists[vids] = True
    dangling = np.zeros(size, dtype=bool)
    dangling[vids[vstats["deg"].to_numpy() == 0]] = True

    prev = np.zeros(size, dtype=np.float64)
    prev[vids] = 1.0 / n

    sc = spark.sparkContext
    metrics: list[dict] = []
    it = 0
    converged = False
    target = fixed_iterations if fixed_iterations is not None else max_iter
    while it < target:
        it += 1
        t0 = time.perf_counter()
        bc = sc.broadcast(prev)

        def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            pv = bc.value
            for batch in batches:
                dst = batch.column("dst_id").to_numpy(zero_copy_only=False)
                src = batch.column("src_id").to_numpy(zero_copy_only=False)
                w = batch.column("w").to_numpy(zero_copy_only=False)
                if len(dst) == 0:
                    continue
                vals = w * pv[src]
                bounds = np.flatnonzero(np.diff(dst)) + 1
                starts = np.concatenate(([0], bounds))
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(dst[starts], type=pa.int64()),
                        pa.array(np.add.reduceat(vals, starts), type=pa.float64()),
                    ],
                    names=["vertex_id", "_p"],
                )

        partials = blocks.mapInArrow(
            gen, schema="vertex_id long, _p double"
        ).toPandas()
        contrib = np.zeros(size, dtype=np.float64)
        # batches within a partition can split a dst run → add, not assign
        np.add.at(
            contrib,
            partials["vertex_id"].to_numpy(),
            partials["_p"].to_numpy(),
        )
        dm = float(prev[dangling].sum()) if dangling_mode == "redistribute" else 0.0
        base = (1.0 - d) / n + d * dm / n
        curr = np.where(exists, base + d * contrib, 0.0)
        delta = float(np.sqrt(((curr - prev) ** 2).sum()))
        prev = curr
        bc.destroy()
        metrics.append(
            {
                "iter": it,
                "l2_delta": delta,
                "rank_sum": float(curr.sum()),
                "dangling_mass": float(curr[dangling].sum()),
                "elapsed_s": time.perf_counter() - t0,
            }
        )
        if fixed_iterations is None and delta <= eps:
            converged = True
            break
    if fixed_iterations is not None:
        converged = True

    ranks_pdf = pd.DataFrame({"vertex_id": vids, "rank": prev[vids]})
    ranks = spark.createDataFrame(ranks_pdf)
    blocks.unpersist()
    return PageRankResult(
        ranks=ranks, iterations=it, converged=converged, metrics=metrics
    )


def top_k_ranks(ranks: DataFrame, k: int = 100) -> DataFrame:
    """Top-k query helper (SURVEY.md §2.5): TakeOrderedAndProject — no full
    sort at scale."""
    return ranks.orderBy(F.desc("rank"), F.asc("vertex_id")).limit(k)
