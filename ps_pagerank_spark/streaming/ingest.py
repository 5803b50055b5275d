"""Structured Streaming ingestion: crawl pages arrive continuously →
links extracted incrementally → edge table grows by catalog appends.

The reference is batch-only (SURVEY.md §2.7 — no streaming surface), but a
Common-Crawl-scale pipeline ingests WARC segments as they land. This module
is the streaming face of the same extraction/encoding operators:

  * ``stream_pages``    — file-source readStream over a landing directory
    (each micro-batch = newly arrived page files). ``maxFilesPerTrigger``
    bounds batch size; schema is the BASELINE.json ``input_hint`` pages
    schema.
  * ``stream_links``    — the SAME ``functions.extract.extract_links``
    pandas UDF applied to the stream (mapInPandas is streaming-capable),
    so batch and streaming extraction can never diverge.
  * ``run_edge_ingest`` — ``foreachBatch`` sink: per micro-batch,
    links are normalized, the url dictionary is extended incrementally
    (new urls get ids after the current max — existing ids never change),
    and encoded edges are appended to the catalog. Exactly-once:
    the catalog snapshot records the stream batch_id; a replayed batch
    (restart after failure mid-commit) is detected and skipped, making
    the append idempotent.
  * ``page_stats_stream`` — watermarked sliding-window aggregation
    (pages per lang per window) — the monitoring stream; late pages
    beyond the watermark are dropped deterministically.

Scale notes: the dictionary extension is a left-anti join + offset
assignment per micro-batch — O(batch) work, not O(table); edge appends are
partitioned parquet; compaction is a snapshot rewrite (catalog.overwrite)
that readers never observe mid-commit (atomic manifest swap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ps_pagerank_spark.functions.extract import extract_links, normalize_links
from ps_pagerank_spark.plans.catalog import Catalog
from ps_pagerank_spark.sources.pages import PAGES_SCHEMA

VERTICES_TABLE = "vertices"
EDGES_TABLE = "edges"


def stream_pages(
    spark: SparkSession, landing_dir: str, *, max_files_per_trigger: int = 16
) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing_dir)
    )


def stream_links(pages: DataFrame) -> DataFrame:
    """Streaming link extraction — identical code path to batch."""
    return extract_links(pages)


def _extend_dictionary(
    spark: SparkSession, catalog: Catalog, links: DataFrame
) -> DataFrame:
    """Add unseen urls to the vertices table; return the full dictionary.

    New ids start at current max+1, assigned by url order within the batch
    (deterministic given batch content). Existing assignments are
    immutable — downstream edge ids never need re-encoding.

    Id assignment is the zip-style prefix encoding shared with batch
    ``encode_vertices`` (operators/graph.zip_index) — partition-local
    row_number + tiny driver prefix sum, no single-partition global window
    serializing the stage.
    """
    from ps_pagerank_spark.operators.graph import zip_index

    batch_urls = (
        links.select(F.col("src_url").alias("url"))
        .union(links.select(F.col("dst_url").alias("url")))
        .distinct()
    )
    if catalog.latest_snapshot(VERTICES_TABLE) is None:
        existing = spark.createDataFrame([], "vertex_id long, url string")
        base_id = -1
    else:
        existing = catalog.read(spark, VERTICES_TABLE)
        base_id = existing.agg(F.max("vertex_id")).collect()[0][0]
        if base_id is None:
            base_id = -1
    new_urls = batch_urls.join(existing.select("url"), "url", "left_anti")
    new_vertices = zip_index(new_urls, base_id=int(base_id) + 1)
    if new_vertices.isEmpty():
        return existing
    catalog.append(VERTICES_TABLE, new_vertices)
    return catalog.read(spark, VERTICES_TABLE)


def run_edge_ingest(
    spark: SparkSession,
    landing_dir: str,
    catalog: Catalog,
    *,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int = 16,
    edge_buckets: int = 64,
):
    """Start (and for available_now=True, run to completion) the ingest
    stream: pages → links → incremental dictionary → edges appends.

    Exactly-once, two independent layers:
      * fast path — each catalog append records
        ``{"stream_batch_id": i, "stream_ckpt": checkpoint_dir}``; a
        replayed batch from the SAME checkpoint is skipped outright. The
        checkpoint scoping matters: batch ids restart at 0 under a fresh
        checkpoint dir, so a bare id match would silently drop a genuinely
        new batch (or reprocess all of them).
      * content layer — encoded batch edges are anti-joined against the
        existing edges table before the append, so the edges table stays a
        SET (pagerank()'s "deduplicated upstream" contract): re-crawled
        pages, repeated links across segments, and replays from a different
        checkpoint all append zero duplicate rows.

    Bounding the anti-join scan: the edges table is hive-partitioned by
    ``_bucket = pmod(hash(src_id), edge_buckets)``, and the anti-join's
    build side filters to the buckets the BATCH actually touches — the
    parquet scan prunes whole bucket directories (PartitionFilters), so
    the per-batch probe reads O(touched buckets / edge_buckets) of the
    accumulated table, not all of it. A micro-batch's src ids are the
    batch's own pages (few thousand), so with edge_buckets sized well
    above the per-batch distinct-src count (e.g. 2^14 at crawl scale; the
    default 64 suits tests) most of a 10^11-edge table never gets read.
    Each append writes ≤ edge_buckets files; compaction
    (catalog.overwrite of the same partitioned layout) folds small files.
    """
    links = stream_links(stream_pages(spark, landing_dir,
                                      max_files_per_trigger=max_files_per_trigger))

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        last = catalog.latest_snapshot(EDGES_TABLE)
        if (
            last is not None
            and last["props"].get("stream_batch_id") == batch_id
            and last["props"].get("stream_ckpt") == checkpoint_dir
        ):
            return  # replay of a committed batch — idempotent skip
        from ps_pagerank_spark.operators.graph import encode_edges

        batch_links = normalize_links(batch_df).persist()
        batch_edges = None
        try:
            vertices = _extend_dictionary(spark, catalog, batch_links)
            batch_edges = encode_edges(batch_links, vertices).withColumn(
                "_bucket",
                F.pmod(F.hash("src_id"), F.lit(edge_buckets)).cast("int"),
            ).persist()
            edges = batch_edges
            if last is not None:
                # buckets this batch touches (≤ edge_buckets tiny ints);
                # the isin filter becomes a PartitionFilter on the
                # bucket-partitioned table — untouched dirs never read
                touched = [
                    r["_bucket"]
                    for r in batch_edges.select("_bucket").distinct().collect()
                ]
                existing = (
                    catalog.read(spark, EDGES_TABLE)
                    .filter(F.col("_bucket").isin(touched))
                    .select("src_id", "dst_id")
                )
                edges = edges.join(
                    existing, ["src_id", "dst_id"], "left_anti"
                )
            catalog.append(
                EDGES_TABLE,
                edges,
                props={
                    "stream_batch_id": batch_id,
                    "stream_ckpt": checkpoint_dir,
                },
                partition_by=["_bucket"],
            )
        finally:
            batch_links.unpersist()
            if batch_edges is not None:
                batch_edges.unpersist()

    writer = (
        links.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def compact_edges(
    spark: SparkSession, catalog: Catalog, *, table: str = EDGES_TABLE
) -> int:
    """Fold the accumulated per-batch files into ONE snapshot (the LSM
    compaction step): every append writes ≤ edge_buckets small files, so
    after many micro-batches the table is file-count-bound. Readers never
    observe a partial state — catalog.overwrite is an atomic manifest
    swap, and the partition layout (and thus anti-join pruning) is
    preserved. Returns the new snapshot id; props carry the exactly-once
    stream markers forward so replay detection survives compaction."""
    last = catalog.latest_snapshot(table)
    if last is None:
        raise KeyError(f"table {table!r} has no snapshots to compact")
    df = catalog.read(spark, table)
    part = catalog._load_meta(table).get("partition_by")
    if part:
        # one file per partition dir: coalesce rows of each bucket
        df = df.repartition(*[F.col(c) for c in part])
    return catalog.overwrite(table, df, props=dict(last["props"]))


def page_stats_stream(
    pages: DataFrame,
    *,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked windowed page counts per lang — the crawl-monitoring
    stream (append-mode safe: the watermark closes windows so finalized
    rows can be emitted exactly once)."""
    w = (
        F.window("warc_ts", window, slide)
        if slide
        else F.window("warc_ts", window)
    )
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(w.alias("win"), "lang")
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "lang",
            "n_pages",
        )
    )
