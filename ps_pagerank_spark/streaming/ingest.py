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
    """
    from pyspark.sql import Window

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
    w = Window.orderBy("url")  # batch-local window: O(batch) rows
    new_vertices = new_urls.select(
        (F.row_number().over(w) + F.lit(int(base_id))).cast("long").alias(
            "vertex_id"
        ),
        "url",
    )
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
):
    """Start (and for available_now=True, run to completion) the ingest
    stream: pages → links → incremental dictionary → edges appends.

    Exactly-once: each catalog append records ``{"stream_batch_id": i}``;
    on restart, Structured Streaming replays the last uncommitted batch and
    the sink skips ids it has already committed.
    """
    links = stream_links(stream_pages(spark, landing_dir,
                                      max_files_per_trigger=max_files_per_trigger))

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        last = catalog.latest_snapshot(EDGES_TABLE)
        if last is not None and last["props"].get("stream_batch_id") == batch_id:
            return  # replay of a committed batch — idempotent skip
        from ps_pagerank_spark.operators.graph import encode_edges

        batch_links = normalize_links(batch_df).persist()
        try:
            vertices = _extend_dictionary(spark, catalog, batch_links)
            edges = encode_edges(batch_links, vertices)
            catalog.append(
                EDGES_TABLE, edges, props={"stream_batch_id": batch_id}
            )
        finally:
            batch_links.unpersist()

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
