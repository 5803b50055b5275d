"""Event-stream analytics: windowed aggregation, sessionization, JSON
props extraction.

The reference has no window functions, no event semantics (SURVEY.md §2.5
"absent"); these are the engine-side analytics a crawl/event pipeline needs
around the graph. Batch and streaming share the code path: `windowed_stats`
uses `F.window`, which is the same operator Structured Streaming executes
incrementally behind a watermark (see streaming/ingest.page_stats_stream).

Cross-engine exactness: double sums are order-sensitive, so aggregates are
computed over **floor-micros integers** (`floor(value*1e6)` per row, then
integer SUM) — bit-exact in any engine at any parallelism. min/max/count
are order-free and stay native.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ps_pagerank_spark.functions.text import micros


def windowed_stats(
    events: DataFrame, *, window: str = "1 hour", micros_ts: bool = False
) -> DataFrame:
    """Tumbling-window stats per event_type:
    (window_start, event_type, n_events, value_sum_u, value_min_u,
    value_max_u, n_users).

    micros_ts=True emits window_start as epoch-micros BIGINT instead of a
    timestamp — the cross-engine contract representation (Spark tz-aware/ns
    vs DuckDB naive/us pandas dtypes hash differently even when the instants
    are identical; integers are engine-neutral).
    """
    start = F.col("win.start")
    if micros_ts:
        # session TZ is pinned UTC, so NTZ→instant is the identity mapping
        start = F.unix_micros(start.cast("timestamp"))
    return (
        events.groupBy(
            F.window("ts", window).alias("win"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(micros(F.col("value"))).alias("value_sum_u"),
            F.min(micros(F.col("value"))).alias("value_min_u"),
            F.max(micros(F.col("value"))).alias("value_max_u"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            start.alias("window_start"),
            "event_type",
            "n_events",
            "value_sum_u",
            "value_min_u",
            "value_max_u",
            "n_users",
        )
    )


def windowed_stats_sql(
    events_sql: str, *, hours: int = 1, micros_ts: bool = False
) -> str:
    """DuckDB twin (time_bucket == Spark tumbling window for epoch-aligned
    intervals)."""
    u = "CAST(FLOOR(value * 1000000.0) AS BIGINT)"
    bucket = f"time_bucket(INTERVAL {hours} HOUR, ts)"
    if micros_ts:
        bucket = f"epoch_us({bucket})"
    return f"""
SELECT {bucket} AS window_start,
       event_type,
       count(*) AS n_events,
       CAST(SUM({u}) AS BIGINT) AS value_sum_u,
       MIN({u}) AS value_min_u,
       MAX({u}) AS value_max_u,
       count(DISTINCT user_id) AS n_users
FROM {events_sql}
GROUP BY 1, 2"""


def sessionize(
    events: DataFrame, *, gap_minutes: int = 30, micros_ts: bool = False
) -> DataFrame:
    """Gap-based sessionization per user: a new session starts when the
    pause since the previous event exceeds the gap. Returns one row per
    session: (user_id, session_id, session_start, session_end, n_events).

    Plan: per-user ordered window (lag → new-session flag → running sum) —
    partitionBy(user_id) keeps every window partition-local; no global
    sort. The streaming equivalent is session_window()/
    applyInPandasWithState; batch output is the oracle for both.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = gap_minutes * 60
    # NTZ timestamps can't cast straight to long in Spark 4; go through
    # an instant (session TZ is pinned UTC in session defaults, so this
    # equals DuckDB's floor(epoch(ts)) on the same naive values)
    epoch_s = F.col("ts").cast("timestamp").cast("long")
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(epoch_s - F.lag(epoch_s).over(w) > gap_s, 1)
        .otherwise(0)
        .alias("_new"),
    )
    with_sid = flagged.select(
        "user_id",
        "ts",
        F.sum("_new")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_id"),
    )
    s_start, s_end = F.min("ts"), F.max("ts")
    if micros_ts:
        # contract representation: epoch-micros BIGINT (see windowed_stats)
        s_start = F.unix_micros(s_start.cast("timestamp"))
        s_end = F.unix_micros(s_end.cast("timestamp"))
    return with_sid.groupBy("user_id", "session_id").agg(
        s_start.alias("session_start"),
        s_end.alias("session_end"),
        F.count("*").alias("n_events"),
    )


def sessionize_sql(
    events_sql: str, *, gap_minutes: int = 30, micros_ts: bool = False
) -> str:
    gap_s = gap_minutes * 60
    s_start = "epoch_us(MIN(ts))" if micros_ts else "MIN(ts)"
    s_end = "epoch_us(MAX(ts))" if micros_ts else "MAX(ts)"
    return f"""
flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN CAST(FLOOR(epoch(ts)) AS BIGINT)
                   - lag(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER
                (PARTITION BY user_id ORDER BY ts, event_id) > {gap_s}
              THEN 1 ELSE 0 END AS _new
  FROM {events_sql}),
with_sid AS (
  SELECT user_id, ts,
         CAST(SUM(_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged)
SELECT user_id, session_id,
       {s_start} AS session_start, {s_end} AS session_end,
       count(*) AS n_events
FROM with_sid GROUP BY user_id, session_id"""


def extract_props(events: DataFrame, key: str = "k") -> DataFrame:
    """JSON props field extraction (JVM get_json_object — no Python).
    Returns (event_id, event_type, k bigint)."""
    return events.select(
        "event_id",
        "event_type",
        F.get_json_object("props", f"$.{key}").cast("long").alias(key),
    )


def extract_props_sql(events_sql: str, key: str = "k") -> str:
    return (
        f"SELECT event_id, event_type, "
        f"CAST(json_extract_string(props, '$.{key}') AS BIGINT) AS {key} "
        f"FROM {events_sql}"
    )
