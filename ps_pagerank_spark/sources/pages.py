"""Deterministic synthetic Common-Crawl-style pages table (FIXTURES.md §1).

Schema fixed by BASELINE.json ``input_hint``:
    (url string, warc_ts timestamp, html binary, text string, lang string)

Generation is pure-function-of-(vertex id, edge list): no wall clock, no
randomness outside the seeded graph synthesizer, so every run of the suite
sees byte-identical pages. The ``text`` column is produced by the canonical
extractor over the generated html, keeping both columns mutually consistent.

For big benchmark scales the generator runs distributed: the edge list is a
DataFrame and html assembly happens in Spark (group anchors per src page).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ps_pagerank_spark.functions.extract import extract_text_py

EPOCH = dt.datetime(2026, 1, 1, 0, 0, 0)

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

N_SITES = 97  # vertex v lives on site v % N_SITES


def url_of(v: int) -> str:
    return f"https://site{v % N_SITES:03d}.example/p{v:06d}.html"


def html_of(v: int, dst_vertices: list[int]) -> bytes:
    anchors = "".join(
        f'<a href="{url_of(d)}">anchor {k}</a>' for k, d in enumerate(dst_vertices)
    )
    return (
        f"<html><head><title>T{v}</title><style>.x{{}}</style></head>"
        f"<body><script>var a=1;</script><p>text of page {v} on site "
        f"{v % N_SITES} with tokens t{v % 7} t{v % 11} t{v % 13}</p>"
        f"{anchors}</body></html>"
    ).encode("utf-8")


def lang_of(v: int) -> str:
    return "en" if v % 10 != 3 else "sl"


def pages_pdf_from_edges(n_vertices: int, edges: list[tuple[int, int]]) -> pd.DataFrame:
    """Single-process pages builder (tests / tiny scales). One row per
    vertex in [0, n_vertices); out-links in first-occurrence input order."""
    out: dict[int, list[int]] = {v: [] for v in range(n_vertices)}
    seen: set[tuple[int, int]] = set()
    for s, d in edges:
        if (s, d) not in seen:
            seen.add((s, d))
            out[s].append(d)
    rows = []
    for v in range(n_vertices):
        html = html_of(v, out[v])
        rows.append(
            {
                "url": url_of(v),
                "warc_ts": EPOCH + dt.timedelta(seconds=v),
                "html": html,
                "text": extract_text_py(html),
                "lang": lang_of(v),
            }
        )
    return pd.DataFrame(rows)


def pages_df_from_edges(
    spark: SparkSession, n_vertices: int, edges: list[tuple[int, int]]
) -> DataFrame:
    return spark.createDataFrame(
        pages_pdf_from_edges(n_vertices, edges), schema=PAGES_SCHEMA
    )


def synth_powerlaw_edges(
    n_vertices: int,
    n_edges: int,
    seed: int = 42,
    zipf_s: float = 1.2,
    n_hubs: int = 3,
    dangling_frac: float = 0.01,
    dup_frac: float = 0.02,
) -> np.ndarray:
    """Seeded power-law digraph (FIXTURES.md §1 'bench' shape): Zipf in-degree
    targets, a few deliberate mega-hubs (in-degree ≈ N/10) for skew tests,
    ~dangling_frac pages with no out-links, ~dup_frac duplicated links.

    Returns an int64 array of shape (m, 2). NumPy-vectorized: fine up to
    tens of millions of edges on the driver; bigger scales use
    ``synth_pages_distributed``.
    """
    rng = np.random.default_rng(seed)
    dangling = rng.random(n_vertices) < dangling_frac
    src = rng.integers(0, n_vertices, size=n_edges)
    # remap sources landing on dangling vertices to non-dangling ones
    nond = np.flatnonzero(~dangling)
    src = nond[src % len(nond)]
    # Zipf-ish destination popularity
    ranks = rng.permutation(n_vertices)
    popular = rng.zipf(zipf_s, size=n_edges) % n_vertices
    dst = ranks[popular]
    # deliberate hubs
    hub_ids = nond[:n_hubs] if n_hubs else np.array([], dtype=np.int64)
    if n_hubs:
        hub_edges = max(1, n_vertices // 10)
        hs = nond[rng.integers(0, len(nond), size=hub_edges * n_hubs) % len(nond)]
        hd = np.repeat(hub_ids, hub_edges)
        src = np.concatenate([src, hs])
        dst = np.concatenate([dst, hd])
    # self-loop removal (extractor drops them anyway)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # duplicates: re-append a slice (extractor/dedup removes them again)
    ndup = int(len(src) * dup_frac)
    if ndup:
        src = np.concatenate([src, src[:ndup]])
        dst = np.concatenate([dst, dst[:ndup]])
    return np.stack([src, dst], axis=1).astype(np.int64)


def _url_expr(v):
    """Column analog of ``url_of`` (``%06d`` pads but NEVER truncates —
    ``F.lpad`` silently truncates longer strings, which above 1M vertices
    would collide urls and corrupt the synthetic graph)."""
    return F.format_string(
        "https://site%03d.example/p%06d.html",
        (v % N_SITES).cast("int"),
        v.cast("long"),
    )


def synth_edges_distributed(
    spark: SparkSession, n_vertices: int, avg_out_degree: int = 16, seed: int = 42
) -> DataFrame:
    """The deterministic (v, dst_v, k) anchor list behind
    ``synth_pages_distributed`` — exposed so benchmarks can compute the
    EXACT expected extraction output (distinct (v, dst_v) pairs) and check
    the extractor end-to-end against the generator.

    Out-degree varies 1..2*avg; destination popularity is skewed by squaring
    a uniform hash (quadratic preferential attachment stand-in).
    """
    v = spark.range(n_vertices).withColumnRenamed("id", "v")
    deg = (F.xxhash64(F.col("v"), F.lit(seed)) % (2 * avg_out_degree - 1) + (2 * avg_out_degree - 1)) % (
        2 * avg_out_degree - 1
    ) + 1
    return (
        v.withColumn("deg", deg)
        .withColumn("k", F.explode(F.sequence(F.lit(0), F.col("deg") - 1)))
        .withColumn("h", F.abs(F.xxhash64("v", "k", F.lit(seed + 1))))
        # skew: square a uniform in [0,1) -> low ids are hot destinations
        .withColumn(
            "dst_v",
            (
                F.pow(F.col("h") % 1000003 / F.lit(1000003.0), F.lit(2.0))
                * F.lit(float(n_vertices))
            ).cast("long"),
        )
        .filter(F.col("dst_v") != F.col("v"))
        .select("v", "dst_v", "k")
    )


def synth_pages_distributed(
    spark: SparkSession, n_vertices: int, avg_out_degree: int = 16, seed: int = 42
) -> DataFrame:
    """Fully-distributed deterministic pages synthesizer for benchmarks.

    Uses ``spark.range`` + hash arithmetic (xxhash64) so the same
    (n_vertices, avg_out_degree, seed) always yields the same table at any
    parallelism — no driver-side materialization, scales to any size.
    """
    v = spark.range(n_vertices).withColumnRenamed("id", "v")
    edges = synth_edges_distributed(spark, n_vertices, avg_out_degree, seed)
    anchors = edges.groupBy("v").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("k"), F.col("dst_v")))
                ),
                lambda s: F.concat(
                    F.lit('<a href="'),
                    _url_expr(s["dst_v"]),
                    F.lit('">anchor '),
                    s["k"].cast("string"),
                    F.lit("</a>"),
                ),
            ),
        ).alias("anchors")
    )
    url = _url_expr(F.col("v"))
    body_text = F.concat(
        F.lit("<p>text of page "),
        F.col("v").cast("string"),
        F.lit(" on site "),
        (F.col("v") % N_SITES).cast("string"),
        F.lit(" with tokens t"),
        (F.col("v") % 7).cast("string"),
        F.lit(" t"),
        (F.col("v") % 11).cast("string"),
        F.lit(" t"),
        (F.col("v") % 13).cast("string"),
        F.lit("</p>"),
    )
    html_str = F.concat(
        F.lit("<html><head><title>T"),
        F.col("v").cast("string"),
        F.lit("</title><style>.x{}</style></head><body><script>var a=1;</script>"),
        body_text,
        F.coalesce(F.col("anchors"), F.lit("")),
        F.lit("</body></html>"),
    )
    return (
        v.join(anchors, "v", "left")
        .select(
            url.alias("url"),
            (F.lit(EPOCH) + F.make_interval(secs=F.col("v").cast("double"))).alias(
                "warc_ts"
            ),
            F.encode(html_str, "UTF-8").alias("html"),
            F.lit(None).cast("string").alias("text"),
            F.when(F.col("v") % 10 != 3, "en").otherwise("sl").alias("lang"),
        )
    )
