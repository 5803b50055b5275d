"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)`: flagship pipeline on sf0.001 (tpch-derived link graph →
converged PageRank with dangling redistribution → top-20 with urls).

`queries()` / `oracle_sql()`: one entry per implemented operator
(SURVEY.md §2 + the training-data-pipeline ops). Iterative algorithms are
oracled with *unrolled* DuckDB CTE chains (exact same fixed iteration count
as the Spark callable); floating-point parity notes inline — PageRank ranks
are rounded to 9 decimals on BOTH sides so last-ulp summation-order noise
can't flip the value hash.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

REPO = Path(__file__).resolve().parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from ps_pagerank_spark.session import _ship_package  # noqa: E402
from ps_pagerank_spark.sources.edgelist import (  # noqa: E402
    TPCH_GRAPH_SQL,
    tpch_graph_edges,
)

SF001 = "/root/testdata/sf0.001"

# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------


def _prep(spark: SparkSession) -> None:
    """Ship the package zip to Python workers (driver-created sessions
    don't go through ps_pagerank_spark.get_spark)."""
    try:
        _ship_package(spark)
    except Exception:
        pass  # already added / non-fatal


def _url_expr(col: str):
    """Deterministic url of a vertex id — must match _URL_SQL below."""
    return F.concat(
        F.lit("https://site"),
        F.lpad((F.col(col) % 97).cast("string"), 3, "0"),
        F.lit(".example/p"),
        F.lpad(F.col(col).cast("string"), 6, "0"),
        F.lit(".html"),
    )


def _url_sql(col: str) -> str:
    return (
        f"'https://site' || lpad(CAST({col} % 97 AS VARCHAR), 3, '0') "
        f"|| '.example/p' || lpad(CAST({col} AS VARCHAR), 6, '0') || '.html'"
    )


# DuckDB CTE prelude shared by all graph oracles
_G = f"""WITH base AS MATERIALIZED ({TPCH_GRAPH_SQL}),
verts AS MATERIALIZED (SELECT DISTINCT vertex_id FROM (
    SELECT src_id AS vertex_id FROM base
    UNION ALL SELECT dst_id AS vertex_id FROM base)),
outdeg AS MATERIALIZED (SELECT src_id, count(*) AS deg FROM base GROUP BY src_id),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
dang AS MATERIALIZED (SELECT vertex_id FROM verts
         WHERE vertex_id NOT IN (SELECT src_id FROM outdeg))"""

_D = "CAST(0.85 AS DOUBLE)"
_ONE = "CAST(1 AS DOUBLE)"


def _pagerank_sql(iters: int, redistribute: bool) -> str:
    """Unrolled power iteration, double arithmetic shaped exactly like the
    engine's: base = (1−d)/n [+ d·dm/n], contribution = rank·(1/deg)."""
    ctes = [f"r0 AS MATERIALIZED (SELECT vertex_id, {_ONE}/(SELECT n FROM nn) AS rank FROM verts)"]
    for k in range(1, iters + 1):
        dm_term = ""
        if redistribute:
            if k == 1:
                # engine seeds dangling mass as count(dangling)/n
                ctes.append(
                    f"dm0 AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE)/(SELECT n FROM nn) AS m FROM dang)"
                )
            else:
                ctes.append(
                    f"dm{k-1} AS MATERIALIZED (SELECT CAST(COALESCE(SUM(r.rank), 0) AS DOUBLE) AS m "
                    f"FROM r{k-1} r JOIN dang d ON d.vertex_id = r.vertex_id)"
                )
            dm_term = f" + {_D} * (SELECT m FROM dm{k-1}) / (SELECT n FROM nn)"
        ctes.append(
            f"""r{k} AS MATERIALIZED (
  SELECT v.vertex_id,
         ({_ONE} - {_D})/(SELECT n FROM nn){dm_term}
         + {_D} * COALESCE(c.s, CAST(0 AS DOUBLE)) AS rank
  FROM verts v LEFT JOIN (
      SELECT b.dst_id AS vertex_id,
             SUM(p.rank * ({_ONE} / od.deg)) AS s
      FROM r{k-1} p
      JOIN base b ON b.src_id = p.vertex_id
      JOIN outdeg od ON od.src_id = p.vertex_id
      GROUP BY b.dst_id) c ON c.vertex_id = v.vertex_id)"""
        )
    return ",\n".join(ctes)


def _cc_sql(rounds: int) -> str:
    """Unrolled hash-min propagation (exact when rounds ≥ diameter; the
    engine's large-star/small-star is exact at its own fixed point)."""
    ctes = [
        "und AS MATERIALIZED (SELECT src_id AS u, dst_id AS v FROM base "
        "UNION SELECT dst_id, src_id FROM base)",
        "c0 AS MATERIALIZED (SELECT vertex_id, vertex_id AS lbl FROM verts)",
    ]
    for k in range(1, rounds + 1):
        ctes.append(
            f"""c{k} AS MATERIALIZED (SELECT vertex_id, MIN(lbl) AS lbl FROM (
  SELECT vertex_id, lbl FROM c{k-1}
  UNION ALL
  SELECT e.u AS vertex_id, p.lbl FROM c{k-1} p JOIN und e ON e.v = p.vertex_id
) GROUP BY vertex_id)"""
        )
    return ",\n".join(ctes)


def _lp_sql(rounds: int) -> str:
    """Unrolled synchronous label propagation, min tie-break."""
    ctes = [
        "und AS MATERIALIZED (SELECT src_id AS u, dst_id AS v FROM base "
        "UNION SELECT dst_id, src_id FROM base)",
        "l0 AS MATERIALIZED (SELECT vertex_id, vertex_id AS label FROM verts)",
    ]
    for k in range(1, rounds + 1):
        ctes.append(
            f"""t{k} AS MATERIALIZED (SELECT vertex_id, label FROM (
  SELECT e.u AS vertex_id, p.label,
         row_number() OVER (PARTITION BY e.u
                            ORDER BY count(*) DESC, p.label ASC) AS rn
  FROM l{k-1} p JOIN und e ON e.v = p.vertex_id
  GROUP BY e.u, p.label) WHERE rn = 1)"""
        )
        ctes.append(
            f"""l{k} AS MATERIALIZED (SELECT p.vertex_id, COALESCE(t.label, p.label) AS label
  FROM l{k-1} p LEFT JOIN t{k} t ON t.vertex_id = p.vertex_id)"""
        )
    return ",\n".join(ctes)


PR_ITERS = 12
CC_ORACLE_ROUNDS = 40
LP_ROUNDS = 3


# ---------------------------------------------------------------------------
# Spark-side queries
# ---------------------------------------------------------------------------


def _q_edges(spark, sf_dir):
    return tpch_graph_edges(spark, sf_dir)


def _q_outdeg(spark, sf_dir):
    from ps_pagerank_spark.operators.graph import out_degrees

    return out_degrees(tpch_graph_edges(spark, sf_dir))


def _q_degree_histogram(spark, sf_dir):
    from ps_pagerank_spark.operators.graph import degree_histogram

    return degree_histogram(tpch_graph_edges(spark, sf_dir), "in")


def _q_max_in_degree(spark, sf_dir):
    from ps_pagerank_spark.operators.graph import in_degrees

    return in_degrees(tpch_graph_edges(spark, sf_dir)).agg(
        F.max("deg").alias("max_in_deg")
    )


def _q_weighted_coo(spark, sf_dir):
    from ps_pagerank_spark.operators.graph import weighted_edges

    return weighted_edges(tpch_graph_edges(spark, sf_dir)).select(
        F.col("dst_id").alias("row_id"),
        F.col("src_id").alias("col_id"),
        F.col("w").alias("value"),
    )


def _run_pagerank(spark, sf_dir, mode):
    from ps_pagerank_spark.operators.pagerank import pagerank

    _prep(spark)
    edges = tpch_graph_edges(spark, sf_dir)
    res = pagerank(
        spark, edges, fixed_iterations=PR_ITERS, dangling_mode=mode
    )
    return res.ranks.select(
        "vertex_id", F.round(F.col("rank"), 9).alias("rank_r9")
    )


def _q_pagerank_none(spark, sf_dir):
    return _run_pagerank(spark, sf_dir, "none")


def _q_pagerank_redist(spark, sf_dir):
    return _run_pagerank(spark, sf_dir, "redistribute")


def _q_pagerank_top20(spark, sf_dir):
    return (
        _run_pagerank(spark, sf_dir, "redistribute")
        .orderBy(F.desc("rank_r9"), F.asc("vertex_id"))
        .limit(20)
    )


def _q_components(spark, sf_dir):
    from ps_pagerank_spark.operators.components import connected_components

    _prep(spark)
    return connected_components(spark, tpch_graph_edges(spark, sf_dir)).components


def _q_labelprop(spark, sf_dir):
    from ps_pagerank_spark.operators.labelprop import label_propagation

    _prep(spark)
    return label_propagation(
        spark, tpch_graph_edges(spark, sf_dir), iterations=LP_ROUNDS
    )


def _q_triangles(spark, sf_dir):
    from ps_pagerank_spark.operators.triangles import triangle_counts

    _prep(spark)
    return triangle_counts(spark, tpch_graph_edges(spark, sf_dir))


def _q_link_extract(spark, sf_dir):
    """Build Common-Crawl-style pages for the graph vertices (anchors =
    out-edges), run the REAL pandas-UDF extractor, return the link set.
    The oracle derives the expected set directly from the edge rule."""
    from ps_pagerank_spark.functions.extract import extract_links, normalize_links
    from ps_pagerank_spark.operators.graph import vertices_from_edges

    _prep(spark)
    edges = tpch_graph_edges(spark, sf_dir)
    verts = vertices_from_edges(edges)
    anchors = (
        edges.groupBy("src_id")
        .agg(F.array_sort(F.collect_set("dst_id")).alias("dsts"))
        .select(
            "src_id",
            F.concat_ws(
                "",
                F.transform(
                    F.col("dsts"),
                    lambda d: F.concat(
                        F.lit('<a href="'),
                        F.concat(
                            F.lit("https://site"),
                            F.lpad((d % 97).cast("string"), 3, "0"),
                            F.lit(".example/p"),
                            F.lpad(d.cast("string"), 6, "0"),
                            F.lit(".html"),
                        ),
                        F.lit('">x</a>'),
                    ),
                ),
            ).alias("anchors"),
        )
    )
    pages = (
        verts.join(anchors, verts.vertex_id == anchors.src_id, "left")
        .select(
            _url_expr("vertex_id").alias("url"),
            F.encode(
                F.concat(
                    F.lit("<html><body><p>page</p>"),
                    F.coalesce(F.col("anchors"), F.lit("")),
                    F.lit("</body></html>"),
                ),
                "UTF-8",
            ).alias("html"),
        )
    )
    return normalize_links(extract_links(pages))


def _q_vertices_dict(spark, sf_dir):
    from ps_pagerank_spark.operators.graph import encode_vertices

    edges = tpch_graph_edges(spark, sf_dir)
    urls = (
        edges.select(_url_expr("src_id").alias("url"))
        .union(edges.select(_url_expr("dst_id").alias("url")))
        .distinct()
    )
    return encode_vertices(urls, mode="zip")


def _q_edges_encoded(spark, sf_dir):
    from ps_pagerank_spark.operators.graph import (
        encode_edges,
        encode_vertices,
        vertices_from_links,
    )

    edges = tpch_graph_edges(spark, sf_dir)
    links = edges.select(
        _url_expr("src_id").alias("src_url"), _url_expr("dst_id").alias("dst_url")
    )
    vertices = encode_vertices(vertices_from_links(links), mode="zip")
    return encode_edges(links, vertices)


# ---------------------------------------------------------------------------
# training-data pipeline queries (documents / embeddings tables)
# ---------------------------------------------------------------------------


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _q_text_features(spark, sf_dir):
    from ps_pagerank_spark.functions.text import text_feature_columns

    feats = text_feature_columns(F.col("text"))
    return _docs(spark, sf_dir).select(
        "doc_id", *[v.alias(k) for k, v in feats.items()]
    )


def _q_lang_id(spark, sf_dir):
    from ps_pagerank_spark.functions.text import predicted_lang

    return _docs(spark, sf_dir).select(
        "doc_id", "lang", predicted_lang(F.col("text")).alias("predicted_lang")
    )


def _q_fingerprints(spark, sf_dir):
    from ps_pagerank_spark.functions.text import content_hash, min_word_hash

    return _docs(spark, sf_dir).select(
        "doc_id",
        content_hash(F.col("text")).alias("content_hash"),
        min_word_hash(F.col("text")).alias("min_word_hash"),
    )


def _q_exact_dedup(spark, sf_dir):
    from ps_pagerank_spark.operators.dedup import exact_dedup_groups

    return exact_dedup_groups(_docs(spark, sf_dir))


def _q_jaccard_pairs(spark, sf_dir):
    from ps_pagerank_spark.operators.dedup import ngram_jaccard_pairs

    # explicit exact mode: the DuckDB oracle is uncapped; the operator's
    # DEFAULT is the capped, crawl-scale-safe mode (max_shingle_df=1000)
    return ngram_jaccard_pairs(
        _docs(spark, sf_dir), threshold=0.5, max_shingle_df=None
    )


def _q_minhash_pairs(spark, sf_dir):
    from ps_pagerank_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.5)


def _q_simhash(spark, sf_dir):
    from ps_pagerank_spark.operators.dedup import simhash

    return simhash(_docs(spark, sf_dir))


def _q_simhash_pairs(spark, sf_dir):
    from ps_pagerank_spark.operators.dedup import simhash_neardup_pairs

    return simhash_neardup_pairs(_docs(spark, sf_dir), max_hamming=3)


def _q_emb_neardup(spark, sf_dir):
    from ps_pagerank_spark.operators.similarity import embedding_neardup_pairs

    return embedding_neardup_pairs(
        _emb(spark, sf_dir), threshold_u=300000, method="brute"
    )


def _q_emb_neardup_lsh(spark, sf_dir):
    from ps_pagerank_spark.operators.similarity import embedding_neardup_pairs

    return embedding_neardup_pairs(
        _emb(spark, sf_dir), threshold_u=300000, method="lsh"
    )


def _q_cosine_topk(spark, sf_dir):
    from ps_pagerank_spark.operators.similarity import cosine_topk

    emb = _emb(spark, sf_dir)
    return cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=10)


def _q_ann_topk(spark, sf_dir):
    from ps_pagerank_spark.operators.similarity import ann_lsh_topk

    emb = _emb(spark, sf_dir)
    return ann_lsh_topk(emb, emb.filter(F.col("vec_id") < 5), k=10, n_planes=6)


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _q_events_windowed(spark, sf_dir):
    from ps_pagerank_spark.operators.analytics import windowed_stats

    return windowed_stats(_events(spark, sf_dir), window="1 hour", micros_ts=True)


def _q_events_sessions(spark, sf_dir):
    from ps_pagerank_spark.operators.analytics import sessionize

    return sessionize(_events(spark, sf_dir), gap_minutes=30, micros_ts=True)


def _q_events_props(spark, sf_dir):
    from ps_pagerank_spark.operators.analytics import extract_props

    return extract_props(_events(spark, sf_dir))


def _q_media_features(spark, sf_dir):
    from ps_pagerank_spark.functions.multimodal import (
        extract_media_features,
        media_from_documents,
    )

    _prep(spark)
    return extract_media_features(media_from_documents(_docs(spark, sf_dir)))


# ---------------------------------------------------------------------------
# contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: sf0.001 graph → converged PageRank (redistribute) → top 20
    with urls."""
    from ps_pagerank_spark.operators.pagerank import pagerank, top_k_ranks

    _prep(spark)
    edges = tpch_graph_edges(spark, SF001)
    res = pagerank(spark, edges, eps=1e-6, dangling_mode="redistribute")
    top = top_k_ranks(res.ranks, 20)
    return top.select("vertex_id", _url_expr("vertex_id").alias("url"), "rank")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "edges_dedup": _q_edges,
        "out_degrees": _q_outdeg,
        "degree_histogram_in": _q_degree_histogram,
        "max_in_degree": _q_max_in_degree,
        "weighted_coo": _q_weighted_coo,
        "pagerank_fixed12_none": _q_pagerank_none,
        "pagerank_fixed12_redistribute": _q_pagerank_redist,
        "pagerank_top20": _q_pagerank_top20,
        "connected_components": _q_components,
        "label_propagation_3": _q_labelprop,
        "triangle_counts": _q_triangles,
        "link_extraction": _q_link_extract,
        "vertices_dictionary": _q_vertices_dict,
        "edges_encoded": _q_edges_encoded,
        "text_features": _q_text_features,
        "lang_id": _q_lang_id,
        "doc_fingerprints": _q_fingerprints,
        "exact_dedup_groups": _q_exact_dedup,
        "ngram_jaccard_pairs": _q_jaccard_pairs,
        "minhash_lsh_pairs": _q_minhash_pairs,
        "simhash_fingerprints": _q_simhash,
        "simhash_neardup_pairs": _q_simhash_pairs,
        "embedding_neardup_pairs": _q_emb_neardup,
        "embedding_neardup_lsh": _q_emb_neardup_lsh,
        "cosine_topk10": _q_cosine_topk,
        "ann_lsh_topk10": _q_ann_topk,
        "media_features": _q_media_features,
        "events_windowed_stats": _q_events_windowed,
        "events_sessionize": _q_events_sessions,
        "events_json_props": _q_events_props,
    }


def oracle_sql() -> dict[str, str]:
    url_src = _url_sql("src_id")
    url_dst = _url_sql("dst_id")
    return {
        "edges_dedup": f"{_G} SELECT src_id, dst_id FROM base",
        "out_degrees": f"{_G} SELECT src_id, deg FROM outdeg",
        "degree_histogram_in": f"""{_G},
indeg AS (SELECT dst_id, count(*) AS deg FROM base GROUP BY dst_id)
SELECT deg, count(*) AS n_vertices FROM indeg GROUP BY deg""",
        "max_in_degree": f"""{_G}
SELECT max(deg) AS max_in_deg
FROM (SELECT dst_id, count(*) AS deg FROM base GROUP BY dst_id)""",
        "weighted_coo": f"""{_G}
SELECT b.dst_id AS row_id, b.src_id AS col_id,
       {_ONE} / od.deg AS value
FROM base b JOIN outdeg od ON od.src_id = b.src_id""",
        "pagerank_fixed12_none": f"""{_G},
{_pagerank_sql(PR_ITERS, False)}
SELECT vertex_id, ROUND(rank, 9) AS rank_r9 FROM r{PR_ITERS}""",
        "pagerank_fixed12_redistribute": f"""{_G},
{_pagerank_sql(PR_ITERS, True)}
SELECT vertex_id, ROUND(rank, 9) AS rank_r9 FROM r{PR_ITERS}""",
        "pagerank_top20": f"""{_G},
{_pagerank_sql(PR_ITERS, True)}
SELECT vertex_id, ROUND(rank, 9) AS rank_r9 FROM r{PR_ITERS}
ORDER BY rank_r9 DESC, vertex_id ASC LIMIT 20""",
        "connected_components": f"""{_G},
{_cc_sql(CC_ORACLE_ROUNDS)}
SELECT vertex_id, lbl AS component FROM c{CC_ORACLE_ROUNDS}""",
        "label_propagation_3": f"""{_G},
{_lp_sql(LP_ROUNDS)}
SELECT vertex_id, label FROM l{LP_ROUNDS}""",
        "triangle_counts": f"""{_G},
und1 AS (SELECT DISTINCT LEAST(src_id, dst_id) AS a,
                GREATEST(src_id, dst_id) AS b FROM base),
tri AS (
  SELECT w.u, w.v, w.w FROM (
    SELECT e1.a AS u, e1.b AS v, e2.b AS w
    FROM und1 e1 JOIN und1 e2 ON e1.a = e2.a AND e1.b < e2.b) w
  JOIN und1 e3 ON e3.a = w.v AND e3.b = w.w),
corners AS (
  SELECT u AS vertex_id FROM tri
  UNION ALL SELECT v FROM tri
  UNION ALL SELECT w FROM tri),
cnts AS (SELECT vertex_id, count(*) AS c FROM corners GROUP BY vertex_id)
SELECT v.vertex_id, COALESCE(c.c, 0) AS triangles
FROM verts v LEFT JOIN cnts c ON c.vertex_id = v.vertex_id""",
        "link_extraction": f"""{_G}
SELECT {url_src} AS src_url, {url_dst} AS dst_url FROM base""",
        "vertices_dictionary": f"""{_G},
urls AS (SELECT DISTINCT url FROM (
  SELECT {url_src} AS url FROM base
  UNION ALL SELECT {url_dst} AS url FROM base))
SELECT row_number() OVER (ORDER BY url) - 1 AS vertex_id, url FROM urls""",
        "edges_encoded": f"""{_G},
urls AS (SELECT DISTINCT url FROM (
  SELECT {url_src} AS url FROM base
  UNION ALL SELECT {url_dst} AS url FROM base)),
dict AS (SELECT row_number() OVER (ORDER BY url) - 1 AS vertex_id, url FROM urls)
SELECT ds.vertex_id AS src_id, dd.vertex_id AS dst_id
FROM base b
JOIN dict ds ON ds.url = {url_src}
JOIN dict dd ON dd.url = {url_dst}""",
        **_pipeline_oracles(),
    }


def _pipeline_oracles() -> dict[str, str]:
    from ps_pagerank_spark.functions.multimodal import media_features_sql
    from ps_pagerank_spark.functions.text import (
        content_hash_sql,
        min_word_hash_sql,
        predicted_lang_sql,
        text_feature_sql,
    )
    from ps_pagerank_spark.operators.dedup import (
        minhash_lsh_pairs_sql,
        ngram_jaccard_pairs_sql,
        simhash_neardup_pairs_sql,
        simhash_sql,
    )
    from ps_pagerank_spark.operators.similarity import (
        ann_lsh_topk_sql,
        cosine_topk_sql,
        embedding_neardup_lsh_sql,
        embedding_neardup_pairs_sql,
    )

    feat_cols = ", ".join(
        f"{v} AS {k}" for k, v in text_feature_sql("text").items()
    )
    return {
        "text_features": f"SELECT doc_id, {feat_cols} FROM documents",
        "lang_id": (
            "SELECT doc_id, lang, "
            f"{predicted_lang_sql('text')} AS predicted_lang FROM documents"
        ),
        "doc_fingerprints": (
            f"SELECT doc_id, {content_hash_sql('text')} AS content_hash, "
            f"{min_word_hash_sql('text')} AS min_word_hash FROM documents"
        ),
        "exact_dedup_groups": (
            f"SELECT {content_hash_sql('text')} AS text_hash, "
            "min(doc_id) AS doc_id, count(*) AS n_dups "
            "FROM documents GROUP BY 1"
        ),
        "ngram_jaccard_pairs": "WITH "
        + ngram_jaccard_pairs_sql("documents", threshold=0.5),
        "minhash_lsh_pairs": "WITH "
        + minhash_lsh_pairs_sql("documents", threshold=0.5),
        "simhash_fingerprints": simhash_sql("documents"),
        "simhash_neardup_pairs": "WITH "
        + simhash_neardup_pairs_sql("documents", max_hamming=3),
        "embedding_neardup_pairs": embedding_neardup_pairs_sql(
            "embeddings", threshold_u=300000, dim=64
        ),
        "embedding_neardup_lsh": "WITH "
        + embedding_neardup_lsh_sql("embeddings", threshold_u=300000, dim=64),
        "cosine_topk10": "WITH "
        + cosine_topk_sql("embeddings", "vec_id < 5", k=10, dim=64),
        "ann_lsh_topk10": "WITH "
        + ann_lsh_topk_sql("embeddings", "vec_id < 5", k=10, n_planes=6, dim=64),
        "media_features": media_features_sql("documents"),
        **_analytics_oracles(),
    }


def _analytics_oracles() -> dict[str, str]:
    from ps_pagerank_spark.operators.analytics import (
        extract_props_sql,
        sessionize_sql,
        windowed_stats_sql,
    )

    return {
        "events_windowed_stats": windowed_stats_sql(
            "events", hours=1, micros_ts=True
        ),
        "events_sessionize": "WITH "
        + sessionize_sql("events", gap_minutes=30, micros_ts=True),
        "events_json_props": extract_props_sql("events"),
    }
