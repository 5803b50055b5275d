"""Similarity search over an embedding column (array<float>).

Two paths, mirroring how a crawl-scale pipeline actually runs ANN:

  * **brute-force cosine top-k** — the exactness baseline: query×corpus
    equi-free join, JVM-side zip_with/aggregate dot products, per-query
    window top-k (rank on floor-micros cosine so Spark and the DuckDB
    oracle order identically).
  * **LSH-bucketed ANN** — random-hyperplane signatures; candidates are
    corpus rows sharing the query's bucket. Planes are literal constants
    derived from md5 (``_plane``), so the approximation itself is
    deterministic and the oracle reproduces it exactly. At 10^12-doc
    scale the bucket join replaces the all-pairs cross join; recall is
    tuned by ``n_planes`` (fewer planes → bigger buckets).

Embedding near-dup (cosine ≥ τ pairs, brute force) lives here too as the
fifth dedup family.

All float math: cast each float32 element to double, multiply-accumulate
left-to-right (Spark ``aggregate`` and DuckDB ``list_reduce`` both fold
sequentially) — identical IEEE results, so floor-micros values hash-match.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ps_pagerank_spark.functions.text import micros, micros_sql


# ---------------------------------------------------------------------------
# deterministic hyperplanes (shared literals for Spark and SQL)
# ---------------------------------------------------------------------------


def _plane(p: int, dim: int) -> list[float]:
    """Plane p over `dim` dims: md5-derived values in [-1, 1]."""
    out = []
    for d in range(dim):
        h = int(hashlib.md5(f"p:{p}:d:{d}".encode()).hexdigest()[:15], 16)
        out.append(((h % 2001) - 1000) / 1000.0)
    return out


def planes(n_planes: int, dim: int) -> list[list[float]]:
    return [_plane(p, dim) for p in range(n_planes)]


# ---------------------------------------------------------------------------
# cosine building blocks
# ---------------------------------------------------------------------------


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _dot_sql(a: str, b: str, dim: int) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(generate_series(1, {dim}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
        f"(x, y) -> x + y)"
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_sql(a: str, b: str, dim: int) -> str:
    return (
        f"({_dot_sql(a, b, dim)} / "
        f"(SQRT({_dot_sql(a, a, dim)}) * SQRT({_dot_sql(b, b, dim)})))"
    )


def _dim_of(emb: DataFrame, col: str) -> int:
    return len(emb.select(col).first()[0])


# ---------------------------------------------------------------------------
# brute-force top-k
# ---------------------------------------------------------------------------


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query row (query rows excluded from their
    own result). Output (query_id, neighbor_id, cosine_u, rnk).

    queries: (id_col, vec_col) — typically small → broadcast side of the
    cross join; corpus stays partitioned.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            micros(cosine(F.col("_qv"), F.col("_cv"))).alias("cosine_u"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_u"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine_u", "rnk")
    )


def cosine_topk_sql(
    emb_sql: str, query_pred: str, *, k: int, dim: int
) -> str:
    cos = cosine_sql("q.embedding", "c.embedding", dim)
    return f"""
q AS (SELECT vec_id AS query_id, embedding FROM {emb_sql} WHERE {query_pred}),
c AS (SELECT vec_id AS neighbor_id, embedding FROM {emb_sql}),
scored AS (
  SELECT q.query_id, c.neighbor_id, {micros_sql(cos)} AS cosine_u
  FROM q, c WHERE c.neighbor_id <> q.query_id),
ranked AS (
  SELECT query_id, neighbor_id, cosine_u,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine_u DESC, neighbor_id ASC) AS rnk
  FROM scored)
SELECT query_id, neighbor_id, cosine_u, rnk FROM ranked WHERE rnk <= {k}"""


# ---------------------------------------------------------------------------
# LSH-bucketed ANN
# ---------------------------------------------------------------------------


def lsh_bucket(vec: Column, pls: list[list[float]]) -> Column:
    """Signature = Σ_p 2^p · [vec·plane_p > 0] — one long bucket id."""
    out = F.lit(0).cast("long")
    for p, plane in enumerate(pls):
        plane_col = F.array(*[F.lit(v) for v in plane])
        out = out + F.when(dot(vec, plane_col) > 0, F.lit(1 << p)).otherwise(
            F.lit(0)
        ).cast("long")
    return out


def _bucket_sql(vec: str, pls: list[list[float]], dim: int) -> str:
    terms = []
    for p, plane in enumerate(pls):
        lit = "[" + ", ".join(repr(v) for v in plane) + "]"
        terms.append(
            f"CASE WHEN {_dot_sql(vec, lit, dim)} > 0 "
            f"THEN CAST({1 << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        )
    return "(" + " + ".join(terms) + ")"


def ann_lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine ranking *within* the query's LSH
    bucket. Deterministic approximation — same plane constants on both
    engines ⇒ same candidate sets ⇒ same results."""
    dim = _dim_of(emb, vec_col)
    pls = planes(n_planes, dim)
    with_b = emb.select(
        F.col(id_col), F.col(vec_col), lsh_bucket(F.col(vec_col), pls).alias("_b")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
                       ).withColumn("_b", lsh_bucket(F.col("_qv"), pls))
    c = with_b.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), "_b"
    )
    scored = (
        c.join(F.broadcast(q), "_b")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            micros(cosine(F.col("_qv"), F.col("_cv"))).alias("cosine_u"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_u"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine_u", "rnk")
    )


def ann_lsh_topk_sql(
    emb_sql: str, query_pred: str, *, k: int, n_planes: int, dim: int
) -> str:
    pls = planes(n_planes, dim)
    cos = cosine_sql("q.embedding", "c.embedding", dim)
    return f"""
b AS (SELECT vec_id, embedding,
             {_bucket_sql("embedding", pls, dim)} AS bk FROM {emb_sql}),
q AS (SELECT vec_id AS query_id, embedding, bk FROM b WHERE {query_pred}),
c AS (SELECT vec_id AS neighbor_id, embedding, bk FROM b),
scored AS (
  SELECT q.query_id, c.neighbor_id, {micros_sql(cos)} AS cosine_u
  FROM q JOIN c ON c.bk = q.bk AND c.neighbor_id <> q.query_id),
ranked AS (
  SELECT query_id, neighbor_id, cosine_u,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine_u DESC, neighbor_id ASC) AS rnk
  FROM scored)
SELECT query_id, neighbor_id, cosine_u, rnk FROM ranked WHERE rnk <= {k}"""


# ---------------------------------------------------------------------------
# embedding near-dup (dedup family #5)
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(
    emb: DataFrame,
    *,
    threshold_u: int = 900000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "auto",
    brute_max_rows: int = 20_000,
    n_planes: int = 6,
    n_tables: int = 4,
) -> DataFrame:
    """Pairs (a < b) with floor-micros cosine ≥ threshold_u.

    method:
      * "brute" — exact O(n²) cross join. Correct at any τ, only viable for
        small corpora.
      * "lsh"   — scale path: candidate pairs share a random-hyperplane
        bucket in ≥1 of `n_tables` independent tables (banded LSH), then
        exact-cosine verify. No cross join anywhere; recall < 1 is tunable
        (more tables / fewer planes → higher recall, bigger buckets).
      * "auto"  — brute iff the corpus has ≤ brute_max_rows rows (one
        count), else lsh — the 100 TB default never goes quadratic.

    Return contract under "auto": above brute_max_rows the result is the
    LSH candidate set (recall < 1, tunable via n_planes/n_tables), not the
    exact pair set — callers needing exactness at any size must pass
    method="brute" explicitly and accept the O(n²) cost. Explicit methods
    skip the auto count() probe.
    """
    if method not in ("auto", "brute", "lsh"):
        raise ValueError(f"unknown method {method!r}")
    if method == "auto":
        method = "brute" if emb.count() <= brute_max_rows else "lsh"
    if method == "lsh":
        return _embedding_neardup_lsh(
            emb,
            threshold_u=threshold_u,
            id_col=id_col,
            vec_col=vec_col,
            n_planes=n_planes,
            n_tables=n_tables,
        )
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            micros(cosine(F.col("_va"), F.col("_vb"))).alias("cosine_u"),
        )
        .filter(F.col("cosine_u") >= threshold_u)
    )


def _table_planes(t: int, n_planes: int, dim: int) -> list[list[float]]:
    """Independent plane set per table (distinct md5 namespace per (t, p))."""
    return [_plane(t * 1000 + p, dim) for p in range(n_planes)]


def _embedding_neardup_lsh(
    emb: DataFrame,
    *,
    threshold_u: int,
    id_col: str,
    vec_col: str,
    n_planes: int,
    n_tables: int,
) -> DataFrame:
    """Banded hyperplane LSH near-dup: candidates from slim bucket
    self-joins (ids only — embeddings are re-attached AFTER pair dedup, so
    the widest shuffle carries two longs per row, not two vectors)."""
    dim = _dim_of(emb, vec_col)
    buckets = F.array(
        *[
            lsh_bucket(F.col(vec_col), _table_planes(t, n_planes, dim))
            for t in range(n_tables)
        ]
    )
    banded = emb.select(
        F.col(id_col).alias("_id"), F.posexplode(buckets).alias("_t", "_b")
    )
    a = banded.select(F.col("_id").alias("id_a"), "_t", "_b")
    b = banded.select(F.col("_id").alias("id_b"), "_t", "_b")
    cand = (
        a.join(b, ["_t", "_b"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            micros(cosine(F.col("_va"), F.col("_vb"))).alias("cosine_u"),
        )
        .filter(F.col("cosine_u") >= threshold_u)
    )


def embedding_neardup_lsh_sql(
    emb_sql: str, *, threshold_u: int, dim: int, n_planes: int = 6, n_tables: int = 4
) -> str:
    """DuckDB twin of the banded-LSH near-dup (same plane constants ⇒ same
    candidate sets ⇒ identical rows)."""
    # buckets are computed in their own CTE (DuckDB can't bind correlated
    # columns inside list-lambdas under LATERAL), then zip-unnested
    bk_cols = ", ".join(
        f"{_bucket_sql('embedding', _table_planes(t, n_planes, dim), dim)} AS bk{t}"
        for t in range(n_tables)
    )
    bk_list = ", ".join(f"bk{t}" for t in range(n_tables))
    cos = cosine_sql("va.embedding", "vb.embedding", dim)
    return f"""
src AS (SELECT vec_id, {bk_cols} FROM {emb_sql}),
banded AS (
  SELECT vec_id AS _id,
         unnest(generate_series(0, {n_tables - 1})) AS _t,
         unnest([{bk_list}]) AS _b
  FROM src),
cand AS (
  SELECT DISTINCT a._id AS id_a, b._id AS id_b
  FROM banded a JOIN banded b
    ON a._t = b._t AND a._b = b._b AND a._id < b._id)
SELECT c.id_a, c.id_b, {micros_sql(cos)} AS cosine_u
FROM cand c
JOIN {emb_sql} va ON va.vec_id = c.id_a
JOIN {emb_sql} vb ON vb.vec_id = c.id_b
WHERE {micros_sql(cos)} >= {threshold_u}"""


def embedding_neardup_pairs_sql(
    emb_sql: str, *, threshold_u: int, dim: int
) -> str:
    cos = cosine_sql("a.embedding", "b.embedding", dim)
    return f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b, {micros_sql(cos)} AS cosine_u
FROM {emb_sql} a JOIN {emb_sql} b ON a.vec_id < b.vec_id
WHERE {micros_sql(cos)} >= {threshold_u}"""
