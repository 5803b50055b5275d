"""Deduplication operators for the training-data pipeline layer.

Five dedup families over a ``documents(doc_id, text, …)`` table, all
expressed as DataFrame joins/aggregations with JVM built-in expressions
(no per-row Python — north rule), each with a DuckDB-parity story:

  * **exact**       — md5 content hash, group-by, keep min doc_id.
  * **n-gram Jaccard** — word-shingle inverted index self-join; exact
    Jaccard on common-shingle counts.
  * **MinHash + LSH** — k permutation-hashed minima banded into buckets;
    bucket-join yields candidates, verified by signature agreement.
  * **SimHash**     — 60-bit sign-aggregated token-hash fingerprint;
    near-dup pairs via pigeonhole chunk join + Hamming filter.
  * **embedding cosine** — exact pairwise cosine over an embedding column
    (the brute-force path; the LSH-bucketed scale path lives in
    operators/similarity.py).

Scale notes (100 TB mindset):
  * the shingle inverted index is the standard web-dedup plan: explode →
    shuffle by shingle → pair-count. Ultra-frequent shingles create
    quadratic pair blowup, so ``max_shingle_df`` drops shingles seen in
    more than that many docs (boilerplate n-grams carry no dedup signal).
    The oracle queries run with the cap disabled to stay exact.
  * MinHash/LSH replaces the all-pairs join with #bands bucket joins —
    the only family that survives 10^12 docs; SimHash chunk join likewise.
  * all hashes derive from ``functions.text.hash64`` (md5-based) so the
    DuckDB oracle reproduces them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ps_pagerank_spark.functions.text import (
    content_hash,
    content_hash_sql,
    hash64,
    hash64_sql,
    micros,
    micros_sql,
    shingles,
    shingles_sql,
    tokens,
    tokens_sql,
)

# MinHash permutation family: h_j(x) = (A_j * (x mod P) + B_j) mod P over a
# Mersenne prime; coefficients are fixed literals so Spark and the SQL
# oracle share them. A_j * (x mod P) < 2^62 — no int64 overflow (DuckDB
# and Spark ANSI both *throw* on overflow rather than wrap).
MINHASH_P = 2_147_483_647
_A0, _B0 = 2_654_435_761, 2_246_822_519


def minhash_coeffs(k: int) -> list[tuple[int, int]]:
    return [
        (1 + (_A0 * (j + 1)) % (MINHASH_P - 1), (_B0 * (j + 1)) % MINHASH_P)
        for j in range(k)
    ]


SIMHASH_BITS = 60  # hash64 is 60-bit; bit 60+ would always vote -1
SIMHASH_CHUNKS = 4  # pigeonhole: hamming ≤ 3 ⇒ ≥1 identical 15-bit chunk


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(text_hash, doc_id=min id, n_dups) — one row per distinct content."""
    return (
        docs.select(
            "doc_id", content_hash(F.col(text_col)).alias("text_hash")
        )
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_dups"))
    )


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Documents surviving exact dedup (min doc_id per content hash)."""
    keep = exact_dedup_groups(docs, text_col).select("doc_id")
    return docs.join(keep, "doc_id")


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------


def _doc_shingles(
    docs: DataFrame, n: int, text_col: str, max_shingle_df: int | None
) -> DataFrame:
    sh = docs.select(
        "doc_id", F.explode(shingles(F.col(text_col), n)).alias("sh")
    )
    if max_shingle_df is not None:
        # drop boilerplate shingles: they connect unrelated docs and are
        # the quadratic-blowup term at crawl scale
        freq = (
            sh.groupBy("sh")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_shingle_df)
            .select("sh")
        )
        sh = sh.join(freq, "sh")
    return sh


def ngram_jaccard_pairs(
    docs: DataFrame,
    *,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """Near-dup pairs by exact Jaccard over word n-gram shingle sets.

    Plan: inverted index (explode shingles) → self-equi-join on shingle →
    pair-count = |A∩B| → sizes join → J = |∩| / (|A|+|B|−|∩|).
    Output (doc_a, doc_b, jaccard_u) with doc_a < doc_b.

    max_shingle_df (default 1000) drops shingles appearing in more than
    that many documents before the self-join. The inverted-index join is
    quadratic in shingle document-frequency — one boilerplate shingle
    shared by 1M docs generates 5·10^11 candidate rows — so the capped
    mode is the only safe default at crawl scale (sizes are computed on
    the SAME capped shingle set, so J stays a true Jaccard of the
    filtered sets). Pass ``max_shingle_df=None`` for the exact,
    uncapped semantics (the DuckDB oracle twin below); that mode is
    opt-in because it is a scale hazard by construction.
    """
    sh = _doc_shingles(docs, n, text_col, max_shingle_df)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    b = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    common = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("common"))
    )
    jac = (
        common.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("sa")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("sb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("common").cast("double")
                / (F.col("sa") + F.col("sb") - F.col("common")).cast("double")
            ).alias("j"),
        )
    )
    return jac.filter(F.col("j") >= threshold).select(
        "doc_a", "doc_b", micros(F.col("j")).alias("jaccard_u")
    )


def ngram_jaccard_pairs_sql(
    docs_sql: str, *, n: int = 3, threshold: float = 0.5
) -> str:
    """DuckDB twin of `ngram_jaccard_pairs` (no df cap — exact oracle)."""
    return f"""
sh AS (SELECT doc_id, unnest({shingles_sql("text", n)}) AS sh FROM {docs_sql}),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id),
jac AS (
  SELECT c.doc_a, c.doc_b,
         CAST(c.common AS DOUBLE) /
         CAST(sa.n_sh + sb.n_sh - c.common AS DOUBLE) AS j
  FROM common c
  JOIN sizes sa ON sa.doc_id = c.doc_a
  JOIN sizes sb ON sb.doc_id = c.doc_b)
SELECT doc_a, doc_b, {micros_sql("j")} AS jaccard_u
FROM jac WHERE j >= {threshold}"""


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    docs: DataFrame, *, k: int = 16, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """(doc_id, sig array<long> length k) — min of each permutation hash
    over the doc's shingle hash set. Docs with no shingle content get the
    empty-string shingle, so signatures are always defined.

    Physical shape: explode shingles → ONE md5 per (doc, shingle) row →
    k min-aggregations with map-side partials. (A per-column
    `array_min(transform(...))` formulation re-evaluates the md5 chain k
    times after CollapseProject inlining — measured ~k× slower.)"""
    sh = docs.select(
        "doc_id", F.explode(shingles(F.col(text_col), n)).alias("_s")
    ).select("doc_id", hash64(F.col("_s")).alias("_h"))
    hm = F.col("_h") % F.lit(MINHASH_P)
    aggs = [
        F.min((F.lit(a) * hm + F.lit(b)) % F.lit(MINHASH_P)).alias(f"_m{j}")
        for j, (a, b) in enumerate(minhash_coeffs(k))
    ]
    return (
        sh.groupBy("doc_id")
        .agg(*aggs)
        .select(
            "doc_id", F.array(*[f"_m{j}" for j in range(k)]).alias("sig")
        )
    )


def _minhash_sig_sql(k: int, n: int) -> str:
    base = f"list_transform({shingles_sql('text', n)}, x -> {hash64_sql('x')})"
    mins = ", ".join(
        f"list_min(list_transform({base}, h -> ({a} * (h % {MINHASH_P}) + {b}) % {MINHASH_P}))"
        for a, b in minhash_coeffs(k)
    )
    return f"[{mins}]"


def minhash_lsh_pairs(
    docs: DataFrame,
    *,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """LSH candidate pairs verified by signature agreement.

    Bands of r = k/bands rows; band key = joined sig slice. Candidates =
    docs sharing ≥1 band bucket; est. Jaccard = fraction of agreeing
    signature components. Output (doc_a, doc_b, est_jaccard_u ≥ threshold).

    **Eager**: the result (tiny — near-dup pairs only) is materialized via
    ``localCheckpoint`` before returning so the persisted signature table
    can be unpersisted inside this call. The previous lazy version leaked
    one cached DataFrame per invocation (and made repeated benchmark reps
    hit the leaked cache instead of doing real work).
    """
    r = k // bands
    # persist: the LSH self-join consumes the signature table four times
    # (band sides a/b + the two re-attach joins) — without this the
    # shingle/md5/agg chain runs 4×. Released before return (see above).
    sigs = minhash_signatures(docs, k=k, n=n, text_col=text_col).persist()
    band_arr = F.array(
        *[
            F.array_join(F.slice(F.col("sig"), b * r + 1, r), "_")
            for b in range(bands)
        ]
    )
    # slim band self-join: ids only — carrying the k-long signature arrays
    # through the banded join would shuffle them once per band per side;
    # they are re-attached after pair dedup with two thin joins instead
    banded = sigs.select(
        "doc_id", F.posexplode(band_arr).alias("band", "key")
    )
    a = banded.select(F.col("doc_id").alias("doc_a"), "band", "key")
    b = banded.select(F.col("doc_id").alias("doc_b"), "band", "key")
    pair_ids = (
        a.join(b, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    cand = pair_ids.join(
        sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a")),
        "doc_a",
    ).join(
        sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b")),
        "doc_b",
    )
    est = cand.select(
        "doc_a",
        "doc_b",
        (
            F.aggregate(
                F.zip_with(
                    "sig_a",
                    "sig_b",
                    lambda x, y: F.when(x == y, 1).otherwise(0),
                ),
                F.lit(0),
                lambda acc, x: acc + x,
            ).cast("double")
            / F.lit(float(k))
        ).alias("est"),
    )
    out = est.filter(F.col("est") >= threshold).select(
        "doc_a", "doc_b", micros(F.col("est")).alias("est_jaccard_u")
    )
    try:
        # computes now; truncated lineage no longer references `sigs`, so
        # the cache can be dropped without re-triggering the md5 chain
        return out.localCheckpoint(eager=True)
    finally:
        sigs.unpersist()


def minhash_lsh_pairs_sql(
    docs_sql: str,
    *,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    n: int = 3,
) -> str:
    r = k // bands
    band_keys = ", ".join(
        f"array_to_string(list_slice(sig, {b * r + 1}, {b * r + r}), '_')"
        for b in range(bands)
    )
    return f"""
sigs AS (SELECT doc_id, {_minhash_sig_sql(k, n)} AS sig FROM {docs_sql}),
banded AS (
  SELECT doc_id, sig, u.band, u.key FROM sigs,
  LATERAL (SELECT unnest(generate_series(0, {bands - 1})) AS band,
                  unnest([{band_keys}]) AS key) u),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.sig AS sig_a, b.sig AS sig_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
est AS (
  SELECT doc_a, doc_b,
         CAST(list_sum(list_transform(generate_series(1, {k}),
             i -> CASE WHEN sig_a[i] = sig_b[i] THEN 1 ELSE 0 END))
           AS DOUBLE) / {float(k)} AS est
  FROM cand)
SELECT doc_a, doc_b, {micros_sql("est")} AS est_jaccard_u
FROM est WHERE est >= {threshold}"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash long): 60-bit fingerprint — bit i set iff the sum
    of ±1 votes of token-hash bit i over all tokens is positive.

    Physical shape: explode tokens → ONE md5 per (doc, token) row → 60
    conditional-SUM aggregates with map-side partials → sign+pack per doc.
    (The previous nested ``aggregate(sequence(0,59), … aggregate(
    transform(tokens…)))`` expression re-evaluated the whole
    regexp+md5 token-hash chain once per bit — Catalyst does not hoist
    loop-invariant subtrees out of higher-order-function lambdas, so the
    single-expression form costs ~60× per document. Same fix as
    `minhash_signatures`; A/B measured in BENCH/BASELINE.md.)

    ``explode_outer`` keeps zero-token docs: their single null row makes
    every vote-sum null, so every bit takes the ``otherwise(0)`` branch
    and the fingerprint is 0 — identical to the old empty-fold semantics
    and the DuckDB twin's ``COALESCE(list_sum(…), 0)``.
    """
    th = docs.select(
        "doc_id", F.explode_outer(tokens(F.col(text_col))).alias("_t")
    ).select("doc_id", hash64(F.col("_t")).alias("_h"))
    aggs = [
        F.sum(
            F.shiftright(F.col("_h"), i).bitwiseAND(F.lit(1)) * 2 - 1
        ).alias(f"_s{i}")
        for i in range(SIMHASH_BITS)
    ]
    packed = None
    for i in range(SIMHASH_BITS):
        bit = F.when(
            F.col(f"_s{i}") > 0, F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        packed = bit if packed is None else packed + bit
    return (
        th.groupBy("doc_id").agg(*aggs).select("doc_id", packed.alias("simhash"))
    )


def simhash_sql(docs_sql: str) -> str:
    # Outer fold MUST stay integer end-to-end: DuckDB list_sum returns
    # HUGEINT, which pandas renders as float64 and silently corrupts
    # fingerprints above 2^53. list_reduce over BIGINT terms stays BIGINT
    # (generate_series(0, 59) is never empty, so no COALESCE needed).
    th = f"list_transform({tokens_sql('text')}, x -> {hash64_sql('x')})"
    return f"""
SELECT doc_id,
  list_reduce(list_transform(generate_series(0, {SIMHASH_BITS - 1}),
    i -> CASE WHEN COALESCE(list_sum(list_transform({th},
             h -> ((h >> i) & 1) * 2 - 1)), 0) > 0
         THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END),
    (a, b) -> a + b)
  AS simhash
FROM {docs_sql}"""


def simhash_neardup_pairs(
    docs: DataFrame, *, max_hamming: int = 3, text_col: str = "text"
) -> DataFrame:
    """Pairs with Hamming(simhash) ≤ max_hamming, found via pigeonhole:
    split into SIMHASH_CHUNKS 15-bit chunks; any pair within distance
    ≤ chunks−1 shares ≥1 exact chunk, so the join misses nothing."""
    assert max_hamming <= SIMHASH_CHUNKS - 1
    width = SIMHASH_BITS // SIMHASH_CHUNKS
    mask = (1 << width) - 1
    sh = simhash(docs, text_col)
    chunk_arr = F.array(
        *[
            F.shiftright(F.col("simhash"), c * width).bitwiseAND(F.lit(mask))
            for c in range(SIMHASH_CHUNKS)
        ]
    )
    chunked = sh.select(
        "doc_id", "simhash", F.posexplode(chunk_arr).alias("c", "chunk")
    )
    a = chunked.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"), "c", "chunk"
    )
    b = chunked.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"), "c", "chunk"
    )
    return (
        a.join(b, ["c", "chunk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_neardup_pairs_sql(docs_sql: str, *, max_hamming: int = 3) -> str:
    width = SIMHASH_BITS // SIMHASH_CHUNKS
    mask = (1 << width) - 1
    chunks = ", ".join(
        f"((simhash >> {c * width}) & {mask})" for c in range(SIMHASH_CHUNKS)
    )
    return f"""
sh AS ({simhash_sql(docs_sql)}),
chunked AS (
  SELECT doc_id, simhash, u.c, u.chunk FROM sh,
  LATERAL (SELECT unnest(generate_series(0, {SIMHASH_CHUNKS - 1})) AS c,
                  unnest([{chunks}]) AS chunk) u),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS ha, b.simhash AS hb
  FROM chunked a JOIN chunked b
    ON a.c = b.c AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, bit_count(xor(ha, hb)) AS hamming
FROM pairs WHERE bit_count(xor(ha, hb)) <= {max_hamming}"""
