"""Text-analysis functions for the training-data pipeline layer.

The reference engine has no string functions at all (SURVEY.md §2.6) — this
layer exists because a web-scale link-graph pipeline always sits next to a
document pipeline (language ID, quality scoring, token counting,
fingerprinting over the crawled text).

Design rule: every function here is a **JVM-side built-in expression**
(whole-stage codegen, no Python in the hot path), and each has a
character-for-character SQL twin used by the DuckDB oracle. The twins are
kept in this module (``*_sql`` builders) so Spark and oracle can never
drift apart.

Cross-engine determinism:
  * ``hash64`` = first 15 hex digits of md5, parsed base-16 → a 60-bit
    non-negative int64 that Spark ``conv`` and DuckDB ``CAST('0x…')``
    agree on exactly.
  * ratios are emitted as **micros** (``floor(x * 1e6)`` as BIGINT): floor
    of an exact product is rounding-mode-free, so value hashes can't be
    flipped by HALF_UP vs half-even differences between engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# 64-bit deterministic hash (shared by fingerprinting, MinHash, SimHash)
# ---------------------------------------------------------------------------


def hash64(col: Column) -> Column:
    """60-bit int64 hash of a string column, identical to `hash64_sql`."""
    return F.conv(
        F.substring(F.md5(F.encode(col, "UTF-8")), 1, 15), 16, 10
    ).cast("long")


def hash64_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


# ---------------------------------------------------------------------------
# tokenization
# ---------------------------------------------------------------------------

# word split: whitespace runs; empty tokens dropped (so "" → 0 words)
def words(col: Column) -> Column:
    return F.filter(F.split(F.trim(col), r"\s+"), lambda w: w != "")


def words_sql(expr: str) -> str:
    return (
        f"list_filter(regexp_split_to_array(trim({expr}), '\\s+'), "
        f"x -> x <> '')"
    )


# BPE-ish token regex: alnum runs OR single non-alnum-non-space chars —
# a coarse stand-in for subword tokenizers, identical across engines.
TOKEN_RE = "[A-Za-z0-9]+|[^A-Za-z0-9 \\t\\n]"


def tokens(col: Column) -> Column:
    return F.regexp_extract_all(col, F.lit(TOKEN_RE), 0)


def tokens_sql(expr: str) -> str:
    return f"regexp_extract_all({expr}, '{TOKEN_RE}')"


STOPWORDS = (
    "the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
)

# ---------------------------------------------------------------------------
# micros helper (rounding-mode-free ratio export)
# ---------------------------------------------------------------------------


def micros(col: Column) -> Column:
    return F.floor(col * F.lit(1000000.0)).cast("long")


def micros_sql(expr: str) -> str:
    return f"CAST(FLOOR(({expr}) * 1000000.0) AS BIGINT)"


# ---------------------------------------------------------------------------
# feature columns (Spark side)
# ---------------------------------------------------------------------------


def text_feature_columns(text: Column) -> dict[str, Column]:
    """All quality/token features as named Column expressions."""
    w = words(text)
    n_chars = F.length(text)
    n_words = F.size(w)
    sum_word_len = F.aggregate(
        F.transform(w, F.length), F.lit(0), lambda acc, x: acc + x
    )
    nw = F.greatest(n_words, F.lit(1)).cast("double")
    nc = F.greatest(n_chars, F.lit(1)).cast("double")
    punct = n_chars - F.length(F.regexp_replace(text, r"[.,;:!?]", ""))
    upper = n_chars - F.length(F.regexp_replace(text, "[A-Z]", ""))
    stop = F.size(F.filter(w, lambda x: F.lower(x).isin(*STOPWORDS)))
    stop_ratio = stop.cast("double") / nw
    punct_ratio = punct.cast("double") / nc
    quality = (
        F.least(F.lit(1.0), n_words.cast("double") / F.lit(50.0))
        * (
            F.lit(0.2)
            + F.lit(0.8) * F.least(F.lit(1.0), stop_ratio * F.lit(5.0))
        )
        * (F.lit(1.0) - F.least(F.lit(1.0), punct_ratio * F.lit(4.0)))
    )
    return {
        "n_chars_m": n_chars.cast("long"),
        "n_words": n_words.cast("long"),
        "n_tokens": F.size(tokens(text)).cast("long"),
        "avg_word_len_u": micros(sum_word_len.cast("double") / nw),
        "punct_ratio_u": micros(punct_ratio),
        "upper_ratio_u": micros(upper.cast("double") / nc),
        "stopword_ratio_u": micros(stop_ratio),
        "quality_u": micros(quality),
    }


def text_feature_sql(expr: str) -> dict[str, str]:
    """SQL twins of `text_feature_columns` (DuckDB dialect)."""
    w = words_sql(expr)
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    n_chars = f"length({expr})"
    n_words = f"len({w})"
    sum_word_len = f"COALESCE(list_sum(list_transform({w}, x -> length(x))), 0)"
    nw = f"CAST(GREATEST({n_words}, 1) AS DOUBLE)"
    nc = f"CAST(GREATEST({n_chars}, 1) AS DOUBLE)"
    punct = f"({n_chars} - length(regexp_replace({expr}, '[.,;:!?]', '', 'g')))"
    upper = f"({n_chars} - length(regexp_replace({expr}, '[A-Z]', '', 'g')))"
    stop = f"len(list_filter({w}, x -> list_contains([{stop_list}], lower(x))))"
    stop_ratio = f"(CAST({stop} AS DOUBLE) / {nw})"
    punct_ratio = f"(CAST({punct} AS DOUBLE) / {nc})"
    quality = (
        f"(LEAST(1.0, CAST({n_words} AS DOUBLE) / 50.0) "
        f"* (0.2 + 0.8 * LEAST(1.0, {stop_ratio} * 5.0)) "
        f"* (1.0 - LEAST(1.0, {punct_ratio} * 4.0)))"
    )
    return {
        "n_chars_m": f"CAST({n_chars} AS BIGINT)",
        "n_words": f"CAST({n_words} AS BIGINT)",
        "n_tokens": f"CAST(len({tokens_sql(expr)}) AS BIGINT)",
        "avg_word_len_u": micros_sql(f"CAST({sum_word_len} AS DOUBLE) / {nw}"),
        "punct_ratio_u": micros_sql(punct_ratio),
        "upper_ratio_u": micros_sql(f"CAST({upper} AS DOUBLE) / {nc}"),
        "stopword_ratio_u": micros_sql(stop_ratio),
        "quality_u": micros_sql(quality),
    }


# ---------------------------------------------------------------------------
# language ID (marker-word n-gram heuristic)
# ---------------------------------------------------------------------------

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": (" the ", " and ", " of "),
    "de": (" der ", " und ", " die "),
    "fr": (" le ", " la ", " et "),
    "es": (" el ", " los ", " que "),
    "it": (" di ", " che ", " il "),
}
_LANG_ORDER = tuple(LANG_MARKERS)  # deterministic argmax tie-break


def _occurrences(padded: Column, kw: str) -> Column:
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(kw), F.lit(""))))
        / F.lit(len(kw))
    ).cast("long")


def lang_scores(text: Column) -> dict[str, Column]:
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    return {
        lang: sum(
            (_occurrences(padded, kw) for kw in kws), F.lit(0).cast("long")
        )
        for lang, kws in LANG_MARKERS.items()
    }


def predicted_lang(text: Column) -> Column:
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    expr = F.lit("unknown")
    # build CASE from last to first so earlier langs win ties
    for lang in reversed(_LANG_ORDER):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best == 0, F.lit("unknown")).otherwise(expr)


def predicted_lang_sql(expr: str) -> str:
    padded = f"(' ' || lower({expr}) || ' ')"

    def occ(kw: str) -> str:
        return (
            f"CAST((length({padded}) - "
            f"length(replace({padded}, '{kw}', ''))) / {len(kw)} AS BIGINT)"
        )

    scores = {
        lang: "(" + " + ".join(occ(kw) for kw in kws) + ")"
        for lang, kws in LANG_MARKERS.items()
    }
    best = "GREATEST(" + ", ".join(scores.values()) + ")"
    case = "'unknown'"
    for lang in reversed(_LANG_ORDER):
        case = f"CASE WHEN {scores[lang]} = {best} THEN '{lang}' ELSE {case} END"
    return f"CASE WHEN {best} = 0 THEN 'unknown' ELSE {case} END"


# ---------------------------------------------------------------------------
# document fingerprinting
# ---------------------------------------------------------------------------


def content_hash(text: Column) -> Column:
    """Exact-dup key: md5 hex of the raw text bytes."""
    return F.md5(F.encode(text, "UTF-8"))


def content_hash_sql(expr: str) -> str:
    return f"md5({expr})"


def shingles(text: Column, n: int) -> Column:
    """Distinct word n-gram shingles (space-joined), the MinHash input."""
    w = words(text)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(w) - n, F.lit(0))),
            lambda i: F.array_join(F.slice(w, i + 1, n), " "),
        )
    )


def shingles_sql(expr: str, n: int) -> str:
    w = words_sql(expr)
    return (
        f"list_distinct(list_transform("
        f"generate_series(1, GREATEST(len({w}) - {n - 1}, 1)), "
        f"i -> array_to_string(list_slice({w}, i, i + {n - 1}), ' ')))"
    )


def min_word_hash(text: Column) -> Column:
    """1-permutation MinHash over word shingles — the rolling-fingerprint
    scalar (documents with high shingle overlap collide with prob ≈
    Jaccard)."""
    return F.array_min(F.transform(shingles(text, 3), hash64))


def min_word_hash_sql(expr: str) -> str:
    return (
        f"list_min(list_transform({shingles_sql(expr, 3)}, "
        f"x -> {hash64_sql('x')}))"
    )
