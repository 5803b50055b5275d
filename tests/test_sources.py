"""S1 edge-list scan semantics (SURVEY §2.1) and fuzzed text-feature spec
parity against a pure-Python reimplementation of the documented spec."""

from __future__ import annotations

import math
import random
import re
import string

from pyspark.sql import functions as F

from ps_pagerank_spark.functions.text import (
    STOPWORDS,
    TOKEN_RE,
    text_feature_columns,
)
from ps_pagerank_spark.sources.edgelist import read_edge_list


def test_read_edge_list(spark, tmp_path):
    p = tmp_path / "edges.txt"
    p.write_text(
        "% Matrix-Market style header\n"
        "%% another comment\n"
        "0 1\n"
        "  2   3  \n"
        "4 x\n"  # malformed token → dropped, not a crash (P3)
        "\n"
        "5 6\n"
        "5 6\n"  # duplicate kept (dedup is a separate explicit step)
    )
    rows = [
        (r["src_id"], r["dst_id"])
        for r in read_edge_list(spark, str(p)).collect()
    ]
    assert sorted(rows) == [(0, 1), (2, 3), (5, 6), (5, 6)]


def test_read_edge_list_one_indexed(spark, tmp_path):
    p = tmp_path / "edges1.txt"
    p.write_text("1 2\n3 1\n")
    rows = sorted(
        (r["src_id"], r["dst_id"])
        for r in read_edge_list(spark, str(p), one_indexed=True).collect()
    )
    assert rows == [(0, 1), (2, 0)]


# -- fuzzed text features ----------------------------------------------------


def _py_features(text: str) -> dict:
    """Pure-Python twin of functions/text.py's documented spec."""
    words = [w for w in re.split(r"\s+", text.strip()) if w != ""]
    tokens = re.findall(TOKEN_RE, text)
    n_chars = len(text)
    n_words = len(words)
    nw = float(max(n_words, 1))
    nc = float(max(n_chars, 1))
    punct = len(re.findall(r"[.,;:!?]", text))
    upper = len(re.findall(r"[A-Z]", text))
    stop = sum(1 for w in words if w.lower() in STOPWORDS)
    stop_ratio = stop / nw
    punct_ratio = punct / nc
    quality = (
        min(1.0, n_words / 50.0)
        * (0.2 + 0.8 * min(1.0, stop_ratio * 5.0))
        * (1.0 - min(1.0, punct_ratio * 4.0))
    )
    u = lambda x: math.floor(x * 1000000.0)  # noqa: E731
    return {
        "n_chars_m": n_chars,
        "n_words": n_words,
        "n_tokens": len(tokens),
        "avg_word_len_u": u(sum(len(w) for w in words) / nw),
        "punct_ratio_u": u(punct_ratio),
        "upper_ratio_u": u(upper / nc),
        "stopword_ratio_u": u(stop_ratio),
        "quality_u": u(quality),
    }


def test_text_features_fuzz_vs_python_spec(spark):
    """200 fuzzed ASCII strings (words, punctuation, whitespace runs, empty)
    through the JVM expressions vs the Python spec — all 8 features equal.
    One DataFrame → one Spark job for all examples."""
    rng = random.Random(42)
    alphabet = string.ascii_letters + string.digits
    corpus = ["", " ", "\t\n", "the"]
    for _ in range(196):
        parts = []
        for _ in range(rng.randint(0, 25)):
            r = rng.random()
            if r < 0.15:
                parts.append(rng.choice(list(STOPWORDS)))
            elif r < 0.3:
                parts.append(rng.choice(".,;:!?"))
            else:
                parts.append(
                    "".join(
                        rng.choice(alphabet)
                        for _ in range(rng.randint(1, 10))
                    )
                )
        sep = rng.choice([" ", "  ", " \t ", "\n"])
        corpus.append(sep.join(parts))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    feats = text_feature_columns(F.col("text"))
    got = {
        r["doc_id"]: {k: r[k] for k in feats}
        for r in df.select("doc_id", *[v.alias(k) for k, v in feats.items()])
        .collect()
    }
    for i, text in enumerate(corpus):
        assert got[i] == _py_features(text), (i, repr(text))
