"""ps_pagerank_spark — a PySpark-native link-graph analytics engine.

A from-scratch, idiomatic-Spark re-expression of the capabilities of the
reference MKfri/ps-pagerank (serial/OpenMP/OpenCL SpMV PageRank over web link
graphs) plus the surrounding pipeline a web-scale deployment needs: link
extraction from Common-Crawl-style page tables, dictionary-encoded edge
tables, iterative PageRank / connected components / label propagation /
triangle counting, near-duplicate detection, similarity search, and text
analysis — all DataFrame joins/aggregations with vectorized pandas/Arrow UDFs
(never per-row Python UDFs in a hot path).

Design notes (scale-first):
  * Everything is declared with the DataFrame API so Catalyst/AQE own
    predicate pushdown, column pruning, join strategy and skew splitting.
  * Iterative algorithms truncate lineage every iteration
    (``localCheckpoint``) — the Spark analog of the reference's two-buffer
    swap (c-single-threaded/pagerank.c:211-213).
  * Edge tables are hash-partitioned on ``src_id``; skewed destinations are
    handled by salted two-stage aggregation (the role the reference's hybrid
    ELL+COO format plays on GPUs, README.md:80-88).
"""

__version__ = "0.1.0"

from ps_pagerank_spark.session import get_spark  # noqa: F401
