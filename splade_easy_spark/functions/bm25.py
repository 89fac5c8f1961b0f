"""BM25 as Catalyst column expressions.

BM25 factors into a *document-side* weight per (term, doc) and a
*query-side* weight per term, making the score a sparse dot product — the
exact algebra of the reference's two-pointer kernel
(``src/splade_easy/scoring.py:30-56``: ``sum(dw_i * qw_j)`` over the sorted
intersection).  Plugging these weights into that algebra is what makes the
reference retriever a drop-in oracle for our engine (SURVEY.md §7 step 2).

All math is DoubleType: the reference accumulates in float64 over float32
inputs (``src/splade_easy/scoring.py:37``), and double keeps the DuckDB
oracle comparable at 1e-5 (the reference's own test tolerance,
``tests/test_scoring.py:20``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from splade_easy_spark.config import BM25Params


def idf_expr(df_col: Column, n_docs: Column | int) -> Column:
    """Lucene-style non-negative idf: ``ln(1 + (N - df + 0.5)/(df + 0.5))``."""
    n = F.lit(float(n_docs)) if isinstance(n_docs, (int, float)) else n_docs.cast("double")
    dfd = df_col.cast("double")
    return F.log(F.lit(1.0) + (n - dfd + F.lit(0.5)) / (dfd + F.lit(0.5)))


def bm25_weight_expr(
    tf_col: Column,
    doc_len_col: Column,
    avgdl: Column | float,
    idf_col: Column,
    params: BM25Params | None = None,
) -> Column:
    """Doc-side BM25 weight: ``idf * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))``."""
    p = params or BM25Params()
    tf = tf_col.cast("double")
    dl = doc_len_col.cast("double")
    ad = F.lit(float(avgdl)) if isinstance(avgdl, (int, float)) else avgdl.cast("double")
    k1, b = F.lit(p.k1), F.lit(p.b)
    denom = tf + k1 * (F.lit(1.0) - b + b * dl / ad)
    return idf_col * (tf * (k1 + F.lit(1.0))) / denom
