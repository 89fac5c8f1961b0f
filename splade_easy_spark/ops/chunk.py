"""Sliding-window document chunking: split long documents into fixed
token-budget windows with overlap — the pre-tokenization counterpart of
``ops.pack`` (pack joins short docs; chunk splits long ones).  Context-
window prep for embedding models and LM training both start here.

Semantics (deterministic, engine-independent):

- tokens are the analyzer's (lowercase ``[a-z0-9]+`` runs, the same
  tokenizer the index and oracles share);
- window starts are ``0, stride, 2*stride, …`` with
  ``stride = size - overlap``; the last start is the smallest multiple of
  ``stride`` that still covers the final token, so every token lands in
  ≥1 chunk and no fully-redundant tail window is emitted;
- a doc with ≤ ``size`` tokens (including an empty doc) yields exactly one
  chunk starting at 0.

Scale design (100 TB): pure Catalyst — tokenize, ``sequence`` for the
start list, ``posexplode``, ``slice`` — one corpus scan, zero shuffle,
zero Python; the explode multiplies rows by ~n_tokens/stride, which is
the output's inherent size, not an intermediate blow-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from splade_easy_spark.functions.text import tokenize


def chunk_documents(
    docs: DataFrame,
    size: int = 256,
    overlap: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, chunk_id, start, n_tokens, chunk_text): sliding windows of
    ``size`` tokens every ``size - overlap`` tokens.  ``chunk_id`` counts
    from 0 per doc; ``start`` is the 0-based token offset; ``chunk_text``
    re-joins the window's tokens with single spaces (normalized text — the
    analyzer already lowercased and split it).  ``passthrough`` columns are
    carried doc-grain onto every chunk row (the same no-re-join chaining
    convention as the textstats ops)."""
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got size={size} overlap={overlap}")
    stride = size - overlap
    toks = tokenize(F.col(text_col))
    n = F.size(toks)
    # smallest start multiple of stride with start + size >= n (and >= 0):
    # ceil((n - size) / stride) * stride, clamped at 0
    last = F.greatest(
        F.lit(0), F.ceil((n - F.lit(size)) / F.lit(stride)).cast("long") * stride
    )
    pt = list(passthrough)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        *pt,
        toks.alias("_toks"),
        F.sequence(F.lit(0).cast("long"), last, F.lit(stride).cast("long")).alias("_starts"),
    )
    pos = F.posexplode("_starts")
    return (
        base.select("doc_id", *pt, "_toks", pos.alias("chunk_id", "start"))
        .select(
            "doc_id",
            *pt,
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.col("start").cast("long").alias("start"),
            F.slice("_toks", F.col("start").cast("int") + 1, size).alias("_w"),
        )
        .select(
            "doc_id",
            *pt,
            "chunk_id",
            "start",
            F.size("_w").cast("long").alias("n_tokens"),
            F.array_join("_w", " ").alias("chunk_text"),
        )
    )
