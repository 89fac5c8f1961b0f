"""End-to-end training-data curation: the composition a 100 TB pretraining
pipeline actually runs — quality gate ∧ language gate ∧ near-duplicate
canonicalization — as ONE declarative Spark plan.

Plan shape (and why it scales):

* quality + language features are chained through a single projection
  (``passthrough`` columns, no doc_id re-join) — pure Catalyst, scan
  speed, one pass over the corpus;
* near-dup handling reuses the banded MinHash-LSH candidate pairs
  (never all-pairs) and ``connected_components`` (O(log n) rounds over
  the pair list, which is orders of magnitude smaller than the corpus);
* the final anti-join removes every clustered doc EXCEPT its component's
  min-id canonical — the drop list is component-members-minus-keepers,
  small relative to the corpus, and AQE broadcast/skew handling applies.

The whole thing is SQL-expressible, so the driver gate checks it
value-exactly against DuckDB (quality CTE ⨝ language CTE, minus the
recursive-CTE cluster drop list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from splade_easy_spark.ops.dedup import connected_components, minhash_lsh_candidates
from splade_easy_spark.ops.textstats import language_id, quality_features


def curate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.9,
    min_tokens: int = 20,
    lang: str | None = "en",
    shingle_k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Surviving documents with their curation features:
    ``(doc_id, n_tokens, quality, pred_lang)`` for every doc that passes
    the quality/length/language gates AND is either unclustered or its
    near-dup component's canonical keeper (min doc_id)."""
    feats = quality_features(df, id_col, text_col, passthrough=(text_col,))
    both = language_id(feats, id_col, text_col, passthrough=("n_tokens", "quality"))
    kept = both.where(
        (F.col("quality") >= min_quality) & (F.col("n_tokens") >= min_tokens)
    )
    if lang is not None:
        kept = kept.where(F.col("pred_lang") == lang)

    pairs = minhash_lsh_candidates(
        df, id_col, text_col, shingle_k=shingle_k, num_hashes=num_hashes, bands=bands
    )
    cc = connected_components(pairs, src="id_a", dst="id_b")
    drop = cc.where(F.col("node") != F.col("comp")).select(
        F.col("node").alias(id_col)
    )
    return kept.join(drop, id_col, "left_anti").select(
        id_col, "n_tokens", "quality", "pred_lang"
    )
