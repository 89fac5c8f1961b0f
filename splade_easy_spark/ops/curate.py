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
* each near-dup component retains exactly one gate-passing member (the
  min doc_id among its SURVIVING members — a cluster never loses every
  copy just because its absolute-min member failed a gate); the window
  runs only over the gated-and-clustered subset, small relative to the
  corpus.

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
    near-dup component's canonical keeper.

    The keeper is the min doc_id **among the component's gate-passing
    members** — not the component's absolute min: if the absolute-min
    member itself fails a gate, the cluster must still retain its best
    surviving copy instead of silently losing every near-duplicate of a
    good document.  Implemented as ONE window min keyed on
    ``coalesce(comp, doc_id)`` over the gated frame: unclustered docs get
    their own doc_id as the key (singleton groups — they always survive
    and cannot form a skewed null partition), clustered docs share their
    component key.  Single pass over the gating lineage — no split/union
    that would re-run the corpus-wide feature projection per branch."""
    from pyspark.sql import Window

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
    key = F.coalesce(F.col("comp"), F.col(id_col))
    return (
        kept.join(cc.select(F.col("node").alias(id_col), "comp"), id_col, "left")
        .withColumn("_keeper", F.min(id_col).over(Window.partitionBy(key)))
        .where(F.col(id_col) == F.col("_keeper"))
        .select(id_col, "n_tokens", "quality", "pred_lang")
    )
