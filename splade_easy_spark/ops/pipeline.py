"""The full pretraining data-prep pipeline as ONE composed Spark plan:

    curate (quality ∧ length ∧ language ∧ near-dup-canonical)
      → deterministic sample (data mixing)
        → sliding-window chunk (context-window prep)

i.e. exactly the chain a 100 TB corpus walks between "raw crawl" and
"tokenizer input".  Each stage reuses the standalone op (``ops.curate``,
``ops.sample``, ``ops.chunk``) — the composition adds no new semantics,
only the plumbing that keeps it ONE plan:

- the sample gate is a pure filter on the curated survivors (zero cost,
  no extra scan);
- the chunker consumes ``docs ⨝ sampled-survivors`` — one doc-grain hash
  join (the unavoidable re-read of text for the surviving subset; curate
  reduced the corpus first, so the join's left side is the full docs scan
  but its output — and everything after — is survivors-sized), with the
  survivors' (quality, pred_lang) carried through the chunker's
  passthrough so no post-chunk re-join is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from splade_easy_spark.ops.chunk import chunk_documents
from splade_easy_spark.ops.curate import curate_corpus
from splade_easy_spark.ops.sample import sample_gate


def prep_training_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sample_rate: float = 1.0,
    sample_seed: str = "prep",
    chunk_size: int = 256,
    chunk_overlap: int = 32,
    **curate_kwargs,
) -> DataFrame:
    """(doc_id, quality, pred_lang, chunk_id, start, n_tokens, chunk_text):
    one chunk row per window of every curated, sampled document.
    ``curate_kwargs`` forward to :func:`ops.curate.curate_corpus`."""
    survivors = curate_corpus(docs, id_col=id_col, text_col=text_col, **curate_kwargs)
    meta = survivors.select(F.col(id_col).alias("doc_id"), "quality", "pred_lang")
    if sample_rate < 1.0:
        meta = meta.where(sample_gate(F.col("doc_id"), sample_rate, sample_seed))
    kept = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).join(meta, "doc_id")
    return chunk_documents(
        kept,
        size=chunk_size,
        overlap=chunk_overlap,
        passthrough=("quality", "pred_lang"),
    )
