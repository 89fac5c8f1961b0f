"""Vocabulary construction over a document corpus.

The tokenizer-training / feature-hashing prerequisite of every text
pipeline: scan the corpus once, count per-term document frequency and
collection frequency, drop too-rare and too-common terms, rank, and assign
stable integer ids.

Scale design (100 TB corpus):

- the only shuffle is the term-grain aggregation, and it is map-side
  combined (partial ``count``/``sum`` per partition before the exchange) —
  the exchanged frame is vocab-sized, not corpus-sized;
- ``min_df`` / ``max_df_frac`` filters apply to the aggregated frame
  (vocab-sized) before the ranking window;
- the ranking window is a single global sort over the *surviving* vocab
  (bounded by ``max_size`` after rank filter).  At extreme vocab sizes
  Spark executes ``row_number`` over one partition — acceptable because
  the frame is term-grain, millions of rows, not the corpus.  Ordering is
  total (df desc, term asc) so ids are deterministic across runs/engines.

Reference behavior: splade-easy keeps its vocabulary implicit in the
encoder; this engine materializes it the way a from-scratch sparse
pipeline must (ref: src/splade_easy/index.py builds per-term postings but
never thresholds — thresholding is the scale addition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from splade_easy_spark.adhoc import doc_term_tf


def build_vocab(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df_frac: float = 1.0,
    max_size: int | None = None,
) -> DataFrame:
    """(term, df, total_tf, vocab_id) — vocab_id dense from 0 in
    (df desc, term asc) order after the df-threshold filters.

    ``max_df_frac`` is a fraction of n_docs (stopword cut); ``min_df`` an
    absolute floor (hapax cut); ``max_size`` keeps the top-N ranked terms.
    """
    tt = doc_term_tf(docs, id_col=id_col, text_col=text_col)
    stats = tt.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("total_tf")
    )
    # n_docs via a broadcast cross join of a 1-row agg: stays ONE lazy plan
    # (no driver-side count job), and the max_df threshold is evaluated on
    # the vocab-sized frame only.
    nd = docs.agg(F.count("*").alias("_n_docs"))
    kept = (
        stats.crossJoin(F.broadcast(nd))
        .where(
            (F.col("df") >= min_df)
            & (F.col("df") <= F.floor(F.lit(float(max_df_frac)) * F.col("_n_docs")))
        )
        .drop("_n_docs")
    )
    w = Window.orderBy(F.desc("df"), F.asc("term"))
    ranked = kept.withColumn("vocab_id", F.row_number().over(w) - 1)
    if max_size is not None:
        ranked = ranked.where(F.col("vocab_id") < max_size)
    return ranked.select("term", "df", "total_tf", "vocab_id")
