"""Unigram language-model scoring: per-document average token log-probability
under the corpus's own unigram distribution — the cheap statistical
fluency / outlier filter big pipelines run before (or instead of) a neural
perplexity pass.  A doc of globally-rare tokens scores low; boilerplate of
head tokens scores high; both tails get inspected or cut.

Model: ``p(t) = total_tf(t) / T`` over the scoring corpus itself (or any
corpus the caller computed stats on), optionally add-k smoothed.  Score:

    avg_logprob(d) = sum_t tf(d,t) * ln p(t) / len(d)

Scale design (100 TB):

- term stats come from ``ops.vocab.build_vocab``-shaped aggregation (one
  map-side-combined term agg) or are passed in precomputed — scoring a
  corpus against a *reference* corpus's LM is the same join;
- the per-doc score is doc-grain: doc_term_tf → broadcast-join the
  vocab-sized stats frame → one doc-grain aggregation.  The only corpus-
  sized shuffle is the doc_term_tf groupBy that every text op shares;
- **at real scale pass ``stats`` precomputed** (e.g. a persisted
  ``build_vocab`` output): the default self-corpus mode is a convenience
  that lazily re-derives the tokenize subtree for the stats and totals
  branches (3 corpus scans in one plan — fine at test scale, wasteful at
  100 TB).  With a materialized stats table the corpus is scanned once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from splade_easy_spark.adhoc import doc_term_tf


def unigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stats: DataFrame | None = None,
    smooth_k: float = 0.0,
) -> DataFrame:
    """(doc_id, n_tokens, sum_logprob, avg_logprob): unigram LM score per
    doc.  ``stats`` is an optional precomputed (term, total_tf) frame (e.g.
    from a reference corpus); default is the scoring corpus itself.  With
    ``smooth_k`` > 0, ``p(t) = (tf_t + k) / (T + k*V)`` (add-k over the
    stats vocabulary; unseen terms — possible only with external ``stats``
    — get the k-mass).  Zero-token docs have no terms and are absent from
    the output (callers LEFT-join if they need an explicit row).
    """
    # doc_term_tf's grain column is named "id"; restore the caller's name
    tt = doc_term_tf(docs, id_col=id_col, text_col=text_col).select(
        F.col("id").alias(id_col), "term", "tf"
    )
    if stats is None:
        # total_tf(t) = total token occurrences of t, so the self-corpus
        # stats branch needs no (doc, term) grain: a pure-JVM token explode
        # + map-side-combined count replaces a SECOND run of the doc_term_tf
        # Python kernel (the stats and scoring branches are separate plan
        # subtrees — Catalyst cannot share the opaque kernel between them,
        # so the previous formulation tokenized and counted the corpus
        # twice through Python).  Values are identical: Σ_d tf(d,t) ≡
        # count of t.  At bench scale the wall-clock gain sits inside this
        # row's noise band (±2x across runs); the win is the removed
        # Python boundary pass, which grows with corpus size.
        from splade_easy_spark.functions.text import tokenize

        stats = (
            docs.select(F.explode(tokenize(F.col(text_col))).alias("term"))
            .groupBy("term")
            .agg(F.count("*").alias("total_tf"))
        )
    totals = stats.agg(
        F.sum("total_tf").alias("_T"), F.count("*").alias("_V")
    )
    joined = (
        tt.join(F.broadcast(stats.select("term", "total_tf")), "term", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            "tf",
            # Spark's log() yields NULL (not -inf) at 0 — coalesce so an
            # unsmoothed OOV term poisons the doc's score loudly instead of
            # being silently dropped from the sum
            F.coalesce(
                F.log(
                    (F.coalesce(F.col("total_tf"), F.lit(0)).cast("double") + F.lit(float(smooth_k)))
                    / (F.col("_T").cast("double") + F.lit(float(smooth_k)) * F.col("_V"))
                ),
                F.lit(float("-inf")),
            ).alias("_lp"),
        )
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("_lp")).alias("sum_logprob"),
        )
        .select(
            id_col,
            "n_tokens",
            "sum_logprob",
            (F.col("sum_logprob") / F.col("n_tokens")).alias("avg_logprob"),
        )
    )
