"""Test-set decontamination: flag training documents sharing word n-grams
with a held-out reference corpus (benchmark/eval sets).

The standard large-scale pretraining hygiene step (GPT-3 App. C, Gopher
§A.4-style n-gram overlap): a training doc is contaminated when it contains
one-or-more word n-grams that also appear in any reference document.

Scale design (100 TB training side, small-to-medium reference side):

- both sides shingle JVM-side (``word_shingles`` — tokenize + slice, pure
  Catalyst, no Python) and hash each distinct shingle to an int64
  (``md5_hash64``), so the join key is 8 bytes, never the shingle string;
- the reference side reduces to DISTINCT hashes BEFORE the join — for real
  eval suites (thousands of docs) that frame is megabytes and Spark/AQE
  broadcasts it, making the whole operator one corpus scan with a map-side
  semi-join (no shuffle of the training side); a huge reference degrades
  gracefully to a hash-partitioned join on the int64 key;
- output is doc-grain (one aggregation over the matched shingles only —
  docs with zero hits are restored via left join so the result covers
  every input doc).

No tunable beyond ``shingle_k`` and ``min_hits``; exactly reproducible in
the DuckDB oracle (same tokenizer regex, same 32-bit-in-a-long md5 hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from splade_easy_spark.ops.dedup import md5_hash64, word_shingles


def _distinct_shingle_hashes(
    df: DataFrame, id_col: str, text_col: str, shingle_k: int
) -> DataFrame:
    """(id, sh) — one row per DISTINCT shingle hash per doc.  Distinct is
    taken inside the array (array_distinct, JVM) before the explode so the
    exploded row count is bounded by distinct shingles, not raw length."""
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.transform(
                F.array_distinct(word_shingles(F.col(text_col), shingle_k)),
                lambda s: md5_hash64(s),
            )
        ).alias("sh"),
    )


def ngram_contamination(
    docs: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_id_col: str = "doc_id",
    ref_text_col: str = "text",
    shingle_k: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Per-doc contamination report against ``reference``.

    Returns one row per input doc:
    ``(doc_id, n_shingles, n_hit, contam_frac, contaminated)`` where
    ``n_shingles`` counts the doc's distinct word ``shingle_k``-grams,
    ``n_hit`` how many of those also occur anywhere in the reference,
    ``contam_frac = n_hit / n_shingles`` (0.0 when the doc is too short to
    have any shingle) and ``contaminated = n_hit >= min_hits``.

    Decontaminating a corpus is then one anti-join:
    ``docs.join(report.where("contaminated"), id, "left_anti")``.
    """
    doc_sh = _distinct_shingle_hashes(docs, id_col, text_col, shingle_k)
    ref_sh = (
        _distinct_shingle_hashes(reference, ref_id_col, ref_text_col, shingle_k)
        .select("sh")
        .distinct()
    )
    hits = (
        doc_sh.join(ref_sh, "sh")  # AQE broadcasts the reduced ref side
        .groupBy("id")
        .agg(F.count("*").alias("n_hit"))
    )
    per_doc = docs.select(
        F.col(id_col).alias("id"),
        F.size(
            F.array_distinct(word_shingles(F.col(text_col), shingle_k))
        ).alias("n_shingles"),
    )
    return (
        per_doc.join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_shingles",
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
            F.round(
                F.when(
                    F.col("n_shingles") > 0,
                    F.coalesce(F.col("n_hit"), F.lit(0)).cast("double")
                    / F.col("n_shingles").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("contam_frac"),
            (F.coalesce(F.col("n_hit"), F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )
