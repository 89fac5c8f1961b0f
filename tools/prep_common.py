"""Single source of truth for the prep-op benchmark suite.

``bench.py`` (the per-round artifact of record) and
``tools/prep_scaling.py`` (the two-parallelism scaling evidence) time the
SAME op invocations with the SAME parameters by building them here — a
parameter change edits one place and moves both, so the bench rows and
the scaling table can never silently diverge.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from splade_easy_spark.ops import chunk, dedup, lm, pack, pii, quant, sample, vocab
from splade_easy_spark.ops.semdedup import semdedup

SAMPLE_RATES = {"en": 0.8, "de": 0.5, "fr": 0.25}


def prep_bench_ops(
    docs: DataFrame, emb: DataFrame
) -> list[tuple[str, Callable[[], object]]]:
    """``[(name, thunk)]`` — each thunk drives one prep op to completion
    through a driver-sized aggregate (count/sum), so timing it times the
    full distributed plan and nothing else."""
    return [
        (
            "pii_scan",
            lambda: pii.pii_scan(docs).agg(F.sum("n_pii"), F.count("*")).collect(),
        ),
        (
            "chunk",
            lambda: chunk.chunk_documents(docs, size=64, overlap=8)
            .agg(F.count("*"), F.sum("n_tokens"))
            .collect(),
        ),
        (
            "vocab",
            lambda: vocab.build_vocab(docs, min_df=2, max_df_frac=0.5)
            .agg(F.count("*"))
            .collect(),
        ),
        (
            "unigram_lm",
            lambda: lm.unigram_logprob(docs)
            .agg(F.avg("avg_logprob"), F.count("*"))
            .collect(),
        ),
        (
            "pack",
            lambda: pack.pack_sequences(docs, budget=512, n_buckets=64)
            .agg(F.count("*"), F.max("seq_id"))
            .collect(),
        ),
        (
            "sample",
            lambda: sample.stratified_sample(
                docs, "lang", SAMPLE_RATES, default_rate=0.1
            )
            .agg(F.count("*"))
            .collect(),
        ),
        (
            "quantize",
            lambda: quant.quantize_embeddings(emb)
            .agg(F.sum("mse"), F.count("*"))
            .collect(),
        ),
        (
            "dup_ngrams",
            # corpus-wide duplicated 5-gram spans: the gram stream (~one
            # row per token) through one window exchange + one doc agg
            lambda: dedup.dup_ngram_spans(docs, n=5, min_count=2)
            .agg(F.sum("n_dup_grams"), F.sum("dup_tokens"), F.count("*"))
            .collect(),
        ),
        (
            "semdedup",
            # the corpus-scaling part of SemDeDup — within-cell pair scan
            # + connected components + the full-corpus label join — over a
            # pushed-filter 50k slice with precomputed hash cells standing
            # in for the cluster assignment.  The sample-fit KMeans is
            # deliberately OUTSIDE the timing: it is a once-per-corpus
            # O(sample) cost (measured separately: ~40 s at ANY toy slice
            # size, dominated by driver iteration rounds, amortized to
            # noise at real scale), while this row is the per-corpus-byte
            # cost.  Uniform synthetic vectors have ~no dups at cos 0.9;
            # the pair-scan work is τ-independent.  256 cells ≈ 195/cell
            # ≈ 4.8M within-cell cosines.
            lambda: semdedup(
                emb.where(F.col("vec_id") < 50_000).withColumn(
                    "cell", F.pmod(F.xxhash64("vec_id"), F.lit(256)).cast("int")
                ),
                threshold=0.9,
                assign_col="cell",
            )
            .agg(F.sum(F.col("keep").cast("long")), F.count("*"))
            .collect(),
        ),
    ]
