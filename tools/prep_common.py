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

from splade_easy_spark.ops import chunk, lm, pack, pii, quant, sample, vocab

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
    ]
