"""Greedy sequence packing: assign documents to fixed token-budget training
sequences ("example packing", the standard pre-tokenization step that turns
a ragged corpus into dense LM batches without padding waste).

Semantics (deterministic, engine-independent):

- each doc is routed to one of ``n_buckets`` packing buckets by a
  deterministic hash of its id (uniform, stable under retries);
- within a bucket, docs are processed in ascending id order and packed
  first-fit-sequential: a doc opens a new sequence iff the current
  sequence's fill plus the doc's token count exceeds ``budget``
  (strictly — an exactly-full sequence still accepts a 0-token doc);
- a doc longer than the budget therefore always occupies a sequence of
  its own (callers truncate or split upstream if they need hard caps).

Output grain: one row per doc with (bucket, seq_id, offset, n_tokens) —
exactly what a downstream tokenizer join needs to materialize packed rows.

Scale design (100 TB):

- the corpus-wide stages (token counting, bucket routing) are pure
  Catalyst; the only shuffle is the groupBy on the uniform hash bucket;
- packing itself is inherently sequential *within* a bucket (each
  placement depends on the running fill), so it runs as an Arrow-batched
  ``applyInPandas`` kernel per bucket — O(bucket size), no cross-bucket
  coordination.  ``n_buckets`` is the parallelism knob: size it so a
  bucket's (id, n_tokens) pairs — 16 bytes/doc — fit one task comfortably
  (10^6 docs/bucket ≈ 16 MB); at 10^12 docs that is 10^6 buckets, still a
  single healthy shuffle.  Packing quality is unaffected by bucket count
  beyond at most one partial tail sequence per bucket.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from splade_easy_spark.functions.text import tokenize
from splade_easy_spark.ops.dedup import md5_hash64

def _out_schema(id_type: str) -> str:
    return f"bucket int, doc_id {id_type}, seq_id long, offset long, n_tokens long"


def _pack_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
    """Greedy first-fit-sequential packing of one bucket (driver-free,
    Arrow-batched).  Vector in, vector out; the loop is over the bucket's
    docs only."""
    pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
    budget = int(pdf["budget"].iloc[0])
    toks = pdf["n_tokens"].to_numpy()
    seq_ids = [0] * len(toks)
    offsets = [0] * len(toks)
    seq, fill = 0, 0
    for i, t in enumerate(toks):
        t = int(t)
        if fill + t > budget and i > 0 and fill > 0:
            seq += 1
            fill = 0
        seq_ids[i] = seq
        offsets[i] = fill
        fill += t
    return pd.DataFrame(
        {
            "bucket": pdf["bucket"],
            "doc_id": pdf["doc_id"],
            "seq_id": seq_ids,
            "offset": offsets,
            "n_tokens": pdf["n_tokens"],
        }
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    n_buckets: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "pack",
) -> DataFrame:
    """(bucket, doc_id, seq_id, offset, n_tokens): greedy token-budget
    packing as documented above.  ``seq_id`` counts from 0 within each
    bucket; ``offset`` is the doc's start position inside its sequence."""
    # the id keeps its source type (a long cast would silently NULL string
    # ids like this repo's own "conv…#turn" doc_ids); within-bucket order is
    # the id's natural ascending order in that type
    id_type = docs.schema[id_col].dataType.simpleString()
    base = docs.select(
        F.pmod(md5_hash64(F.col(id_col).cast("string"), seed), F.lit(n_buckets))
        .cast("int")
        .alias("bucket"),
        F.col(id_col).alias("doc_id"),
        F.size(tokenize(F.col(text_col))).cast("long").alias("n_tokens"),
        F.lit(int(budget)).alias("budget"),
    )
    return base.groupBy("bucket").applyInPandas(_pack_bucket, _out_schema(id_type))
