"""Deterministic corpus sampling / data mixing for training pipelines.

Every large-scale pretraining run re-weights its sources ("data mixing"):
keep 100% of curated text, 50% of web, 10% of logs, etc.  Doing it with
``DataFrame.sample`` is non-reproducible across retries and cluster sizes;
the standard trick is a *deterministic hash gate* — keep a row iff
``hash(id) mod M < rate * M``.  Properties that matter at 100 TB:

- **Stable under retries / speculative execution / repartitioning**: the
  keep decision depends only on the row's id, never on partition layout or
  RNG state, so a re-run (or the DuckDB oracle) selects the identical set.
- **Nested**: the kept set at rate 0.1 is a subset of the kept set at
  rate 0.5 (same hash, same threshold direction) — lets a pipeline carve
  progressively smaller mixes without resampling.
- **Zero shuffle**: a pure Catalyst filter over the scan; at cluster scale
  it composes with partition pruning and never materializes the rejects.

Hashing is ``md5_hash64`` (first-8-hex-of-md5 → BIGINT) so the oracle is
bit-exact; swap ``xxhash64`` via ``hash_fn`` in production for speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from splade_easy_spark.ops.dedup import md5_hash64

#: hash-space modulus: rates are resolved at 1e-6 granularity
_M = 1_000_000


def sample_gate(
    id_col: Column, rate: float, seed: str = "sample", hash_fn=md5_hash64
) -> Column:
    """Boolean keep-gate: deterministic in the id, uniform over the corpus.

    ``pmod`` (not ``%``) because the 32-bit-in-a-long md5 hash is
    non-negative, but production ``xxhash64`` is signed."""
    bucket = F.pmod(hash_fn(id_col.cast("string"), seed), F.lit(_M))
    return bucket < F.lit(int(round(rate * _M)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    id_col: str = "doc_id",
    seed: str = "sample",
    hash_fn=md5_hash64,
) -> DataFrame:
    """Keep each row of stratum ``s`` with probability ``rates[s]``
    (``default_rate`` for unlisted strata), deterministically in
    ``id_col``.  One scan, no shuffle; the per-stratum rate resolves to a
    CASE chain the optimizer folds into the gate predicate.

    Mirrors the mixture-sampling stage every pretraining pipeline runs
    before tokenization.  Spark's own ``sampleBy`` is seed-stable only
    within one partition layout; this gate is stable always.
    """
    rate = F.lit(int(round(default_rate * _M)))
    # deterministic iteration order → deterministic (and oracle-identical) plan
    for s in sorted(rates):
        rate = F.when(F.col(strata_col) == s, F.lit(int(round(rates[s] * _M)))).otherwise(rate)
    bucket = F.pmod(hash_fn(F.col(id_col).cast("string"), seed), F.lit(_M))
    return df.where(bucket < rate)


def mixture_counts(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    id_col: str = "doc_id",
    seed: str = "sample",
) -> DataFrame:
    """Audit frame for a mix: per stratum, rows in vs rows kept vs target
    rate — the sanity table a pipeline materializes next to the sample."""
    gated = stratified_sample(df, strata_col, rates, default_rate, id_col, seed)
    total = df.groupBy(strata_col).agg(F.count("*").alias("n_in"))
    kept = gated.groupBy(strata_col).agg(F.count("*").alias("n_kept"))
    return (
        total.join(kept, strata_col, "left")
        .select(
            F.col(strata_col),
            "n_in",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )
