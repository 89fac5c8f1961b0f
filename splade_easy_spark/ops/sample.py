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


def temperature_mix(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    seed: str = "sample",
    hash_fn=md5_hash64,
) -> DataFrame:
    """Temperature-based source re-weighting (the T5/multilingual-LM mix):
    downsample so post-sample counts are proportional to ``n_s^alpha``
    (``alpha < 1`` flattens the source distribution toward uniform,
    ``alpha = 1`` is a no-op).  Downsample-only — no row is ever
    duplicated — so the realized mix is ``m_s = k * n_s^alpha`` with
    ``k = min_s n_s^(1-alpha)``: the smallest stratum keeps rate 1.0 and
    every larger one is gated down toward the temperature distribution.

    All in one plan: a strata-grain count agg (tiny — strata cardinality),
    a 1-row global min for ``k``, a broadcast join of the per-stratum
    rates back onto the scan, and the same deterministic hash gate as
    ``stratified_sample`` (stable under retries, nested across alphas in
    the same hash space).  The only full-data pass is the final gated
    scan; nothing about the plan changes at 1000 executors.

    Rates are rounded to the gate's 1e-6 grain *before* the compare so an
    oracle restating the same arithmetic (e.g. DuckDB ``pow``) cannot
    diverge on a final-ulp difference.

    A NULL stratum is a stratum: ``groupBy`` counts it and the rate join
    is null-safe, so NULL-source rows get their own temperature rate
    instead of silently vanishing through an inner join (while still
    deflating ``k`` for everyone else).
    """
    counts = df.groupBy(strata_col).agg(F.count("*").alias("_n"))
    k = counts.agg(
        F.min(F.pow(F.col("_n").cast("double"), F.lit(1.0 - alpha))).alias("_k")
    )
    rates = (
        counts.crossJoin(F.broadcast(k))
        .select(
            F.col(strata_col),
            F.round(
                F.least(
                    F.lit(1.0),
                    F.col("_k") * F.pow(F.col("_n").cast("double"), F.lit(alpha - 1.0)),
                )
                * _M,
                0,
            )
            .cast("long")
            .alias("_thr"),
        )
    )
    bucket = F.pmod(hash_fn(F.col(id_col).cast("string"), seed), F.lit(_M))
    rates = rates.withColumnRenamed(strata_col, "_strata")
    return (
        df.join(
            F.broadcast(rates),
            F.col(strata_col).eqNullSafe(F.col("_strata")),
        )
        .where(bucket < F.col("_thr"))
        .drop("_strata", "_thr")
    )


def source_cap(
    df: DataFrame,
    strata_col: str,
    cap: int,
    id_col: str = "doc_id",
    seed: str = "sample",
    hash_fn=md5_hash64,
    overshoot: float = 4.0,
) -> DataFrame:
    """Keep at most ``cap`` rows per stratum — the per-domain contribution
    cap every web-corpus pipeline (C4, RefinedWeb) applies so no single
    domain dominates training.  Selection is the ``cap`` smallest
    deterministic hashes within each stratum (ties broken by id), i.e. a
    uniform, retry-stable choice — NOT "first cap rows seen", which would
    depend on partition layout.

    Scale design: a naive ``row_number() OVER (PARTITION BY source)``
    sorts every giant domain inside one task.  Instead a *hash-prefix
    pre-gate* runs first: keep rows with ``hash < overshoot*cap/n_s`` of
    the hash space (per-stratum thresholds broadcast from a tiny count
    agg), shrinking each stratum to ~``overshoot*cap`` survivors before
    the window — partitions stay bounded regardless of domain size.
    Exactness is unconditional, not probabilistic: the gate keeps a
    PREFIX of the hash order, so whenever ``>= min(cap, n_s)`` rows
    survive, the window's top-``cap`` equals the unrestricted top-``cap``;
    a survivor-count check raises loudly in the astronomically unlikely
    shortfall (Chernoff bound at overshoot=4) instead of silently
    under-selecting — re-run with a larger ``overshoot``.

    A NULL stratum is a stratum (scraped-web metadata routinely has
    missing sources): every join here is null-safe, so NULL-source rows
    are capped like any other group rather than dropped or tripping the
    exactness check.
    """
    bucket = F.pmod(hash_fn(F.col(id_col).cast("string"), seed), F.lit(_M))
    counts = df.groupBy(strata_col).agg(F.count("*").alias("_n"))
    thr = counts.select(
        F.col(strata_col),
        F.least(
            F.lit(_M),
            F.ceil(F.lit(float(overshoot * cap)) * _M / F.col("_n")).cast("long"),
        ).alias("_gate"),
        F.col("_n"),
    )
    # null-safe joins throughout: a NULL stratum is a stratum (groupBy
    # counts it, the window partitions it) — an inner equi-join would
    # silently drop its rows and then trip the exactness check
    thr = thr.withColumnRenamed(strata_col, "_strata")
    surv = (
        df.withColumn("_h", bucket)
        .join(
            F.broadcast(thr), F.col(strata_col).eqNullSafe(F.col("_strata"))
        )
        .where(F.col("_h") < F.col("_gate"))
        .drop("_strata")
    )
    # loud exactness check: every stratum must keep >= min(cap, n_s)
    # survivors for the prefix argument to hold (driver-sized agg).  LEFT
    # join from the counts frame — a stratum whose survivors are EMPTY
    # must still be caught, and it has no survivor group to count.
    surv_counts = (
        surv.groupBy(strata_col)
        .agg(F.count("*").alias("_s"))
        .withColumnRenamed(strata_col, "_strata")
    )
    short = (
        counts.join(
            surv_counts,
            F.col(strata_col).eqNullSafe(F.col("_strata")),
            "left",
        )
        .where(F.coalesce("_s", F.lit(0)) < F.least(F.lit(cap), F.col("_n")))
        .collect()
    )
    if short:
        raise RuntimeError(
            f"source_cap pre-gate undershot for strata {[r[0] for r in short]} "
            f"(survivors < min(cap, n)); re-run with overshoot > {overshoot}"
        )
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(F.asc("_h"), F.asc(id_col))
    return (
        surv.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= cap)
        .drop("_h", "_gate", "_n", "_rk")
    )


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
