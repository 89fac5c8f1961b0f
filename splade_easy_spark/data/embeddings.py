"""Deterministic synthetic embeddings for tests/benchmarks: every value is
a pure function of (row id, dimension index) via xxhash64, so any two
generators — different sessions, different partitionings, the scaling
harness and the per-round bench — produce the identical table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synthetic_embeddings(
    spark: SparkSession, n: int, dim: int = 64, id_col: str = "vec_id"
) -> DataFrame:
    """``n`` rows of (``id_col`` BIGINT, embedding ARRAY<FLOAT>), values
    uniform in [-0.5, 0.5] (scaled integers — exactly reproducible)."""
    return spark.range(n).select(
        F.col("id").alias(id_col),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: (
                (F.pmod(F.xxhash64(F.col("id"), i), F.lit(2001)) - 1000) / 1000.0
            ).cast("float"),
        ).alias("embedding"),
    )
