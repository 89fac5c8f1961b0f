"""Scalable deterministic dense doc-int assignment.

Posting compression (delta + varbyte), block-max WAND, and the engine's
pinned tie-break (score DESC, doc_id ASC — resolved on ``doc_int``) all
need ``doc_int`` to equal the **global rank of doc_id** in sort order.  A
global ``row_number()`` window would funnel 100 TB through one partition;
``monotonically_increasing_id`` depends on the physical partitioning
(different ids at local[8] vs local[32]).  Instead, a two-phase plan where
everything wide happens exactly once:

1. **skinny pass** — project ONLY the key column (Catalyst prunes
   text/metadata out of the parquet scan), range-partition it (the range
   sampling sub-pass therefore reads just the key column too), and collect
   per-partition ``(max_key, count)``: that is an *exact* ordered boundary
   list plus exact per-range counts, P rows to the driver;
2. **wide pass** — the full rows get their range bucket from a broadcast
   ``searchsorted`` over those boundaries (a vectorized Arrow kernel fed
   ONLY the key column — wide rows never enter Python; exact: every key was
   seen in pass 1), then ``doc_int = offset[bucket] + row_number() - 1``
   over a JVM window partitioned by bucket (one hash exchange, in-partition
   sort; buckets are balanced by construction so no window-skew).

``doc_int`` = rank of doc_id in the global sort order — independent of
parallelism, boundary sampling, and AQE decisions (boundaries only shape
partition sizes; offset + within-range rank is the global rank regardless),
so the index artifact is identical at any cluster size (required for the
N-vs-4N scaling evidence and resumable rebuilds).  The docs table comes out
range-major sorted by doc_id, which keeps parquet row-group min/max pruning
sharp for point lookups.

Compared to round 1 (range-partition the FULL rows + persist the whole
corpus + count): the sampling pass and the counting pass now read only the
key column, and nothing corpus-sized is ever cached (the round-1 persist
also leaked — never unpersisted — accumulating executor storage under
streaming appenders that assign ids per micro-batch).

Preconditions: ``key`` values are unique (doc_id is the document identity;
duplicate transcript keys should be deduplicated upstream — the append path
does) and the input is deterministic across the two passes (parquet/Iceberg
sources and foreachBatch frames are; a bare ``limit`` is not — materialize
such inputs first, or assigned ids may collide silently).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_doc_ints(df: DataFrame, key: str = "doc_id", partitions: int = 32) -> DataFrame:
    """Add a ``doc_int`` LONG column = dense global rank of ``key`` ascending."""
    # ---- pass 1: skinny — exact range boundaries + counts, P driver rows
    ids = df.select(F.col(key).alias("_k"))
    ranges = (
        ids.repartitionByRange(partitions, F.col("_k"))
        .withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.max("_k").alias("mx"), F.count("*").alias("cnt"))
        .collect()
    )
    ranges.sort(key=lambda r: r["_pid"])
    boundaries = [r["mx"] for r in ranges]  # strictly increasing (unique keys)
    counts = [int(r["cnt"]) for r in ranges]
    offsets = []
    acc = 0
    for c in counts:
        offsets.append(acc)
        acc += c

    spark = df.sparkSession
    b_bounds = spark.sparkContext.broadcast(boundaries)

    # ---- pass 2: wide — bucket by boundary, one exchange, ordinal assign.
    # The bucket kernel receives ONLY the key column (one Arrow-transferred
    # string per row); the ordinal itself is a JVM window over the bucket
    # exchange, so the wide rows (text etc.) never round-trip through
    # Python — a round-1 profile showed the full-row Arrow hop was a real
    # bandwidth term at 10^6 rows, and at 100 TB it would dominate.
    import numpy as np
    from pyspark.sql.types import IntegerType
    from pyspark.sql.window import Window

    @F.pandas_udf(IntegerType())
    def bucket_of(k: pd.Series) -> pd.Series:
        bounds = np.array(b_bounds.value, dtype=object)
        if len(bounds) == 0:
            return pd.Series(np.zeros(len(k), dtype=np.int32))
        # first range whose max >= key — exact, every key was seen in pass 1.
        # Keys ABOVE the last boundary get pos == len(bounds): do NOT raise
        # here — Spark gives no guarantee a Python UDF only sees post-
        # filter/post-join rows (the ArrowEvalPython node is planned below
        # joins when only this side's columns are needed), so when ``df``
        # carries an upstream anti-join this kernel legitimately sees rows
        # the join later removes.  The out-of-range sentinel is checked
        # loudly downstream on rows that actually SURVIVE the plan.
        pos = np.searchsorted(bounds, k.to_numpy(dtype=object), side="left")
        return pd.Series(pos.astype(np.int32))

    # bucket → global offset via a broadcast literal array (the round-2
    # inner join on an offsets table silently DROPPED any row whose key
    # exceeded the pass-1 max boundary — a precondition violation must fail
    # loudly instead, and only for rows that survive the final plan: the
    # raise_error branch lives in a projection ABOVE every join, so phantom
    # pre-join UDF evaluations can't trip it).
    off_arr = F.array(*[F.lit(int(o)).cast("long") for o in offsets]) if offsets else F.array(F.lit(0).cast("long"))
    guarded_off = F.when(F.col("_b") < F.lit(len(offsets)), F.element_at(off_arr, F.col("_b") + 1)).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "assign_doc_ints: key above the pass-1 max boundary: '"
                ),
                F.col(key).cast("string"),
                F.lit(
                    "' — the input is not deterministic across passes; "
                    "materialize it first (see module preconditions)"
                ),
            )
        ).cast("long")
    )
    # the window's own hash exchange on _b is the one wide shuffle (an
    # explicit repartition would just add a second, mismatched exchange)
    w = Window.partitionBy("_b").orderBy(key)
    return (
        df.withColumn("_b", bucket_of(F.col(key)))
        .withColumn("doc_int", F.row_number().over(w) - 1 + guarded_off)
        .drop("_b")
    )
