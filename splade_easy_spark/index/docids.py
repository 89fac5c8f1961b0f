"""Scalable deterministic dense doc-int assignment.

Posting compression (delta + varbyte) and block-max WAND both need a total
integer order over documents.  A global ``row_number()`` window would funnel
100 TB through one partition; ``monotonically_increasing_id`` depends on the
physical partitioning (different ids at local[8] vs local[32]).  Instead:
the classic two-phase zip-with-index —

1. range-partition + sort by ``doc_id`` (one shuffle, the sort we'd need
   anyway for an ordered docs table);
2. count rows per partition (cheap agg), cumulative offsets on the driver
   (P integers, tiny), broadcast;
3. a ``mapInPandas`` pass adds ``offset[pid] + local ordinal``.

The resulting ``doc_int`` equals the *rank of doc_id in the global sort
order* — independent of partition count or boundary sampling, so the index
artifact is identical at any parallelism (required for the N-vs-4N scaling
evidence and for resumable rebuilds).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_doc_ints(df: DataFrame, key: str = "doc_id", partitions: int = 32) -> DataFrame:
    """Add a ``doc_int`` LONG column = dense rank of ``key`` ascending."""
    parted = (
        df.repartitionByRange(partitions, F.col(key))
        .sortWithinPartitions(key)
        .withColumn("_pid", F.spark_partition_id())
    )
    parted = parted.persist()
    counts = {r["_pid"]: r["cnt"] for r in parted.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    spark = df.sparkSession
    b_offsets = spark.sparkContext.broadcast(offsets)
    out_schema = parted.drop("_pid").schema.add("doc_int", "long", False)

    def add_ordinal(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            start = b_offsets.value.get(pid, 0) + local
            out = pdf.drop(columns=["_pid"])
            out["doc_int"] = range(start, start + len(pdf))
            local += len(pdf)
            yield out

    result = parted.mapInPandas(add_ordinal, schema=out_schema)
    return result
