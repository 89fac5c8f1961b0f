"""Deterministic corpus shuffling for training order.

Every pretraining run wants its corpus in a *reproducible* pseudo-random
order: the same seed must yield the same epoch ordering across retries,
cluster sizes, and re-runs (else a resumed job trains on a different
stream).  ``DataFrame.orderBy(rand())`` fails both requirements; the
standard construction is *rank of a deterministic hash*:

    ord(doc) = rank of (hash(seed:id), id) over the corpus

The rank itself is the interesting part at scale.  A naive
``row_number() OVER (ORDER BY hash)`` is a single-partition window — one
task sorts 100 TB.  This implementation is the classic distributed rank
(what RDD ``zipWithIndex`` does, expressed on DataFrames):

1. ``repartitionByRange`` on ``(hash, id)`` — ascending key ranges land
   in ascending partition ids, each partition locally sorted.
2. ``localCheckpoint`` the partitioned frame: range boundaries come from
   a SAMPLING pass whose boundaries are not guaranteed identical across
   re-executions, and the two downstream jobs (offset count + final
   plan) must see the SAME partitioning.  The checkpoint pins it (and is
   the only materialization — O(id + 8 bytes) per row, not the corpus).
3. Per-partition counts → cumulative offsets: a partition-count-sized
   frame (driver-trivial), cumulated with a window over partition id and
   broadcast back.
4. ``ord`` = partition offset + local row_number − 1 (0-based).

One range exchange total; every sort is partition-local; no stage
touches more than (id, hash) per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from splade_easy_spark.ops.dedup import md5_hash64


def training_order(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "shuffle",
    hash_fn=md5_hash64,
) -> DataFrame:
    """(``id_col``, ``ord``): the deterministic global shuffle rank of
    every row, 0-based, dense, and identical across re-runs/partitionings
    (ties in the hash broken by id).  Join back on ``id_col`` to order
    the full corpus, or feed the pair straight to a sharded writer."""
    keyed = df.select(
        F.col(id_col), hash_fn(F.col(id_col).cast("string"), seed).alias("_k")
    )
    parted = (
        keyed.repartitionByRange(F.col("_k"), F.col(id_col))
        .sortWithinPartitions("_k", id_col)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = parted.groupBy("_pid").agg(F.count("*").alias("_n"))
    w_cum = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_n").over(w_cum), F.lit(0)).alias("_off")
    )
    w_local = Window.partitionBy("_pid").orderBy("_k", id_col)
    return (
        parted.join(F.broadcast(offsets), "_pid")
        .select(
            F.col(id_col),
            (F.col("_off") + F.row_number().over(w_local) - 1)
            .cast("long")
            .alias("ord"),
        )
    )
