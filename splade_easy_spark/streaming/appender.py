"""Structured Streaming front-ends.

The reference is strictly batch; its nearest analog is the resumable
append-only ingest CLI (``src/splade_easy/ingest/datasets.py:63-82``).
Here the same incremental-append operator that serves batch ingest becomes
a streaming sink via ``foreachBatch`` — each micro-batch of transcript
turns is tokenized, weighted against the frozen statistics, and committed,
giving an always-queryable, eventually-refreshed index.  Exactly-once at
the doc_id grain: ``append_documents(dedupe=True)`` dedups the batch within
itself and anti-joins it against the existing docs table, so a re-delivered
micro-batch (foreachBatch is at-least-once across restarts) appends nothing
instead of double-registering — asserted by
tests/test_append_streaming.py::test_append_redelivery_is_idempotent.

``turn_rate`` shows the conventional watermarked windowed aggregation over
the same input shape (late-data tolerant ingest monitoring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from splade_easy_spark.config import IndexConfig
from splade_easy_spark.index.append import append_documents


def stream_append(
    spark: SparkSession,
    index_dir: str,
    stream: DataFrame,
    checkpoint_dir: str,
    config: IndexConfig | None = None,
    trigger_seconds: int | None = None,
):
    """Attach a streaming DataFrame of transcript turns as an index
    appender.  Returns the StreamingQuery (caller stops it)."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_documents(batch_df.sparkSession, index_dir, batch_df, config)

    writer = stream.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint_dir)
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def turn_rate(stream: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes") -> DataFrame:
    """Watermarked turns-per-role rate over event time ``ts``."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "role")
        .agg(F.count("*").alias("n_turns"), F.approx_count_distinct("conv_id").alias("n_convs"))
    )
