"""Structured Streaming front-ends.

The reference is strictly batch; its nearest analog is the resumable
append-only ingest CLI (``src/splade_easy/ingest/datasets.py:63-82``).
Here the same incremental-append operator that serves batch ingest becomes
a streaming sink via ``foreachBatch`` — each micro-batch of transcript
turns is tokenized, weighted against the frozen statistics, and committed,
giving an always-queryable, eventually-refreshed index.

Exactly-once is the standard two-layer foreachBatch transaction protocol:

1. **Committed-epoch log** (steady state, O(1)): the manifest records the
   last fully-committed ``epoch_id`` per checkpoint; foreachBatch epochs
   are monotone per checkpoint and a restart re-delivers only the epoch
   that was in flight, so ``epoch_id <= last_committed`` skips the batch
   outright — no index scan at all, regardless of index size (round 2
   anti-joined every re-delivered batch against the docs table's doc_id
   column, an O(index) read per re-delivery at 10^12 turns).
2. **Idempotent repair** (crash path): an epoch that started but never
   reached the log may have partially appended; it re-runs through
   ``append_documents(dedupe=True)``, whose doc_id anti-join (bounded by
   the batch's id range against the range-major docs table) heals the
   partial commit.  Asserted by
   tests/test_append_streaming.py::test_append_redelivery_is_idempotent.

``turn_rate`` shows the conventional watermarked windowed aggregation over
the same input shape (late-data tolerant ingest monitoring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from splade_easy_spark.config import IndexConfig
from splade_easy_spark.index.append import append_documents


def make_epoch_sink(
    index_dir: str,
    checkpoint_dir: str,
    config: IndexConfig | None = None,
    optimize_every: int | None = None,
    transform=None,
):
    """foreachBatch sink with the committed-epoch transaction log (module
    docstring layer 1); factored out so tests can drive re-delivery
    directly with explicit epoch ids.

    ``optimize_every=K`` runs ``maintenance.optimize_postings`` after
    every K committed epochs — each micro-batch adds one parquet file and
    one block run per touched (seg, term), so an unmaintained streamed
    index accretes small files without bound; the periodic partition-
    scoped merge keeps file counts and run counts flat at O(active segs),
    with no external orchestration.  Optimize runs AFTER the epoch is
    logged (it only rewrites committed data).  A crash mid-optimize is
    safe but not invisible: outside the per-partition swap window the
    live partitions are untouched, and a crash INSIDE the window (between
    the two renames) is healed — rename-only, restoring the pre-optimize
    partition — by ``heal_interrupted_swaps``, which runs at the next
    maintenance call and at every ``Searcher`` open.

    ``transform`` (DataFrame → DataFrame, optional) is a per-micro-batch
    prep stage run BEFORE indexing — the streaming analog of the batch
    curation pipeline: redact PII, drop low-quality turns, gate a sample
    (the ``ops`` filters/projections compose here unchanged, since a
    micro-batch is a plain DataFrame).  It must be deterministic in the
    row (pure column expressions — every ``ops`` gate qualifies): a
    re-delivered epoch re-runs it, and the idempotent-repair anti-join
    heals on the TRANSFORMED rows' ids."""
    from splade_easy_spark.index.catalog import IndexCatalog

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        key = str(checkpoint_dir)
        committed = (
            IndexCatalog(index_dir, config)
            .manifest.data.get("streams", {})
            .get(key, {})
            .get("last_committed_epoch", -1)
        )
        if int(epoch_id) <= int(committed):
            return  # re-delivered, fully-committed epoch: nothing to do
        if transform is not None:
            batch_df = transform(batch_df)
            if batch_df.isEmpty():
                # the prep stage gated the whole batch: still commit the
                # epoch below so a restart doesn't re-run it
                batch_df = None
        if batch_df is not None:
            append_documents(batch_df.sparkSession, index_dir, batch_df, config)
        # record the commit LAST (append_documents saved its own manifest
        # state — reload so next_doc_int/appends are not clobbered); a
        # crash before this line re-runs the epoch through the repair path
        man = IndexCatalog(index_dir, config).manifest
        st = man.data.setdefault("streams", {}).setdefault(key, {})
        st["last_committed_epoch"] = int(epoch_id)
        st["epochs_since_optimize"] = int(st.get("epochs_since_optimize", 0)) + 1
        due = optimize_every and st["epochs_since_optimize"] >= optimize_every
        if due:
            st["epochs_since_optimize"] = 0
        man.save()
        if due:
            from splade_easy_spark.index.maintenance import optimize_postings

            optimize_postings(batch_df.sparkSession, index_dir, config)

    return sink


def stream_append(
    spark: SparkSession,
    index_dir: str,
    stream: DataFrame,
    checkpoint_dir: str,
    config: IndexConfig | None = None,
    trigger_seconds: int | None = None,
    optimize_every: int | None = None,
    transform=None,
):
    """Attach a streaming DataFrame of transcript turns as an index
    appender.  Returns the StreamingQuery (caller stops it).
    ``optimize_every=K`` folds periodic partition-scoped maintenance into
    the sink; ``transform`` runs a deterministic prep stage (redact /
    quality-gate / sample) on every micro-batch before indexing (see
    ``make_epoch_sink``)."""

    writer = stream.writeStream.foreachBatch(
        make_epoch_sink(index_dir, checkpoint_dir, config, optimize_every, transform)
    ).option("checkpointLocation", checkpoint_dir)
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
