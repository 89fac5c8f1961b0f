"""Incremental append + streaming appender tests (reference W1-W3 analog,
``src/splade_easy/index.py:133-205``; resume-ingest ``ingest/datasets.py:63-68``)."""

import pytest
from pyspark.sql import functions as F

from splade_easy_spark.config import IndexConfig
from splade_easy_spark.data import generate_transcripts
from splade_easy_spark.data.transcripts import TRANSCRIPT_SCHEMA
from splade_easy_spark.index import build_index
from splade_easy_spark.index.append import append_documents, refresh_stats
from splade_easy_spark.query import Searcher

CFG = IndexConfig(build_partitions=4, term_buckets=8, segment_docs=128, block_size=32)


def test_append_then_search(spark, tmp_path):
    idx = str(tmp_path / "idx")
    all_tx = generate_transcripts(spark, num_convs=10, seed=11)
    first = all_tx.where(F.col("conv_id") < "conv_00000007")
    rest = all_tx.where(F.col("conv_id") >= "conv_00000007")
    build_index(spark, first, idx, CFG)

    s = Searcher(spark, idx, CFG)
    out = append_documents(spark, idx, rest, CFG)
    assert out["appended_docs"] == rest.count()

    s2 = Searcher(spark, idx, CFG)
    docs = spark.read.parquet(f"{idx}/docs")
    assert docs.count() == all_tx.count()
    # doc_ints remain unique and dense-extended
    assert docs.select("doc_int").distinct().count() == docs.count()
    # appended docs are findable
    new_doc = rest.limit(1).collect()[0]
    did = f"{new_doc['conv_id']}#{new_doc['turn_idx']}"
    assert s2.get(did) is not None
    hits = s2.search("baba0", top_k=100).collect()
    hit_ids = {r["doc_id"] for r in hits}
    assert any(h.startswith("conv_0000000" + str(i)) for h in hit_ids for i in (7, 8, 9))


def test_refresh_stats_matches_oneshot(spark, tmp_path):
    """Append drifts stats; refresh_stats must make the index identical (to
    float tolerance) to a one-shot build over the full corpus."""
    idx_a, idx_b = str(tmp_path / "a"), str(tmp_path / "b")
    all_tx = generate_transcripts(spark, num_convs=8, seed=13)
    first = all_tx.where(F.col("conv_id") < "conv_00000005")
    rest = all_tx.where(F.col("conv_id") >= "conv_00000005")

    build_index(spark, all_tx, idx_a, CFG)
    build_index(spark, first, idx_b, CFG)
    append_documents(spark, idx_b, rest, CFG)
    refresh_stats(spark, idx_b, CFG)

    sa, sb = Searcher(spark, idx_a, CFG), Searcher(spark, idx_b, CFG)
    for q in ["baba0", "baba0 ceba1 diba2"]:
        ra = [(r["doc_id"], r["score"]) for r in sa.search(q, 20).collect()]
        rb = [(r["doc_id"], r["score"]) for r in sb.search(q, 20).collect()]
        assert [d for d, _ in ra] == [d for d, _ in rb]
        for (_, x), (_, y) in zip(ra, rb):
            assert abs(x - y) < 1e-9


def test_streaming_append(spark, tmp_path):
    """File-source micro-batch stream drives the index appender."""
    from splade_easy_spark.streaming import stream_append

    idx = str(tmp_path / "idx")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    tx = generate_transcripts(spark, num_convs=6, seed=17)
    build_index(spark, tx.where(F.col("conv_id") < "conv_00000003"), idx, CFG)
    tx.where(F.col("conv_id") >= "conv_00000003").write.parquet(src)

    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src)
    q = stream_append(spark, idx, stream, ckpt, CFG)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    docs = spark.read.parquet(f"{idx}/docs")
    assert docs.count() == tx.count()
    s = Searcher(spark, idx, CFG)
    row = tx.where(F.col("conv_id") == "conv_00000005").limit(1).collect()[0]
    assert s.get(f"{row['conv_id']}#{row['turn_idx']}") is not None


def test_turn_rate_stream(spark, tmp_path):
    from splade_easy_spark.streaming import turn_rate

    src = str(tmp_path / "src")
    tx = generate_transcripts(spark, num_convs=5, seed=19)
    tx.write.parquet(src)
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src)
    agg = turn_rate(stream, window="10 minutes", watermark="1 hour")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("turn_rate_out")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM turn_rate_out").collect()
    finally:
        q.stop()
    assert rows
    assert sum(r["n_turns"] for r in rows) == tx.count()
    assert {r["role"] for r in rows} <= {"user", "assistant", "tool"}
