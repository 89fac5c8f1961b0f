"""Term-dictionary encoding of the packed postings (round-4 layout).

The postings term key is a 60-bit md5-prefix hash (``catalog.term_id_py``)
instead of the term string — the analog of the reference storing uint32
token ids in its wire format (``src/splade_easy/schema.fbs:14``).  These
tests pin (a) driver/JVM hash agreement, (b) rank-and-score identity
between the native int-keyed layout and a legacy string-keyed index read
through the same kernels, and (c) the collision gates.
"""

import shutil
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from splade_easy_spark.config import IndexConfig
from splade_easy_spark.data import generate_transcripts
from splade_easy_spark.index import build_index
from splade_easy_spark.index.builder import pack_doc_terms
from splade_easy_spark.index.catalog import IndexCatalog, term_id_expr, term_id_py
from splade_easy_spark.query import Searcher

CFG = IndexConfig(build_partitions=4, term_buckets=8, segment_docs=128, block_size=32)


def test_term_id_py_matches_jvm(spark):
    """The driver-side hash (used for the query filter, no lookup job) and
    the JVM expression (used by the build) must agree on every term,
    including non-ASCII and edge lengths, for multiple seeds."""
    terms = ["baba0", "ceba1", "", "a", "a" * 64, "éclair", "0" * 15, "日本語"]
    df = spark.createDataFrame([(t,) for t in terms], "term STRING")
    for seed in (0, 1, 12345):
        jvm = {
            r["term"]: r["tid"]
            for r in df.select(
                "term", term_id_expr(F.col("term"), seed).alias("tid")
            ).collect()
        }
        py = {t: term_id_py(t, seed) for t in terms}
        assert jvm == py
        assert all(0 <= v < 2**60 for v in py.values())
    # seed actually perturbs
    assert term_id_py("baba0", 0) != term_id_py("baba0", 1)


def _legacy_index(spark, tmp_path) -> str:
    """Build a round-4 index, then rewrite it into the pre-term_id layout
    (term STRING per block row, no term_id in term_stats, no layout flag) —
    the on-disk shape every index built before this round has."""
    idx = str(tmp_path / "legacy")
    build_index(spark, generate_transcripts(spark, num_convs=8, seed=5), idx, CFG)
    cat = IndexCatalog(idx, CFG)
    # repack postings with string keys from the (unchanged) doc_terms table
    dt = spark.read.parquet(f"{idx}/doc_terms")
    legacy = pack_doc_terms(
        dt.select("term", "doc_int", "weight", "norm"),
        CFG.segment_docs,
        CFG.block_size,
        term_ids=False,
    )
    staging = str(tmp_path / "legacy_postings")
    legacy.write.partitionBy("seg").parquet(staging)
    shutil.rmtree(Path(idx) / "postings")
    shutil.move(staging, Path(idx) / "postings")
    ts = spark.read.parquet(f"{idx}/term_stats").drop("term_id")
    ts_staging = str(tmp_path / "legacy_ts")
    ts.write.parquet(ts_staging)
    shutil.rmtree(Path(idx) / "term_stats")
    shutil.move(ts_staging, Path(idx) / "term_stats")
    man = cat.manifest
    man.data["layout"].pop("postings_term_ids", None)
    man.data["layout"].pop("term_id_seed", None)
    man.save()
    return idx


def test_legacy_string_layout_still_searchable(spark, tmp_path):
    """A pre-term_id index must read through the SAME kernels (layout
    autodetected from the postings columns, hash projected JVM-side above
    the pushed string filter) with results identical to the SQL path and
    to a native term_id index of the same corpus."""
    legacy = _legacy_index(spark, tmp_path)
    native = str(tmp_path / "native")
    build_index(spark, generate_transcripts(spark, num_convs=8, seed=5), native, CFG)
    assert "term" in spark.read.parquet(f"{legacy}/postings").columns
    assert "term_id" in spark.read.parquet(f"{native}/postings").columns

    sl, sn = Searcher(spark, legacy, CFG), Searcher(spark, native, CFG)
    for q in ["baba0 ceba1", "diba2 foba3 baba0"]:
        sql = [(r["doc_id"], round(r["score"], 6)) for r in sl.search(q, 15).collect()]
        for s in (sl, sn):
            for cos in (False, True):
                wand = [
                    (r["doc_id"], round(r["score"], 6))
                    for r in s.search(q, 15, method="wand", use_cosine=cos).collect()
                ]
                if not cos:
                    assert [d for d, _ in wand] == [d for d, _ in sql]
        # batch kernel over the legacy layout
        m = sl.search_many(
            [{"query_id": "q", "text": q}], top_k=15, method="wand"
        ).collect()
        assert [r["doc_id"] for r in m] == [d for d, _ in sql]


def test_append_to_legacy_index_keeps_string_layout(spark, tmp_path):
    """Appending to a legacy index must pack string-keyed blocks (one table,
    one schema) and stay searchable."""
    legacy = _legacy_index(spark, tmp_path)
    from splade_easy_spark.index.append import append_documents

    batch = generate_transcripts(spark, num_convs=3, seed=77).withColumn(
        "conv_id", F.concat(F.lit("x"), F.col("conv_id"))  # disjoint doc_ids
    )
    out = append_documents(spark, legacy, batch, CFG)
    assert out["appended_docs"] > 0
    post = spark.read.parquet(f"{legacy}/postings")
    assert "term" in post.columns and "term_id" not in post.columns
    s = Searcher(spark, legacy, CFG)
    sql = [(r["doc_id"], round(r["score"], 6)) for r in s.search("baba0 ceba1", 15).collect()]
    wand = [
        (r["doc_id"], round(r["score"], 6))
        for r in s.search("baba0 ceba1", 15, method="wand").collect()
    ]
    assert [d for d, _ in wand] == [d for d, _ in sql]


def test_build_collision_gate_raises(spark):
    """_assert_no_term_id_collisions refuses a vocabulary whose ids clash."""
    from splade_easy_spark.index.builder import _assert_no_term_id_collisions

    ok = spark.createDataFrame(
        [("a", 1), ("b", 2)], "term STRING, term_id LONG"
    )
    _assert_no_term_id_collisions(ok, 0)  # no raise
    clash = spark.createDataFrame(
        [("a", 1), ("b", 1)], "term STRING, term_id LONG"
    )
    with pytest.raises(ValueError, match="term_id collision"):
        _assert_no_term_id_collisions(clash, 0)


def test_query_collision_gate_raises():
    from splade_easy_spark.query.wand import _query_term_ids

    ids = _query_term_ids(["a", "b", "c"], 0)
    assert len(set(ids.values())) == 3
    import splade_easy_spark.query.wand as w

    orig = w.term_id_py
    try:
        w.term_id_py = lambda t, s: 7  # force a clash
        with pytest.raises(ValueError, match="collision"):
            w._query_term_ids(["a", "b"], 0)
    finally:
        w.term_id_py = orig


def test_migrate_postings_weight_preserving(spark, tmp_path):
    """migrate_postings is THE layout migration (round-4 VERDICT #6): a
    legacy string-keyed index repacked to term_id keys must return
    byte-identical WAND results (same float32 weights through the same
    packer — unlike refresh_stats, which re-derives statistics), flip the
    recorded layout so later appends pack term_id blocks, and add term_id
    to term_stats."""
    from splade_easy_spark.index.append import append_documents
    from splade_easy_spark.index.maintenance import migrate_postings

    legacy = _legacy_index(spark, tmp_path)
    s0 = Searcher(spark, legacy, CFG)
    before = {
        q: [
            (r["doc_id"], r["score"])
            for r in s0.search(q, 20, method="wand").collect()
        ]
        for q in ["baba0 ceba1", "diba2 foba3 baba0"]
    }
    cos_before = [
        (r["doc_id"], r["score"])
        for r in s0.search("baba0 ceba1", 20, method="wand", use_cosine=True).collect()
    ]

    out = migrate_postings(spark, legacy, CFG)
    assert out["migrated"] is True
    post = spark.read.parquet(f"{legacy}/postings")
    assert "term_id" in post.columns and "term" not in post.columns
    assert "term_id" in spark.read.parquet(f"{legacy}/term_stats").columns
    man = IndexCatalog(legacy, CFG).manifest.data
    assert man["layout"]["postings_term_ids"] is True

    s1 = Searcher(spark, legacy, CFG)
    for q, exp in before.items():
        got = [
            (r["doc_id"], r["score"])
            for r in s1.search(q, 20, method="wand").collect()
        ]
        assert got == exp  # EXACT equality: weights preserved bit-for-bit
    got_cos = [
        (r["doc_id"], r["score"])
        for r in s1.search("baba0 ceba1", 20, method="wand", use_cosine=True).collect()
    ]
    assert got_cos == cos_before

    # idempotent no-op on an already-migrated index
    assert migrate_postings(spark, legacy, CFG)["migrated"] is False

    # appends now pack term_id-keyed blocks into the migrated table
    batch = generate_transcripts(spark, num_convs=2, seed=88).withColumn(
        "conv_id", F.concat(F.lit("m"), F.col("conv_id"))
    )
    assert append_documents(spark, legacy, batch, CFG)["appended_docs"] > 0
    post2 = spark.read.parquet(f"{legacy}/postings")
    assert "term_id" in post2.columns and "term" not in post2.columns
    s2 = Searcher(spark, legacy, CFG)
    sql = [
        (r["doc_id"], round(r["score"], 6)) for r in s2.search("baba0 ceba1", 15).collect()
    ]
    wand = [
        (r["doc_id"], round(r["score"], 6))
        for r in s2.search("baba0 ceba1", 15, method="wand").collect()
    ]
    assert [d for d, _ in wand] == [d for d, _ in sql]
