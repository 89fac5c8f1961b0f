"""Manifest + resumable-build tests (SURVEY.md §7 step 7): stage-level
checkpointing with per-file lineage; a build killed between stage commits
resumes by recomputing only the missing stages, ending byte-identical in
stats to a one-shot build."""

import json
import shutil
from pathlib import Path

import pytest

from splade_easy_spark.config import IndexConfig
from splade_easy_spark.data import generate_transcripts
from splade_easy_spark.index import build_index
from splade_easy_spark.index.builder import _STAGES, _STAGE_TABLES, _stage_docs
from splade_easy_spark.index.catalog import IndexCatalog
from splade_easy_spark.index.manifest import Manifest

CFG = IndexConfig(build_partitions=4, term_buckets=8, segment_docs=128, block_size=32)


def test_manifest_lineage_recorded(spark, tmp_path):
    idx_dir = str(tmp_path / "idx")
    tx = generate_transcripts(spark, num_convs=5, seed=1)
    build_index(spark, tx, idx_dir, CFG)
    man = json.loads((Path(idx_dir) / "_manifest.json").read_text())
    assert set(man["stages"]) == {"docs", "stats", "postings"}
    for t in ["docs", "doc_terms", "postings", "term_stats", "corpus_stats"]:
        files = man["tables"][t]["files"]
        assert files, f"no lineage for {t}"
        for f in files:
            assert len(f["sha256"]) == 64 and f["rows"] >= 0 and f["bytes"] > 0
    # per-stage metrics present
    assert man["stages"]["docs"]["metrics"]["elapsed_sec"] > 0
    assert man["identity"]["analyzer_hash"]


def test_resume_skips_completed_stages(spark, tmp_path):
    """Simulated crash after stage 'docs': only later stages rerun, and the
    final manifest equals a one-shot build's (modulo timestamps)."""
    idx_a = str(tmp_path / "a")
    idx_b = str(tmp_path / "b")
    tx = generate_transcripts(spark, num_convs=5, seed=1)
    build_index(spark, tx, idx_a, CFG)

    # partial build: run stage docs only, commit, then "crash"
    cat = IndexCatalog(idx_b, CFG)
    cat.manifest.set_identity(CFG.identity())
    metrics = _stage_docs(spark, tx, cat)
    cat.manifest.record_stage("docs", {"docs": "docs"}, metrics)

    res = build_index(spark, tx, idx_b, CFG, resume=True)
    assert res.stages_skipped == ["docs"]
    assert sorted(res.stages_run) == ["postings", "stats"]

    man_a = json.loads((Path(idx_a) / "_manifest.json").read_text())
    man_b = json.loads((Path(idx_b) / "_manifest.json").read_text())
    # identical content lineage (deterministic build ⇒ identical file hashes)
    for t in ["docs", "doc_terms", "term_stats", "corpus_stats", "postings"]:
        ha = sorted(f["sha256"] for f in man_a["tables"][t]["files"])
        hb = sorted(f["sha256"] for f in man_b["tables"][t]["files"])
        assert ha == hb, f"lineage mismatch in {t}"


def test_resume_detects_corrupted_stage(spark, tmp_path):
    """A committed stage whose files were damaged is rebuilt, not trusted."""
    idx = str(tmp_path / "idx")
    tx = generate_transcripts(spark, num_convs=4, seed=2)
    build_index(spark, tx, idx, CFG)
    # corrupt one docs file
    victim = next(Path(idx, "docs").glob("*.parquet"))
    victim.write_bytes(b"garbage")
    res = build_index(spark, tx, idx, CFG, resume=True)
    assert "docs" in res.stages_run  # invalid lineage ⇒ stage rerun


def test_full_resume_is_noop(spark, tmp_path):
    idx = str(tmp_path / "idx")
    tx = generate_transcripts(spark, num_convs=4, seed=2)
    build_index(spark, tx, idx, CFG)
    res = build_index(spark, tx, idx, CFG, resume=True)
    assert res.stages_run == []
    assert sorted(res.stages_skipped) == ["docs", "postings", "stats"]
