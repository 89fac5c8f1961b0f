"""CLI + config-driven ingest tests (reference entry points S9/S10,
``pyproject.toml:15-18``, ``src/splade_easy/ingest/datasets.py``)."""

import json

import pytest
import yaml
from pyspark.sql import functions as F

from splade_easy_spark import cli
from splade_easy_spark.config import IndexConfig
from splade_easy_spark.data import generate_transcripts
from splade_easy_spark.ingest import IngestConfig, ingest, to_transcripts


def test_cli_build_search_stats_delete_compact(spark, tmp_path, capsys):
    src = str(tmp_path / "tx")
    idx = str(tmp_path / "idx")
    generate_transcripts(spark, num_convs=5, seed=23).write.parquet(src)

    assert cli.main(["build", "--input", src, "--index", idx]) == 0
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["n_docs"] > 0

    assert cli.main(["search", "--index", idx, "--query", "baba0", "--top-k", "3"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) <= 3 and all("conv_" in l for l in out)
    victim = out[0].split()[1]

    assert cli.main(["stats", "--index", idx]) == 0
    st = json.loads(capsys.readouterr().out)
    assert st["num_docs"] == built["n_docs"]

    assert cli.main(["delete", "--index", idx, "--doc-ids", victim]) == 0
    assert json.loads(capsys.readouterr().out)["deleted"] == 1

    assert cli.main(["compact", "--index", idx]) == 0
    assert json.loads(capsys.readouterr().out)["removed"] == 1

    assert cli.main(["reshard", "--index", idx, "--segment-docs", "64", "--block-size", "16"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["after"]["num_docs"] == built["n_docs"] - 1


def test_ingest_from_parquet_with_synth_ids(spark, tmp_path, capsys):
    """Arbitrary table → transcripts projection: synthesized content-hash
    doc ids (datasets.py:38 analog), text-column concat, resume no-op."""
    src = str(tmp_path / "raw")
    idx = str(tmp_path / "idx")
    spark.createDataFrame(
        [("alpha beta", "x"), ("gamma delta", "y"), ("epsilon zeta", "z")],
        "body STRING, tag STRING",
    ).write.parquet(src)
    cfg_path = tmp_path / "ingest.yaml"
    cfg_path.write_text(
        yaml.safe_dump(
            {
                "input_path": src,
                "index_path": idx,
                "text_columns": ["body", "tag"],
                "separator": " | ",
                "metadata_columns": ["tag"],
            }
        )
    )
    out = ingest(spark, IngestConfig.from_yaml(str(cfg_path)))
    assert out["ingested"] == 3 and out["mode"] == "build"

    docs = spark.read.parquet(f"{idx}/docs")
    row = docs.where(F.col("text").contains("alpha")).collect()[0]
    assert row["text"] == "alpha beta | x"
    assert row["conv_id"].startswith("doc_")

    # resume with same input = no-op
    out2 = ingest(spark, IngestConfig.from_yaml(str(cfg_path)), resume=True)
    assert out2["mode"] == "resume-noop" and out2["ingested"] == 0


def test_ingest_resume_appends_only_new(spark, tmp_path):
    src1, src2 = str(tmp_path / "r1"), str(tmp_path / "r2")
    idx = str(tmp_path / "idx")
    spark.createDataFrame([("one", 1), ("two", 2)], "body STRING, k INT").write.parquet(src1)
    spark.createDataFrame(
        [("one", 1), ("two", 2), ("three", 3)], "body STRING, k INT"
    ).write.parquet(src2)
    c1 = IngestConfig(input_path=src1, index_path=idx, text_columns=["body"], id_column="k")
    c2 = IngestConfig(input_path=src2, index_path=idx, text_columns=["body"], id_column="k")
    assert ingest(spark, c1)["ingested"] == 2
    out = ingest(spark, c2, resume=True)
    assert out["mode"] == "resume-append" and out["ingested"] == 1
    assert spark.read.parquet(f"{idx}/docs").count() == 3


def test_synth_id_ordinal_deterministic_pairing(spark, tmp_path):
    """Round-2 ADVICE (medium): duplicate texts share a content hash; the
    per-hash ordinal must pair doc_id with metadata DETERMINISTICALLY
    across runs and parallelism levels (the old window ordered by the
    partition key itself, leaving the pairing to shuffle luck)."""
    from splade_easy_spark.ingest import IngestConfig, to_transcripts

    rows = [("same text", f"meta_{i}") for i in range(6)] + [("other", "m")]
    cfg = IngestConfig(
        input_path="unused", index_path="unused",
        text_columns=["body"], metadata_columns=["tag"],
    )

    def pairing(partitions):
        df = spark.createDataFrame(rows, "body STRING, tag STRING").repartition(partitions)
        out = to_transcripts(df, cfg)
        return sorted(
            (f"{r['conv_id']}#{r['turn_idx']}", r["tool"]) for r in out.collect()
        )

    p1 = pairing(1)
    for trial in range(3):
        assert pairing(8) == p1, f"trial {trial}: doc_id↔metadata pairing unstable"
    # all copies kept distinct ids
    assert len({d for d, _ in p1}) == len(rows)


def test_cli_curate(spark, tmp_path, capsys):
    """curate verb: writes survivors, summary matches the library op."""
    import json

    from splade_easy_spark import cli
    from splade_easy_spark.ops.curate import curate_corpus

    src = "/root/testdata/sf0.001/documents.parquet"
    out = str(tmp_path / "kept")
    assert cli.main(["curate", "--input", src, "--output", out]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    docs = spark.read.parquet(src)
    expect = curate_corpus(docs)
    assert summary["kept_docs"] == expect.count()
    assert 0 < summary["kept_docs"] < summary["input_docs"]
    kept = spark.read.parquet(out)
    assert set(kept.columns) == {"doc_id", "n_tokens", "quality", "pred_lang"}
    assert kept.count() == summary["kept_docs"]


def test_cli_decontaminate(spark, tmp_path, capsys):
    """decontaminate verb: anti-joins flagged docs, summary matches the
    library op at the same knobs."""
    import json

    from pyspark.sql import functions as F

    from splade_easy_spark import cli
    from splade_easy_spark.ops.decontaminate import ngram_contamination

    src = "/root/testdata/sf0.001/documents.parquet"
    docs = spark.read.parquet(src)
    # reference = a deterministic tenth of the corpus, written separately
    ref_df = docs.where(F.col("doc_id") % 10 == 0)
    ref = str(tmp_path / "ref")
    ref_df.write.parquet(ref)
    out = str(tmp_path / "clean")
    assert (
        cli.main(
            ["decontaminate", "--input", src, "--reference", ref,
             "--output", out, "--shingle-k", "3"]
        )
        == 0
    )
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    rep = ngram_contamination(docs, ref_df, shingle_k=3)
    n_flagged = rep.where(F.col("contaminated")).count()
    assert summary["contaminated"] == n_flagged
    assert summary["kept_docs"] == summary["input_docs"] - n_flagged
    # reference docs themselves are (trivially) contaminated and dropped
    kept_ids = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert not any(i % 10 == 0 for i in kept_ids if i is not None)


def test_cli_dedup_spans_and_semdedup(spark, tmp_path, capsys):
    import json as _json

    from splade_easy_spark import cli

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [(1, f"head words {shared} tail one"), (2, f"{shared} other continuation two"),
            (3, "independent text with nothing shared here at all")]
    src = str(tmp_path / "docs")
    spark.createDataFrame(docs, "doc_id INT, text STRING").write.parquet(src)
    out = str(tmp_path / "clean")
    assert cli.main(["dedup-spans", "--input", src, "--output", out, "--ngram", "4"]) == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["docs"] == 3 and rep["tokens_removed"] > 0
    rows = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert "gamma" not in rows[1]["clean_text"]
    assert rows[3]["kept_tokens"] == rows[3]["n_tokens"]

    vecs = [(i, [float((i % 4 == 0) * 1.0 + 0.001 * i), 1.0, float(i % 7) / 7.0]) for i in range(24)]
    vsrc = str(tmp_path / "vecs")
    spark.createDataFrame(vecs, "vec_id LONG, embedding ARRAY<FLOAT>").write.parquet(vsrc)
    vout = str(tmp_path / "sd")
    assert cli.main([
        "semdedup", "--input", vsrc, "--output", vout,
        "--threshold", "0.999", "--clusters", "1",
    ]) == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["rows"] == 24 and rep["kept"] + rep["dropped"] == 24 and rep["dropped"] > 0


def test_cli_batch_search_and_fulltext_verbs(spark, tmp_path, capsys):
    src = str(tmp_path / "tx")
    idx = str(tmp_path / "idx")
    generate_transcripts(spark, num_convs=5, seed=23).write.parquet(src)
    assert cli.main(["build", "--input", src, "--index", idx]) == 0
    capsys.readouterr()

    qf = tmp_path / "queries.txt"
    qf.write_text('baba0 ceba1\n{"query_id": "jq", "text": "diba2"}\n')
    assert cli.main([
        "batch-search", "--index", idx, "--queries", str(qf),
        "--top-k", "3", "--method", "wand",
    ]) == 0
    rows = [l.split("\t") for l in capsys.readouterr().out.strip().splitlines()]
    qids = {r[0] for r in rows}
    assert qids == {"q0", "jq"}
    assert all(len(r) == 4 and int(r[1]) <= 3 for r in rows)

    # filtered batch equals filtered singles (rank order per query)
    assert cli.main([
        "batch-search", "--index", idx, "--queries", str(qf),
        "--top-k", "3", "--filter", "role = 'user'",
    ]) == 0
    brows = [l.split("\t") for l in capsys.readouterr().out.strip().splitlines()]
    assert cli.main([
        "search", "--index", idx, "--query", "baba0 ceba1",
        "--top-k", "3", "--filter", "role = 'user'",
    ]) == 0
    srows = [l.split() for l in capsys.readouterr().out.strip().splitlines()]
    assert [r[3] for r in brows if r[0] == "q0"] == [r[1] for r in srows]

    assert cli.main(["facets", "--index", idx, "--query", "baba0", "--by", "role"]) == 0
    frows = capsys.readouterr().out.strip().splitlines()
    assert frows and all(len(l.split()) == 2 for l in frows)

    seed_doc = brows[0][3] if brows else srows[0][1]
    assert cli.main(["mlt", "--index", idx, "--doc-id", seed_doc, "--top-k", "3"]) == 0
    assert capsys.readouterr().out.strip()

    assert cli.main(["phrase", "--index", idx, "--query", "baba0", "--top-k", "3"]) == 0
    capsys.readouterr()
