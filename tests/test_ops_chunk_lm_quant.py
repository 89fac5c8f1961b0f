"""Tests for sliding-window chunking, unigram-LM scoring, and int8
embedding quantization — each against a brute-force Python/NumPy replay."""

import math
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from splade_easy_spark.ops import chunk, lm, quant


def toks_py(text):
    return re.findall("[a-z0-9]+", text.lower())


def chunks_py(toks, size, overlap):
    stride = size - overlap
    n = len(toks)
    last = max(0, math.ceil((n - size) / stride) * stride)
    return [
        (i, s, toks[s : s + size])
        for i, s in enumerate(range(0, last + 1, stride))
    ]


# ---------------------------------------------------------------------------
# chunk_documents


def test_chunk_matches_python(spark):
    rows = [
        (1, " ".join(f"w{i}" for i in range(25))),   # 25 toks: 3 chunks @ size 10/ov 2
        (2, " ".join(f"w{i}" for i in range(10))),   # exactly size: 1 chunk
        (3, " ".join(f"w{i}" for i in range(11))),   # size+1: 2 chunks
        (4, "short doc"),                            # < size: 1 chunk
        (5, ""),                                     # empty: 1 empty chunk
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    got = chunk.chunk_documents(df, size=10, overlap=2).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for did, text in rows:
        expect = chunks_py(toks_py(text), 10, 2)
        have = sorted(by_doc[did], key=lambda r: r["chunk_id"])
        assert len(have) == len(expect), did
        for r, (cid, start, w) in zip(have, expect):
            assert r["chunk_id"] == cid and r["start"] == start
            assert r["n_tokens"] == len(w)
            assert r["chunk_text"] == " ".join(w)


def test_chunk_covers_every_token(spark):
    text = " ".join(f"t{i}" for i in range(101))
    df = spark.createDataFrame([(1, text)], "doc_id INT, text STRING")
    got = chunk.chunk_documents(df, size=16, overlap=4).collect()
    covered = set()
    for r in got:
        covered.update(range(r["start"], r["start"] + r["n_tokens"]))
    assert covered == set(range(101))
    # no chunk exceeds size; only the tail chunk may be short
    sizes = [r["n_tokens"] for r in sorted(got, key=lambda r: r["chunk_id"])]
    assert all(s == 16 for s in sizes[:-1]) and sizes[-1] <= 16


def test_chunk_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id INT, text STRING")
    with pytest.raises(ValueError):
        chunk.chunk_documents(df, size=8, overlap=8)
    with pytest.raises(ValueError):
        chunk.chunk_documents(df, size=8, overlap=-1)


# ---------------------------------------------------------------------------
# unigram_logprob


def test_unigram_lm_matches_python(spark):
    rows = [
        (1, "apple banana apple cherry"),
        (2, "banana banana banana"),
        (3, "apple unique"),
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    got = {r["doc_id"]: r for r in lm.unigram_logprob(df).collect()}
    # corpus: apple 3, banana 4, cherry 1, unique 1 → T = 9
    tot = {"apple": 3, "banana": 4, "cherry": 1, "unique": 1}
    T = sum(tot.values())
    for did, text in rows:
        toks = toks_py(text)
        exp_sum = sum(math.log(tot[t] / T) for t in toks)
        assert got[did]["n_tokens"] == len(toks)
        assert got[did]["sum_logprob"] == pytest.approx(exp_sum, rel=1e-9)
        assert got[did]["avg_logprob"] == pytest.approx(exp_sum / len(toks), rel=1e-9)


def test_unigram_lm_external_stats_and_smoothing(spark):
    docs = spark.createDataFrame(
        [(1, "known known oov")], "doc_id INT, text STRING"
    )
    stats = spark.createDataFrame(
        [("known", 8), ("other", 2)], "term STRING, total_tf LONG"
    )
    # unsmoothed: oov term has p=0 → log(0) = -inf propagates loudly
    row = lm.unigram_logprob(docs, stats=stats).collect()[0]
    assert row["sum_logprob"] is None or math.isinf(row["sum_logprob"])
    # add-1 smoothing: p(known) = 9/12, p(oov) = 1/12 (V=2, T=10)
    row = lm.unigram_logprob(docs, stats=stats, smooth_k=1.0).collect()[0]
    exp = 2 * math.log(9 / 12) + math.log(1 / 12)
    assert row["sum_logprob"] == pytest.approx(exp, rel=1e-9)


# ---------------------------------------------------------------------------
# quantize_embeddings


def quant_py(v):
    v = np.asarray(v, dtype=np.float64)
    m = np.abs(v).max() if len(v) else 0.0
    if m == 0.0:
        return 0.0, np.zeros(len(v), dtype=np.int64)
    q = np.floor(v * 127.0 / m + 0.5).astype(np.int64)
    return m / 127.0, q


def test_quantize_matches_numpy(spark):
    rng = np.random.default_rng(7)
    rows = [(i, [float(np.float32(x)) for x in rng.normal(0, 0.2, 16)]) for i in range(20)]
    rows.append((99, [0.0] * 16))  # all-zero guard
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    got = {r["vec_id"]: r for r in quant.quantize_embeddings(df).collect()}
    for vid, emb in rows:
        scale, q = quant_py(np.array(emb, dtype=np.float32))
        assert got[vid]["scale"] == pytest.approx(scale, abs=1e-12)
        assert list(got[vid]["q_emb"]) == list(q), vid
        # error audit columns agree with the reconstruction
        v = np.array(emb, dtype=np.float32).astype(np.float64)
        err = np.abs(q * scale - v)
        assert got[vid]["max_abs_err"] == pytest.approx(float(err.max()), abs=1e-12)
        assert got[vid]["mse"] == pytest.approx(float((err**2).mean()), abs=1e-15)
        assert all(-127 <= c <= 127 for c in got[vid]["q_emb"])


def test_quantized_cosine_topk_close_to_float(spark):
    rng = np.random.default_rng(11)
    corpus = [(i, [float(x) for x in rng.normal(0, 1, 32)]) for i in range(60)]
    df = spark.createDataFrame(corpus, "vec_id LONG, embedding ARRAY<FLOAT>")
    qdf = quant.quantize_embeddings(df, with_error=False)
    probes = spark.createDataFrame(
        [(0, corpus[0][1])], "probe_id LONG, embedding ARRAY<FLOAT>"
    )
    got = quant.quantized_cosine_topk(qdf, probes, k=5).collect()
    assert [r["rank"] for r in sorted(got, key=lambda r: r["rank"])] == [1, 2, 3, 4, 5]
    # float-space brute force: top hit must be the probe itself (cos ~ 1)
    top = min(got, key=lambda r: r["rank"])
    assert top["vec_id"] == 0 and top["cos"] == pytest.approx(1.0, abs=1e-3)
    # int8 quantization distorts cosine by well under 1% on 32-dim gaussians
    emb = {i: np.array(v) for i, v in corpus}
    exact = sorted(
        (
            (float(emb[0] @ v / (np.linalg.norm(emb[0]) * np.linalg.norm(v))), i)
            for i, v in emb.items()
        ),
        reverse=True,
    )[:5]
    for r in got:
        ex = next(c for c, i in exact if i == r["vec_id"]) if any(
            i == r["vec_id"] for _, i in exact
        ) else None
        if ex is not None:
            assert r["cos"] == pytest.approx(ex, abs=0.01)


# ---------------------------------------------------------------------------
# prep_training_corpus (composed pipeline)


def test_chunk_passthrough_columns(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e", 0.9), (2, "f g", 0.5)],
        "doc_id INT, text STRING, quality DOUBLE",
    )
    got = chunk.chunk_documents(df, size=3, overlap=1, passthrough=("quality",)).collect()
    assert {r["doc_id"] for r in got} == {1, 2}
    for r in got:
        assert r["quality"] == (0.9 if r["doc_id"] == 1 else 0.5)
    assert list(got[0].asDict()) == [
        "doc_id", "quality", "chunk_id", "start", "n_tokens", "chunk_text",
    ]


def test_prep_pipeline_composition(spark):
    from splade_easy_spark.ops.pipeline import prep_training_corpus
    from splade_easy_spark.ops.curate import curate_corpus
    from splade_easy_spark.ops.sample import sample_gate
    from pyspark.sql import functions as F

    # english-ish docs that pass quality/length gates, plus junk that fails
    good = "the and for with that this from they have words more tokens " * 3
    rows = [(i, good + f" tail{i}") for i in range(1, 9)]
    rows += [(100, "short"), (101, "el gato perro casa " * 10)]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")

    out = prep_training_corpus(
        df, sample_rate=0.6, sample_seed="prep", chunk_size=10, chunk_overlap=2,
        min_quality=0.5, min_tokens=10, lang="en",
    ).collect()

    survivors = {
        r["doc_id"]
        for r in curate_corpus(df, min_quality=0.5, min_tokens=10, lang="en").collect()
    }
    sampled = {
        r["doc_id"]
        for r in df.where(sample_gate(F.col("doc_id"), 0.6, "prep")).collect()
    }
    expect_docs = survivors & sampled
    assert {r["doc_id"] for r in out} == expect_docs and expect_docs
    # chunk grain matches the standalone chunker on the same subset
    sub = df.where(F.col("doc_id").isin(list(expect_docs)))
    standalone = chunk.chunk_documents(sub, size=10, overlap=2).collect()
    assert sorted((r["doc_id"], r["chunk_id"], r["chunk_text"]) for r in out) == sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_text"]) for r in standalone
    )
    # passthrough metadata is doc-constant and present on every chunk row
    for r in out:
        assert r["pred_lang"] == "en" and 0.5 <= r["quality"] <= 1.0
