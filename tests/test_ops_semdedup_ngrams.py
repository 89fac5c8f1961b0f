"""Tests for the round-5 additions: SemDeDup (embedding-cluster semantic
dedup) and corpus-level duplicated n-gram spans — each checked against a
brute-force Python replay of the documented semantics, plus the SemDeDup
blocking-approximation contract (clustered pairs ⊆ exact pairs)."""

import hashlib
import itertools
import math
import re

import pytest
from pyspark.sql import functions as F

from splade_easy_spark.ops.dedup import dup_ngram_spans, md5_hash60
from splade_easy_spark.ops.semdedup import semdedup


# ---------------------------------------------------------------------------
# fixtures


def _vec(i, dim=8):
    """Deterministic unit-ish vectors with planted duplicate groups:
    ids 0..3 share direction A (+ tiny jitter), 10..11 share B, rest
    pseudo-random."""
    base_a = [1.0, 0.5, 0.0, -0.5, 1.0, 0.0, 0.5, -1.0]
    base_b = [-1.0, 1.0, 0.5, 0.0, -0.5, 1.0, 0.0, 0.5]
    if i < 4:
        return [x + 0.01 * i * ((j % 3) - 1) for j, x in enumerate(base_a)]
    if 10 <= i < 12:
        return [x + 0.02 * (i - 10) * ((j % 2) * 2 - 1) for j, x in enumerate(base_b)]
    h = int(hashlib.md5(f"v:{i}".encode()).hexdigest(), 16)
    return [((h >> (8 * j)) % 1000) / 500.0 - 1.0 for j in range(dim)]


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


@pytest.fixture(scope="module")
def emb_df(spark):
    rows = [(i, [float(x) for x in _vec(i)]) for i in range(40)]
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")


# ---------------------------------------------------------------------------
# semdedup


def _exact_semdedup_py(rows, tau):
    """Brute-force reference: all-pairs cosine >= tau, union-find, min id."""
    ids = [i for i, _ in rows]
    vecs = dict(rows)
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in itertools.combinations(ids, 2):
        if _cos(vecs[a], vecs[b]) >= tau:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in ids}


def test_semdedup_exact_mode_matches_bruteforce(spark, emb_df):
    tau = 0.995
    got = {
        r["vec_id"]: (r["rep_id"], r["keep"])
        for r in semdedup(emb_df, threshold=tau, n_clusters=1).collect()
    }
    rows = [(r["vec_id"], [float(x) for x in r["embedding"]]) for r in emb_df.collect()]
    want = _exact_semdedup_py(rows, tau)
    assert set(got) == set(want)
    for i, rep in want.items():
        assert got[i] == (rep, rep == i), f"vec {i}: {got[i]} != ({rep}, {rep == i})"
    # the planted groups actually deduplicate (the test has teeth)
    reps = {got[i][0] for i in range(4)}
    assert reps == {0}, reps
    assert got[10][0] == got[11][0] == 10


def test_semdedup_clustered_is_subset_of_exact(spark, emb_df):
    """Blocking only removes candidate pairs: every duplicate found WITH
    clustering is a duplicate of the exact run, and the kept set is a
    superset of the exact kept set."""
    tau = 0.995
    exact = {r["vec_id"]: r["rep_id"] for r in semdedup(emb_df, threshold=tau, n_clusters=1).collect()}
    clustered = {
        r["vec_id"]: r["rep_id"]
        for r in semdedup(emb_df, threshold=tau, n_clusters=4, seed=7).collect()
    }
    assert set(clustered) == set(exact)
    exact_kept = {i for i, rep in exact.items() if rep == i}
    clus_kept = {i for i, rep in clustered.items() if rep == i}
    assert exact_kept <= clus_kept
    # a vec marked duplicate under clustering is duplicate-of-same-rep or
    # at least non-kept in the exact run too (cluster pairs ⊆ exact pairs)
    for i, rep in clustered.items():
        if rep != i:
            assert exact[i] != i


def test_semdedup_assign_col_and_determinism(spark, emb_df):
    """assign_col blocks exactly like a precomputed cell; same seed + same
    input → identical output across runs."""
    with_blk = emb_df.withColumn("blk", (F.col("vec_id") % 2).cast("int"))
    a = sorted(
        semdedup(with_blk, threshold=0.995, assign_col="blk").collect()
    )
    b = sorted(
        semdedup(with_blk, threshold=0.995, assign_col="blk").collect()
    )
    assert a == b
    # ids 0..3 are planted dups but 0,2 vs 1,3 land in different blocks:
    # blocking must split the component in two
    rep = {r["vec_id"]: r["rep_id"] for r in a}
    assert rep[2] == 0 and rep[3] == 1


# ---------------------------------------------------------------------------
# dup_ngram_spans


TOK = re.compile("[a-z0-9]+")


def _spans_py(docs, n, min_count):
    grams = []  # (doc, pos, gram)
    toks = {d: TOK.findall(t.lower()) for d, t in docs}
    for d, ts in toks.items():
        for p in range(max(len(ts) - n + 1, 0)):
            grams.append((d, p, " ".join(ts[p : p + n])))
    from collections import Counter

    cnt = Counter(g for _, _, g in grams)
    out = {}
    for d, ts in toks.items():
        dup = [(p, g) for dd, p, g in grams if dd == d and cnt[g] >= min_count]
        covered = set()
        for p, _ in dup:
            covered.update(range(p, p + n))
        ng = max(len(ts) - n + 1, 0)
        out[d] = (
            len(ts),
            ng,
            len(dup),
            len(covered),
            round(len(dup) / ng, 6) if ng else 0.0,
            round(len(covered) / len(ts), 6) if ts else 0.0,
        )
    return out


def test_dup_ngram_spans_matches_python(spark):
    shared = "the quick brown fox jumps over the lazy dog tonight"
    docs = [
        (1, f"intro text alpha {shared} closing words beta"),
        (2, f"{shared} and something entirely different after it"),
        (3, "no duplicated content lives in this document at all"),
        (4, "short doc"),  # below n: zero grams
        (5, "spam spam spam spam spam spam spam spam"),  # self-repeat
    ]
    df = spark.createDataFrame(docs, "doc_id INT, text STRING")
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["n_grams"], r["n_dup_grams"], r["dup_tokens"],
            r["dup_gram_frac"], r["dup_token_frac"],
        )
        for r in dup_ngram_spans(df, n=4, min_count=2, hash_fn=md5_hash60).collect()
    }
    want = _spans_py(docs, n=4, min_count=2)
    assert got == want
    # teeth: the shared passage IS detected on both docs, doc 3 is clean,
    # doc 5's self-repetition counts (corpus-occurrence semantics)
    assert got[1][2] > 0 and got[2][2] > 0
    assert got[3][2] == 0 and got[4] == (2, 0, 0, 0, 0.0, 0.0)
    assert got[5][5] == 1.0


def test_dup_ngram_spans_default_hash_same_counts(spark):
    """The default xxhash64 gram key yields the same statistics as the
    oracle-pinned md5 hash (hash choice affects only the key width)."""
    docs = [(i, f"common prefix words here tail {i}") for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id INT, text STRING")
    a = sorted(dup_ngram_spans(df, n=3).collect())
    b = sorted(dup_ngram_spans(df, n=3, hash_fn=md5_hash60).collect())
    assert a == b


def test_remove_dup_spans_matches_python(spark):
    from splade_easy_spark.ops.dedup import remove_dup_spans

    shared = "alpha beta gamma delta epsilon zeta"
    docs = [
        (1, f"unique head words {shared} unique tail words"),
        (2, f"{shared} totally different continuation here now"),
        (3, "clean document with no shared passages anywhere inside"),
        (4, "tiny"),
    ]
    n, mc = 4, 2
    df = spark.createDataFrame(docs, "doc_id INT, text STRING")
    got = {
        r["doc_id"]: (r["n_tokens"], r["kept_tokens"], r["clean_text"])
        for r in remove_dup_spans(df, n=n, min_count=mc, hash_fn=md5_hash60).collect()
    }
    toks = {d: TOK.findall(t.lower()) for d, t in docs}
    from collections import Counter

    cnt = Counter(
        " ".join(ts[p : p + n])
        for ts in toks.values()
        for p in range(max(len(ts) - n + 1, 0))
    )
    for d, ts in toks.items():
        covered = set()
        for p in range(max(len(ts) - n + 1, 0)):
            if cnt[" ".join(ts[p : p + n])] >= mc:
                covered.update(range(p, p + n))
        kept = [t for i, t in enumerate(ts) if i not in covered]
        assert got[d] == (len(ts), len(kept), " ".join(kept)), d
    # teeth: the shared passage is actually excised from both docs,
    # doc 3 is untouched, short doc 4 passes through whole
    assert "gamma" not in got[1][2] and "gamma" not in got[2][2]
    assert got[1][2].startswith("unique head words")
    assert got[3][2] == " ".join(toks[3])
    assert got[4] == (1, 1, "tiny")


# ---------------------------------------------------------------------------
# knn_graph


def test_knn_graph_matches_bruteforce(spark, emb_df):
    from splade_easy_spark.ops.similarity import knn_graph

    with_blk = emb_df.withColumn("blk", (F.col("vec_id") % 3).cast("int"))
    got = {}
    for r in knn_graph(with_blk, k=3, block_col="blk").collect():
        got.setdefault(r["src"], []).append((r["rank"], r["dst"], round(r["cosine"], 9)))
    rows = [(r["vec_id"], [float(x) for x in r["embedding"]]) for r in emb_df.collect()]
    vecs = dict(rows)
    for src in vecs:
        cands = [
            (-_cos(vecs[src], vecs[d]), d)
            for d in vecs
            if d != src and d % 3 == src % 3
        ]
        cands.sort()
        want = [
            (i + 1, d, round(-negc, 9)) for i, (negc, d) in enumerate(cands[:3])
        ]
        assert sorted(got.get(src, [])) == want, src


def test_knn_graph_lsh_blocking_subset(spark, emb_df):
    """LSH-bucket blocking returns each src's exact in-bucket top-k: every
    edge it emits exists in the label-free brute-force candidate set with
    the same cosine."""
    from splade_easy_spark.ops.similarity import knn_graph

    rows = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in emb_df.collect()}
    out = knn_graph(emb_df, k=2, block_col=None, planes=4, dim=8).collect()
    assert len(out) > 0
    for r in out:
        assert abs(_cos(rows[r["src"]], rows[r["dst"]]) - r["cosine"]) < 1e-6
