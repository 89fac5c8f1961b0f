"""Tests for the training-pipeline prep ops added in round 5: deterministic
stratified sampling (data mixing), vocabulary construction, PII scan/redact,
and greedy sequence packing — each verified against a brute-force Python
replay of the documented semantics."""

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from splade_easy_spark.ops import pack, pii, sample, vocab

_M = 1_000_000


def gate_py(doc_id, rate, seed="sample"):
    h = int(hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()[:8], 16)
    return h % _M < int(round(rate * _M))


def toks_py(text):
    return re.findall("[a-z0-9]+", text.lower())


@pytest.fixture(scope="module")
def mix_df(spark):
    rows = [(i, ["en", "de", "fr", "xx"][i % 4], f"doc {i} text body") for i in range(400)]
    return spark.createDataFrame(rows, "doc_id INT, lang STRING, text STRING")


# ---------------------------------------------------------------------------
# stratified_sample


def test_sample_matches_python_gate(spark, mix_df):
    rates = {"en": 0.8, "de": 0.5, "fr": 0.25}
    kept = {
        r["doc_id"]
        for r in sample.stratified_sample(mix_df, "lang", rates, default_rate=0.1).collect()
    }
    for r in mix_df.collect():
        rate = rates.get(r["lang"], 0.1)
        assert (r["doc_id"] in kept) == gate_py(r["doc_id"], rate)


def test_sample_deterministic_and_nested(spark, mix_df):
    # same call twice → identical set (no RNG, no partition dependence)
    a = {r["doc_id"] for r in sample.stratified_sample(mix_df, "lang", {"en": 0.5}).collect()}
    b = {
        r["doc_id"]
        for r in sample.stratified_sample(mix_df.repartition(7), "lang", {"en": 0.5}).collect()
    }
    assert a == b
    # lower rate selects a subset of the higher rate's set, per stratum
    lo = {r["doc_id"] for r in sample.stratified_sample(mix_df, "lang", {"en": 0.2}).collect()}
    assert lo <= a


def test_mixture_counts_audit(spark, mix_df):
    rates = {"en": 0.8, "de": 0.5}
    audit = {r["lang"]: r for r in sample.mixture_counts(mix_df, "lang", rates).collect()}
    assert set(audit) == {"en", "de", "fr", "xx"}
    for lang, row in audit.items():
        expect = sum(
            1
            for r in mix_df.collect()
            if r["lang"] == lang and gate_py(r["doc_id"], rates.get(lang, 0.0))
        )
        assert row["n_kept"] == expect
        assert row["n_in"] == 100


# ---------------------------------------------------------------------------
# build_vocab


def test_vocab_counts_and_ids(spark):
    rows = [
        (1, "apple banana apple"),
        (2, "apple cherry"),
        (3, "banana banana date"),
        (4, "apple"),
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    out = {r["term"]: r for r in vocab.build_vocab(df).collect()}
    # df / total_tf against hand counts
    assert (out["apple"]["df"], out["apple"]["total_tf"]) == (3, 4)
    assert (out["banana"]["df"], out["banana"]["total_tf"]) == (2, 3)
    assert (out["cherry"]["df"], out["cherry"]["total_tf"]) == (1, 1)
    assert (out["date"]["df"], out["date"]["total_tf"]) == (1, 1)
    # ids dense in (df desc, term asc) order
    assert [t for t, r in sorted(out.items(), key=lambda kv: kv[1]["vocab_id"])] == [
        "apple",
        "banana",
        "cherry",
        "date",
    ]
    assert sorted(r["vocab_id"] for r in out.values()) == [0, 1, 2, 3]


def test_vocab_thresholds(spark):
    rows = [
        (1, "common rare1 common"),
        (2, "common rare2"),
        (3, "common mid"),
        (4, "common mid"),
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    # min_df=2 drops hapaxes; max_df_frac=0.75 drops 'common' (df 4 > 3)
    out = {r["term"]: r for r in vocab.build_vocab(df, min_df=2, max_df_frac=0.75).collect()}
    assert set(out) == {"mid"}
    assert out["mid"]["vocab_id"] == 0
    # max_size keeps the top-N ranked
    top1 = vocab.build_vocab(df, max_size=1).collect()
    assert len(top1) == 1 and top1[0]["term"] == "common"


# ---------------------------------------------------------------------------
# pii_scan


def test_pii_counts_and_redaction(spark):
    rows = [
        (1, "mail me at a.b+c@example.com or x@y.io thanks"),
        (2, "server 192.168.0.1 and 10.0.0.255 up"),
        (3, "ssn 123-45-6789 phone 555-867-5309"),
        (4, "clean text no identifiers"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    out = {r["doc_id"]: r for r in pii.pii_scan(df).collect()}
    assert (out[1]["n_email"], out[1]["n_pii"], out[1]["has_pii"]) == (2, 2, 1)
    assert (out[2]["n_ipv4"], out[2]["n_pii"]) == (2, 2)
    assert (out[3]["n_ssn"], out[3]["n_phone"], out[3]["n_pii"]) == (1, 1, 2)
    assert (out[4]["n_pii"], out[4]["has_pii"]) == (0, 0)
    assert out[5]["n_pii"] == 0
    assert out[1]["redacted_text"] == "mail me at <EMAIL> or <EMAIL> thanks"
    assert out[2]["redacted_text"] == "server <IPV4> and <IPV4> up"
    assert out[3]["redacted_text"] == "ssn <SSN> phone <PHONE>"
    assert out[4]["redacted_text"] == "clean text no identifiers"


def test_pii_python_regex_parity(spark):
    # the pattern table must behave identically under Python re (a proxy
    # for RE2/DuckDB) and Java regex (Spark) on tricky near-miss spans
    rows = [
        (1, "almost-ip 999.999.999.999 and 1.2.3.4.5 chained"),
        (2, "not-a-phone 12-345-6789 real 555-123-4567"),
        (3, "no-tld user@host plain"),
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    got = {r["doc_id"]: r for r in pii.pii_scan(df, with_redacted=False).collect()}
    for did, text in rows:
        for kind, pat in pii.PII_PATTERNS:
            assert got[did][f"n_{kind}"] == len(re.findall(pat, text)), (did, kind)


# ---------------------------------------------------------------------------
# pack_sequences


def pack_py(items, budget):
    """(doc_id, n_tokens) in id order → {doc_id: (seq, offset)}."""
    out, seq, fill = {}, 0, 0
    for i, (did, t) in enumerate(sorted(items)):
        if fill + t > budget and i > 0 and fill > 0:
            seq, fill = seq + 1, 0
        out[did] = (seq, fill)
        fill += t
    return out


def test_pack_matches_python_replay(spark, mix_df):
    budget, n_buckets = 12, 4
    got = pack.pack_sequences(mix_df, budget=budget, n_buckets=n_buckets).collect()
    by_bucket = {}
    for r in got:
        by_bucket.setdefault(r["bucket"], []).append(r)
    texts = {r["doc_id"]: r["text"] for r in mix_df.collect()}
    assert sum(len(v) for v in by_bucket.values()) == len(texts)
    for b, rows in by_bucket.items():
        items = [(r["doc_id"], len(toks_py(texts[r["doc_id"]]))) for r in rows]
        expect = pack_py(items, budget)
        for r in rows:
            assert (r["seq_id"], r["offset"]) == expect[r["doc_id"]], (b, r["doc_id"])


def test_pack_invariants(spark):
    rows = [
        (1, "a b c"),           # 3 tokens
        (2, "d e f g h"),       # 5
        (3, " ".join("t" + str(i) for i in range(20))),  # 20 > budget: own seq
        (4, "i j"),             # 2
        (5, ""),                # 0 tokens: never opens a new sequence
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    out = pack.pack_sequences(df, budget=8, n_buckets=1).collect()
    fills = {}
    for r in out:
        fills.setdefault(r["seq_id"], 0)
        fills[r["seq_id"]] += r["n_tokens"]
        assert r["offset"] >= 0
    over = [s for s, f in fills.items() if f > 8]
    # only the sequence holding the 20-token doc may exceed the budget
    seq_of_3 = next(r["seq_id"] for r in out if r["doc_id"] == 3)
    assert over == [seq_of_3]
    n_in_seq3 = sum(1 for r in out if r["seq_id"] == seq_of_3)
    assert n_in_seq3 == 1 or all(
        r["n_tokens"] == 0 for r in out if r["seq_id"] == seq_of_3 and r["doc_id"] != 3
    )
    # seq ids dense from 0
    assert sorted(set(fills)) == list(range(len(fills)))


# ---------------------------------------------------------------------------
# temperature_mix


def test_temperature_mix_matches_python_replay(spark, mix_df):
    # skewed strata: drop most xx/fr rows so lang sizes differ
    df = mix_df.where((F.col("doc_id") % 4 < 2) | (F.col("doc_id") < 80))
    counts = {r["lang"]: r["n"] for r in df.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    alpha = 0.5
    k = min(n ** (1 - alpha) for n in counts.values())
    thr = {
        s: int(round(min(1.0, k * n ** (alpha - 1)) * _M)) for s, n in counts.items()
    }
    kept = {r["doc_id"] for r in sample.temperature_mix(df, "lang", alpha=alpha).collect()}
    for r in df.collect():
        h = int(hashlib.md5(f"sample:{r['doc_id']}".encode()).hexdigest()[:8], 16)
        assert (r["doc_id"] in kept) == (h % _M < thr[r["lang"]])


def test_temperature_mix_smallest_stratum_whole(spark, mix_df):
    out = sample.temperature_mix(mix_df, "lang", alpha=0.3)
    n_in = {r["lang"]: r["n"] for r in mix_df.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    n_out = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    smallest = min(n_in, key=lambda s: (n_in[s], s))
    assert n_out[smallest] == n_in[smallest]  # rate 1.0: kept whole
    # alpha=1 is a no-op mix (every rate 1.0)
    assert sample.temperature_mix(mix_df, "lang", alpha=1.0).count() == mix_df.count()


# ---------------------------------------------------------------------------
# source_cap


def test_source_cap_exact_vs_bruteforce(spark, mix_df):
    df = mix_df.withColumn("source", F.concat(F.lit("s"), (F.col("doc_id") % 5).cast("string")))
    out = sample.source_cap(df, "source", cap=7)
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r["source"], []).append(r["doc_id"])
    assert all(len(v) == 7 for v in per.values())  # every source has 80 > 7 rows
    # brute force: 7 smallest (hash, id) per source over the FULL frame
    for src, ids in per.items():
        full = [
            (int(hashlib.md5(f"sample:{r['doc_id']}".encode()).hexdigest()[:8], 16) % _M, r["doc_id"])
            for r in df.where(F.col("source") == src).collect()
        ]
        expect = {d for _, d in sorted(full)[:7]}
        assert set(ids) == expect


def test_source_cap_small_sources_kept_whole(spark, mix_df):
    # a source with fewer rows than the cap is untouched
    df = mix_df.withColumn(
        "source",
        F.when(F.col("doc_id") < 3, F.lit("tiny")).otherwise(F.lit("big")),
    )
    out = sample.source_cap(df, "source", cap=10)
    got = {r["source"] for r in out.collect()}, out.where(F.col("source") == "tiny").count()
    assert got == ({"tiny", "big"}, 3)
    assert out.where(F.col("source") == "big").count() == 10


def test_source_cap_undershoot_raises(spark, mix_df):
    df = mix_df.withColumn("source", F.lit("only"))
    with pytest.raises(RuntimeError, match="pre-gate undershot"):
        # overshoot so small the gate keeps ~0.4 rows << cap
        sample.source_cap(df, "source", cap=100, overshoot=0.001)


def test_temperature_mix_null_stratum(spark):
    # NULL lang rows form their own stratum: they participate in k AND get
    # a rate, instead of vanishing through an inner join (round-5 review)
    rows = [(i, "en" if i < 100 else None, "txt") for i in range(104)]
    df = spark.createDataFrame(rows, "doc_id INT, lang STRING, text STRING")
    out = sample.temperature_mix(df, "lang", alpha=0.5)
    by = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by.get(None, 0) == 4  # smallest stratum: rate 1.0, kept whole
    # en gated at k*n^-0.5 = 2/10 = 0.2
    kept_en = sum(
        1 for i in range(100)
        if int(hashlib.md5(f"sample:{i}".encode()).hexdigest()[:8], 16) % _M < 200000
    )
    assert by["en"] == kept_en


def test_source_cap_null_stratum(spark):
    rows = [(i, "web" if i % 3 else None, "txt") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id INT, source STRING, text STRING")
    out = sample.source_cap(df, "source", cap=5)
    by = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by == {"web": 5, None: 5}  # NULL capped like any other group


# ---------------------------------------------------------------------------
# training_order


def test_training_order_matches_python_and_is_dense(spark, mix_df):
    from splade_easy_spark.ops import shuffle as ops_shuffle

    got = {r["doc_id"]: r["ord"] for r in ops_shuffle.training_order(mix_df).collect()}
    keys = sorted(
        (int(hashlib.md5(f"shuffle:{r['doc_id']}".encode()).hexdigest()[:8], 16), r["doc_id"])
        for r in mix_df.collect()
    )
    expect = {d: i for i, (_, d) in enumerate(keys)}
    assert got == expect  # exact global rank, 0-based dense
    assert sorted(got.values()) == list(range(len(got)))


def test_training_order_partition_independent(spark, mix_df):
    from splade_easy_spark.ops import shuffle as ops_shuffle

    a = {r["doc_id"]: r["ord"] for r in ops_shuffle.training_order(mix_df).collect()}
    b = {
        r["doc_id"]: r["ord"]
        for r in ops_shuffle.training_order(mix_df.repartition(13)).collect()
    }
    assert a == b
