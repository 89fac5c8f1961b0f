"""Synthetic transcript generator invariants (determinism is load-bearing:
the N-vs-4N scaling evidence requires the same input at both parallelisms)."""

from pyspark.sql import functions as F

from splade_easy_spark.data import generate_transcripts, generate_query_set


def test_schema_and_keys(spark):
    df = generate_transcripts(spark, num_convs=20, seed=42)
    assert [f.name for f in df.schema.fields] == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    n = df.count()
    assert n >= 20 * 8
    assert df.select("conv_id", "turn_idx").distinct().count() == n  # stable doc key


def test_deterministic_across_partitioning(spark):
    a = generate_transcripts(spark, num_convs=30, seed=42, num_partitions=1)
    b = generate_transcripts(spark, num_convs=30, seed=42, num_partitions=8)
    ax = sorted(a.collect(), key=lambda r: (r["conv_id"], r["turn_idx"]))
    bx = sorted(b.collect(), key=lambda r: (r["conv_id"], r["turn_idx"]))
    assert ax == bx


def test_edge_cases_present(spark):
    df = generate_transcripts(spark, num_convs=100, seed=42)
    assert df.where(F.col("text") == "").count() > 0  # empty turns
    assert df.where(F.col("text").rlike("[A-Z]")).count() > 0  # case variants
    assert df.where((F.col("role") == "tool") & F.col("tool").isNotNull()).count() > 0
    # ts monotone within conversation
    bad = (
        df.withColumn(
            "prev",
            F.lag("ts").over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                    "conv_id"
                ).orderBy("turn_idx")
            ),
        )
        .where(F.col("prev").isNotNull() & (F.col("ts") <= F.col("prev")))
        .count()
    )
    assert bad == 0


def test_query_set_fixed():
    qs = generate_query_set()
    assert len(qs) == 50
    assert qs == generate_query_set()  # deterministic
    assert any(q["text"].startswith("zzqx") for q in qs)  # no-hit queries


def test_wide_vocab_unique_and_prefix_stable():
    """make_vocab must stay collision-free at realistic-vocabulary sizes
    (the pre-round-4 scheme silently recycled words past 27k: the digit
    cycle 10 divides the 3-syllable period 27000) and must not change any
    word below the old period (fixture/gate stability)."""
    from splade_easy_spark.data.transcripts import make_vocab

    wide = make_vocab(120_000)
    assert len(set(wide)) == len(wide)
    assert wide[:27_000] == make_vocab(27_000)
    assert wide[0] == "baba0"
