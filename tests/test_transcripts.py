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
