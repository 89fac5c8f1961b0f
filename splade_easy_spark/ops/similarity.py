"""Similarity search over embedding columns (``array<float>``).

Two paths:

- ``cosine_topk`` — exact brute force: broadcast the (tiny) probe set,
  JVM-side ``zip_with``/``aggregate`` dot products, per-probe window top-k.
  The correctness baseline; also the within-partition kernel of the scale
  path.
- ``lsh_bucket_topk`` — random-hyperplane LSH: deterministic pseudo-random
  planes derived from md5 of (plane, dim), sign-bits → bucket key; probes
  only score docs sharing a bucket (multi-probe over all plane subsets is
  NOT done — this is the recall/throughput tradeoff knob).  At 100 TB the
  bucket key becomes the partition key so a probe touches a few partitions
  instead of the full corpus.
- ``embedding_near_dup_pairs`` — near-duplicate pairs above a cosine
  threshold with attribute blocking (here: the ``label`` column), the
  standard blocking trick that turns O(N²) into Σ O(|block|²).

Everything stays in Catalyst expressions (higher-order functions); no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(
    vectors: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Exact top-k by cosine for each probe vector.

    (probe_id, rank, vec_id, cosine); excludes the probe row itself when ids
    collide.  Broadcast-cross-join (probes are small by contract) → window
    top-k per probe = per-partition partial top-k + merge."""
    p = probes.select(F.col(probe_id_col), F.col(vec_col).alias("_pvec"))
    scored = (
        vectors.crossJoin(F.broadcast(p))
        .where(F.col(id_col) != F.col(probe_id_col))
        .select(
            probe_id_col,
            id_col,
            cosine_expr(F.col(vec_col), F.col("_pvec")).alias("cosine"),
        )
    )
    w = Window.partitionBy(probe_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy(probe_id_col, "rank")
    )


def hyperplane_signs(dim: int, planes: int = 8) -> list[list[float]]:
    """Deterministic pseudo-random ±1 hyperplanes: sign from md5("p:d")
    parity, precomputed at plan-build time so both Spark and any SQL oracle
    embed identical constants."""
    import hashlib

    return [
        [
            1.0 if int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8], 16) % 2 == 0 else -1.0
            for d in range(dim)
        ]
        for p in range(planes)
    ]


def hyperplane_bits(vec_col: Column, dim: int, planes: int = 8) -> Column:
    """LSH bucket key: sign bits of dot(vec, r_p) over the deterministic
    hyperplanes above."""
    signs = hyperplane_signs(dim, planes)
    bits = []
    for p in range(planes):
        plane = F.array(*[F.lit(s) for s in signs[p]])
        dot = dot_expr(vec_col, plane)
        bits.append(F.when(dot >= 0, F.lit(2 ** p)).otherwise(F.lit(0)))
    return sum(bits[1:], bits[0]).cast("int")


def lsh_bucket_topk(
    vectors: DataFrame,
    probes: DataFrame,
    dim: int,
    k: int = 10,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Approximate top-k: score only same-bucket vectors (single-probe)."""
    vb = vectors.withColumn("_bucket", hyperplane_bits(F.col(vec_col), dim, planes))
    pb = probes.select(
        F.col(probe_id_col),
        F.col(vec_col).alias("_pvec"),
        hyperplane_bits(F.col(vec_col), dim, planes).alias("_bucket"),
    )
    scored = (
        vb.join(F.broadcast(pb), "_bucket")
        .where(F.col(id_col) != F.col(probe_id_col))
        .select(probe_id_col, id_col, cosine_expr(F.col(vec_col), F.col("_pvec")).alias("cosine"))
    )
    w = Window.partitionBy(probe_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy(probe_id_col, "rank")
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cosine) pairs above threshold within blocking groups."""
    a = vectors.select(
        F.col(block_col).alias("_blk"), F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va")
    )
    b = vectors.select(
        F.col(block_col).alias("_blk"), F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb")
    )
    return (
        a.join(b, "_blk")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine_expr(F.col("_va"), F.col("_vb")).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )
