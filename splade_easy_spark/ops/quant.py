"""Embedding quantization: symmetric per-vector int8 scalar quantization —
the standard 4× shrink applied to embedding columns before they are stored
or served at corpus scale (a 100 TB float32 embedding table becomes 25 TB
of int8 plus one float scale per vector, with ~0.4% typical cosine error).

Scheme (per vector ``v``):

    m     = max(|v_i|)                       (the clip-free symmetric range)
    q_i   = floor(v_i * 127 / m + 0.5)       in [-127, 127]
    v̂_i  = q_i * m / 127                    (dequantized reconstruction)

``floor(x + 0.5)`` — NOT engine ``round()`` — so ties break identically in
every engine (Java HALF_UP vs C half-away-from-zero never disagree on the
reconstruction path this way); all arithmetic is widened to float64 first,
which makes the computation bit-deterministic across Spark and the DuckDB
oracle (float32→float64 widening is exact, float64 ops are IEEE-fixed).

Scale design: pure Catalyst higher-order functions (``transform`` /
``array_max`` / ``aggregate``) — one scan, zero shuffle, zero Python.  The
all-zero vector quantizes to all-zero (scale 0) rather than dividing by
zero.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _absmax(col: Column) -> Column:
    return F.array_max(F.transform(col, lambda x: F.abs(x.cast("double"))))


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    with_error: bool = True,
) -> DataFrame:
    """(id, scale, q_emb, [max_abs_err, mse]): int8-range codes plus the
    per-vector dequantization scale ``m / 127``.  ``max_abs_err`` / ``mse``
    (optional) measure reconstruction against the float input — the audit
    columns a pipeline materializes to alarm on outlier vectors."""
    v = F.col(vec_col)
    m = _absmax(v)
    # guard the all-zero vector: scale 0, every code 0
    q = F.when(m == 0.0, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(
            v,
            lambda x: F.floor(x.cast("double") * F.lit(127.0) / m + F.lit(0.5)).cast("int"),
        )
    )
    out = df.select(
        F.col(id_col),
        (m / F.lit(127.0)).alias("scale"),
        q.alias("q_emb"),
        v.alias("_v"),
    )
    if not with_error:
        return out.drop("_v")
    err = F.zip_with(
        "q_emb", "_v", lambda qi, vi: F.abs(qi.cast("double") * F.col("scale") - vi.cast("double"))
    )
    return out.select(
        id_col,
        "scale",
        "q_emb",
        F.array_max(err).alias("max_abs_err"),
        F.aggregate(
            err, F.lit(0.0), lambda acc, e: acc + e * e
        ).alias("_sse"),
    ).select(
        id_col,
        "scale",
        "q_emb",
        "max_abs_err",
        (F.col("_sse") / F.size("q_emb")).alias("mse"),
    )


def dequantize(q_col: Column, scale_col: Column) -> Column:
    """array<double> reconstruction of a quantized vector."""
    return F.transform(q_col, lambda x: x.cast("double") * scale_col)


def quantized_cosine_topk(
    quantized: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k cosine neighbours per probe computed ON THE CODES (dequantize
    inline, no float column needed): the recall-vs-bytes audit for a
    quantized serving table.  ``probes`` carries (probe_id, embedding);
    broadcast-joined against the quantized corpus like
    ``ops.similarity.cosine_topk``."""
    from pyspark.sql.window import Window

    deq = dequantize(F.col("q_emb"), F.col("scale"))
    corpus = quantized.select(F.col(id_col), deq.alias("emb"))
    dot = F.aggregate(
        F.zip_with("emb", "p_emb", lambda a, b: a * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    scored = (
        corpus.crossJoin(
            F.broadcast(probes.select(F.col("probe_id"), F.col("embedding").alias("p_emb")))
        )
        .select(
            "probe_id",
            F.col(id_col),
            (dot / (norm(F.col("emb")) * norm(F.col("p_emb")))).alias("cos"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "rank", id_col, F.round("cos", 6).alias("cos"))
    )
