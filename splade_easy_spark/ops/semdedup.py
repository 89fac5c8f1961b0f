"""SemDeDup — semantic deduplication over an embedding column.

The published recipe (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication", arXiv:2303.09540):
cluster the corpus embeddings with k-means, call two documents semantic
duplicates when their cosine similarity exceeds a threshold *within a
cluster*, and keep one representative per duplicate group.  The clustering
is what makes it tractable at web scale — candidate pairs are only formed
inside a cluster (Σ O(|cell|²) instead of O(N²)), accepting that
cross-cluster near-duplicates are missed (the paper's own approximation).

Spark rendering (each stage reuses an operator this repo already ships and
tests — no new kernels):

1. **cluster assignment** — Spark ML KMeans over L2-normalized vectors
   (sample-fit via ``train_fraction`` at scale, one map-side transform to
   assign), exactly the IVF coarse quantizer ``ops.similarity.ivf_topk``
   uses; or any deterministic ``assign_col`` already on the frame
   (a precomputed cell id, a shard key) to skip the fit entirely.
2. **within-cluster pairs** — ``embedding_near_dup_pairs`` with the cell
   as the blocking column: self-join on the cell key, pairs bounded by
   Σ|cell|² (never all-pairs), cosine in Catalyst HOF expressions.
3. **duplicate groups** — ``ops.dedup.connected_components`` over the pair
   list (min-label propagation + pointer jumping, O(log n) rounds over a
   frame orders of magnitude smaller than the corpus).
4. **representative** — the smallest id per component (the repo's dedup
   convention, deterministic and centroid-free; the paper keeps the member
   farthest from the centroid — swap the keeper rule downstream if wanted,
   the component labels carry all the information).

Exactness contract (mirrors the ANN operators'): ``n_clusters=1`` (or a
constant ``assign_col``) disables the blocking approximation entirely and
the output equals brute-force all-pairs semantic dedup — the setting the
driver gate proves value-exact against the DuckDB recursive-CTE oracle.
At ``n_clusters>1`` the pair set is a subset of the exact one (blocking
only *removes* candidate pairs), so kept-count is monotonically ≥ the
exact run's — asserted in tests.

Scale shape: one sample-bounded ML fit, one map-side transform, one
self-join on the cell key (skew-safe: cells are KMeans-balanced, AQE
splits stragglers), CC over the pair list only, one broadcast-size join
back to label every row.  No stage holds more than a cell's pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from splade_easy_spark.ops.dedup import connected_components
from splade_easy_spark.ops.similarity import embedding_near_dup_pairs, norm_expr


def kmeans_assign(
    vectors: DataFrame,
    n_cells: int,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
    train_fraction: float | None = None,
) -> DataFrame:
    """The input frame plus a ``_cell`` int column: KMeans cell of the
    L2-normalized vector (euclidean cells over unit vectors ≈ cosine
    cells).  Fit runs on a ``train_fraction`` sample when given (at 100 TB
    you fit once on ~10^6 rows); assignment is one map-side ML transform.
    Zero-norm vectors are kept as the zero vector (nearest-origin cell)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    safe_norm = F.when(
        norm_expr(F.col(vec_col)) > 0, norm_expr(F.col(vec_col))
    ).otherwise(F.lit(1.0))
    unit = F.transform(F.col(vec_col), lambda x: x.cast("double") / safe_norm)
    feats = vectors.select(array_to_vector(unit).alias("features"))
    if train_fraction is not None:
        feats = feats.sample(train_fraction, seed=seed)
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(feats)
    return (
        model.transform(vectors.withColumn("features", array_to_vector(unit)))
        .withColumnRenamed("prediction", "_cell")
        .drop("features")
    )


def semdedup(
    vectors: DataFrame,
    threshold: float = 0.95,
    n_clusters: int = 64,
    assign_col: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
    train_fraction: float | None = None,
) -> DataFrame:
    """One row per input vector: ``(id_col, rep_id, keep)`` where
    ``rep_id`` is the smallest id in the row's semantic-duplicate
    component (its own id when it has no duplicate) and ``keep`` marks the
    component representative — filter ``keep`` for the deduplicated
    corpus, or join ``rep_id`` back to collapse references.

    ``assign_col``: use an existing column as the cluster key instead of
    fitting KMeans (deterministic, oracle-friendly).  ``n_clusters=1``
    ≡ exact all-pairs semantic dedup (see module docstring)."""
    if assign_col is not None:
        cells = vectors.select(
            F.col(id_col), F.col(vec_col), F.col(assign_col).alias("_cell")
        )
    elif n_clusters <= 1:
        # exact mode: a constant cell, no fit — blocking disabled
        cells = vectors.select(
            F.col(id_col), F.col(vec_col), F.lit(0).alias("_cell")
        )
    else:
        cells = kmeans_assign(
            vectors.select(id_col, vec_col),
            n_clusters,
            vec_col=vec_col,
            seed=seed,
            max_iter=max_iter,
            train_fraction=train_fraction,
        )
    pairs = embedding_near_dup_pairs(
        cells, threshold=threshold, block_col="_cell", id_col=id_col, vec_col=vec_col
    ).select("id_a", "id_b")
    comps = connected_components(pairs, src="id_a", dst="id_b")
    return (
        vectors.select(id_col)
        .join(comps.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("comp", F.col(id_col)).alias("rep_id"),
            (F.coalesce("comp", F.col(id_col)) == F.col(id_col)).alias("keep"),
        )
    )
