"""IndexCatalog: the storage seam.

All reads/writes of index tables go through this class so that on a cluster
with Iceberg on the classpath the Parquet-dirs-plus-manifest fallback swaps
for ``spark.read/write.format("iceberg")`` + snapshot commits without
touching the build or query code (SURVEY.md §1.4).  Table names are fixed:

- ``docs``         doc_id, conv_id, turn_idx, role, tool, ts, text, doc_len, doc_int
- ``doc_terms``    exploded postings: tb, term, doc_int, weight, norm
                   (SQL path; norm = L2 of the doc's weight vector,
                   denormalized in so cosine scoring needs no join)
- ``postings``     packed blocks, hive-partitioned by doc segment:
                   seg, term, block_id, n, doc_min, doc_max, max_weight,
                   docs BINARY (varbyte deltas), wts BINARY (float32 LE)
                   (WAND path)
- ``term_stats``   term, df, max_tf, idf, tb
- ``corpus_stats`` single row: n_docs, avgdl, total_tokens, n_terms
- ``deleted``      doc_id, doc_int (tombstones; analog of deleted_ids.txt,
                   ``src/splade_easy/index.py:80-89``)
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from splade_easy_spark.config import IndexConfig
from splade_easy_spark.index.manifest import Manifest

TABLES = ["docs", "doc_terms", "postings", "term_stats", "corpus_stats", "deleted"]


def term_bucket_expr(term_col, buckets: int):
    """Partition-pruning bucket for a term.  ``crc32`` (not ``hash``) so the
    DuckDB oracle and any non-Spark reader can reproduce it."""
    return F.pmod(F.crc32(term_col.cast("string")), F.lit(buckets)).cast("int")


class IndexCatalog:
    def __init__(self, index_dir: str | Path, config: IndexConfig | None = None):
        self.index_dir = Path(index_dir)
        self.config = config or IndexConfig()
        self.manifest = Manifest(self.index_dir)

    def table_dir(self, name: str) -> str:
        return str(self.index_dir / name)

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self.table_dir(name))

    def read_deleted(self, spark: SparkSession) -> DataFrame | None:
        """Tombstones, or None when no delete has ever happened."""
        p = Path(self.table_dir("deleted"))
        if not any(p.rglob("*.parquet")) if p.exists() else True:
            return None
        return spark.read.parquet(str(p))

    def write(self, df: DataFrame, name: str, partition_by: list[str] | None = None, mode: str = "overwrite") -> None:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.table_dir(name))

    def corpus_stats(self, spark: SparkSession) -> dict:
        row = self.read(spark, "corpus_stats").collect()[0]
        return row.asDict()

    def table_rows(self, name: str) -> int:
        """Exact row count from parquet footers — no Spark job."""
        import pyarrow.parquet as pq

        p = Path(self.table_dir(name))
        return sum(pq.read_metadata(f).num_rows for f in p.rglob("*.parquet"))
