"""Config-driven bulk ingest — the analog of the reference's
``ingest-dataset`` CLI (``src/splade_easy/ingest/datasets.py:21-92``), with
HuggingFace datasets replaced by any Spark-readable source (parquet/csv/
json paths; on a cluster, Iceberg tables).

Reference semantics mirrored exactly:
- doc_id: explicit id column if configured, else synthesized
  ``doc_{row_idx}_{sha256(content)[:16]}`` (``datasets.py:32-38``) — here the
  row index is the deterministic rank of the content hash (a driver-side
  enumerate doesn't exist in a distributed read);
- text: ``separator.join(text_columns)`` (``datasets.py:40-42``);
- metadata: configured columns coerced to string (``datasets.py:44-46``) —
  carried through the transcript ``role``/``tool`` fields where they fit and
  a JSON blob otherwise;
- ``resume``: reopening an existing index and appending (``datasets.py:63-68``)
  maps to the manifest-checked incremental append.

The ingest target is the engine's transcript schema: each source row becomes
one single-turn conversation unless ``conv_id_column``/``turn_idx_column``
are configured.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import yaml
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from splade_easy_spark.config import IndexConfig


@dataclass
class IngestConfig:
    input_path: str
    index_path: str
    format: str = "parquet"
    text_columns: list[str] = field(default_factory=lambda: ["text"])
    separator: str = "\n\n"
    id_column: str | None = None
    conv_id_column: str | None = None
    turn_idx_column: str | None = None
    metadata_columns: list[str] = field(default_factory=list)
    max_docs: int | None = None

    @classmethod
    def from_yaml(cls, path: str) -> "IngestConfig":
        with open(path) as f:
            raw = yaml.safe_load(f)
        return cls(**raw)


def to_transcripts(df: DataFrame, cfg: IngestConfig) -> DataFrame:
    """Project an arbitrary source frame onto the engine's transcript
    schema (conv_id, turn_idx, role, text, tool, ts)."""
    text = F.concat_ws(cfg.separator, *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cfg.text_columns])
    if cfg.conv_id_column and cfg.turn_idx_column:
        conv = F.col(cfg.conv_id_column).cast("string")
        turn = F.col(cfg.turn_idx_column).cast("int")
    elif cfg.id_column:
        conv = F.col(cfg.id_column).cast("string")
        turn = F.lit(0)
    else:
        # synthesized id, cf. datasets.py:38 — content-hash based, stable.
        # Duplicate texts collide on the hash, so a per-hash ordinal rides
        # the turn slot (doc_id becomes doc_<hash>#<ordinal>) — each copy
        # keeps a distinct, stable doc_id instead of round 1's duplicate
        # doc_id rows (ambiguous get/delete, double search hits).  The
        # ordinal window orders by a deterministic tiebreaker (metadata
        # columns, then ts) so the doc_id↔metadata pairing of duplicate
        # texts is stable across runs and parallelism levels; rows that are
        # byte-identical on every projected column are indistinguishable,
        # so their (arbitrary) ordinal assignment is immaterial.
        from pyspark.sql import Window

        conv = F.concat(F.lit("doc_"), F.substring(F.sha2(text, 256), 1, 16))
        tiebreak = [F.col(c).cast("string") for c in cfg.metadata_columns]
        if "ts" in df.columns:
            tiebreak.append(F.col("ts").cast("string"))
        turn = (
            F.row_number().over(Window.partitionBy(conv).orderBy(conv, *tiebreak)) - 1
        )
    meta = (
        F.to_json(F.struct(*[F.col(c).cast("string").alias(c) for c in cfg.metadata_columns]))
        if cfg.metadata_columns
        else F.lit(None).cast("string")
    )
    out = df.select(
        conv.alias("conv_id"),
        turn.alias("turn_idx"),
        F.lit("user").alias("role"),
        text.alias("text"),
        meta.alias("tool"),  # metadata rides the free-form string slot
        F.coalesce(
            F.col("ts") if "ts" in df.columns else F.lit(None).cast("timestamp"),
            F.lit("1970-01-01 00:00:00").cast("timestamp"),
        ).alias("ts"),
    )
    if cfg.max_docs:
        out = out.limit(cfg.max_docs)
    return out


def ingest(
    spark: SparkSession,
    cfg: IngestConfig,
    index_config: IndexConfig | None = None,
    resume: bool = False,
) -> dict:
    reader = spark.read.format(cfg.format)
    if cfg.format == "csv":
        reader = reader.option("header", "true")
    src = reader.load(cfg.input_path)
    tx = to_transcripts(src, cfg)
    from pathlib import Path

    from splade_easy_spark.index import build_index
    from splade_easy_spark.index.append import append_documents

    if resume and (Path(cfg.index_path) / "_manifest.json").exists():
        from splade_easy_spark.index.catalog import IndexCatalog

        cat = IndexCatalog(cfg.index_path, index_config)
        existing = cat.read(spark, "docs").select("doc_id")
        new = tx.withColumn(
            "doc_id", F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string"))
        ).join(existing, "doc_id", "left_anti").drop("doc_id")
        n = new.count()
        if n == 0:
            return {"ingested": 0, "mode": "resume-noop"}
        out = append_documents(spark, cfg.index_path, new, index_config)
        return {"ingested": out["appended_docs"], "mode": "resume-append"}
    result = build_index(spark, tx, cfg.index_path, index_config)
    return {"ingested": result.n_docs, "mode": "build", "elapsed_sec": result.elapsed_sec}
