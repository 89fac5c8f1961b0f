"""Measure the Arrow bytes/row crossing the two hot Python-kernel hops,
before vs after the round-3 slimming — the evidence behind the pack-hop
and query-path byte claims in BENCH.md.

Builds a representative corpus, materializes each hop's INPUT frame both
ways (round-2 schema vs shipped schema), converts a fixed row sample to
Arrow, and reports exact buffer bytes per row.  Buffer bytes are what the
JVM→Python Arrow stream carries (modulo framing), so the ratio is the
honest before/after for the IPC-bound stages.

Usage: python tools/hop_bytes.py
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def arrow_bytes(df, n: int) -> tuple[int, int]:
    """(total buffer bytes, rows) for a deterministic n-row sample."""
    tbl = df.limit(n).toArrow()
    total = 0
    for col in tbl.columns:
        for chunk in col.chunks:
            for buf in chunk.buffers():
                if buf is not None:
                    total += buf.size
    return total, tbl.num_rows


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from splade_easy_spark.config import IndexConfig
    from splade_easy_spark.data import generate_transcripts
    from splade_easy_spark.index import build_index
    from splade_easy_spark.query import Searcher
    from splade_easy_spark.session import get_spark

    spark = get_spark("hop_bytes", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = IndexConfig(build_partitions=8, term_buckets=16, segment_docs=1 << 14)
    idx = tempfile.mkdtemp(prefix="hop_idx_")
    import shutil

    shutil.rmtree(idx)
    build_index(spark, generate_transcripts(spark, num_convs=1500, seed=42), idx, cfg)
    s = Searcher(spark, idx, cfg)
    out: dict = {}

    # ---- hop 1: the postings pack kernel input (build hot path) --------
    dt = s.doc_terms.select("term", "doc_int", "weight", "norm")
    seg = (F.col("doc_int") / F.lit(cfg.segment_docs)).cast("long")
    nweight = F.when(F.col("norm") > 0, F.col("weight") / F.col("norm")).otherwise(F.lit(0.0))
    old_pack = dt.select(
        seg.alias("seg"), "term", "doc_int", "weight", nweight.alias("nweight")
    ).sortWithinPartitions("seg", "term", "doc_int")
    w = Window.partitionBy(seg.alias("seg")).orderBy("term", "doc_int")
    # shipped schema (builder.pack_doc_terms): term only on group-first rows
    new_pack = (
        dt.select(seg.alias("seg"), "term", "doc_int", "weight", nweight.alias("nweight"))
        .withColumn(
            "term_first",
            F.when(
                F.lag("term").over(Window.partitionBy("seg").orderBy("term", "doc_int"))
                == F.col("term"),
                F.lit(None).cast("string"),
            ).otherwise(F.col("term")),
        )
        .select("term_first", "doc_int", "weight", "nweight")
    )
    N = 2_000_000
    b_old, r_old = arrow_bytes(old_pack, N)
    b_new, r_new = arrow_bytes(new_pack, N)
    out["pack_hop"] = {
        "rows_sampled": r_old,
        "round2_bytes_per_row": round(b_old / r_old, 2),
        "round3_bytes_per_row": round(b_new / r_new, 2),
        "reduction": round(1 - (b_new / r_new) / (b_old / r_old), 3),
    }

    # ---- hop 2: the WAND kernel input (query hot path, dot mode) -------
    # three generations: round-2 shipped the whole schema (both weight
    # streams + block_id + term string), round-3 pruned to the active
    # mode's columns but still carried the term string per block row,
    # round-4 stores/ships the int64 term_id instead of the string.
    from splade_easy_spark.index.catalog import term_id_py
    from splade_easy_spark.query.searcher import analyze_query

    terms = [t for t, _ in analyze_query("baba0 ceba1 diba2 foba3 sudi4", cfg)]
    ids = [term_id_py(t, cfg.term_id_seed) for t in terms]
    postings = s.cat.read(spark, "postings")
    native = postings.where(F.col("term_id").isin(ids))
    # reattach the string to reconstruct the older shipped schemas exactly
    tmap = s.cat.read(spark, "term_stats").select("term", "term_id")
    with_str = native.join(F.broadcast(tmap), "term_id")
    full = with_str.select(  # round-2 wire schema
        "seg", "term", "block_id", "n", "doc_min", "doc_max",
        "max_weight", "docs", "wts", "max_nweight", "nwts",
    )
    r3 = with_str.select(
        "seg", "term", "n", "doc_min", "doc_max", "max_weight", "docs", "wts"
    )
    r4 = native.select(
        "seg", "term_id", "n", "doc_min", "doc_max", "max_weight", "docs", "wts"
    )
    b_full, r_full = arrow_bytes(full, 200_000)
    b_r3, n_r3 = arrow_bytes(r3, 200_000)
    b_r4, n_r4 = arrow_bytes(r4, 200_000)
    out["query_hop"] = {
        "block_rows_sampled": r_full,
        "round2_bytes_per_block_row": round(b_full / r_full, 1),
        "round3_bytes_per_block_row": round(b_r3 / n_r3, 1),
        "round4_bytes_per_block_row": round(b_r4 / n_r4, 1),
        "reduction_vs_round2": round(1 - (b_r4 / n_r4) / (b_full / r_full), 3),
        "reduction_vs_round3": round(1 - (b_r4 / n_r4) / (b_r3 / n_r3), 3),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
