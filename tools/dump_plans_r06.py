"""Dump `.explain("formatted")` for every query path touched in the round-6
optimization pass into ``plans/r06/<name>_<tag>.txt``.

Usage: python tools/dump_plans_r06.py <tag>   (tag = "before" | "after")

Run once from the round-start tree (a detached worktree at the round-start
commit) with tag=before and once from the optimized tree with tag=after; the
judge checks plan claims in OPTIMIZATION_r06.md against these files.

Covers the entry queries whose plans changed (lsh_candidates /
dup_ngram_spans / remove_dup_spans / semdedup / embedding_near_dup /
quantize_emb / unigram_lm) plus two non-entry paths: the build's postings
pack frame and the searcher's more_like_this seed-weight job (both over a
small throwaway index).
"""

from __future__ import annotations

import contextlib
import io
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path("/root/repo/plans/r06")
SF = "/root/testdata/sf0.001"
ENTRY_QUERIES = [
    "lsh_candidates",
    "dup_ngram_spans",
    "remove_dup_spans",
    "semdedup",
    "embedding_near_dup",
    "quantize_emb",
    "unigram_lm",
]


def formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    tag = sys.argv[1]
    OUT.mkdir(parents=True, exist_ok=True)
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from splade_easy_spark.config import IndexConfig
    from splade_easy_spark.data import generate_transcripts
    from splade_easy_spark.index import build_index
    from splade_easy_spark.index.builder import pack_doc_terms
    from splade_easy_spark.query import Searcher
    from splade_easy_spark.session import get_spark

    spark = get_spark("plans-r06", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    for name in ENTRY_QUERIES:
        (OUT / f"{name}_{tag}.txt").write_text(formatted(qs[name](spark, SF)))

    # build-path pack plan + searcher more_like_this over a tiny index
    tmp = tempfile.mkdtemp(prefix="plans_idx_")
    try:
        cfg = IndexConfig(build_partitions=8, segment_docs=1 << 10)
        tx = generate_transcripts(spark, num_convs=20, seed=42)
        build_index(spark, tx, tmp, cfg)
        s = Searcher(spark, tmp, cfg)
        dt = s.cat.read(spark, "doc_terms").select("term", "doc_int", "weight", "norm")
        packed = pack_doc_terms(dt, cfg.segment_docs, cfg.block_size)
        (OUT / f"build_pack_{tag}.txt").write_text(formatted(packed))
        seed = s.docs.select("doc_id").orderBy("doc_id").first()["doc_id"]
        (OUT / f"more_like_this_searcher_{tag}.txt").write_text(
            formatted(s.more_like_this(seed, query_terms=5, top_k=5))
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
    print(f"wrote {tag} plans to {OUT}")


if __name__ == "__main__":
    main()
