"""10^4-query batch stress over a ~10^6-turn corpus — the design point of
the batch WAND kernel's O(union-decode + per-(term,query) scatter) claim
(round-3 VERDICT #6).  Memory stays bounded: ONE dense accumulator per
kernel task is reused across all queries (wand._batch_segment), so the
footprint is O(segment_docs + union postings), independent of batch size.

Usage: python tools/batch_stress.py [num_convs] [num_queries]
Prints one JSON line with batch seconds and queries/sec.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    num_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 28_000  # ~1M turns
    num_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from splade_easy_spark.config import IndexConfig
    from splade_easy_spark.data import generate_query_set, generate_transcripts
    from splade_easy_spark.index import build_index
    from splade_easy_spark.query import Searcher
    from splade_easy_spark.session import get_spark

    spark = get_spark("batch_stress", cores=cpus, shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    cfg = IndexConfig(
        build_partitions=max(cpus, 16), term_buckets=64,
        segment_docs=1 << 17, block_size=128,
    )
    tmp_root = os.environ.get("BENCH_TMPDIR")
    idx = tempfile.mkdtemp(prefix="stress_idx_", dir=tmp_root)
    try:
        tx = generate_transcripts(spark, num_convs=num_convs, seed=42)
        t0 = time.time()
        res = build_index(spark, tx, idx, cfg)
        build_s = round(time.time() - t0, 1)

        searcher = Searcher(spark, idx, cfg)
        qset = generate_query_set(num_queries, seed=4242)
        # warm the JVM/Python workers with a tiny batch, then time the run
        searcher.search_many(qset[:20], top_k=10, method="wand").count()
        t0 = time.time()
        hits = searcher.search_many(qset, top_k=10, method="wand").count()
        batch_s = round(time.time() - t0, 2)
        print(json.dumps({
            "metric": "batch_stress",
            "num_queries": num_queries,
            "n_docs": res.n_docs,
            "build_sec": build_s,
            "batch_sec": batch_s,
            "queries_per_sec": round(num_queries / batch_s, 1),
            "hits": hits,
            "cpus": cpus,
        }))
    finally:
        shutil.rmtree(idx, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()


