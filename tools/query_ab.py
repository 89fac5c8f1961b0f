"""Interleaved A/B: colocated batch WAND kernel vs the exchange-free
variant (``method='wand_nox'``) at two pinned parallelism levels.

The round-4 verdict pinned the batch-query 2->8 scaling shortfall (median
0.71 vs the 0.8 target) on this box's 0.48-0.54 Arrow-IPC passthrough
ceiling — the ``repartition(seg)`` exchange plus its Arrow hop.  The nox
path deletes exactly that stage: each scan task scores whatever postings
blocks it holds and emits partial ``(query_id, doc_int, score)`` sums,
merged by ``groupBy().sum()`` + window top-k above.  This tool measures
whether that buys back scaling efficiency, or whether the loss of the
per-segment dense accumulator / per-segment top-k cut costs more than the
exchange saved.

Protocol (round-4 memory: never trust one run on this box):
  - ONE shared index built unpinned at full cores on /dev/shm; query legs
    never rebuild it, so every leg measures the identical bytes.
  - each leg is a fresh taskset-pinned subprocess (local[N] alone lets JVM
    helper threads and Python workers leak onto extra cores).
  - legs interleave (method x cores) within each trial so slow host drift
    hits all four cells equally; optional cooldown rests the package
    between legs (the box throttles wide legs under sustained load).
  - report per-method per-trial paired efficiencies + medians.

Usage:
    AB_TRIALS=3 AB_COOLDOWN=60 python tools/query_ab.py
    python tools/query_ab.py --leg <cpus> <method> <idx_dir>   (internal)
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ROOT = "/dev/shm/query_ab"
NUM_CONVS = 20_000
NUM_QUERIES = 100
TOP_K = 10


def _leg(cpus: int, method: str, idx_dir: str) -> None:
    """Query-only leg: open the shared index, warm, time one batch."""
    os.environ.setdefault("SPARK_LOCAL_DIRS", f"{ROOT}/shuffle_{cpus}_{method}")
    from splade_easy_spark.config import IndexConfig
    from splade_easy_spark.data import generate_query_set
    from splade_easy_spark.query import Searcher
    from splade_easy_spark.session import get_spark

    spark = get_spark("query_ab_leg", cores=cpus, shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    cfg = IndexConfig(
        build_partitions=max(cpus, 16),
        term_buckets=64,
        segment_docs=1 << 14,
        block_size=128,
    )
    s = Searcher(spark, idx_dir, cfg)
    qset = generate_query_set(NUM_QUERIES)
    # warm JVM codegen + Python workers on a small slice, then time
    s.search_many(qset[:5], top_k=TOP_K, method=method).count()
    t0 = time.time()
    hits = s.search_many(qset, top_k=TOP_K, method=method).count()
    sec = time.time() - t0
    print(json.dumps({
        "leg": True, "cpus": cpus, "method": method,
        "sec": round(sec, 3), "hits": hits,
        "qps": round(NUM_QUERIES / sec, 1),
    }), flush=True)
    spark.stop()


def _run_leg(cpus: int, method: str, idx_dir: str) -> dict:
    cmd = [sys.executable, os.path.abspath(__file__), "--leg", str(cpus), method, idx_dir]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800,
                         cwd=Path(__file__).resolve().parent.parent)
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"leg {cpus}/{method} failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--leg":
        _leg(int(sys.argv[2]), sys.argv[3], sys.argv[4])
        return

    trials = int(os.environ.get("AB_TRIALS", "3"))
    cooldown = int(os.environ.get("AB_COOLDOWN", "60"))
    lo, hi = (int(x) for x in os.environ.get("AB_CORES", "2,8").split(","))
    factor = hi // lo
    methods = os.environ.get("AB_METHODS", "wand,wand_nox").split(",")

    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(ROOT)
    idx_dir = f"{ROOT}/idx"

    # shared index, built once unpinned (build scaling is measured elsewhere)
    from splade_easy_spark.config import IndexConfig
    from splade_easy_spark.data import generate_transcripts
    from splade_easy_spark.index import build_index
    from splade_easy_spark.session import get_spark

    spark = get_spark("query_ab_build", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = IndexConfig(build_partitions=32, term_buckets=64,
                      segment_docs=1 << 14, block_size=128)
    tx = generate_transcripts(spark, num_convs=NUM_CONVS, seed=42)
    res = build_index(spark, tx, idx_dir, cfg)
    print(f"shared index: {res.n_docs} docs at {idx_dir}", flush=True)
    spark.stop()

    runs: dict[tuple[str, int], list[float]] = {
        (m, c): [] for m in methods for c in (lo, hi)
    }
    hits_seen: dict[str, set[int]] = {m: set() for m in methods}
    for t in range(trials):
        for method in methods:
            for cpus in (lo, hi):
                if cooldown:
                    print(f"cooldown {cooldown}s ...", flush=True)
                    time.sleep(cooldown)
                print(f"trial {t + 1}/{trials}: {method} @ local[{cpus}] ...", flush=True)
                rec = _run_leg(cpus, method, idx_dir)
                print(json.dumps(rec), flush=True)
                runs[(method, cpus)].append(rec["sec"])
                hits_seen[method].add(rec["hits"])

    # both methods must return the same hit count on the same index — a
    # mismatch means the A/B compared different answers, not different plans
    counts = {m: sorted(h) for m, h in hits_seen.items()}
    summary: dict = {
        "metric": "query_ab", "num_queries": NUM_QUERIES, "trials": trials,
        "cores": [lo, hi], "hits_by_method": counts, "methods": {},
    }
    for m in methods:
        l_all, h_all = runs[(m, lo)], runs[(m, hi)]
        effs = [round(a / b / factor, 3) for a, b in zip(l_all, h_all)]
        summary["methods"][m] = {
            f"sec_{lo}c": l_all, f"sec_{hi}c": h_all,
            "eff_trials": effs,
            "eff_median": round(statistics.median(effs), 3),
            f"median_sec_{lo}c": round(statistics.median(l_all), 3),
            f"median_sec_{hi}c": round(statistics.median(h_all), 3),
        }
    print(json.dumps(summary), flush=True)
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
