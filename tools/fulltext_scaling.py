"""Two-parallelism-level scaling evidence for the round-5 fulltext query
operators (filtered retrieval, phrase search, faceting, more-like-this),
mirroring tools/prep_scaling.py's protocol: ONE deterministic index staged
on tmpfs (untimed build; the index artifact is parallelism-independent,
tests/test_build_search.py::test_index_artifact_identical_across_parallelism),
each timed leg a fresh taskset-pinned subprocess, tmpfs shuffle dirs,
cooldown before each leg, efficiency = (T_N / T_4N) / (4N/N).

Each op is timed over a BATCH of queries (10 filtered / 10 phrase /
10 facet / 5 MLT) so per-job driver overhead amortizes — the same reason
bench.py's scaling protocol uses query batches.  The 2→8 core pair follows
the measured hardware envelope (BENCH.md: the pure-JVM probe caps at 1.8×
going 8→32 on this VM).

Usage:
  python tools/fulltext_scaling.py                 # stage + both legs + table
  FT_CONVS=16000 FT_CORES=2,8 FT_COOLDOWN=60 python tools/fulltext_scaling.py
  python tools/fulltext_scaling.py worker <cores>  # one timed leg (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

STAGE = Path(os.environ.get("FT_STAGE_DIR", "/dev/shm/ft_scale"))
IDX = str(STAGE / "index")


def _spark(cores: int):
    os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/ft_shuffle")
    from splade_easy_spark.session import get_spark

    return get_spark("ft-scaling", cores=cores, shuffle_partitions=max(cores * 4, 8))


def _cfg():
    from splade_easy_spark.config import IndexConfig

    return IndexConfig(
        build_partitions=16, term_buckets=64, segment_docs=1 << 14, block_size=128
    )


def prepare() -> None:
    from splade_easy_spark.data import generate_transcripts
    from splade_easy_spark.index import build_index

    convs = int(os.environ.get("FT_CONVS", "16000"))
    spark = _spark(8)
    tx = generate_transcripts(spark, num_convs=convs, seed=42)
    r = build_index(spark, tx, IDX, _cfg())
    print(f"staged index: {r.n_docs} docs, {r.n_terms} terms at {IDX}", file=sys.stderr)
    spark.stop()


def worker(cores: int) -> None:
    from pyspark.sql import functions as F

    from splade_easy_spark.data import generate_query_set
    from splade_easy_spark.query import Searcher

    spark = _spark(cores)
    s = Searcher(spark, IDX, _cfg())
    qs = [q["text"] for q in generate_query_set(50)]
    # warm the session (JVM/codegen init out of the timings)
    s.search(qs[0], top_k=10).collect()

    times = {}

    # serial-term probe: a 1-row job carries only driver coordination —
    # its per-job cost is the floor every single-query row below pays
    # regardless of cores (reported so the latency rows can be read)
    t0 = time.time()
    for _ in range(10):
        s.docs.limit(1).count()
    times["job_floor_x10"] = round(time.time() - t0, 3)

    # the throughput-shaped row: ONE job scores a 50-query batch under a
    # filter — this is the path that matters at cluster scale (per-query
    # driver latency amortizes to zero), same reason bench.py's scaling
    # criterion rides search_many
    batch = [{"query_id": f"q{i}", "text": t} for i, t in enumerate(qs[:50])]
    t0 = time.time()
    s.search_many(batch, top_k=10, doc_filter=F.col("role") == "user").count()
    times["filtered_search_many50"] = round(time.time() - t0, 3)

    t0 = time.time()
    for q in qs[:10]:
        s.search(q, top_k=10, doc_filter=F.col("role") == "user").collect()
    times["filtered_search_x10"] = round(time.time() - t0, 3)

    t0 = time.time()
    for q in qs[:10]:
        s.phrase_search(" ".join(q.split()[:2]), top_k=10).collect()
    times["phrase_search_x10"] = round(time.time() - t0, 3)

    t0 = time.time()
    for q in qs[:10]:
        s.facet_counts(q, "role").collect()
    times["facet_counts_x10"] = round(time.time() - t0, 3)

    seeds = [r["doc_id"] for r in s.docs.select("doc_id").orderBy("doc_id").limit(5).collect()]
    t0 = time.time()
    for d in seeds:
        s.more_like_this(d, query_terms=10, top_k=10).collect()
    times["more_like_this_x5"] = round(time.time() - t0, 3)

    print(json.dumps({"cores": cores, "times": times}))
    spark.stop()


def leg(cores: int) -> dict:
    cooldown = int(os.environ.get("FT_COOLDOWN", "60"))
    if cooldown:
        time.sleep(cooldown)
    cmd = [sys.executable, str(REPO / "tools" / "fulltext_scaling.py"), "worker", str(cores)]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600, cwd=REPO)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-3000:])
        raise SystemExit(f"leg cores={cores} failed")
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]))
        return
    if not Path(IDX).exists() or "prepare" in sys.argv[1:]:
        prepare()
        if "prepare" in sys.argv[1:]:
            return
    lo, hi = (int(x) for x in os.environ.get("FT_CORES", "2,8").split(","))
    a, b = leg(lo), leg(hi)
    factor = hi / lo
    rows = []
    for op in a["times"]:
        t_lo, t_hi = a["times"][op], b["times"][op]
        sp = round(t_lo / t_hi, 2) if t_hi else None
        eff = round(t_lo / t_hi / factor, 3) if t_hi else None
        rows.append((op, t_lo, t_hi, sp, eff))
    print(json.dumps({"cores": [lo, hi], "legs": [a, b], "table": rows}))
    print(f"\n| op | local[{lo}] s | local[{hi}] s | speedup | efficiency |", file=sys.stderr)
    print("|---|---|---|---|---|", file=sys.stderr)
    for op, t_lo, t_hi, sp, eff in rows:
        print(f"| {op} | {t_lo} | {t_hi} | {sp}x | {eff} |", file=sys.stderr)


if __name__ == "__main__":
    main()
