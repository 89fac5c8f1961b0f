"""Two-parallelism-level scaling evidence for the training-pipeline prep
ops (chunk / pack / pii / sample / vocab / lm / quant), mirroring
tools/scaling_evidence.py's protocol: the SAME deterministic input (a
partitioning-independent generated corpus staged once on tmpfs), each leg
a fresh taskset-pinned subprocess (JVM helper threads can't leak cores),
tmpfs shuffle dirs, cooldown before each timed leg, efficiency =
(T_N / T_4N) / (4N/N).

The 2→8 core pair follows the measured hardware envelope (BENCH.md: the
pure-JVM probe itself caps at 1.8× going 8→32 on this VM, so ≥0.8 is only
observable below the saturation knee).

Usage:
  python tools/prep_scaling.py                 # stage + both legs + table
  PREP_CONVS=4000 PREP_CORES=2,8 PREP_COOLDOWN=60 python tools/prep_scaling.py
  python tools/prep_scaling.py worker <cores>  # one timed leg (internal)
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

STAGE = Path(os.environ.get("PREP_STAGE_DIR", "/dev/shm/prep_scale"))
DOCS = str(STAGE / "docs.parquet")
EMB = str(STAGE / "emb.parquet")


def _spark(cores: int):
    os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/prep_shuffle")
    from splade_easy_spark.session import get_spark

    return get_spark("prep-scaling", cores=cores, shuffle_partitions=max(cores * 4, 8))


def prepare() -> None:
    """Stage the deterministic corpus once (untimed; generator output is
    partitioning-independent, tests/test_transcripts.py)."""
    from pyspark.sql import functions as F

    from splade_easy_spark.data import generate_transcripts

    convs = int(os.environ.get("PREP_CONVS", "4000"))
    n_emb = int(os.environ.get("PREP_EMB", "300000"))
    spark = _spark(8)
    docs = (
        generate_transcripts(spark, num_convs=convs, seed=42)
        .select(
            (
                F.regexp_extract("conv_id", r"\d+", 0).cast("long") * 1000
                + F.col("turn_idx")
            ).alias("doc_id"),
            F.col("text"),
        )
        .withColumn(
            "lang",
            F.element_at(
                F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("xx")),
                (F.pmod(F.col("doc_id"), F.lit(4)) + 1).cast("int"),
            ),
        )
    )
    docs.repartition(64).write.mode("overwrite").parquet(DOCS)
    from splade_easy_spark.data import synthetic_embeddings

    synthetic_embeddings(spark, n_emb).repartition(32).write.mode(
        "overwrite"
    ).parquet(EMB)
    n = spark.read.parquet(DOCS).count()
    print(f"staged {n} docs, {n_emb} embeddings at {STAGE}", file=sys.stderr)
    spark.stop()


def worker(cores: int) -> None:
    from pyspark.sql import functions as F

    from tools.prep_common import prep_bench_ops

    spark = _spark(cores)
    docs = spark.read.parquet(DOCS)
    emb = spark.read.parquet(EMB)
    # warm the session (JVM/codegen/Arrow init out of the timings)
    docs.limit(1000).agg(F.count("*")).collect()

    times = {}
    for name, thunk in prep_bench_ops(docs, emb):
        t0 = time.time()
        thunk()
        times[name] = round(time.time() - t0, 3)
    print(json.dumps({"cores": cores, "times": times}))
    spark.stop()


def leg(cores: int) -> dict:
    cooldown = int(os.environ.get("PREP_COOLDOWN", "60"))
    if cooldown:
        time.sleep(cooldown)
    cmd = [sys.executable, str(REPO / "tools" / "prep_scaling.py"), "worker", str(cores)]
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
    if not (Path(DOCS).exists() and Path(EMB).exists()) or "prepare" in sys.argv[1:]:
        prepare()
        if "prepare" in sys.argv[1:]:
            return
    lo, hi = (int(x) for x in os.environ.get("PREP_CORES", "2,8").split(","))
    a, b = leg(lo), leg(hi)
    factor = hi / lo
    rows = []
    for op in a["times"]:
        t_lo, t_hi = a["times"][op], b["times"][op]
        # t_hi can round to 0.0 on a sub-ms op — guard BOTH divisions
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
