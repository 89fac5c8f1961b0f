"""Scaling-efficiency evidence for the north rule (≥0.8 from N to 4N).

No real cluster exists in this sandbox, so per the driver contract the same
build+query job runs at two parallelism levels — local[8] and local[32] —
on the SAME deterministic input (the generator is partitioning-independent,
tests/test_transcripts.py), and efficiency = (T8/T32)/4 computed on
wall-clock throughput.  Each measurement is a fresh subprocess running
bench.py so JVM/session state can't leak between levels.

Usage: python tools/scaling_evidence.py [sf_dir] [--out BENCH.md]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CONVS=os.environ.get("SCALING_CONVS", "28000"),
        SPARK_GRAFT_QUERIES="200",
    )
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=5400,
        cwd=REPO,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    rec["wall_sec"] = round(time.time() - t0, 1)
    return rec


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = REPO / "BENCH.md"
    results = {}
    for cpus in (8, 32):
        print(f"running bench at local[{cpus}] ...", flush=True)
        results[cpus] = run_bench(cpus, sf_dir)
        print(json.dumps(results[cpus]), flush=True)

    b8, b32 = results[8], results[32]
    tput8 = b8["extra"]["build_turns_per_sec"]
    tput32 = b32["extra"]["build_turns_per_sec"]
    eff_build = round(tput32 / tput8 / 4, 3)
    q8 = b8["queries"]["search_batch50"]
    q32 = b32["queries"]["search_batch50"]
    eff_query = round((q8 / q32) / 4, 3)

    lines = [
        "# BENCH — scaling evidence (N vs 4N parallelism)",
        "",
        "Same deterministic input (partitioning-independent generator, seed=42),",
        f"same job (`bench.py`), two parallelism levels on one machine; sf_dir={sf_dir}.",
        "Efficiency = (T_N / T_4N) / 4 on wall-clock (equivalently throughput_4N /",
        "(4·throughput_N)). North-rule target: ≥ 0.8.",
        "",
        "| metric | local[8] (N) | local[32] (4N) | speedup | efficiency |",
        "|---|---|---|---|---|",
        f"| build wall (s) | {b8['queries']['build_index']} | {b32['queries']['build_index']} "
        f"| {round(b8['queries']['build_index']/b32['queries']['build_index'],2)}× | — |",
        f"| build turns/sec | {tput8} | {tput32} | {round(tput32/tput8,2)}× | **{eff_build}** |",
        f"| 50-query batch (s) | {q8} | {q32} | {round(q8/q32,2)}× | {eff_query} |",
        f"| single query (s) | {b8['queries']['search_single']} | {b32['queries']['search_single']} | — | — |",
        f"| WAND query (s) | {b8['queries']['search_wand']} | {b32['queries']['search_wand']} | — | — |",
        "",
        f"Corpus: {b32['extra']['n_docs']} turns, {b32['extra']['n_terms']} distinct terms.",
        "",
        "Raw bench JSON:",
        "```json",
        json.dumps(b8),
        json.dumps(b32),
        "```",
        "",
        "Caveats: single-machine core-scaling is a *lower bound* proxy for",
        "executor-scaling (shared memory bandwidth, one JVM, constant per-job",
        "driver overhead that a real cluster amortizes over far larger inputs).",
        "Fixed driver-side costs (query planning, manifest hashing) dominate at",
        "this small scale and attenuate measured efficiency; the per-stage data",
        "path is embarrassingly partition-parallel (map-side tokenize/tf, hash",
        "aggs, salted exchanges) with no driver-side loops over data.",
    ]
    out_path.write_text("\n".join(lines) + "\n")
    print(f"wrote {out_path}: build efficiency {eff_build}, query efficiency {eff_query}")


if __name__ == "__main__":
    main()
