"""Matched-conditions per-stage scaling probe (BENCH.md headline table).

Builds the 717k-turn corpus at pinned local[N], reads the build's own
per-stage metrics from the manifest, then times the batch-100 WAND query
and a no-op-kernel variant (scan + seg exchange + Arrow hop only) on the
leg's fresh index.  Run one leg per invocation, pinned, after resting
the box:

    taskset -c 0-1 python tools/stage_probe.py 2
    taskset -c 0-7 python tools/stage_probe.py 8
"""
import sys, time, json, tempfile, shutil, os
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
from splade_easy_spark.session import get_spark
from pyspark.sql import functions as F
from splade_easy_spark.config import IndexConfig
from splade_easy_spark.data import generate_transcripts, generate_query_set
from splade_easy_spark.index import build_index
from splade_easy_spark.query import Searcher
from splade_easy_spark.query.searcher import analyze_query
from splade_easy_spark.query.wand import _pruned_with_tombstones

cpus = int(sys.argv[1])
spark = get_spark("stage_probe", cores=cpus, shuffle_partitions=max(cpus, 16))
spark.sparkContext.setLogLevel("ERROR")
root = "/dev/shm/stage_probe"
shutil.rmtree(root, ignore_errors=True)
os.makedirs(root)
cfg = IndexConfig(build_partitions=max(cpus, 16), term_buckets=64, segment_docs=1 << 14, block_size=128)
tx_dir = f"{root}/tx"
generate_transcripts(spark, num_convs=20000, seed=42).write.parquet(tx_dir)
tx = spark.read.parquet(tx_dir)
idx = f"{root}/idx"
r = build_index(spark, tx, idx, cfg)
man = json.load(open(idx + "/_manifest.json"))
stages = {s: d["metrics"]["elapsed_sec"] for s, d in man["stages"].items()}

s = Searcher(spark, idx, cfg)
qset = generate_query_set(100)
qt = {q["query_id"]: analyze_query(q["text"], cfg) for q in qset}
qt = {k: v for k, v in qt.items() if v}
all_terms = sorted({t for ts in qt.values() for t, _ in ts})
postings = s.cat.read(spark, "postings")

# warmup JVM/code paths once
s.search_many(qset[:5], top_k=10, method="wand").count()

t0 = time.time()
s.search_many(qset, top_k=10, method="wand").count()
full = time.time() - t0

# scan + seg exchange + Arrow hop with a NO-OP kernel (emits one count row)
import pandas as pd
from splade_easy_spark.index.catalog import term_id_py
ids = [term_id_py(t, cfg.term_id_seed) for t in all_terms]
pruned = _pruned_with_tombstones(postings, ids, None, cfg.segment_docs)
def noop(batches):
    n = 0
    for b in batches:
        n += len(b)
    yield pd.DataFrame({"n": [n]})
t0 = time.time()
pruned.mapInPandas(noop, schema="n LONG").agg(F.sum("n")).collect()
hop_only = time.time() - t0

print(json.dumps({"cpus": cpus, "stages": stages, "build_total": r.elapsed_sec,
                  "batch100_full": round(full, 2), "batch100_hop_only": round(hop_only, 2)}))
spark.stop()
shutil.rmtree(root, ignore_errors=True)
