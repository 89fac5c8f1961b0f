"""Block-max pruned top-k retrieval over the packed postings layout.

The physical plan mirrors the reference's shard fan-out + heap merge
(``src/splade_easy/retriever.py:105-122``) but over an *inverted, doc-
segmented* layout:

  postings (partitioned by seg, one complete posting sub-list per term per
  segment) → parquet scan pruned to the query's terms (predicate pushdown;
  files are sorted by term inside each segment partition so row-group stats
  prune) → mapInPandas kernel: per segment, exact BM25 scores via a dense
  NumPy scatter-add accumulator with **block-max MaxScore pruning**
  (WAND-family dynamic pruning: terms processed in descending score upper
  bound; once the remaining terms' upper-bound sum falls below the running
  top-k threshold, later terms can no longer introduce new top-k docs, and
  their blocks are decoded only when their [doc_min, doc_max] range
  intersects surviving candidates — block skipping driven by the per-block
  max-score/min-max metadata) → per-segment top-k candidates → global
  ``orderBy(desc).limit(k)`` (TakeOrderedAndProject: partial top-k per
  partition + driver merge, the reference's exact merge topology).

Scores are EXACT (pruning only skips work that cannot change the top-k),
so this path is rank-identical to the SQL path and to the oracle — asserted
by tests/test_wand.py on every fixture.

Dot-product (BM25) mode only: block max-scores bound Σ w·qw, which does not
bound the cosine ratio; cosine queries use the SQL path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from splade_easy_spark.index.postings import unpack_block


def _score_segment(
    g: pd.DataFrame,
    qw_map: dict[str, float],
    seg_base: int,
    seg_docs: int,
    top_k: int,
    deleted: np.ndarray | None,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact top-k for one segment; returns (doc_ints, scores)."""
    acc = np.zeros(seg_docs, dtype=np.float64)
    touched = np.zeros(seg_docs, dtype=bool)

    # per-term upper bound = qw * max block max_weight
    terms = []
    for term, tg in g.groupby("term", sort=False):
        qw = qw_map[term]
        ub = qw * float(tg["max_weight"].max())
        terms.append((ub, term, tg.sort_values("block_id"), qw))
    terms.sort(key=lambda t: -t[0])
    suffix_ub = np.cumsum([t[0] for t in terms][::-1])[::-1]

    theta = 0.0
    candidates: np.ndarray | None = None  # local indices, None = all docs
    for i, (ub, term, tg, qw) in enumerate(terms):
        remaining_after = suffix_ub[i + 1] if i + 1 < len(terms) else 0.0
        for _, row in tg.iterrows():
            if candidates is not None:
                # candidate-only mode: skip blocks not overlapping survivors
                lo = np.searchsorted(candidates, row["doc_min"] - seg_base)
                if lo >= len(candidates) or candidates[lo] > row["doc_max"] - seg_base:
                    continue  # block-max/range skip
            d, w = unpack_block(row["docs"], row["wts"], int(row["n"]))
            idx = d - seg_base
            acc[idx] += qw * w
            touched[idx] = True
        # update running threshold + candidate set
        if candidates is None:
            t_idx = np.flatnonzero(touched)
            if len(t_idx) >= top_k:
                scores = acc[t_idx]
                kth = np.partition(scores, len(scores) - top_k)[len(scores) - top_k]
                theta = kth
                if remaining_after < theta:
                    # remaining terms cannot create NEW top-k docs
                    keep = t_idx[acc[t_idx] + remaining_after >= theta]
                    candidates = np.sort(keep)
        else:
            candidates = candidates[acc[candidates] + remaining_after >= theta]

    live = np.flatnonzero(touched & (acc > 0))
    if deleted is not None and len(live):
        live = live[~np.isin(live + seg_base, deleted)]
    if len(live) == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64)
    scores = acc[live]
    if len(live) > top_k:
        part = np.argpartition(scores, len(scores) - top_k)[len(scores) - top_k :]
        live, scores = live[part], scores[part]
    order = np.lexsort((live, -scores))
    return (live + seg_base)[order], scores[order]


def wand_search_many_scores(
    spark: SparkSession,
    postings: DataFrame,
    queries_terms: dict[str, list[tuple[str, float]]],
    segment_docs: int,
    top_k: int = 10,
    deleted_doc_ints: list[int] | None = None,
) -> DataFrame:
    """Batch retrieval: (query_id, doc_int, score) per-segment top-k
    candidates for EVERY query in one pass.

    The SQL batch path multiplies each posting row by every query sharing
    its term (a Zipfian head term × 100 queries → 10^8 joined rows).  Here
    each segment's blocks for the union of query terms are decoded ONCE and
    scattered into per-query dense accumulators — work is
    O(Σ_term decode + Σ_(term,query) postings_in_segment) with no join
    blowup materialized, and only per-segment top-k rows leave the kernel.
    """
    term_to_queries: dict[str, list[tuple[int, float]]] = {}
    qids = sorted(queries_terms)
    for qi, qid in enumerate(qids):
        for term, qw in queries_terms[qid]:
            term_to_queries.setdefault(term, []).append((qi, qw))
    all_terms = sorted(term_to_queries)
    b_t2q = spark.sparkContext.broadcast(term_to_queries)
    b_qids = spark.sparkContext.broadcast(qids)
    b_del = spark.sparkContext.broadcast(
        np.array(sorted(deleted_doc_ints), dtype=np.int64) if deleted_doc_ints else None
    )

    pruned = postings.where(F.col("term").isin(all_terms)).repartition(F.col("seg"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        frames = [b for b in batches if len(b)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        t2q = b_t2q.value
        nq = len(b_qids.value)
        deleted = b_del.value
        # bound accumulator memory at ~256 MB per task
        q_chunk = max(1, (256 << 20) // (segment_docs * 9))
        for seg, g in pdf.groupby("seg", sort=False):
            base = int(seg) * segment_docs
            # decode each term's blocks ONCE per segment, reused by chunks
            decoded: dict[str, tuple[np.ndarray, np.ndarray]] = {}
            for term, tg in g.groupby("term", sort=False):
                docs_cat, wts_cat = [], []
                for _, row in tg.iterrows():
                    d, w = unpack_block(row["docs"], row["wts"], int(row["n"]))
                    docs_cat.append(d)
                    wts_cat.append(w)
                decoded[term] = (np.concatenate(docs_cat) - base, np.concatenate(wts_cat))
            out_q, out_d, out_s = [], [], []
            for q0 in range(0, nq, q_chunk):
                qn = min(q_chunk, nq - q0)
                acc = np.zeros((qn, segment_docs), dtype=np.float64)
                touched = np.zeros((qn, segment_docs), dtype=bool)
                for term, (idx, wts) in decoded.items():
                    for qi, qw in t2q[term]:
                        if q0 <= qi < q0 + qn:
                            acc[qi - q0, idx] += qw * wts
                            touched[qi - q0, idx] = True
                for ci in range(qn):
                    live = np.flatnonzero(touched[ci] & (acc[ci] > 0))
                    if deleted is not None and len(live):
                        live = live[~np.isin(live + base, deleted)]
                    if len(live) == 0:
                        continue
                    scores = acc[ci, live]
                    if len(live) > top_k:
                        part = np.argpartition(scores, len(scores) - top_k)[len(scores) - top_k:]
                        live, scores = live[part], scores[part]
                    out_q.extend([b_qids.value[q0 + ci]] * len(live))
                    out_d.extend((live + base).tolist())
                    out_s.extend(scores.tolist())
            if out_q:
                yield pd.DataFrame({"query_id": out_q, "doc_int": out_d, "score": out_s})

    return pruned.mapInPandas(kernel, schema="query_id STRING, doc_int LONG, score DOUBLE")


def wand_search_scores(
    spark: SparkSession,
    postings: DataFrame,
    terms: list[tuple[str, float]],
    segment_docs: int,
    top_k: int = 10,
    deleted_doc_ints: list[int] | None = None,
) -> DataFrame:
    """(doc_int, score) candidates: per-segment exact top-k via the pruned
    kernel, global merge left to the caller's orderBy/limit."""
    qterms = [t for t, _ in terms]
    qw_map = dict(terms)
    b_qw = spark.sparkContext.broadcast(qw_map)
    b_del = spark.sparkContext.broadcast(
        np.array(sorted(deleted_doc_ints), dtype=np.int64) if deleted_doc_ints else None
    )

    # Term filter FIRST (parquet predicate pushdown — only the query's
    # posting lists are read), then colocate each segment's surviving blocks
    # in one partition.  The kernel needs a segment's blocks together to
    # produce complete document scores; this repartition moves only the
    # query's postings (same volume the SQL path shuffles into its join).
    pruned = postings.where(F.col("term").isin(qterms)).repartition(F.col("seg"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        frames = [b for b in batches if len(b)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        for seg, g in pdf.groupby("seg", sort=False):
            base = int(seg) * segment_docs
            d, s = _score_segment(g, b_qw.value, base, segment_docs, top_k, b_del.value)
            if len(d):
                yield pd.DataFrame({"doc_int": d, "score": s})

    return pruned.mapInPandas(kernel, schema="doc_int LONG, score DOUBLE")
