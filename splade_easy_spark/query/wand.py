"""Block-max WAND pruned top-k retrieval over the packed postings layout.

The physical plan mirrors the reference's shard fan-out + heap merge
(``src/splade_easy/retriever.py:105-122``) but over an *inverted, doc-
segmented* layout:

  postings (partitioned by seg, one complete posting sub-list per term per
  segment) → parquet scan pruned to the query's terms (predicate pushdown;
  files are sorted by term inside each segment partition so row-group stats
  prune) → mapInPandas kernel: per segment, exact BM25 scores via a dense
  NumPy scatter-add accumulator with **block-max pruning** → per-segment
  top-k candidates → global ``orderBy(desc).limit(k)``
  (TakeOrderedAndProject: partial top-k per partition + driver merge, the
  reference's exact merge topology).

Pruning inside ``_score_segment`` is a vectorized block-max MaxScore/WAND
hybrid, exact by construction:

  phase 1 (essential terms, descending score upper bound): every block is
  decoded into the dense accumulator — except that once a running top-k
  threshold θ exists, a block is skipped when even its best possible
  outcome, ``max(acc over its doc range) + qw·block_max_weight +
  Σ remaining-term upper bounds``, stays below θ (per-block max_weight
  skipping, the block-max part).  Docs in a skipped block are *proven*
  unable to reach the final top-k, so their understated partial scores can
  never surface (see the invariant note in ``_score_segment``).

  phase 2 (candidate mode): once the remaining terms' upper-bound sum falls
  below θ, no new doc can enter the top-k; the surviving candidate set is
  tracked explicitly with **per-candidate remaining upper bounds computed
  from each candidate's covering block** (searchsorted over block ranges —
  tighter than the global per-term bound), only blocks containing a live
  candidate are decoded, and θ keeps rising from the candidates' exact
  partial scores.

Tombstones never pass through the driver: the ``deleted`` table is packed
into varbyte tombstone rows (``term_id = TOMB_TERM_ID``) that ride the same
seg-colocation exchange as the postings, and the kernel masks dead docs
*before* θ / candidate computation, so deletes can never inflate the
pruning threshold (they are invisible to it) and results equal a
rebuilt-without-them index's.

Scores are EXACT (pruning only skips work that cannot change the top-k),
so this path is rank-identical to the SQL path and to the oracle — asserted
by tests/test_wand.py on every fixture.  Per-segment k-boundary ties are
all kept (everything scoring >= the kth value survives the segment cut) so
the global (score DESC, doc_id ASC) ordering resolves them deterministically.

Both score modes run through the same kernel: dot (BM25) over the raw
packed weights, cosine over the doc-normalized weight stream packed
alongside (``nwts`` = w/‖d‖ with per-block ``max_nweight``) — cosine is a
plain dot product over that stream up to the query-norm factor, which the
caller divides out (monotone: pruning and ranking are unaffected).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from splade_easy_spark.index.catalog import (
    ALLOW_TERM_ID,
    TOMB_TERM_ID,
    term_id_expr,
    term_id_py,
)
from splade_easy_spark.index.postings import unpack_block, varbyte_encode

#: schema of the pruned frame entering the kernels (and of the packed
#: tombstone rows unioned into it).  The term key is the 60-bit content
#: hash (``catalog.term_id_py``) — the postings table stores it natively
#: (round-4 layout) and the legacy string layout projects it JVM-side
#: after its term filter, so the seg exchange, the Arrow hop and the
#: kernel groupby always run over an int64, never a string column.
_PRUNED_SCHEMA = (
    "seg LONG, term_id LONG, block_id INT, n INT, doc_min LONG, "
    "doc_max LONG, max_weight DOUBLE, docs BINARY, wts BINARY, "
    "max_nweight DOUBLE, nwts BINARY"
)


def _query_term_ids(terms: list[str], seed: int) -> dict[str, int]:
    """term → term_id for a query's terms, raising on the (astronomically
    unlikely, ~1/2^60 per pair) driver-visible collision instead of
    silently merging two query terms' weights."""
    ids = {t: term_id_py(t, seed) for t in terms}
    if len(set(ids.values())) != len(ids):
        by_id: dict[int, list[str]] = {}
        for t, i in ids.items():
            by_id.setdefault(i, []).append(t)
        clash = [ts for ts in by_id.values() if len(ts) > 1]
        raise ValueError(
            f"query term_id collision {clash!r}: rebuild the index with a "
            f"different IndexConfig.term_id_seed"
        )
    return ids


def _tombstone_blocks(
    deleted: DataFrame, segment_docs: int, sentinel: int = TOMB_TERM_ID
) -> DataFrame:
    """Pack a doc_int set into postings-schema rows so it rides the
    postings' seg-colocation exchange to its segment's kernel — fully
    distributed (the round-1 driver ``collect()`` of tombstones would
    funnel a heavily-deleted index's millions of ids through the driver per
    query).  Multiple rows per seg are fine; the kernel concatenates.

    ``sentinel`` selects the row kind: TOMB_TERM_ID for an EXCLUSION set
    (deletes, masked out), ALLOW_TERM_ID for the filtered-retrieval
    INCLUSION set (only these doc_ints may score)."""
    dels = deleted.select(
        (F.col("doc_int") / F.lit(segment_docs)).cast("long").alias("seg"),
        "doc_int",
    )

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out: dict[str, list] = {
                k: []
                for k in (
                    "seg", "term_id", "block_id", "n", "doc_min", "doc_max",
                    "max_weight", "docs", "wts", "max_nweight", "nwts",
                )
            }
            for seg, g in pdf.groupby("seg", sort=False):
                ids = np.unique(g["doc_int"].to_numpy().astype(np.int64))
                deltas = np.empty(len(ids), dtype=np.uint64)
                deltas[0] = ids[0]
                deltas[1:] = np.diff(ids).astype(np.uint64)
                out["seg"].append(int(seg))
                out["term_id"].append(sentinel)
                out["block_id"].append(0)
                out["n"].append(int(len(ids)))
                out["doc_min"].append(int(ids[0]))
                out["doc_max"].append(int(ids[-1]))
                out["max_weight"].append(0.0)
                out["docs"].append(varbyte_encode(deltas))
                out["wts"].append(b"")
                out["max_nweight"].append(0.0)
                out["nwts"].append(b"")
            yield pd.DataFrame(out)

    return dels.mapInPandas(pack, schema=_PRUNED_SCHEMA)


def _split_tombstones(
    pdf: pd.DataFrame,
) -> tuple[pd.DataFrame, pd.DataFrame | None, pd.DataFrame | None]:
    """(real, tombstones, allow) — sentinel rows carved off the postings
    frame (real ids are non-negative 60-bit hashes)."""
    mask = pdf["term_id"] < 0
    if not mask.any():
        return pdf, None, None
    neg = pdf[mask]
    tomb = neg[neg["term_id"] == TOMB_TERM_ID]
    allow = neg[neg["term_id"] == ALLOW_TERM_ID]
    return (
        pdf[~mask],
        tomb if len(tomb) else None,
        allow if len(allow) else None,
    )


def _dead_local(tomb: pd.DataFrame | None, seg: int, seg_base: int) -> np.ndarray | None:
    """Segment-local indices of one packed-id frame (tombstones OR allow
    rows — the wire format is identical)."""
    if tomb is None:
        return None
    tg = tomb[tomb["seg"] == seg]
    if not len(tg):
        return None
    parts = [
        unpack_block(b, b"", int(n))[0] for b, n in zip(tg["docs"], tg["n"])
    ]
    return np.unique(np.concatenate(parts)) - seg_base


def _alive_mask(
    seg_docs: int,
    dead: np.ndarray | None,
    wm_local: int | None,
    allow: np.ndarray | None = None,
    allow_active: bool = False,
) -> np.ndarray | None:
    """The eligibility mask every kernel applies BEFORE θ/candidates/output.

    ``allow_active`` distinguishes "no filter" (None mask possible) from
    "filter excludes this whole segment" (an active filter whose allow rows
    never reached this seg means NO doc here is eligible — without the flag
    the kernel would treat the segment as unfiltered and leak disallowed
    docs).  Deletes and the snapshot watermark then clear bits on top."""
    alive: np.ndarray | None = None
    if allow_active:
        alive = np.zeros(seg_docs, dtype=bool)
        if allow is not None and len(allow):
            alive[allow[(allow >= 0) & (allow < seg_docs)]] = True
    if dead is not None and len(dead):
        if alive is None:
            alive = np.ones(seg_docs, dtype=bool)
        alive[dead[(dead >= 0) & (dead < seg_docs)]] = False
    if wm_local is not None and wm_local < seg_docs:
        if alive is None:
            alive = np.ones(seg_docs, dtype=bool)
        alive[max(wm_local, 0):] = False
    return alive


def _score_segment(
    g: pd.DataFrame,
    qw_map: dict[int, float],
    seg_base: int,
    seg_docs: int,
    top_k: int,
    dead_local: np.ndarray | None = None,
    wcol: str = "wts",
    mcol: str = "max_weight",
    wm_local: int | None = None,
    allow_local: np.ndarray | None = None,
    allow_active: bool = False,
) -> tuple[np.ndarray, np.ndarray, int, int]:
    """Exact top-k for one segment.

    Returns (doc_ints, scores, blocks_total, blocks_decoded); ties at the
    k-boundary are all kept (caller's global order resolves them).

    ``wm_local`` is the reader's as-of-open snapshot watermark in segment-
    local coordinates: docs at local index >= wm_local belong to batches
    not yet acknowledged when the reader opened and are masked exactly
    like tombstones (they never touch θ, candidates, or the output).
    Only blocks SPANNING the watermark reach here with post-watermark
    docs — all-post-watermark blocks are dropped by the pushed
    ``doc_min < W`` predicate (searcher._postings).

    Exactness invariant for block skipping: a block is only skipped when
    every doc in it provably cannot reach the final top-k — at the FIRST
    skip touching a doc its accumulated score is still exact, and the skip
    condition bounds its total potential (exact acc + this block's
    qw·max_weight + all remaining terms' upper bounds) strictly below θ,
    which only grows toward the final kth score.  A doc with an understated
    score therefore always ranks strictly below the exact top-k and can
    never be emitted (the per-segment cut keeps >= kth, and understated
    docs are < θ <= kth).
    """
    acc = np.zeros(seg_docs, dtype=np.float64)
    touched = np.zeros(seg_docs, dtype=bool)
    # filtered retrieval rides the same mask as deletes/snapshot: ineligible
    # docs never touch θ, candidates, or the output, and the block-max
    # bounds stay conservative (a block's max over ALL docs ≥ its max over
    # allowed docs), so the exactness invariant below is unchanged
    alive = _alive_mask(seg_docs, dead_local, wm_local, allow_local, allow_active)

    # per term: blocks sorted by doc_min (non-overlapping ascending ranges —
    # pack_postings emits consecutive sorted runs; appended runs start past
    # the previous max doc_int)
    terms = []
    blocks_total = 0
    for term, tg in g.groupby("term_id", sort=False):
        qw = qw_map[term]
        tg = tg.sort_values("doc_min", kind="stable")
        bmin = tg["doc_min"].to_numpy(dtype=np.int64) - seg_base
        bmax = tg["doc_max"].to_numpy(dtype=np.int64) - seg_base
        bubs = qw * tg[mcol].to_numpy(dtype=np.float64)
        bufs = list(zip(tg["docs"], tg[wcol], tg["n"].astype(int)))
        terms.append((float(bubs.max()), term, qw, bmin, bmax, bubs, bufs))
        blocks_total += len(bufs)
    # descending upper bound; term as tiebreak for determinism
    terms.sort(key=lambda t: (-t[0], t[1]))
    ubs = np.array([t[0] for t in terms], dtype=np.float64)
    suffix = np.concatenate((np.cumsum(ubs[::-1])[::-1], [0.0]))

    blocks_decoded = 0
    theta = 0.0
    theta_set = False
    candidates: np.ndarray | None = None  # sorted local indices, None = phase 1
    rem_ub: np.ndarray | None = None  # per-candidate remaining block-max bound

    def covering_ub(bmin_t, bmax_t, bubs_t, cand):
        """Per-candidate upper bound from the covering block of one term
        (0 where no block covers the candidate)."""
        pos = np.searchsorted(bmin_t, cand, side="right") - 1
        cov = pos >= 0
        cov[cov] = cand[cov] <= bmax_t[pos[cov]]
        out = np.zeros(len(cand), dtype=np.float64)
        out[cov] = bubs_t[pos[cov]]
        return out

    for i, (ub, term, qw, bmin, bmax, bubs, bufs) in enumerate(terms):
        remaining_after = float(suffix[i + 1])
        if candidates is None:
            for j, (dbuf, wbuf, n) in enumerate(bufs):
                if theta_set:
                    lo, hi = int(bmin[j]), int(bmax[j]) + 1
                    if acc[lo:hi].max() + bubs[j] + remaining_after < theta:
                        continue  # block-max skip (phase-1)
                d, w = unpack_block(dbuf, wbuf, int(n))
                blocks_decoded += 1
                idx = d - seg_base
                acc[idx] += qw * w
                if alive is None:
                    touched[idx] = True
                else:
                    touched[idx] = alive[idx]
            t_idx = np.flatnonzero(touched)
            if len(t_idx) >= top_k:
                scores = acc[t_idx]
                kth = np.partition(scores, len(scores) - top_k)[len(scores) - top_k]
                theta = max(theta, float(kth))
                theta_set = True
                if remaining_after < theta:
                    # no untouched doc can reach θ — freeze the candidate set
                    keep = t_idx[acc[t_idx] + remaining_after >= theta]
                    candidates = np.sort(keep)
                    rem_ub = np.zeros(len(candidates), dtype=np.float64)
                    for (_, _, _, bmin2, bmax2, bubs2, _) in terms[i + 1 :]:
                        rem_ub += covering_ub(bmin2, bmax2, bubs2, candidates)
                    sel = acc[candidates] + rem_ub >= theta
                    candidates, rem_ub = candidates[sel], rem_ub[sel]
        else:
            if len(candidates) == 0:
                break
            # decode only blocks containing >=1 surviving candidate
            pos_lo = np.searchsorted(candidates, bmin)
            has_c = pos_lo < len(candidates)
            needed = has_c.copy()
            needed[has_c] = candidates[pos_lo[has_c]] <= bmax[has_c]
            for j in np.flatnonzero(needed):
                dbuf, wbuf, n = bufs[j]
                d, w = unpack_block(dbuf, wbuf, int(n))
                blocks_decoded += 1
                idx = d - seg_base
                acc[idx] += qw * w
            # retire this term's per-candidate bound, tighten θ, re-filter
            rem_ub = rem_ub - covering_ub(bmin, bmax, bubs, candidates)
            cs = acc[candidates]
            if len(cs) >= top_k:
                kth = np.partition(cs, len(cs) - top_k)[len(cs) - top_k]
                theta = max(theta, float(kth))
            sel = cs + rem_ub >= theta
            candidates, rem_ub = candidates[sel], rem_ub[sel]

    if candidates is not None:
        live = candidates[acc[candidates] > 0]
    else:
        live = np.flatnonzero(touched & (acc > 0))
    if len(live) == 0:
        return (
            np.zeros(0, dtype=np.int64),
            np.zeros(0, dtype=np.float64),
            blocks_total,
            blocks_decoded,
        )
    scores = acc[live]
    if len(live) > top_k:
        kth = np.partition(scores, len(scores) - top_k)[len(scores) - top_k]
        sel = scores >= kth  # keep k-boundary ties for the global tiebreak
        live, scores = live[sel], scores[sel]
    order = np.lexsort((live, -scores))
    return (live + seg_base)[order], scores[order], blocks_total, blocks_decoded


def _pruned_with_tombstones(
    postings: DataFrame,
    qterm_ids: list[int],
    deleted: DataFrame | None,
    segment_docs: int,
    wcol: str = "wts",
    mcol: str = "max_weight",
    qterms_legacy: list[str] | None = None,
    term_id_seed: int = 0,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """Term filter FIRST (parquet predicate pushdown — only the query's
    posting lists are read), prune to the columns THIS score mode's kernel
    reads, union the packed tombstones, then colocate each segment's
    surviving blocks in one partition.  The kernel needs a segment's blocks
    together to produce complete document scores; this repartition moves
    only the query's postings (same volume the SQL path shuffles into its
    join).

    On the round-4 layout the filter is ``term_id IN (...)`` — an int64
    predicate against the natively-stored hash, pushed to parquet row-group
    stats exactly like the string filter was.  On a legacy index
    (``qterms_legacy`` given) the string filter still pushes down and the
    hash is projected JVM-side above the scan, so the exchange/hop/kernel
    see the identical int64-keyed frame either way.

    The column pruning matters as much as the term filter: the postings
    table carries BOTH weight streams (``wts`` and the cosine-mode
    ``nwts``, equal-sized) plus ``block_id``; a dot-mode query that
    shipped the full schema would pay ~2× the weight bytes through the
    seg exchange AND the Arrow hop into the kernel — the measured scaling
    cap on this box is exactly bytes through that hop.  The projection
    lands below the exchange (Catalyst pushes it into the scan), so the
    unused stream is never read, shuffled, or IPC'd."""
    cols = ["seg", "term_id", "n", "doc_min", "doc_max", mcol, "docs", wcol]
    if qterms_legacy is not None:
        pruned = (
            postings.where(F.col("term").isin(qterms_legacy))
            .withColumn("term_id", term_id_expr(F.col("term"), term_id_seed))
            .select(*cols)
        )
    else:
        pruned = postings.where(F.col("term_id").isin(qterm_ids)).select(*cols)
    if deleted is not None:
        pruned = pruned.unionByName(
            _tombstone_blocks(deleted, segment_docs).select(*cols)
        )
    if allowed is not None:
        # the filtered-retrieval inclusion set rides the identical packed
        # wire format under its own sentinel; pack cost ∝ |allowed| — the
        # selective-filter case this path exists for keeps it tiny
        pruned = pruned.unionByName(
            _tombstone_blocks(allowed, segment_docs, ALLOW_TERM_ID).select(*cols)
        )
    return pruned.repartition(F.col("seg"))


def wand_search_scores(
    spark: SparkSession,
    postings: DataFrame,
    terms: list[tuple[str, float]],
    segment_docs: int,
    top_k: int = 10,
    deleted: DataFrame | None = None,
    use_cosine: bool = False,
    term_id_seed: int = 0,
    snapshot_max: int | None = None,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """(doc_int, score) candidates: per-segment exact top-k via the pruned
    kernel, global merge left to the caller's orderBy/limit.

    ``allowed``: filtered retrieval — a (doc_int) frame of the docs a
    filter permits.  Packed and shipped like tombstones, masked in the
    kernel BEFORE θ (block-max bounds stay conservative upper bounds over
    the allowed subset, so exactness is unchanged); segments none of whose
    docs are allowed are skipped outright.  Pack cost ∝ |allowed| — use
    this path for selective filters, the SQL path for broad ones.

    ``snapshot_max``: the reader's as-of-open watermark — docs with
    ``doc_int >= snapshot_max`` are masked exactly in the kernel (blocks
    merged across the watermark by a concurrent optimize are decoded and
    row-filtered, never dropped whole; see searcher._postings).

    ``use_cosine`` runs the SAME kernel over the normalized weight stream
    (``nwts``/``max_nweight``: w/‖d‖ packed at build time) — cosine is then
    a plain dot product, Σ qw·(w/‖d‖), up to the query-norm factor the
    caller divides out (monotone, so pruning and ranking are unaffected).

    The postings layout (native int64 ``term_id`` vs legacy ``term``
    string) is detected from the frame's columns; ``term_id_seed`` must be
    the index's recorded seed (manifest layout)."""
    qterms = [t for t, _ in terms]
    ids = _query_term_ids(qterms, term_id_seed)
    b_qw = spark.sparkContext.broadcast({ids[t]: w for t, w in terms})
    wcol, mcol = ("nwts", "max_nweight") if use_cosine else ("wts", "max_weight")
    filter_active = allowed is not None
    pruned = _pruned_with_tombstones(
        postings, [ids[t] for t in qterms], deleted, segment_docs, wcol, mcol,
        qterms_legacy=None if "term_id" in postings.columns else qterms,
        term_id_seed=term_id_seed, allowed=allowed,
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        frames = [b for b in batches if len(b)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        real, tomb, allow = _split_tombstones(pdf)
        for seg, g in real.groupby("seg", sort=False):
            base = int(seg) * segment_docs
            alw = _dead_local(allow, seg, base)
            if filter_active and alw is None:
                continue  # active filter, no allowed doc in this segment
            dead = _dead_local(tomb, seg, base)
            wm = None if snapshot_max is None else int(snapshot_max) - base
            d, s, _, _ = _score_segment(
                g, b_qw.value, base, segment_docs, top_k, dead, wcol, mcol,
                wm_local=wm, allow_local=alw, allow_active=filter_active,
            )
            if len(d):
                yield pd.DataFrame({"doc_int": d, "score": s})

    return pruned.mapInPandas(kernel, schema="doc_int LONG, score DOUBLE")


def wand_profile(
    spark: SparkSession,
    postings: DataFrame,
    terms: list[tuple[str, float]],
    segment_docs: int,
    top_k: int = 10,
    deleted: DataFrame | None = None,
    use_cosine: bool = False,
    term_id_seed: int = 0,
    snapshot_max: int | None = None,
) -> DataFrame:
    """Instrumented run: per-segment (blocks_total, blocks_decoded) for the
    same exact computation — the pruning-effectiveness probe behind the
    ``wand_block_skip_ratio`` bench entry."""
    qterms = [t for t, _ in terms]
    ids = _query_term_ids(qterms, term_id_seed)
    b_qw = spark.sparkContext.broadcast({ids[t]: w for t, w in terms})
    wcol, mcol = ("nwts", "max_nweight") if use_cosine else ("wts", "max_weight")
    pruned = _pruned_with_tombstones(
        postings, [ids[t] for t in qterms], deleted, segment_docs, wcol, mcol,
        qterms_legacy=None if "term_id" in postings.columns else qterms,
        term_id_seed=term_id_seed,
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        frames = [b for b in batches if len(b)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        real, tomb, _allow = _split_tombstones(pdf)
        segs, bt, bd = [], [], []
        for seg, g in real.groupby("seg", sort=False):
            base = int(seg) * segment_docs
            dead = _dead_local(tomb, seg, base)
            wm = None if snapshot_max is None else int(snapshot_max) - base
            _, _, total, decoded = _score_segment(
                g, b_qw.value, base, segment_docs, top_k, dead, wcol, mcol,
                wm_local=wm,
            )
            segs.append(int(seg))
            bt.append(total)
            bd.append(decoded)
        if segs:
            yield pd.DataFrame(
                {"seg": segs, "blocks_total": bt, "blocks_decoded": bd}
            )

    return pruned.mapInPandas(
        kernel, schema="seg LONG, blocks_total LONG, blocks_decoded LONG"
    )


def _batch_segment(
    g: pd.DataFrame,
    queries: list[tuple[str, list[tuple[int, float]]]],
    base: int,
    segment_docs: int,
    top_k: int,
    dead: np.ndarray | None,
    wcol: str,
    mcol: str,
    wm_local: int | None = None,
    allow: np.ndarray | None = None,
    allow_active: bool = False,
) -> tuple[list, list, list, int, int]:
    """Exact batch top-k for one segment; shared by the live batch kernel
    and the profile kernel.  ``wm_local`` masks post-snapshot docs exactly
    like tombstones (see ``_score_segment``).

    Returns (query_ids, doc_ints, scores, blocks_total, blocks_decoded).

    Decode policy is **once per term, whole list** (round-4 measurement):
    round 3 decoded blocks lazily through a per-block cache with block-max
    probes, betting that a batch would leave many blocks packed.  Measured
    across the regimes that matter — 5k and 50k vocabularies, 2–7-term and
    SPLADE-like 24-term queries, 100–500-query batches — the batch decode
    ratio never left 0.97–1.00: rare terms carry the HIGHEST idf, so every
    query scatters its rare (thin) terms first and cuts its common (fat)
    ones, and across even a modest batch some query always ends up needing
    each matched term.  The per-block probes were pure overhead at batch
    scale (a 500-query run was ~40% slower before the round-3 fast path
    papered over them), so the cache is gone: a term's posting list is
    decoded in full the first time ANY query scatters it or repairs
    through it, then every later use is one vectorized scatter/gather.

    What still stays packed: terms MaxScore-cut by every query that
    carries them whose block ranges (checked against candidate doc ids
    with metadata only — searchsorted over bmin/bmax, no decode) never
    cover a surviving candidate.  Single queries keep real block-level
    skipping in ``_score_segment`` (skip ratio ~0.6 on the bench corpus);
    that is the right tool for k≈1–5 queries, this kernel is the right
    tool for batches.

    Each term's block rows are sorted by ``doc_min`` before use — rows
    arrive through a ``repartition(seg)`` shuffle and, on appended indexes,
    from multiple parquet files whose read order Spark picks by size, so
    raw partition order is NOT ascending (the round-2 batch kernel assumed
    it was, corrupting the searchsorted repair on appended indexes).
    """
    alive = _alive_mask(segment_docs, dead, wm_local, allow, allow_active)

    # per-term: block ranges (doc_min ascending, non-overlapping — see
    # _score_segment), packed buffers, decode slot, score upper bound
    meta: dict[int, list] = {}
    blocks_total = 0
    for term, tg in g.groupby("term_id", sort=False):
        tg = tg.sort_values("doc_min", kind="stable")
        bmin = tg["doc_min"].to_numpy(dtype=np.int64) - base
        bmax = tg["doc_max"].to_numpy(dtype=np.int64) - base
        bufs = list(zip(tg["docs"], tg[wcol], tg["n"].astype(int)))
        # slots: 0=bmin 1=bmax 2=bufs 3=decoded (idx, wts) 4=max weight
        meta[term] = [bmin, bmax, bufs, None, float(tg[mcol].max())]
        blocks_total += len(bufs)

    n_decoded = 0

    def full(tm: list) -> tuple[np.ndarray, np.ndarray]:
        """The term's whole posting list (idx ascending), decoded once."""
        nonlocal n_decoded
        if tm[3] is None:
            parts = [unpack_block(d, w, int(n)) for d, w, n in tm[2]]
            if len(parts) == 1:
                tm[3] = (parts[0][0] - base, parts[0][1])
            else:
                tm[3] = (
                    np.concatenate([p[0] for p in parts]) - base,
                    np.concatenate([p[1] for p in parts]),
                )
            n_decoded += len(tm[2])
        return tm[3]

    acc = np.zeros(segment_docs, dtype=np.float64)
    out_q: list[str] = []
    out_d: list[int] = []
    out_s: list[float] = []
    for qid, qterms in queries:
        # per-query MaxScore: terms descending by upper bound; once the
        # remaining terms' ub-sum falls below a running lower bound θ of
        # the final kth score, STOP scattering — docs not yet touched
        # cannot enter the top-k, and the skipped terms' contributions to
        # surviving candidates are repaired exactly afterwards.
        present = [
            (qw * meta[t][4], t, qw)
            for t, qw in qterms
            if t in meta and meta[t][4] > 0.0
        ]
        if not present:
            continue
        present.sort(key=lambda x: (-x[0], x[1]))
        ubs = np.array([p[0] for p in present])
        suffix = np.concatenate((np.cumsum(ubs[::-1])[::-1], [0.0]))
        acc.fill(0.0)
        theta = 0.0
        theta_set = False
        cut = len(present)
        for i, (_ub, term, qw) in enumerate(present):
            if theta_set and suffix[i] < theta:
                cut = i  # remaining terms cannot create new top-k docs
                break
            sidx, swts = full(meta[term])
            acc[sidx] += qw * swts
            # cheap θ lower bound: kth largest of the LIVE accs on the
            # postings scattered so far (a subset's kth is ≤ the global
            # kth, so pruning stays safe; dead docs excluded or θ would
            # overstate and prune true post-delete winners)
            vals = acc[sidx] if alive is None else acc[sidx[alive[sidx]]]
            if len(vals) >= top_k:
                kth = np.partition(vals, len(vals) - top_k)[len(vals) - top_k]
                if kth > 0:
                    theta = max(theta, float(kth))
                    theta_set = True
        live = np.flatnonzero(acc > 0)
        if alive is not None and len(live):
            live = live[alive[live]]
        if len(live) == 0:
            continue
        if cut < len(present):
            # candidate filter with the skipped tail's ub, then exact
            # repair of those terms on survivors only.  The coverage test
            # runs on block METADATA (searchsorted over the sorted
            # non-overlapping ranges): a cut term none of whose blocks
            # contains a surviving candidate is never decoded at all.
            rem = float(suffix[cut])
            live = live[acc[live] + rem >= theta]
            for _, term, qw in present[cut:]:
                tm = meta[term]
                if tm[3] is None:
                    bmin, bmax = tm[0], tm[1]
                    pos = np.searchsorted(bmin, live, side="right") - 1
                    cov = pos >= 0
                    cov[cov] = live[cov] <= bmax[pos[cov]]
                    if not cov.any():
                        continue  # no candidate in any block range: skip
                fidx, fwts = full(tm)
                p = np.searchsorted(fidx, live)
                ok = p < len(fidx)
                ok[ok] = fidx[p[ok]] == live[ok]
                acc[live[ok]] += qw * fwts[p[ok]]
        scores = acc[live]
        if len(live) > top_k:
            kth = np.partition(scores, len(scores) - top_k)[len(scores) - top_k]
            sel = scores >= kth  # keep k-boundary ties
            live, scores = live[sel], scores[sel]
        out_q.extend([qid] * len(live))
        out_d.extend((live + base).tolist())
        out_s.extend(scores.tolist())
    return out_q, out_d, out_s, blocks_total, n_decoded


def _batch_prepared(
    spark: SparkSession,
    postings: DataFrame,
    queries_terms: dict[str, list[tuple[str, float]]],
    segment_docs: int,
    deleted: DataFrame | None,
    use_cosine: bool,
    term_id_seed: int = 0,
    allowed: DataFrame | None = None,
):
    qids = sorted(queries_terms)
    all_terms = sorted({t for ts in queries_terms.values() for t, _ in ts})
    ids = _query_term_ids(all_terms, term_id_seed)
    b_queries = spark.sparkContext.broadcast(
        [
            (qid, sorted((ids[t], w) for t, w in queries_terms[qid]))
            for qid in qids
        ]
    )
    wcol, mcol = ("nwts", "max_nweight") if use_cosine else ("wts", "max_weight")
    pruned = _pruned_with_tombstones(
        postings, [ids[t] for t in all_terms], deleted, segment_docs, wcol, mcol,
        qterms_legacy=None if "term_id" in postings.columns else all_terms,
        term_id_seed=term_id_seed, allowed=allowed,
    )
    return b_queries, wcol, mcol, pruned


def wand_search_many_scores(
    spark: SparkSession,
    postings: DataFrame,
    queries_terms: dict[str, list[tuple[str, float]]],
    segment_docs: int,
    top_k: int = 10,
    deleted: DataFrame | None = None,
    use_cosine: bool = False,
    term_id_seed: int = 0,
    snapshot_max: int | None = None,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """Batch retrieval: (query_id, doc_int, score) per-segment top-k
    candidates for EVERY query in one pass.

    ``allowed`` is the filtered-retrieval inclusion set, shared by every
    query in the batch (see ``wand_search_scores`` — same wire format,
    same exactness argument, ONE pack for the whole batch).

    The SQL batch path multiplies each posting row by every query sharing
    its term (a Zipfian head term × 100 queries → 10^8 joined rows).  Here
    each segment's blocks for the union of query terms are decoded AT MOST
    once (decode-once per term — see ``_batch_segment``; terms no query needs stay
    packed) and scattered into per-query dense accumulators — work is
    O(Σ_term needed-block decode + Σ_(term,query) postings_in_segment)
    with no join blowup materialized, and only per-segment top-k rows
    leave the kernel.
    """
    filter_active = allowed is not None
    b_queries, wcol, mcol, pruned = _batch_prepared(
        spark, postings, queries_terms, segment_docs, deleted, use_cosine,
        term_id_seed, allowed=allowed,
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        frames = [b for b in batches if len(b)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        real, tomb, allow = _split_tombstones(pdf)
        for seg, g in real.groupby("seg", sort=False):
            base = int(seg) * segment_docs
            alw = _dead_local(allow, seg, base)
            if filter_active and alw is None:
                continue  # active filter, no allowed doc in this segment
            dead = _dead_local(tomb, seg, base)
            wm = None if snapshot_max is None else int(snapshot_max) - base
            out_q, out_d, out_s, _, _ = _batch_segment(
                g, b_queries.value, base, segment_docs, top_k, dead, wcol, mcol,
                wm_local=wm, allow=alw, allow_active=filter_active,
            )
            if out_q:
                yield pd.DataFrame({"query_id": out_q, "doc_int": out_d, "score": out_s})

    return pruned.mapInPandas(kernel, schema="query_id STRING, doc_int LONG, score DOUBLE")


def wand_search_many_scores_nox(
    spark: SparkSession,
    postings: DataFrame,
    queries_terms: dict[str, list[tuple[str, float]]],
    segment_docs: int,
    top_k: int = 10,
    deleted: DataFrame | None = None,
    use_cosine: bool = False,
    term_id_seed: int = 0,
    snapshot_max: int | None = None,
) -> DataFrame:
    """EXCHANGE-FREE batch scoring (the round-4 VERDICT #1 experiment).

    Scores are additive over block runs, so the batch kernel does not
    *need* segment colocation: this path runs the scatter kernel directly
    on the scan output — term filter + column prune, **no
    ``repartition(seg)``** — each task scores whatever postings blocks it
    was handed and emits partial ``(query, doc_int, partial_score)`` sums;
    a ``groupBy(query, doc_int).sum`` + per-query top-k above merges them
    (the doc-grain partial frame is the thing shuffled, instead of the
    postings blocks).

    Trade-offs vs ``wand_search_many_scores`` (the colocated kernel):

    * deleted: the ``repartition(seg)`` exchange AND its post-shuffle
      Arrow hop — on the sandbox box exactly the stage the measured
      0.48–0.54 IPC passthrough ceiling throttles;
    * lost: per-query MaxScore term cuts and the per-segment top-k cut —
      a task holding half a segment cannot prove anything about final
      ranks, so EVERY matched posting is scattered and EVERY matched
      (query, doc) pair leaves the kernel (k rows/query/segment for the
      colocated kernel vs all-matched-docs/query here), then pays a
      doc-grain shuffle the colocated path never does.

    Exactness: trivially exact (no pruning anywhere).  Tombstones and the
    snapshot watermark are row-grain filters on the summed frame — they
    cannot ride a seg exchange that no longer exists, and masking AFTER
    the sum is equivalent because masks are per-doc, not per-block.
    Both paths are A/B'd by the 2→8 scaling harness; see BENCH.md."""
    qids = sorted(queries_terms)
    all_terms = sorted({t for ts in queries_terms.values() for t, _ in ts})
    ids = _query_term_ids(all_terms, term_id_seed)
    # inverted query map: term_id -> [(query index, qweight)] — the kernel
    # scatters each decoded term ONCE per query carrying it
    by_term: dict[int, list[tuple[int, float]]] = {}
    for qi, qid in enumerate(qids):
        for t, w in queries_terms[qid]:
            by_term.setdefault(ids[t], []).append((qi, w))
    b_by_term = spark.sparkContext.broadcast(by_term)
    wcol = "nwts" if use_cosine else "wts"
    mcol = "max_nweight" if use_cosine else "max_weight"
    cols = ["seg", "term_id", "n", "doc_min", "doc_max", mcol, "docs", wcol]
    if "term_id" in postings.columns:
        pruned = postings.where(
            F.col("term_id").isin([ids[t] for t in all_terms])
        ).select(*cols)
    else:
        pruned = (
            postings.where(F.col("term").isin(all_terms))
            .withColumn("term_id", term_id_expr(F.col("term"), term_id_seed))
            .select(*cols)
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        frames = [b for b in batches if len(b)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        bt = b_by_term.value
        acc = np.zeros(segment_docs, dtype=np.float64)
        for seg, g in pdf.groupby("seg", sort=False):
            base = int(seg) * segment_docs
            wm = None if snapshot_max is None else int(snapshot_max) - base
            # decode each term's blocks present in THIS task once, then
            # scatter per carrying query into a dense per-segment acc
            decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {}
            for term, tg in g.groupby("term_id", sort=False):
                parts = [
                    unpack_block(d, w, int(n))
                    for d, w, n in zip(tg["docs"], tg[wcol], tg["n"])
                ]
                idx = (
                    np.concatenate([p[0] for p in parts])
                    if len(parts) > 1
                    else parts[0][0]
                ) - base
                wts = (
                    np.concatenate([p[1] for p in parts])
                    if len(parts) > 1
                    else parts[0][1]
                )
                if wm is not None and wm < segment_docs:
                    keep = idx < max(wm, 0)
                    idx, wts = idx[keep], wts[keep]
                if len(idx):
                    decoded[int(term)] = (idx, wts)
            # per-query partial sums over this task's fragment of the seg
            per_q: dict[int, list[tuple[np.ndarray, np.ndarray]]] = {}
            for term, (idx, wts) in decoded.items():
                for qi, qw in bt.get(term, ()):
                    per_q.setdefault(qi, []).append((idx, qw * wts))
            for qi, contribs in per_q.items():
                if len(contribs) == 1:
                    live, vals = contribs[0]
                    out_d, out_s = live + base, vals
                else:
                    acc.fill(0.0)
                    touched_parts = []
                    for idx, vals in contribs:
                        acc[idx] += vals
                        touched_parts.append(idx)
                    live = np.unique(np.concatenate(touched_parts))
                    out_d, out_s = live + base, acc[live]
                yield pd.DataFrame(
                    {
                        "q": np.full(len(out_d), qi, dtype=np.int32),
                        "doc_int": out_d.astype(np.int64),
                        "score": out_s.astype(np.float64),
                    }
                )

    part = pruned.mapInPandas(kernel, schema="q INT, doc_int LONG, score DOUBLE")
    scores = (
        part.groupBy("q", "doc_int")
        .agg(F.sum("score").alias("score"))
        .where(F.col("score") > 0)
    )
    if deleted is not None:
        scores = scores.join(
            F.broadcast(deleted.select("doc_int")), "doc_int", "left_anti"
        )
    scores = scores.select("q", "doc_int", "score")
    qmap = spark.createDataFrame(
        list(enumerate(qids)), "q INT, query_id STRING"
    )

    # partial per-partition top-k before the caller's global window — the
    # summed frame still holds EVERY matched doc per query (no per-segment
    # cut exists on this path)
    def partial_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [b for b in batches if len(b)]
        if not parts:
            return
        allp = pd.concat(parts, ignore_index=True)
        allp = allp.sort_values(
            ["q", "score", "doc_int"], ascending=[True, False, True]
        )
        yield allp.groupby("q", sort=False).head(top_k)

    scores = scores.mapInPandas(
        partial_topk, schema="q INT, doc_int LONG, score DOUBLE"
    )
    return scores.join(F.broadcast(qmap), "q").select("query_id", "doc_int", "score")


def wand_batch_profile(
    spark: SparkSession,
    postings: DataFrame,
    queries_terms: dict[str, list[tuple[str, float]]],
    segment_docs: int,
    top_k: int = 10,
    deleted: DataFrame | None = None,
    use_cosine: bool = False,
    term_id_seed: int = 0,
    snapshot_max: int | None = None,
) -> DataFrame:
    """Instrumented batch run: per-segment (blocks_total, blocks_decoded)
    for the same exact computation — the probe behind the
    ``batch_block_decode_ratio`` bench entry (terms no query in the batch
    scattered or repaired through stay packed)."""
    b_queries, wcol, mcol, pruned = _batch_prepared(
        spark, postings, queries_terms, segment_docs, deleted, use_cosine,
        term_id_seed,
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        frames = [b for b in batches if len(b)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        real, tomb, _allow = _split_tombstones(pdf)
        segs, bt, bd = [], [], []
        for seg, g in real.groupby("seg", sort=False):
            base = int(seg) * segment_docs
            dead = _dead_local(tomb, seg, base)
            wm = None if snapshot_max is None else int(snapshot_max) - base
            _, _, _, total, decoded = _batch_segment(
                g, b_queries.value, base, segment_docs, top_k, dead, wcol, mcol,
                wm_local=wm,
            )
            segs.append(int(seg))
            bt.append(total)
            bd.append(decoded)
        if segs:
            yield pd.DataFrame(
                {"seg": segs, "blocks_total": bt, "blocks_decoded": bd}
            )

    return pruned.mapInPandas(
        kernel, schema="seg LONG, blocks_total LONG, blocks_decoded LONG"
    )
