"""Index maintenance: soft delete, compact, reshard, stats.

Semantics mirror the reference (SURVEY.md §2.2), including one subtle
contract: **delete/compact never change surviving documents' scores.**  The
reference stores each doc's vector at write time, so removing docs leaves
other vectors untouched (``src/splade_easy/index.py:221-266`` rewrites live
docs verbatim).  Our BM25 weights are likewise *frozen at build time*:
compaction filters and repacks, it does not re-derive df/avgdl (a separate
full rebuild refreshes statistics).  This is asserted by
tests/test_maintenance.py (search results identical before/after compact).

Atomic table swap: new data is written to ``<table>__rewrite``, then
directories are exchanged and the manifest committed — the analog of the
reference's staged ``_reshard_temp`` + atomic metadata rename + rollback
(``src/splade_easy/reshard.py:34-124``).  A crash mid-rewrite leaves the
live table untouched (the ``__rewrite`` dir is garbage-collected on the
next maintenance run).
"""

from __future__ import annotations

import shutil
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from splade_easy_spark.config import IndexConfig
from splade_easy_spark.index.builder import pack_doc_terms
from splade_easy_spark.index.catalog import IndexCatalog


def _swap_in(cat: IndexCatalog, name: str, keep_old: bool = False) -> None:
    """Promote ``<name>__rewrite`` to ``<name>`` (old moved away first so a
    failure between the two renames cannot leave a half-written live dir).
    With ``keep_old`` the previous layout is retained as ``<name>__backup``
    for ``rollback_reshard`` — the analog of the reference's
    ``keep_originals`` renaming shards to ``.fb.backup``
    (``src/splade_easy/reshard.py:22,102-115``).

    Tolerates a concurrent reader's ``heal_interrupted_swaps`` (which runs
    at every Searcher open and restores ``__old`` → live inside the
    two-rename window): the second rename then fails, and the swap is
    simply retried — the healer only acts while live is missing, so a
    bounded retry wins the race.  On final failure the live dir is
    restored from the moved-away copy and the error propagates (the
    rewrite staging is left for the caller/GC)."""
    live = Path(cat.table_dir(name))
    new = live.with_name(live.name + "__rewrite")
    trash = live.with_name(live.name + ("__backup" if keep_old else "__old"))
    last_err: OSError | None = None
    for _ in range(3):
        # trash may hold the ONLY copy of the table if a previous attempt's
        # restore failed (or a prior crash) — never delete it while live is
        # missing; restore it instead so every retry starts from a live dir
        if trash.exists():
            if not live.exists():
                try:
                    trash.rename(live)
                except OSError as e:
                    last_err = e
                    continue
            else:
                try:
                    shutil.rmtree(trash)
                except OSError as e:
                    last_err = e
                    continue
        try:
            live.rename(trash)
        except OSError as e:
            last_err = e
            continue
        try:
            new.rename(live)
        except OSError as e:
            last_err = e
            if not live.exists():  # not the healer: put the table back
                try:
                    trash.rename(live)
                except OSError:
                    pass
            continue
        if not keep_old:
            shutil.rmtree(trash, ignore_errors=True)
        return
    # leave the table live if at all possible before giving up
    if not live.exists() and trash.exists():
        try:
            trash.rename(live)
        except OSError:
            pass
    raise RuntimeError(
        f"table swap for {name!r} did not land after 3 attempts"
    ) from last_err


def heal_interrupted_swaps(index_dir: str | Path) -> list[str]:
    """Repair ``optimize_postings``' per-partition swap window.

    The swap is ``live.rename(<part>__old)`` → ``staged.rename(live)`` →
    ``rmtree(<part>__old)``; a crash between the two renames leaves the
    live partition dir missing and ``<part>__old`` in its place, and a
    crash before the rmtree leaves both.  Either state breaks Hive
    partition inference for the whole table (``seg=5__old`` is not a
    LONG, so ``seg`` falls back to string and the kernels' ``int(seg)``
    raises).  Healing is rename-only and idempotent: restore ``__old``
    when the live dir is missing (pre-optimize state — optimize is
    byte-preserving and simply reruns), delete it when the swap already
    completed.  Returns the partition dirs touched.  Safe to call from
    read-only contexts: rename failures are swallowed (nothing to heal
    is the overwhelmingly common case and costs one listdir per table)."""
    healed: list[str] = []
    root = Path(index_dir)
    if not root.exists():
        return healed
    # top-level table swaps (_swap_in, used by compact/reshard) have the
    # same two-rename window: a crash leaves `<table>__old` holding the
    # ONLY copy of the table while `<table>__rewrite` staging still exists
    # — and _gc_rewrite_dirs deletes both unless the table is restored
    # first.  Restore when the live dir is missing; a completed swap's
    # leftover `__old` is deleted by the GC, not here (top-level `__old`
    # dirs don't break reads the way nested partition dirs do).
    for suffix in ("__old", "__backup"):
        for old in root.glob(f"*{suffix}"):
            live = old.with_name(old.name[: -len(suffix)])
            if not live.exists():
                # live missing = the swap never completed; restore.  (A
                # *completed* keep_old swap leaves __backup NEXT TO live
                # for rollback_reshard — untouched here.)
                try:
                    old.rename(live)
                    healed.append(str(old))
                except OSError:
                    pass
    for tdir in root.iterdir():
        if not tdir.is_dir() or tdir.name.endswith(("__rewrite", "__old", "__backup")):
            continue
        for old in tdir.glob("*__old"):
            live = old.with_name(old.name[: -len("__old")])
            try:
                if live.exists():
                    shutil.rmtree(old, ignore_errors=True)
                else:
                    old.rename(live)
                healed.append(str(old))
            except OSError:
                pass  # read-only replica: the next maintenance run heals
    return healed


def _swap_partition(live: Path, new: Path) -> bool:
    """Per-partition swap used by ``optimize_postings``, tolerant of a
    CONCURRENT reader's ``heal_interrupted_swaps`` (which runs at every
    Searcher open): if a reader restores ``<part>__old`` to ``live``
    between our two renames, the second rename fails — the pre-optimize
    content is back in place (correct, just unmerged), so the staged
    replacement for this partition is discarded and the caller skips it.
    All rmtrees ignore errors for the same reason (the healer may delete
    ``__old`` first).  Returns True when the swap landed."""
    old = live.with_name(live.name + "__old")
    if old.exists():
        shutil.rmtree(old, ignore_errors=True)
    try:
        live.rename(old)
    except OSError:
        return False
    try:
        new.rename(live)
    except OSError:
        # two distinct causes: a concurrent heal restored `live` from
        # `old` (then `old` is stale and safe to drop), or the rename
        # failed for its own reasons with `live` still MISSING — in which
        # case `old` holds the only copy and must be put back, never
        # deleted (round-4 review: deleting unconditionally destroyed the
        # partition on e.g. a transient EIO)
        if live.exists():
            shutil.rmtree(old, ignore_errors=True)
        else:
            try:
                old.rename(live)
            except OSError:
                pass  # healer got there between our check and rename
        return False
    shutil.rmtree(old, ignore_errors=True)
    return True


def _gc_rewrite_dirs(cat: IndexCatalog) -> None:
    # heal interrupted per-partition swaps BEFORE deleting staging: the
    # staged `<table>__rewrite` dir may hold the only copy of a partition
    # whose live dir was renamed away mid-swap — restoring `__old` first
    # makes deleting the staging safe (the round-3 ADVICE `high`: deleting
    # staging first lost the seg's data and left a `seg=N__old` dir that
    # broke partition inference for every later query).
    heal_interrupted_swaps(cat.index_dir)
    for p in cat.index_dir.glob("*__rewrite"):
        shutil.rmtree(p, ignore_errors=True)
    for p in cat.index_dir.glob("*__old"):
        shutil.rmtree(p, ignore_errors=True)


def _fresh_lineage(cat: IndexCatalog, name: str) -> list[dict] | None:
    """The manifest's recorded per-file lineage for ``name`` IF it still
    describes the table exactly — i.e. no append/stream activity since the
    stage commit that recorded it (appends add files without re-hashing
    lineage; re-hashing per micro-batch would be O(index)).  Returns None
    when stale or absent: the caller must list the filesystem.  At object-
    store scale a fresh manifest turns ``stats``/``optimize`` fragmentation
    detection into a metadata read instead of an O(files) driver listing
    (round-3 VERDICT #7); a stale one behaves exactly as before."""
    man = cat.manifest
    info = man.data.get("tables", {}).get(name)
    if not info:
        return None
    if man.data.get("pending_append"):
        return None
    for e in man.pending_maintenance_entries():
        # a maintenance op crashed after its swaps landed but before
        # record_stage re-recorded lineage (the files on disk are the
        # POST-rewrite set while the lineage still describes the
        # pre-rewrite files — round-5 ADVICE low): never trust a table the
        # entry declared at-risk.  Legacy entries carry no table list and
        # distrust everything.
        if "tables" not in e or name in e["tables"]:
            return None
    stages = [
        s
        for s in man.data.get("stages", {}).values()
        if name in s.get("tables", [])
    ]
    if not stages:
        return None
    appends = man.data.get("appends", [])
    # order events by the monotonic manifest sequence when every entry
    # carries one (all manifests written since round 5 do); legacy entries
    # without seq fall back to the wall-clock comparison they were written
    # under
    if all("seq" in s for s in stages) and all("seq" in a for a in appends):
        committed = max(s["seq"] for s in stages)
        last_append = max((a["seq"] for a in appends), default=0)
        if last_append > committed:
            return None
    else:
        committed = max(s.get("committed_at", 0) for s in stages)
        if committed == 0.0:
            return None
        last_append = max((a.get("at", 0) for a in appends), default=0.0)
        if last_append > committed:
            return None
    return info["files"]


def _pack_layout(cat: IndexCatalog) -> tuple[dict, str]:
    """(pack_doc_terms kwargs, postings term-key column) from the index's
    recorded layout — maintenance rewrites must reproduce the layout the
    index was built with (term_id vs legacy string keys, cosine stream
    present or not), never the caller's config defaults."""
    lay = cat.manifest.data.get("layout", {})
    term_ids = bool(lay.get("postings_term_ids"))
    return (
        {
            "pack_cosine": lay.get("pack_cosine", cat.config.pack_cosine),
            "term_ids": term_ids,
            "term_id_seed": int(lay.get("term_id_seed", cat.config.term_id_seed)),
        },
        "term_id" if term_ids else "term",
    )


def _journal_maintenance(
    man, op: str, tables: list[str], extra: dict | None = None
) -> int:
    """Durable journal entry that a maintenance op is about to swap the
    named tables' dirs in.  A crash AFTER a swap lands but BEFORE
    ``record_stage`` re-records lineage leaves the manifest's per-file
    lineage describing the pre-rewrite files with no append entry to mark
    it stale — ``stats()`` would report just-compacted rows and
    ``optimize_postings`` would size partitions from ghosts (round-5
    ADVICE low).  ``_fresh_lineage`` treats a table's presence in any
    entry as lineage-stale, mirroring ``pending_append``; a table leaves
    the journal only when a later stage commit records its CURRENT
    lineage (``record_stage``) or the owning op withdraws its entry after
    skipping every swap — so a different op completing cannot launder a
    crashed op's stale tables (round-5 review finding).  Returns the
    entry seq (the owner's withdrawal handle).  ``extra`` (dict) rides the
    entry for parameters a crash-heal must reproduce exactly."""
    return man.journal_maintenance(op, tables, extra)


def heal_interrupted_migration(spark: SparkSession, cat: IndexCatalog) -> bool:
    """Detect and finish a ``migrate_postings`` whose dir swaps landed but
    whose stage commit did not (round-5 review finding): the postings are
    physically ``term_id``-keyed while the recorded layout still claims
    string keys, so the NEXT append would pack string-keyed blocks into
    the term_id table — mixed schemas, and every appended doc's postings
    silently unmatched by the term_id-filtered WAND scan.  The pending
    ``migrate_postings`` journal entry is the witness that the swapped
    files are a completed, collision-gated rewrite; healing = finishing
    the layout flip + stage commit exactly as migrate would have.  A
    physical/recorded mismatch WITHOUT that witness is unknown state and
    raises instead of guessing.  Returns True when it healed."""
    man = cat.manifest
    lay = man.data.setdefault("layout", {})
    flag = bool(lay.get("postings_term_ids"))
    pdir = Path(cat.table_dir("postings"))
    if not pdir.exists():
        return False
    try:
        physical = "term_id" in spark.read.parquet(str(pdir)).columns
    except Exception:
        return False  # empty/unreadable dir: nothing to protect yet
    if physical == flag:
        return False
    witness = next(
        (
            e
            for e in man.pending_maintenance_entries()
            if e.get("op") == "migrate_postings"
        ),
        None,
    )
    if physical and not flag and witness is not None:
        lay["postings_term_ids"] = True
        # the seed the crashed migrate actually packed with rides its
        # journal entry — the healer's own config may use a different one
        # (a fallback to the healer's seed covers only pre-seed-journal
        # entries, written when configs could not diverge mid-migrate)
        lay["term_id_seed"] = int(witness.get("seed", cat.config.term_id_seed))
        lay["pack_cosine"] = bool(
            lay.get("pack_cosine", cat.config.pack_cosine)
        ) and ("norm" in cat.read(spark, "doc_terms").columns)
        man.record_stage(
            "migrate",
            {"term_stats": "term_stats", "postings": "postings"},
            {"healed_interrupted_migration": True},
        )
        return True
    raise RuntimeError(
        f"postings are physically {'term_id' if physical else 'string'}-keyed "
        f"but the recorded layout says postings_term_ids={flag}, and no "
        "pending migrate_postings journal explains it — refusing to write "
        "mixed-schema blocks; investigate, then restore the table or re-run "
        "migrate_postings"
    )


def _repair_pending_for_maintenance(spark: SparkSession, cat: IndexCatalog) -> None:
    """Maintenance ops are writer-side: heal a crashed append BEFORE
    rewriting anything.  Without this, optimize/compact would merge orphan
    runs into blocks that SPAN the journaled doc_int range, breaking the
    reader-side exclusion predicate's no-spanning invariant (which only
    needs to hold while the journal exists — once the repair tombstones
    the orphans, exact doc_int masking takes over and spanning is fine).
    A half-committed layout migration is healed here too, for the same
    reason: rewrites must see the true layout before repacking anything."""
    from splade_easy_spark.index.append import _repair_pending

    # settle crashed-swap dirs FIRST so everything below sees final state
    heal_interrupted_swaps(cat.index_dir)
    _repair_pending(spark, cat)
    heal_interrupted_migration(spark, cat)
    # Single-writer contract: any journal entry still present belongs to a
    # CRASHED op, and with swaps settled the on-disk dirs ARE that op's
    # final state.  Re-recording current lineage for its tables is a true
    # statement that both heals the staleness (stats/optimize trust real
    # files again instead of listing) and retires the entries — without
    # it, a crashed compact's docs entry would outlive every later op,
    # since only compact re-records docs and compact early-returns once
    # the tombstones are gone.  Size-only lineage: hashing whole tables
    # through the driver per heal would be O(table bytes).
    man = cat.manifest
    stale = sorted(
        {
            t
            for e in man.pending_maintenance_entries()
            for t in e.get("tables", [])
            if Path(cat.table_dir(t)).exists()
        }
    )
    if stale:
        man.record_stage(
            "maintenance_heal",
            {t: t for t in stale},
            {"healed_pending": stale},
            checksum=False,
        )


def delete(spark: SparkSession, index_dir: str, doc_ids: list[str]) -> int:
    """Soft delete: tombstone rows (doc_id, doc_int) appended to the
    ``deleted`` table; read paths anti-join against it.  Returns the number
    actually deleted (ids must exist and not already be tombstoned —
    cf. ``src/splade_easy/index.py:207-219``)."""
    cat = IndexCatalog(index_dir)
    docs = cat.read(spark, "docs")
    target = docs.where(F.col("doc_id").isin(doc_ids)).select("doc_id", "doc_int")
    existing = cat.read_deleted(spark)
    if existing is not None:
        target = target.join(existing.select("doc_id"), "doc_id", "left_anti")
    n = target.count()
    if n:
        target.write.mode("append").parquet(cat.table_dir("deleted"))
    return n


def compact(spark: SparkSession, index_dir: str, config: IndexConfig | None = None) -> dict:
    """Physically drop tombstoned docs from every table, clear tombstones.
    Weights/statistics frozen (see module docstring)."""
    cat = IndexCatalog(index_dir, config)
    cfg = cat.config
    _repair_pending_for_maintenance(spark, cat)
    deleted = cat.read_deleted(spark)
    t0 = time.time()
    _gc_rewrite_dirs(cat)
    if deleted is None:
        return {"removed": 0, "elapsed_sec": 0.0}
    dead = deleted.select("doc_int").distinct()
    n_dead = dead.count()
    # broadcast only a bounded tombstone set; a heavily-deleted index falls
    # back to a shuffle anti-join instead of shipping millions of ids to
    # every task (the broadcast would also have to fit on the driver)
    dead_b = F.broadcast(dead) if n_dead <= 5_000_000 else dead

    docs = cat.read(spark, "docs").join(dead_b, "doc_int", "left_anti")
    docs.write.parquet(cat.table_dir("docs") + "__rewrite")

    dt = cat.read(spark, "doc_terms").join(dead_b, "doc_int", "left_anti")
    dt.repartition(cfg.build_partitions, "tb").write.partitionBy("tb").parquet(
        cat.table_dir("doc_terms") + "__rewrite"
    )

    dt_new = spark.read.parquet(cat.table_dir("doc_terms") + "__rewrite")
    pack_kw, tkey = _pack_layout(cat)
    packed = pack_doc_terms(
        dt_new, cfg.segment_docs, cfg.block_size, **pack_kw
    ).sortWithinPartitions(tkey, "block_id")
    packed.write.partitionBy("seg").parquet(cat.table_dir("postings") + "__rewrite")

    _journal_maintenance(cat.manifest, "compact", ["docs", "doc_terms", "postings"])
    for t in ["docs", "doc_terms", "postings"]:
        _swap_in(cat, t)
    shutil.rmtree(cat.table_dir("deleted"), ignore_errors=True)

    # compact physically removed any crash-repair orphan rows with the
    # tombstones that marked them
    cat.manifest.data.pop("orphan_tombstones", None)
    cat.manifest.record_stage(
        "compact",
        {t: t for t in ["docs", "doc_terms", "postings"]},
        {"removed": n_dead, "elapsed_sec": round(time.time() - t0, 3)},
    )
    return {"removed": n_dead, "elapsed_sec": round(time.time() - t0, 3)}


def reshard(
    spark: SparkSession,
    index_dir: str,
    config: IndexConfig | None = None,
    target_partitions: int | None = None,
    segment_docs: int | None = None,
    block_size: int | None = None,
    keep_originals: bool = False,
) -> dict:
    """Rewrite index layout (partition count / segment size / block size)
    preserving content byte-for-byte at the logical level — the analog of
    ``IndexResharder.reshard`` (``src/splade_easy/reshard.py:126-195``).
    With ``keep_originals`` the previous layout is retained as
    ``<table>__backup`` dirs (the reference's ``.fb.backup`` shards,
    ``src/splade_easy/reshard.py:22,102-115``) and ``rollback_reshard``
    restores it.  Returns before/after layout stats."""
    cat = IndexCatalog(index_dir, config)
    cfg = cat.config
    _repair_pending_for_maintenance(spark, cat)
    t0 = time.time()
    _gc_rewrite_dirs(cat)
    parts = target_partitions or cfg.build_partitions
    seg_docs = segment_docs or cfg.segment_docs
    bs = block_size or cfg.block_size

    before = stats(spark, index_dir)

    dt = cat.read(spark, "doc_terms")
    dt.repartition(parts, "tb").write.partitionBy("tb").parquet(
        cat.table_dir("doc_terms") + "__rewrite"
    )
    dt_new = spark.read.parquet(cat.table_dir("doc_terms") + "__rewrite")
    pack_kw, tkey = _pack_layout(cat)
    packed = pack_doc_terms(dt_new, seg_docs, bs, **pack_kw).sortWithinPartitions(
        tkey, "block_id"
    )
    packed.write.partitionBy("seg").parquet(cat.table_dir("postings") + "__rewrite")
    man = cat.manifest
    prior_layout = dict(man.data.get("layout", {}))
    _journal_maintenance(man, "reshard", ["doc_terms", "postings"])
    for t in ["doc_terms", "postings"]:
        _swap_in(cat, t, keep_old=keep_originals)

    man.data.setdefault("layout", {})
    man.data["layout"].update(
        {"segment_docs": seg_docs, "block_size": bs, "build_partitions": parts}
    )
    if keep_originals:
        man.data["reshard_backup"] = {"layout": prior_layout, "at": time.time()}
    man.record_stage(
        "reshard",
        {"doc_terms": "doc_terms", "postings": "postings"},
        {"elapsed_sec": round(time.time() - t0, 3), "segment_docs": seg_docs, "block_size": bs},
    )
    after = stats(spark, index_dir)
    return {"before": before, "after": after, "elapsed_sec": round(time.time() - t0, 3)}


def rollback_reshard(index_dir: str) -> dict:
    """Restore the layout preserved by ``reshard(keep_originals=True)`` —
    the analog of the reference's backup-shard restore
    (``src/splade_easy/index.py:268-288``).  Pure directory renames (no
    Spark job); raises if no backup exists."""
    cat = IndexCatalog(index_dir)
    man = cat.manifest
    backup = man.data.pop("reshard_backup", None)
    pend_seq = _journal_maintenance(man, "rollback_reshard", ["doc_terms", "postings"])
    restored = []
    for t in ["doc_terms", "postings"]:
        live = Path(cat.table_dir(t))
        bak = live.with_name(live.name + "__backup")
        if not bak.exists():
            continue
        if live.exists():
            shutil.rmtree(live)
        try:
            bak.rename(live)
        except OSError:
            # a concurrent reader's heal_interrupted_swaps saw live missing
            # (our rmtree window) and restored the backup itself — that IS
            # the rollback; anything else is a real failure
            if not live.exists():
                raise
        restored.append(t)
    if not restored:
        # nothing was renamed (every backup dir was missing): the journaled
        # swap window never opened, so withdraw only OUR entry (a foreign
        # crashed op's entry keeps its tables stale)
        man.clear_maintenance(pend_seq)
        raise FileNotFoundError(f"no __backup dirs under {index_dir} to roll back")
    if backup and backup.get("layout"):
        man.data["layout"] = backup["layout"]
    man.data["stages"].pop("reshard", None)
    # re-record lineage for the restored dirs so resume/verify_table trusts them
    man.record_stage("rollback", {t: t for t in restored}, {"restored": restored})
    return {"restored": restored}


def stats(spark: SparkSession, index_dir: str) -> dict:
    """Index statistics — the analog of ``SpladeIndex.stats``
    (``src/splade_easy/index.py:298-306``): live/deleted doc counts, table
    sizes and file counts."""
    cat = IndexCatalog(index_dir)
    corpus = cat.corpus_stats(spark)
    deleted = cat.read_deleted(spark)
    if deleted is None:
        n_deleted = 0
    elif cat.manifest.data.get("orphan_tombstones"):
        # crash-repair tombstones (append.py:_repair_pending) target doc_ints
        # that were never registered in docs — counting them would understate
        # num_docs; restrict to tombstones of physically-present docs
        n_deleted = (
            deleted.select("doc_int")
            .distinct()
            .join(cat.read(spark, "docs").select("doc_int"), "doc_int", "left_semi")
            .count()
        )
    else:
        n_deleted = deleted.select("doc_id").distinct().count()
    # live count from the physical docs table (manifest lineage when fresh,
    # else parquet footers — no job either way) — corpus_stats.n_docs is
    # the FROZEN weighting statistic and diverges after compaction/appends
    # (reference analog: num_docs decremented on delete while vectors stay
    # fixed, src/splade_easy/index.py:218)
    docs_lineage = _fresh_lineage(cat, "docs")
    n_physical = (
        sum(f["rows"] for f in docs_lineage)
        if docs_lineage is not None
        else cat.table_rows("docs")
    )
    tables = {}
    for t in ["docs", "doc_terms", "postings", "term_stats"]:
        lineage = _fresh_lineage(cat, t)
        if lineage is not None:
            tables[t] = {
                "files": len(lineage),
                "mb": round(sum(f["bytes"] for f in lineage) / 1e6, 3),
            }
            continue
        p = Path(cat.table_dir(t))
        files = list(p.rglob("*.parquet")) if p.exists() else []
        tables[t] = {
            "files": len(files),
            "mb": round(sum(f.stat().st_size for f in files) / 1e6, 3),
        }
    return {
        "num_docs": n_physical - n_deleted,
        "num_docs_built": int(corpus["n_docs"]),
        "num_deleted": n_deleted,
        "num_terms": int(corpus["n_terms"]),
        "avgdl": float(corpus["avgdl"] or 0.0),
        "tables": tables,
    }


def migrate_postings(
    spark: SparkSession, index_dir: str, config: IndexConfig | None = None
) -> dict:
    """Weight-preserving migration of a legacy string-keyed postings table
    to the int64 ``term_id`` layout (the round-4 analog of the reference's
    token-id wire format, ``src/splade_easy/schema.fbs:14``).

    ``refresh_stats`` also migrates, but re-derives corpus statistics and
    therefore CHANGES weights on an appended index (that is its job).
    This op is the pure layout move: postings are repacked from the
    existing ``doc_terms`` weights, so scores are byte-identical before
    and after (same float32 values through the same packer), and
    ``term_stats`` gains the ``term_id`` column behind the build's exact
    collision gate.  No-op on already-migrated indexes.  Subsequent
    appends pack term_id-keyed blocks (the recorded layout flips)."""
    from splade_easy_spark.index.builder import _assert_no_term_id_collisions
    from splade_easy_spark.index.catalog import term_id_expr

    cat = IndexCatalog(index_dir, config)
    man = cat.manifest
    lay = man.data.setdefault("layout", {})
    if lay.get("postings_term_ids"):
        return {"migrated": False, "reason": "already term_id layout"}
    _repair_pending_for_maintenance(spark, cat)
    if lay.get("postings_term_ids"):
        # the repair found this migration's own swaps already on disk
        # (crash between swap and stage commit) and finished the commit
        return {"migrated": True, "healed_interrupted_migration": True}
    _gc_rewrite_dirs(cat)
    t0 = time.time()
    seed = int(cat.config.term_id_seed)

    ts = cat.read(spark, "term_stats")
    if "term_id" in ts.columns:
        ts = ts.drop("term_id")
    ts = ts.withColumn("term_id", term_id_expr(F.col("term"), seed))
    _assert_no_term_id_collisions(ts, seed)
    ts.write.parquet(cat.table_dir("term_stats") + "__rewrite")

    dt = cat.read(spark, "doc_terms")
    # pre-nwts indexes have no norm column: migrate without the cosine
    # stream (matching what the index could serve before)
    pack_cosine = bool(lay.get("pack_cosine", cat.config.pack_cosine)) and (
        "norm" in dt.columns
    )
    seg_docs = int(lay.get("segment_docs", cat.config.segment_docs))
    bs = int(lay.get("block_size", cat.config.block_size))
    sel = ["term", "doc_int", "weight"] + (["norm"] if "norm" in dt.columns else [])
    packed = pack_doc_terms(
        dt.select(*sel), seg_docs, bs,
        pack_cosine=pack_cosine, term_ids=True, term_id_seed=seed,
    ).sortWithinPartitions("term_id", "block_id")
    packed.write.partitionBy("seg").parquet(cat.table_dir("postings") + "__rewrite")

    # the seed rides the journal entry: a crash-heal by a writer running a
    # DIFFERENT config must flip the layout to the seed these files were
    # actually packed with, not its own
    _journal_maintenance(
        man, "migrate_postings", ["term_stats", "postings"], {"seed": seed}
    )
    for t in ["term_stats", "postings"]:
        _swap_in(cat, t)
    lay["postings_term_ids"] = True
    lay["term_id_seed"] = seed
    lay["pack_cosine"] = pack_cosine
    metrics = {"elapsed_sec": round(time.time() - t0, 3)}
    man.record_stage(
        "migrate", {"term_stats": "term_stats", "postings": "postings"}, metrics
    )
    return {"migrated": True, **metrics}


def optimize_postings(
    spark: SparkSession,
    index_dir: str,
    config: IndexConfig | None = None,
    min_files: int = 2,
    doc_terms_min_files: int = 8,
) -> dict:
    """Partition-scoped coalescing for append-heavy indexes — the Iceberg
    ``rewrite_data_files`` / Lucene segment-merge analog, and the missing
    piece of the streaming-append story at 10^12 turns: every micro-batch
    appends at least one parquet file AND one extra block run per touched
    ``(seg, term)``, so a long-lived streamed index accretes thousands of
    tiny files (listing + open cost per query) and short posting runs
    (per-run kernel overhead, weaker block-max bounds on partial blocks).

    Unlike ``reshard`` (full-index rewrite), this touches ONLY the seg
    partitions whose file count reached ``min_files``: their block runs
    are unpacked, merged per ``(seg, term)``, and repacked into minimal
    full blocks, then the rewritten ``seg=N`` directories are swapped in
    one by one — O(fragmented partitions), not O(index).  Weights are
    preserved bit-exactly (float32 in, float32 out), so scores are
    byte-identical before/after (the frozen-weight contract of this
    module); tombstones are untouched (postings keep deleted docs until
    ``compact``).  ``doc_terms`` ``tb=N`` partitions with ≥
    ``doc_terms_min_files`` files are coalesced the same way (plain
    re-sorted rewrite; row-group stats on ``term`` come back tight).
    """
    import numpy as np
    import pandas as pd

    from splade_easy_spark.index.builder import POSTINGS_SCHEMA
    from splade_easy_spark.index.postings import pack_postings, varbyte_decode

    cat = IndexCatalog(index_dir, config)
    _repair_pending_for_maintenance(spark, cat)
    man = cat.manifest
    layout = man.data.get("layout", {})
    block_size = int(layout.get("block_size", cat.config.block_size))
    t0 = time.time()
    _gc_rewrite_dirs(cat)

    def _partition_file_counts(table: str, prefix: str, table_dir: Path) -> dict[int, int]:
        """Files per hive partition — from the manifest's per-file lineage
        when it is current (no listing at all), else one directory walk."""
        lineage = _fresh_lineage(cat, table)
        if lineage is not None:
            counts: dict[int, int] = {}
            for f in lineage:
                rel = str(f["file"])
                if rel.startswith(prefix + "="):
                    key = rel.split("=", 1)[1].split("/", 1)[0]
                    try:
                        k = int(key)
                    except ValueError:
                        continue
                    counts[k] = counts.get(k, 0) + 1
            return counts
        return {
            int(p.name.split("=", 1)[1]): sum(1 for _ in p.glob("*.parquet"))
            for p in table_dir.glob(prefix + "=*")
            if p.is_dir()
        }

    post_dir = Path(cat.table_dir("postings"))
    seg_files = _partition_file_counts("postings", "seg", post_dir)
    frag_segs = sorted(s for s, n in seg_files.items() if n >= min_files)
    rewritten_segs = 0
    pend_seqs: list[int] = []
    if frag_segs:
        src = cat.read(spark, "postings").where(F.col("seg").isin(frag_segs))
        # pre-nwts indexes (built before the cosine stream existed) have no
        # nwts/max_nweight columns at all — Searcher supports them (SQL
        # cosine fallback), so optimize must too: merge without the stream
        # and emit the legacy schema so swapped partitions match the rest
        # of the table.
        has_nwts_col = "nwts" in src.columns
        # the table's term key: int64 term_id (round-4 layout) or the
        # legacy term string — merge whichever the index carries
        tkey = "term_id" if "term_id" in src.columns else "term"
        from splade_easy_spark.index.builder import POSTINGS_SCHEMA_LEGACY

        base_schema = POSTINGS_SCHEMA if tkey == "term_id" else POSTINGS_SCHEMA_LEGACY
        out_cols = [
            "seg", tkey, "block_id", "n", "doc_min", "doc_max",
            "max_weight", "docs", "wts",
        ] + (["max_nweight", "nwts"] if has_nwts_col else [])
        out_schema = (
            base_schema
            if has_nwts_col
            else base_schema.split(", max_nweight")[0]
        )

        def _merge_groups(pdf: pd.DataFrame):
            """Repack each complete (seg, term) group of block-run rows."""
            for (seg, term), g in pdf.groupby(["seg", tkey], sort=False):
                g = g.sort_values(["doc_min", "block_id"], kind="stable")
                nbufs = g["nwts"] if has_nwts_col else [None] * len(g)
                docs_cat, wts_cat, nwts_cat = [], [], []
                for dbuf, wbuf, nbuf, n in zip(g["docs"], g["wts"], nbufs, g["n"]):
                    deltas = varbyte_decode(dbuf, int(n))
                    docs_cat.append(np.cumsum(deltas.astype(np.int64)))
                    wts_cat.append(np.frombuffer(wbuf, dtype=np.float32))
                    if nbuf is not None and len(nbuf):
                        nwts_cat.append(np.frombuffer(nbuf, dtype=np.float32))
                if 0 < len(nwts_cat) < len(docs_cat):
                    # some runs carry the cosine stream and some don't —
                    # merging would silently write empty nwts and corrupt
                    # cosine-WAND for this term (round-3 ADVICE): refuse.
                    raise ValueError(
                        f"optimize_postings: (seg={seg}, term={term!r}) mixes "
                        f"runs with and without the nwts cosine stream "
                        f"({len(nwts_cat)}/{len(docs_cat)} runs carry it); "
                        "the index is corrupt or was appended with an "
                        "inconsistent pack_cosine setting"
                    )
                docs = np.concatenate(docs_cat)
                wts = np.concatenate(wts_cat).astype(np.float64)
                nwts = (
                    np.concatenate(nwts_cat).astype(np.float64)
                    if nwts_cat
                    else None
                )
                out: dict[str, list] = {k: [] for k in out_cols}
                for b in pack_postings(docs, wts, block_size, nweights=nwts):
                    out["seg"].append(int(seg))
                    out[tkey].append(term)
                    out["block_id"].append(b["block_id"])
                    out["n"].append(b["n"])
                    out["doc_min"].append(b["doc_min"])
                    out["doc_max"].append(b["doc_max"])
                    out["max_weight"].append(b["max_weight"])
                    out["docs"].append(b["docs"])
                    out["wts"].append(b["wts"])
                    if has_nwts_col:
                        out["max_nweight"].append(b.get("max_nweight", 0.0))
                        out["nwts"].append(b.get("nwts", b""))
                yield pd.DataFrame(out)

        def merge_runs(batches):
            """Streaming over (seg, term)-sorted rows with a trailing-group
            carry — memory is bounded by ONE term's runs within one segment
            (≤ segment_docs postings), never a whole seg partition (a seg
            holds ~segment_docs × avgdl postings at real scale)."""
            carry: pd.DataFrame | None = None
            for b in batches:
                if not len(b):
                    continue
                if carry is not None and len(carry):
                    b = pd.concat([carry, b], ignore_index=True)
                # rows arrive sorted by (seg, term): the last (seg, term)
                # pair may continue in the next batch — hold it back
                last_seg = b["seg"].iloc[-1]
                last_term = b[tkey].iloc[-1]
                tail = (b["seg"] == last_seg) & (b[tkey] == last_term)
                complete, carry = b[~tail], b[tail]
                if len(complete):
                    yield from _merge_groups(complete)
            if carry is not None and len(carry):
                yield from _merge_groups(carry)

        staged = post_dir.with_name(post_dir.name + "__rewrite")
        (
            src.repartition(F.col("seg"))
            .sortWithinPartitions("seg", tkey)
            .mapInPandas(merge_runs, schema=out_schema)
            .sortWithinPartitions(tkey, "block_id")
            .write.partitionBy("seg")
            .parquet(str(staged))
        )
        pend_seqs.append(_journal_maintenance(man, "optimize", ["postings"]))
        # per-partition swap: only the fragmented seg dirs move
        for s in frag_segs:
            new = staged / f"seg={s}"
            if not new.exists():
                continue  # seg held only empty files — nothing to swap
            if _swap_partition(post_dir / f"seg={s}", new):
                rewritten_segs += 1
        shutil.rmtree(staged, ignore_errors=True)

    dt_dir = Path(cat.table_dir("doc_terms"))
    tb_files = _partition_file_counts("doc_terms", "tb", dt_dir)
    frag_tbs = sorted(t for t, n in tb_files.items() if n >= doc_terms_min_files)
    rewritten_tbs = 0
    if frag_tbs:
        staged = dt_dir.with_name(dt_dir.name + "__rewrite")
        (
            cat.read(spark, "doc_terms")
            .where(F.col("tb").isin(frag_tbs))
            .repartition(max(1, len(frag_tbs)), "tb")
            .sortWithinPartitions("term", "doc_int")
            .write.partitionBy("tb")
            .parquet(str(staged))
        )
        pend_seqs.append(_journal_maintenance(man, "optimize", ["doc_terms"]))
        for t in frag_tbs:
            new = staged / f"tb={t}"
            if not new.exists():
                continue
            if _swap_partition(dt_dir / f"tb={t}", new):
                rewritten_tbs += 1
        shutil.rmtree(staged, ignore_errors=True)

    metrics = {
        "segs_rewritten": rewritten_segs,
        "segs_total": len(seg_files),
        "tb_partitions_rewritten": rewritten_tbs,
        "elapsed_sec": round(time.time() - t0, 3),
    }
    if rewritten_segs or rewritten_tbs:
        # size/row lineage only: optimize runs periodically from the
        # streaming sink — re-hashing the whole table per merge would be
        # O(table bytes) through the driver (see manifest.file_lineage)
        man.record_stage(
            "optimize",
            {"postings": "postings", "doc_terms": "doc_terms"},
            metrics,
            checksum=False,
        )
    else:
        # every staged swap was skipped (e.g. a concurrent reader's heal
        # won each race): the live dirs are unchanged, so withdraw ONLY
        # this op's own journal entries — a foreign crashed op's entry
        # must survive (its tables really are stale) until a commit
        # re-records them
        for s in pend_seqs:
            man.clear_maintenance(s)
    return metrics
