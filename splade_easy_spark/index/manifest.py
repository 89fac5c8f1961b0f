"""Index manifest: the Parquet-fallback analog of an Iceberg snapshot log.

Mirrors the reference's durability contract (SURVEY.md §1.4): the reference
finalizes a shard by flush → SHA-256 → atomic ``os.replace`` → append hash to
``metadata.json`` (``src/splade_easy/index.py:103-122``), so readers only ever
see fully-committed shards.  Here the unit of commit is a build *stage*
(docs / stats / postings): each stage's output files are content-hashed and
recorded with per-file lineage (rows, bytes, sha256) plus stage metrics
(elapsed seconds, input rows), and the manifest itself is swapped atomically
via temp-file + ``os.replace``.  A crashed build leaves at most Spark
``_temporary`` dirs (cleaned by the output committer) and a manifest that
still describes only complete stages — which is exactly what makes the build
**resumable**: re-running skips stages already present and valid.

On a real cluster with Iceberg jars this module is replaced by snapshot
commits; the seam is ``IndexCatalog`` in ``catalog.py``.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from pathlib import Path
from typing import Any

import pyarrow.parquet as pq

MANIFEST_NAME = "_manifest.json"
FORMAT_VERSION = 1


def _hash_file(path: Path, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def file_lineage(table_dir: Path, checksum: bool = True) -> list[dict]:
    """Per-file lineage for every parquet data file under ``table_dir``
    (recursive — hive-partitioned tables have ``tb=.../part-*.parquet``).
    Hashed with a thread pool: sha256 releases the GIL, so lineage cost
    scales with cores instead of being a serial commit tail.

    ``checksum=False`` records sizes/rows only (parquet footers + stat,
    no data read): the right mode for FREQUENT maintenance commits like
    ``optimize_postings`` — re-hashing a whole table per periodic merge
    is O(table bytes) through one machine, while resume validation
    (``verify_table``) only consults existence + size anyway; full sha256
    stays on the one-time build/compact/reshard commits (the reference's
    hash-per-shard-finalize analog, ``src/splade_easy/index.py:108-112``)."""
    from concurrent.futures import ThreadPoolExecutor

    files = sorted(table_dir.rglob("*.parquet"))

    def entry(p: Path) -> dict:
        meta = pq.read_metadata(p)
        out = {
            "file": str(p.relative_to(table_dir)),
            "bytes": p.stat().st_size,
            "rows": meta.num_rows,
        }
        if checksum:
            out["sha256"] = _hash_file(p)
        return out

    if len(files) <= 2:
        return [entry(p) for p in files]
    with ThreadPoolExecutor(max_workers=min(16, len(files))) as ex:
        return list(ex.map(entry, files))


class Manifest:
    """Load/commit cycle for ``<index_dir>/_manifest.json``."""

    def __init__(self, index_dir: str | Path):
        self.index_dir = Path(index_dir)
        self.path = self.index_dir / MANIFEST_NAME
        self.data: dict[str, Any] = {
            "format_version": FORMAT_VERSION,
            "identity": {},
            "stages": {},
            "tables": {},
        }
        if self.path.exists():
            self.data = json.loads(self.path.read_text())

    # -- queries ---------------------------------------------------------
    def stage_complete(self, stage: str) -> bool:
        return stage in self.data["stages"]

    def table_path(self, name: str) -> Path:
        return self.index_dir / self.data["tables"][name]["dir"]

    def verify_table(self, name: str) -> bool:
        """Check every recorded file still exists with the recorded size
        (cheap validation, like ``get_shard_paths`` strict mode,
        ``src/splade_easy/utils.py:12-31``; full sha check is opt-in)."""
        info = self.data["tables"].get(name)
        if not info:
            return False
        root = self.index_dir / info["dir"]
        for f in info["files"]:
            p = root / f["file"]
            if not p.exists() or p.stat().st_size != f["bytes"]:
                return False
        return True

    # -- commits ---------------------------------------------------------
    def set_identity(self, identity: dict) -> None:
        self.data["identity"] = identity

    def next_seq(self) -> int:
        """Monotonic manifest sequence number, bumped by every append /
        repair / stage commit.  Freshness comparisons (``_fresh_lineage``)
        order events by this instead of wall-clock timestamps — equal or
        skewed clocks (coarse mtime granularity, a writer on another host,
        an append landing the same second as a stage commit) could order
        timestamps wrongly and mark stale lineage fresh (round-5 ADVICE).
        The caller's ``save()`` persists the bump atomically with the event
        that consumed it."""
        self.data["seq"] = int(self.data.get("seq", 0)) + 1
        return self.data["seq"]

    # -- maintenance journal --------------------------------------------
    def pending_maintenance_entries(self) -> list[dict]:
        """The pending-maintenance journal as a list (a dict is the legacy
        single-marker format written before the per-table protocol)."""
        pend = self.data.get("pending_maintenance")
        if not pend:
            return []
        return [pend] if isinstance(pend, dict) else list(pend)

    def journal_maintenance(
        self, op: str, tables: list[str], extra: dict | None = None
    ) -> int:
        """Append a journal entry declaring which tables' lineage the op's
        imminent dir swaps will invalidate.  Entries are per-op (a second
        op crashing cannot be healed by a first op's commit): each lives
        until every one of its tables has fresh post-swap lineage recorded
        (``record_stage``), or until its owner withdraws it
        (``clear_maintenance`` — no swaps happened).  ``extra`` carries
        op parameters a crash-heal must reproduce exactly (e.g. the
        term_id seed a migrate packed with — the healer's own config may
        differ).  Returns the entry's seq (the owner's handle)."""
        entries = self.pending_maintenance_entries()
        seq = self.next_seq()
        entries.append(
            {
                "op": op,
                "tables": sorted(tables),
                "at": time.time(),
                "seq": seq,
                **(extra or {}),
            }
        )
        self.data["pending_maintenance"] = entries
        self.save()
        return seq

    def clear_maintenance(self, seq: int) -> None:
        """Withdraw ONE journal entry by its seq — only the op that created
        it may call this (its swaps were all skipped, so the lineage it
        declared at-risk was never touched).  Foreign entries from other
        crashed ops stay: their tables remain stale until re-recorded."""
        entries = [
            e for e in self.pending_maintenance_entries() if e.get("seq") != seq
        ]
        if entries:
            self.data["pending_maintenance"] = entries
        else:
            self.data.pop("pending_maintenance", None)
        self.save()

    def record_stage(
        self,
        stage: str,
        tables: dict[str, str],
        metrics: dict | None = None,
        checksum: bool = True,
    ) -> None:
        """Commit a completed stage: hash all its table files, record
        lineage + metrics, atomically swap the manifest.  ``checksum=False``
        for frequent maintenance commits (see ``file_lineage``)."""
        for name, rel in tables.items():
            tdir = self.index_dir / rel
            self.data["tables"][name] = {
                "dir": rel,
                "files": file_lineage(tdir, checksum=checksum),
            }
        self.data["stages"][stage] = {
            "tables": list(tables),
            "committed_at": time.time(),
            "seq": self.next_seq(),
            "metrics": metrics or {},
        }
        # The stage commit just recorded CURRENT on-disk lineage for its
        # tables, so those tables leave every pending-maintenance entry —
        # including a foreign crashed op's (the fresh recording supersedes
        # whatever that op's swaps did to the same table).  Tables the
        # commit did NOT cover stay journaled: a completed optimize must
        # not re-trust the docs lineage a crashed compact invalidated.
        entries = []
        for e in self.pending_maintenance_entries():
            left = [t for t in e.get("tables", []) if t not in tables]
            if left and e.get("tables"):
                entries.append({**e, "tables": left})
            # legacy dict-format markers carry no tables list: dropped on
            # any stage commit (the pre-round-5 behavior they were written
            # under)
        if entries:
            self.data["pending_maintenance"] = entries
        else:
            self.data.pop("pending_maintenance", None)
        self.save()

    def drop_stage(self, stage: str) -> None:
        self.data["stages"].pop(stage, None)
        self.save()

    def save(self) -> None:
        self.index_dir.mkdir(parents=True, exist_ok=True)
        tmp = self.path.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(self.data, indent=1, sort_keys=True))
        os.replace(tmp, self.path)  # atomic commit, cf. index.py:110-117
