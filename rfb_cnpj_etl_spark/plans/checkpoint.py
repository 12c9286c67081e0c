"""Checkpoint manifest — the engine's exactly-once commit log.

The reference gets atomicity from one giant SQLite transaction
(``db/sqlite_loader.py:39,84``) and resumability from ``.part`` temp
files + ``os.replace`` (``cnpj_downloader.py:67,116,169``); its Postgres
path commits per batch with NO dedup on retry — the exactly-once gap
SURVEY S8 calls out. The engine closes that gap:

* every applied micro-batch appends a manifest entry
  ``{batch_id, lsn_lo, lsn_hi, touched_buckets, bucket_rows, rows,
  schema_version, columns}``;
* the entry is committed as its own atomic segment file (write temp +
  ``os.replace`` into ``{path}.segs/``) — O(entry) per commit, not
  O(manifest): round 2 rewrote the whole JSONL file per commit and
  re-read it per ``is_applied`` probe, an O(n²) driver cost across a
  long replay;
* segments are folded into the JSONL snapshot at ``{path}`` every
  ``compact_segments`` commits (write temp + rename, then delete the
  folded segments — a crash between the two leaves duplicates that the
  loader dedups by batch_id, so every window is safe);
* on restart, ``high_watermark()`` gives the last applied LSN; events at
  or below it are skipped (idempotent replay), and a crash after the
  data swap but before the manifest commit merely re-applies a batch
  that LWW-by-LSN turns into a no-op.

State (entries, applied ids, high watermark) is kept in memory and
updated incrementally — the manifest is single-writer per replay (one
engine owns it), which is the same contract the data-side swap protocol
already assumes. The files are tiny JSON on the driver — at cluster
scale they live on the object store next to the table (same pattern,
``fs.rename`` as the commit), or become the Iceberg snapshot log when
the runtime is present.
"""

from __future__ import annotations

import json
import os
import time


class Manifest:
    """Append-only manifest: JSONL snapshot + atomic per-commit segment
    files, folded together periodically. Single-writer; readers may
    re-open concurrently (a fresh instance reloads from disk)."""

    def __init__(self, path: str, compact_segments: int = 256) -> None:
        self.path = path
        self.segs_dir = f"{path}.segs"
        self.compact_segments = compact_segments
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._entries: list[dict] = []
        self._ids: set[str] = set()
        self._hw = -1
        self._load()

    # -- load ------------------------------------------------------------

    def _segment_files(self) -> list[str]:
        if not os.path.isdir(self.segs_dir):
            return []
        return sorted(
            f
            for f in os.listdir(self.segs_dir)
            if f.startswith("seg-") and f.endswith(".json")
        )

    def _load(self) -> None:
        raw: list[dict] = []
        if os.path.exists(self.path):
            with open(self.path, encoding="utf-8") as f:
                raw.extend(json.loads(line) for line in f if line.strip())
        for name in self._segment_files():
            with open(os.path.join(self.segs_dir, name), encoding="utf-8") as f:
                raw.append(json.load(f))
        for e in raw:
            # a crash between snapshot fold and segment deletion leaves an
            # entry in BOTH — first occurrence wins (identical content).
            if e["batch_id"] in self._ids:
                continue
            self._ids.add(e["batch_id"])
            self._entries.append(e)
            self._hw = max(self._hw, int(e.get("lsn_hi", -1)))

    # -- read ------------------------------------------------------------

    def entries(self) -> list[dict]:
        return list(self._entries)

    def high_watermark(self) -> int:
        """Highest applied LSN; -1 when nothing applied yet."""
        return self._hw

    def applied_batch_ids(self) -> set[str]:
        return set(self._ids)

    def schema_version(self) -> int:
        return max((e.get("schema_version", 0) for e in self._entries), default=0)

    def current_buckets(self) -> int | None:
        """Bucket count of the table's current layout (last entry that
        recorded one — merge and rebucket entries both do). None when the
        manifest predates bucket recording or is empty."""
        for e in reversed(self._entries):
            if e.get("buckets") is not None:
                return int(e["buckets"])
        return None

    # -- write -----------------------------------------------------------

    def commit(self, entry: dict) -> dict:
        """Atomically append one entry: O(entry) — a single segment file
        renamed into place (the reference's .part/os.replace pattern)."""
        if entry["batch_id"] in self._ids:
            return entry  # already committed → no-op (exactly-once)
        entry = {**entry, "committed_at": time.time(), "seq": len(self._entries)}
        os.makedirs(self.segs_dir, exist_ok=True)
        name = f"seg-{entry['seq']:010d}.json"
        tmp = os.path.join(self.segs_dir, name + ".part")
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(entry, f)
        os.replace(tmp, os.path.join(self.segs_dir, name))
        self._entries.append(entry)
        self._ids.add(entry["batch_id"])
        self._hw = max(self._hw, int(entry.get("lsn_hi", -1)))
        if len(self._segment_files()) >= self.compact_segments:
            self._fold_segments()
        return entry

    def _fold_segments(self) -> None:
        """Fold segments into the snapshot. Commit point = the snapshot
        rename; deleting the folded segments afterwards is cleanup (a
        crash in between leaves harmless duplicates, deduped at load)."""
        segs = self._segment_files()
        tmp = f"{self.path}.part"
        with open(tmp, "w", encoding="utf-8") as f:
            for e in self._entries:
                f.write(json.dumps(e) + "\n")
        os.replace(tmp, self.path)
        for name in segs:
            try:
                os.remove(os.path.join(self.segs_dir, name))
            except FileNotFoundError:
                pass

    def is_applied(self, batch_id: str) -> bool:
        return batch_id in self._ids
