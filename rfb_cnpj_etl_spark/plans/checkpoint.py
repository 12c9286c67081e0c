"""Checkpoint manifest — the engine's exactly-once commit log.

The reference gets atomicity from one giant SQLite transaction
(``db/sqlite_loader.py:39,84``) and resumability from ``.part`` temp
files + ``os.replace`` (``cnpj_downloader.py:67,116,169``); its Postgres
path commits per batch with NO dedup on retry — the exactly-once gap
SURVEY S8 calls out. The engine closes that gap:

* every applied micro-batch appends a manifest entry
  ``{batch_id, lsn_lo, lsn_hi, touched_buckets, bucket_rows, rows,
  schema_version, columns}``;
* the entry is written to a temp file then ``os.replace``d — the atomic
  commit point;
* on restart, ``high_watermark()`` gives the last applied LSN; events at
  or below it are skipped (idempotent replay), and a crash after the
  data swap but before the manifest write merely re-applies a batch that
  LWW-by-LSN turns into a no-op.

The manifest is tiny JSON on the driver — at cluster scale it lives on
the object store next to the table (same pattern, ``fs.rename`` as the
commit), or becomes the Iceberg snapshot log when the runtime is present.
"""

from __future__ import annotations

import json
import os
import time


class Manifest:
    """Append-only JSON-lines manifest with atomic-rename commits."""

    def __init__(self, path: str) -> None:
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    # -- read ------------------------------------------------------------

    def entries(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path, encoding="utf-8") as f:
            return [json.loads(line) for line in f if line.strip()]

    def high_watermark(self) -> int:
        """Highest applied LSN; -1 when nothing applied yet."""
        entries = self.entries()
        return max((e["lsn_hi"] for e in entries), default=-1)

    def applied_batch_ids(self) -> set[str]:
        return {e["batch_id"] for e in self.entries()}

    def schema_version(self) -> int:
        entries = self.entries()
        return max((e.get("schema_version", 0) for e in entries), default=0)

    def current_buckets(self) -> int | None:
        """Bucket count of the table's current layout (last entry that
        recorded one — merge and rebucket entries both do). None when the
        manifest predates bucket recording or is empty."""
        for e in reversed(self.entries()):
            if e.get("buckets") is not None:
                return int(e["buckets"])
        return None

    # -- write -----------------------------------------------------------

    def commit(self, entry: dict) -> dict:
        """Atomically append one entry (write-whole-file + rename —
        the reference's .part/os.replace pattern)."""
        entry = {**entry, "committed_at": time.time()}
        existing = self.entries()
        if entry["batch_id"] in {e["batch_id"] for e in existing}:
            return entry  # already committed → no-op (exactly-once)
        tmp = f"{self.path}.part"
        with open(tmp, "w", encoding="utf-8") as f:
            for e in existing:
                f.write(json.dumps(e) + "\n")
            f.write(json.dumps(entry) + "\n")
        os.replace(tmp, self.path)
        return entry

    def is_applied(self, batch_id: str) -> bool:
        return batch_id in self.applied_batch_ids()
