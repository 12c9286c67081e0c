"""Round-4 items (VERDICT r3 "Next round" list):

* bounded manifest tail — incremental (append) fold, O(1) driver memory
  aggregates, full history streamed off disk on demand;
* merge-on-read delta segments for the bucketed state table;
* generic rebucket for every bucketed store (index sig/post included);
* index-ingest hygiene (materialized pairs, _batch_sigs cleanup,
  pairs-dir retention);
* posting-store skew report + bounded-fanout cap.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

import pytest

from rfb_cnpj_etl_spark.plans.checkpoint import Manifest


def _shm_dir(prefix: str) -> str:
    """tmpfs-backed work dir when available (the 10^5-commit test times
    pure manifest I/O; the sandbox's single shared disk would time the
    disk instead — same rationale as bench.py)."""
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    return tempfile.mkdtemp(prefix=prefix, dir=base)


class TestBoundedManifest:
    def test_tail_bounded_and_fold_incremental(self):
        """10^5 commits: in-memory entries capped at tail_entries, fold
        cost flat across the manifest's life (the r3 scheme rewrote the
        whole snapshot every 256 commits — O(n²/256) total, so the last
        chunk of commits cost ~an order of magnitude more than the
        first)."""
        work = _shm_dir("manifest_tail_")
        try:
            n, tail = 100_000, 512
            m = Manifest(
                os.path.join(work, "m.jsonl"),
                compact_segments=64,
                tail_entries=tail,
            )
            chunk = n // 10
            chunk_times = []
            for c in range(10):
                t0 = time.time()
                for i in range(c * chunk, (c + 1) * chunk):
                    m.commit({"batch_id": f"b{i}", "lsn_lo": i, "lsn_hi": i})
                chunk_times.append(time.time() - t0)
            assert m.count() == n
            assert len(m._tail) == tail  # bounded RSS
            assert m.high_watermark() == n - 1
            # Fold cost must not grow with manifest size: the last chunk
            # may not dwarf the first (quadratic fold ⇒ ~10× here; the
            # generous 6× margin absorbs host-weather noise).
            assert chunk_times[-1] < 6 * max(chunk_times[0], 0.05), chunk_times

            # a fresh reader reconstructs aggregates without holding
            # everything, and full history is still streamable
            m2 = Manifest(
                os.path.join(work, "m.jsonl"),
                compact_segments=64,
                tail_entries=tail,
            )
            assert m2.count() == n
            assert len(m2._tail) == tail
            assert m2.is_applied("b0") and m2.is_applied(f"b{n-1}")
            full = m2.entries()
            assert len(full) == n
            assert [e["seq"] for e in full[:5]] == [0, 1, 2, 3, 4]
            assert full[-1]["batch_id"] == f"b{n-1}"
        finally:
            shutil.rmtree(work, ignore_errors=True)

    def test_aggregates_tracked_beyond_tail(self, tmp_path):
        """schema_version / current_buckets come from incremental
        aggregates, not an entries() scan — correct even when the
        recording entry has been evicted from the in-memory tail."""
        path = str(tmp_path / "m.jsonl")
        m = Manifest(path, compact_segments=8, tail_entries=4)
        m.commit(
            {"batch_id": "a", "lsn_lo": 0, "lsn_hi": 0, "schema_version": 3,
             "buckets": 64}
        )
        for i in range(10):  # evict "a" from the tail
            m.commit({"batch_id": f"f{i}", "lsn_lo": i, "lsn_hi": i})
        assert m.schema_version() == 3
        assert m.current_buckets() == 64
        m2 = Manifest(path, tail_entries=4)
        assert m2.schema_version() == 3
        assert m2.current_buckets() == 64
        assert m2.count() == 11

    def test_torn_append_tail_recovered_from_segment(self, tmp_path):
        """Crash mid-append during a fold: the snapshot ends in a torn
        line but the folded segment was only deleted AFTER the fsync —
        the loader skips the torn tail and recovers the entry from its
        still-present segment."""
        path = str(tmp_path / "m.jsonl")
        m = Manifest(path, compact_segments=10_000)
        e = m.commit({"batch_id": "ok", "lsn_lo": 7, "lsn_hi": 7})
        with open(path, "a", encoding="utf-8") as f:
            f.write(json.dumps(e)[: len(json.dumps(e)) // 2])  # torn append
        m2 = Manifest(path)
        assert [x["batch_id"] for x in m2.entries()] == ["ok"]
        assert m2.high_watermark() == 7

    def test_torn_middle_line_is_corruption(self, tmp_path):
        path = str(tmp_path / "m.jsonl")
        with open(path, "w", encoding="utf-8") as f:
            f.write('{"batch_id": "torn"\n')
            f.write(json.dumps({"batch_id": "later", "lsn_hi": 1}) + "\n")
        with pytest.raises(json.JSONDecodeError):
            Manifest(path)
