"""Round-5 items (VERDICT r4 "Next round" list + ADVICE):

* crashed-COW journal recovery clears the folded delta buckets (ADVICE
  medium: a stale MOR UPSERT delta must not resurrect an id the crashed
  COW batch deleted);
* selective per-bucket compaction (compact only the offending buckets —
  the last O(table) cost on the steady-state path);
* index auto-MOR delta-cap check aligned to touched-buckets-only
  (matching StateTable._resolve_mode);
* within-bucket sort order for parquet min/max data skipping;
* posting-skew surfaced by maintenance with a max_fanout recommendation;
* rebucket staging marker carries no stale-keyed row estimates (ADVICE);
* _LwwIndexStore.compact reseeds row estimates (ADVICE);
* CLI posting_skew no longer silently creates an index (ADVICE).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from rfb_cnpj_etl_spark.operators.dedup import MinhashIndex
from rfb_cnpj_etl_spark.operators.merge import StateTable

BASE_TEXT = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "green turtles watch from the river bank in the warm afternoon sun"
)
OTHER_TEXT = (
    "completely unrelated spark catalyst optimizer notes about shuffle "
    "partitions broadcast joins and adaptive query execution internals"
)

LOG_SCHEMA = (
    "repo string, path string, commit string, lang string, content string,"
    " lsn long, op string"
)


def docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def log_df(spark, rows):
    return spark.createDataFrame(rows, LOG_SCHEMA)


def row(repo, path, content, lsn, op="upsert"):
    return (repo, path, f"c{lsn}", "python", content, lsn, op)


def seed_rows(n):
    return [row("r", f"p{i}", f"v{i}", i) for i in range(n)]


class TestJournalRecoveryClearsDeltas:
    """ADVICE (medium): _recover_journal redid a crashed COW swap but
    left the touched delta buckets in place. A stale MOR UPSERT delta
    for an id the crashed COW batch DELETED has no base row to outrank
    it — the deleted doc (and its postings) resurrected on fold."""

    def test_cow_delete_crash_does_not_resurrect_mor_upsert(
        self, spark, tmp_path, monkeypatch
    ):
        path = str(tmp_path / "idx")
        idx = MinhashIndex(spark, path, k=2, num_hashes=16, bands=4, buckets=2)
        idx.update(docs_df(spark, [("a", BASE_TEXT), ("b", OTHER_TEXT)]),
                   "text", "doc_id")  # cow seed
        # MOR upsert of a → sig/post deltas hold UPSERT rows for a
        idx.update(docs_df(spark, [("a", BASE_TEXT + " v2")]),
                   "text", "doc_id", mode="mor")
        assert idx.sig_store.delta_bucket_ids()
        # COW batch DELETES a; crash after both swaps but before the
        # delta clear + journal removal (the normal path's last steps)
        boom = RuntimeError("simulated crash before delta clear")

        def crash(_bucket_ids):
            raise boom

        monkeypatch.setattr(idx.sig_store, "clear_delta_buckets", crash)
        with pytest.raises(RuntimeError, match="simulated crash"):
            idx.update(
                docs_df(spark, []), "text", "doc_id",
                deleted_ids=spark.createDataFrame([("a",)], "doc_id string"),
                mode="cow",
            )
        monkeypatch.undo()
        assert os.path.exists(idx._journal_path())
        assert idx.sig_store.delta_bucket_ids()  # stale delta on disk
        # reopen → journal recovery must clear the folded deltas too
        idx2 = MinhashIndex(spark, path, k=2, num_hashes=16, bands=4, buckets=2)
        assert not os.path.exists(idx2._journal_path())
        assert not idx2.sig_store.delta_bucket_ids()
        assert not idx2.post_store.delta_bucket_ids()
        assert {r["id"] for r in idx2.signatures().collect()} == {"b"}
        # a's postings are gone as well: its old text pairs with nothing
        pairs = idx2.incremental_pairs(
            docs_df(spark, [("probe", BASE_TEXT)]), threshold=0.4
        )
        assert pairs.count() == 0
        # and a later compact does not fold a resurrection into the base
        idx2.sig_store.compact()
        idx2.post_store.compact()
        assert {r["id"] for r in idx2.signatures().collect()} == {"b"}
