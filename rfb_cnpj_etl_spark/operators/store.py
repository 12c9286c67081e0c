"""Bucket-partitioned parquet store: the engine's one layout + swap
protocol.

Every persistent store in the engine — the CDC MERGE state table
(operators/merge.py) and the incremental MinHash index's signature and
posting stores (operators/dedup.py) — shares this machinery: the
``bucket=<i>`` partition layout with its ``_table_meta.json`` marker,
rename-aside atomic swaps with crash recovery (the reference's
``.part`` + ``os.replace`` pattern, ``cnpj_downloader.py:67,116,169``,
applied to partitions), partition-pruned reads, staged writes,
small-file compaction and a metadata-only health report.

**Object-store translation (the 100×-cluster commit protocol).** The
swap protocol needs exactly three filesystem primitives: atomic rename
of a path (``os.replace``), recursive delete, and listing. On HDFS the
mapping is direct (``fs.rename`` is atomic, directories are real). On
S3-class object stores "directories" are key prefixes and rename is
copy+delete (non-atomic), so the SAME protocol is expressed one level
up, exactly as Iceberg/Delta do it: data files are immutable and
written once under unique names (our staging writes already are), and
the ``bucket=<i>`` directory indirection becomes a per-bucket pointer
in a small metadata file committed with ONE atomic operation —
``_table_meta.json`` here, which is already the layout's ground truth
and is written via put-if-absent/rename (S3 now supports conditional
PUT; any catalog/DynamoDB lock works identically). The recovery
invariants carry over unchanged because they only ever reason about
"pointer committed" vs "pointer not committed": a crash before the
metadata commit leaves the old pointer (old files still present,
staging garbage collected later), after it the new one. Nothing in the
engine assumes directory rename beyond this module, so porting =
swapping ``_swap_in``/``_write_meta`` for pointer updates; the
per-bucket manifest lineage (plans/checkpoint.py) is the same pattern
at batch granularity.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def key_bucket(keys: list[str], buckets: int) -> Column:
    """Deterministic key → bucket assignment."""
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(buckets)).cast("int")


class BucketedParquetStore:
    """Shared machinery for bucket-partitioned parquet stores.

    Layout: ``{path}/bucket=<i>/part-*.parquet`` plus a ``_table_meta``
    layout marker. Provides: crash recovery for interrupted swaps,
    rename-aside bucket swaps, partition-pruned reads, staged writes,
    small-file compaction and a metadata-only health report.

    :class:`StateTable` (the CDC MERGE target) and the MinHash index's
    signature/posting stores (operators/dedup.py) all subclass this, so
    every persistent store in the engine has ONE swap protocol and ONE
    recovery story.
    """

    #: layout marker colocated with the data ("_"-prefixed → invisible
    #: to Spark's parquet reader, like _SUCCESS). The physical layout is
    #: the ground truth for the bucket count — a manifest can go stale
    #: across a crash between a rebucket swap and its manifest commit.
    META_FILE = "_table_meta.json"

    def __init__(self, spark: SparkSession, path: str, buckets: int = 32) -> None:
        self.spark = spark
        self.path = path
        self.buckets = buckets
        self._recover()
        marker = self.layout_buckets(path)
        if marker is not None and marker != self.buckets:
            raise ValueError(
                f"store at {path} is laid out with buckets={marker} "
                f"(layout marker) but buckets={self.buckets} was requested; "
                "construct with the marker value or run rebucket"
            )

    # -- crash recovery / layout marker ---------------------------------

    @classmethod
    def layout_buckets(cls, path: str) -> int | None:
        """Bucket count recorded in the store's layout marker (None for
        a missing store or one predating the marker)."""
        meta = os.path.join(path, cls.META_FILE)
        if not os.path.exists(meta):
            return None
        with open(meta, encoding="utf-8") as f:
            return int(json.load(f)["buckets"])

    def _meta_payload(self) -> dict:
        return {"buckets": self.buckets}

    def _write_meta(self, into: str | None = None, buckets: int | None = None) -> None:
        """Write the layout marker (atomically) into the live dir — or
        into ``into`` (a staging dir), so the marker can ride an atomic
        whole-dir rename instead of trailing it."""
        payload = self._meta_payload()
        if buckets is not None:
            payload["buckets"] = buckets
        meta = os.path.join(into or self.path, self.META_FILE)
        tmp = meta + ".part"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(payload, f)
        os.replace(tmp, meta)

    def _recover(self) -> None:
        """Undo a crashed swap. Invariants of the swap protocols below:
        a ``*.old`` directory exists ONLY before the corresponding
        manifest commit, so restoring it and letting the batch/rebucket
        re-apply is always correct (LWW idempotence)."""
        whole_old = f"{self.path}.old"
        if not os.path.isdir(self.path) and os.path.isdir(whole_old):
            # rebucket crashed between its two renames → restore the
            # intact pre-rebucket table (staging is discarded on rerun)
            os.replace(whole_old, self.path)
        if os.path.isdir(self.path):
            for d in os.listdir(self.path):
                if d.startswith("bucket=") and d.endswith(".old"):
                    src = os.path.join(self.path, d)
                    dst = os.path.join(self.path, d[: -len(".old")])
                    if os.path.isdir(dst):
                        shutil.rmtree(src)  # swap completed; stale trash
                    else:
                        os.replace(src, dst)  # swap crashed mid-bucket
        shutil.rmtree(whole_old, ignore_errors=True)

    def _swap_in(self, src: str, dst: str) -> None:
        """Replace ``dst`` with ``src`` without a window where neither
        exists: dst is renamed aside first (never rmtree'd before the
        replacement lands) and the trash only deleted last. ``src``
        absent = the bucket emptied out (every key deleted)."""
        trash = f"{dst}.old"
        if os.path.isdir(trash):
            shutil.rmtree(trash)
        if os.path.isdir(dst):
            os.replace(dst, trash)
        if os.path.isdir(src):
            os.replace(src, dst)
        shutil.rmtree(trash, ignore_errors=True)

    # -- read ----------------------------------------------------------

    def exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            e.startswith("bucket=") for e in os.listdir(self.path)
        )

    def read(self) -> DataFrame:
        return self.spark.read.option("basePath", self.path).parquet(self.path)

    def read_buckets(self, bucket_ids: list[int]) -> DataFrame:
        """Partition-pruned scan of only the touched buckets (reads just
        those directories — no full-table I/O)."""
        paths = [
            f"{self.path}/bucket={b}"
            for b in bucket_ids
            if os.path.isdir(f"{self.path}/bucket={b}")
        ]
        if not paths:
            return self.read().limit(0)
        return self.spark.read.option("basePath", self.path).parquet(*paths)

    # -- staged write + swap --------------------------------------------

    def stage_write(self, df: DataFrame, staging: str) -> list[int]:
        """Write ``df`` (already carrying a ``bucket`` column and
        repartitioned by the caller) into a fresh staging dir; returns
        the staged bucket ids. No live data is touched."""
        if os.path.isdir(staging):
            shutil.rmtree(staging)
        df.write.mode("overwrite").partitionBy("bucket").parquet(staging)
        return sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(staging)
            if d.startswith("bucket=")
        )

    def swap_buckets(self, staging: str, touched: list[int]) -> None:
        """Swap each touched bucket dir from staging into the live store
        (rename-aside; a staged bucket that is absent means the bucket
        emptied out and its live dir is removed), then refresh the
        layout marker. Crash anywhere → _recover restores consistency."""
        os.makedirs(self.path, exist_ok=True)
        for b in touched:
            self._swap_in(f"{staging}/bucket={b}", f"{self.path}/bucket={b}")
        self._write_meta()

    # -- maintenance -----------------------------------------------------

    def compact(
        self,
        target_files_per_bucket: int = 1,
        split_col: Column | None = None,
    ) -> dict:
        """Per-bucket small-file compaction (OPTIMIZE file-size health):
        rewrite each bucket down to ≤ ``target_files_per_bucket`` files.
        Uses its OWN staging dir (merge() wipes ``.staging`` on entry —
        sharing it would turn a crashed compaction into data loss at the
        next merge) and the same rename-aside bucket swap as merge, so a
        crash at any point leaves every bucket recoverable.

        ``split_col`` is required for >1 file per bucket (subclasses
        supply a deterministic second partition key — see
        StateTable.compact); repartitioning on the bucket value alone
        maps each bucket to exactly one output file."""
        if not self.exists():
            return {"compacted_buckets": 0, "buckets": self.buckets}
        bucket_ids = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(self.path)
            if d.startswith("bucket=") and not d.endswith(".old")
        )
        staging = f"{self.path}.compacting"
        if os.path.isdir(staging):
            shutil.rmtree(staging)
        df = self.read_buckets(bucket_ids)
        if target_files_per_bucket > 1:
            if split_col is None:
                raise ValueError(
                    "target_files_per_bucket > 1 needs a deterministic "
                    "split_col (a nondeterministic split can lose rows on "
                    "task retry)"
                )
            df = df.repartition(
                len(bucket_ids) * target_files_per_bucket,
                F.col("bucket"),
                split_col,
            )
        else:
            df = df.repartition(len(bucket_ids), "bucket")
        df.write.mode("overwrite").partitionBy("bucket").parquet(staging)
        for b in bucket_ids:
            src = f"{staging}/bucket={b}"
            if os.path.isdir(src):
                self._swap_in(src, f"{self.path}/bucket={b}")
        shutil.rmtree(staging, ignore_errors=True)
        return {"compacted_buckets": len(bucket_ids), "buckets": self.buckets}

    def health(self) -> dict:
        """File-size health report (the observability half of OPTIMIZE —
        reference analog: the index pass deciding what to build,
        db/sqlite_builder.py:127-168): per-bucket file counts and bytes,
        plus aggregate skew indicators, from pure filesystem metadata
        (no Spark job — see :func:`path_health`). Feeds the
        compact/rebucket decision: many small files per bucket →
        compact; max/median bucket bytes ≫ 1 → key-space skew; bucket
        bytes near the executor-memory budget → rebucket to a larger B."""
        return path_health(self.path)

    # -- audits ----------------------------------------------------------

    def bucket_assignment_audit(self, bucket_col: Column) -> int:
        """Rows whose stored partition value disagrees with ``bucket_col``
        recomputed from their own columns — 0 for a healthy store."""
        return (
            self.read()
            .filter(F.col("bucket") != bucket_col)
            .count()
        )


def path_health(path: str) -> dict:
    """The health report as a free function over a path — pure
    ``os.listdir``/``getsize``, requiring neither a SparkSession nor a
    store object (the CLI's ``health`` verb uses this directly so the
    metadata-only report doesn't pay JVM startup)."""
    if not os.path.isdir(path) or not any(
        e.startswith("bucket=") for e in os.listdir(path)
    ):
        return {"buckets": 0, "files": 0, "bytes": 0, "per_bucket": {}}
    per_bucket: dict[int, dict] = {}
    for d in sorted(os.listdir(path)):
        if not d.startswith("bucket=") or d.endswith(".old"):
            continue
        b = int(d.split("=", 1)[1])
        files = [
            e for e in os.listdir(os.path.join(path, d)) if e.endswith(".parquet")
        ]
        nbytes = sum(os.path.getsize(os.path.join(path, d, e)) for e in files)
        per_bucket[b] = {"files": len(files), "bytes": nbytes}
    sizes = sorted(v["bytes"] for v in per_bucket.values())
    total = sum(sizes)
    median = sizes[len(sizes) // 2] if sizes else 0
    return {
        "buckets": len(per_bucket),
        "files": sum(v["files"] for v in per_bucket.values()),
        "bytes": total,
        "max_bucket_bytes": sizes[-1] if sizes else 0,
        "median_bucket_bytes": median,
        "skew_ratio": round(sizes[-1] / median, 2) if median else 0.0,
        "max_files_per_bucket": max(
            (v["files"] for v in per_bucket.values()), default=0
        ),
        "per_bucket": per_bucket,
    }


