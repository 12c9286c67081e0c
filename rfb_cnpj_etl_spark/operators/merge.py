"""MERGE-style upsert/delete apply over a bucket-partitioned parquet
state table.

The reference's "merge" is drop-and-reload plus patch SQL
(``db/sqlite_builder.py:170-177``, ``utils/db_patch.py``). The engine
implements real keyed MERGE semantics. With Iceberg jars on the
classpath ``MERGE INTO`` would be config-only (SURVEY §4); this sandbox
has no Iceberg runtime, so the same public API is kept and the physical
plan is the scalable parquet fallback:

1. the state table is partitioned by ``bucket = pmod(xxhash64(keys), B)``
   (the Iceberg ``bucket(B, key)`` transform analog);
2. a micro-batch only touches the buckets its keys hash to → read just
   those partitions (partition-pruned scan), union with the batch
   winners, window-dedup by (key, lsn), and rewrite ONLY those buckets;
3. the rewrite goes to a hidden staging dir first, then bucket dirs are
   swapped into place — the reference's ``.part`` + ``os.replace``
   atomic-rename pattern (``cnpj_downloader.py:67,116,169``) applied to
   partitions. The checkpoint manifest (plans/checkpoint.py) is the
   commit point; a crash between swap and manifest replays the batch,
   and LWW-by-LSN makes the replay a no-op (idempotent).

Write amplification is bounded by touched-buckets/B of the table, not
the whole table. At 100 TB you raise B so a bucket ≈ a few GB; the
algorithm is unchanged.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import CODE_KEY, OP_DELETE, OP_UPSERT
from .dedup import last_writer_wins, last_writer_wins_salted


def key_bucket(keys: list[str], buckets: int) -> Column:
    """Deterministic key → bucket assignment."""
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(buckets)).cast("int")


class StateTable:
    """A bucket-partitioned parquet table with MERGE apply.

    Layout: ``{path}/bucket=<i>/part-*.parquet``. Schema = user columns
    + ``lsn`` (last applied per key) + ``content_sha256`` (the per-row
    invariant) + partition column ``bucket``.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: list[str] | None = None,
        buckets: int = 32,
        content_col: str = "content",
    ) -> None:
        self.spark = spark
        self.path = path
        self.keys = keys or CODE_KEY
        self.buckets = buckets
        self.content_col = content_col

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

    # -- write ---------------------------------------------------------

    def init_empty(self, like: DataFrame) -> None:
        """DDL analog of initialize_schema (db/sqlite_builder.py:170-177):
        create an empty table layout from a changelog-shaped DF."""
        if os.path.isdir(self.path):
            shutil.rmtree(self.path)
        prepared = self._prepare(like.limit(0)).drop("op")
        prepared.write.mode("overwrite").partitionBy("bucket").parquet(self.path)

    def _prepare(self, df: DataFrame) -> DataFrame:
        """Add engine metadata columns (bucket, content sha256)."""
        out = df
        if "bucket" not in df.columns:
            out = out.withColumn("bucket", key_bucket(self.keys, self.buckets))
        if "content_sha256" not in df.columns:
            out = out.withColumn(
                "content_sha256", F.sha2(F.col(self.content_col).cast("string"), 256)
            )
        return out

    def merge(
        self,
        batch: DataFrame,
        lsn_col: str = "lsn",
        op_col: str = "op",
        salt_buckets: int | None = None,
    ) -> dict:
        """Apply a changelog micro-batch. Returns manifest metrics:
        ``{"touched_buckets": [...], "bucket_rows": {b: n}, "rows": N}``.

        Logical semantics::

            MERGE INTO state USING dedup(batch) ON state.key = batch.key
              WHEN MATCHED AND op='delete'   THEN DELETE
              WHEN MATCHED                   THEN UPDATE SET *
              WHEN NOT MATCHED AND op<>'delete' THEN INSERT *

        LWW-by-LSN is associative, so state ∪ batch needs only ONE
        keyed dedup (salted two-phase when ``salt_buckets`` is set —
        hot-repo skew, SURVEY P7). The touched-bucket set is computed
        from the raw batch keys (column-pruned scan + tiny distinct on
        an int — dedup can't change which buckets a batch touches), so
        the expensive window shuffle runs exactly once, inside the
        write job. State rows keep their stored LSN so re-applying an
        already applied batch converges to the same state (idempotent).
        """
        bucket_col = key_bucket(self.keys, self.buckets)
        touched = sorted(
            r["bucket"]
            for r in batch.select(bucket_col.alias("bucket")).distinct().collect()
        )
        if not touched:
            return {"touched_buckets": [], "bucket_rows": {}, "rows": 0}

        incoming = batch
        if "bucket" not in incoming.columns:
            incoming = incoming.withColumn("bucket", bucket_col)
        if self.exists():
            # stored sha is recomputed post-dedup; dropping it keeps the
            # union schema = batch schema + bucket.
            current = (
                self.read_buckets(touched)
                .drop("content_sha256")
                .withColumn(op_col, F.lit(OP_UPSERT))
            )
            merged = current.unionByName(incoming, allowMissingColumns=True)
        else:
            merged = incoming
        if salt_buckets:
            final = last_writer_wins_salted(
                merged, self.keys, lsn_col, op_col, salt_buckets
            )
        else:
            final = last_writer_wins(merged, self.keys, lsn_col, op_col)
        final = (
            final.filter(F.col(op_col) != OP_DELETE)
            .drop(op_col)
            .withColumn(
                "content_sha256",
                F.sha2(F.col(self.content_col).cast("string"), 256),
            )
        )

        # stage → swap (atomic per bucket dir, commit point = manifest).
        # Repartition on the partition column first (Iceberg
        # write.distribution-mode=hash analog): without it every write
        # task emits a file per bucket it holds — tasks × buckets tiny
        # files per batch; with it, one task and one file per bucket.
        staging = f"{self.path}.staging"
        if os.path.isdir(staging):
            shutil.rmtree(staging)
        final.repartition(self.buckets, "bucket").write.mode("overwrite").partitionBy(
            "bucket"
        ).parquet(staging)

        os.makedirs(self.path, exist_ok=True)
        for b in touched:
            dst = f"{self.path}/bucket={b}"
            src = f"{staging}/bucket={b}"
            if os.path.isdir(dst):
                shutil.rmtree(dst)
            if os.path.isdir(src):
                os.replace(src, dst)
            # else: every key in this bucket was deleted → bucket gone.
        shutil.rmtree(staging, ignore_errors=True)

        remaining = [
            b for b in touched if os.path.isdir(f"{self.path}/bucket={b}")
        ]
        counts = (
            {
                r["bucket"]: r["rows"]
                for r in self.read_buckets(remaining)
                .groupBy("bucket")
                .agg(F.count("*").alias("rows"))
                .collect()
            }
            if remaining
            else {}
        )
        return {
            "touched_buckets": touched,
            "bucket_rows": {int(k): int(v) for k, v in counts.items()},
            "rows": int(sum(counts.values())),
        }

    # -- audits (reference S10/S12 analogs) -----------------------------

    def audit_key_uniqueness(self) -> int:
        """Post-load PK audit (deferred-PK analog,
        db/postgres_builder.py:96-126): count of duplicated keys."""
        return (
            self.read()
            .groupBy(*self.keys)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .count()
        )
