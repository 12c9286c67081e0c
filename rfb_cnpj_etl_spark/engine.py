"""The replay loop / micro-batch driver (reference §3.1 lifecycle,
``orchestrator.py:23-124``, re-expressed).

One call = one resumable CDC replay::

    engine = CdcEngine(spark, state_path, manifest_path)
    engine.replay(changelog_df, batch_size=100_000)

Per micro-batch: filter the log to the LSN window → normalize (vectorized
cleaners) → LWW dedup (salted when skewed) → bucket-pruned MERGE →
atomically commit a manifest entry carrying lsn range, per-bucket row
counts (per-partition lineage + metrics, the north_rule requirement) and
schema version. Restart resumes after ``manifest.high_watermark()``;
re-delivered batches are no-ops.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .operators.merge import StateTable
from .plans.checkpoint import Manifest
from .schema import CHANGELOG_SCHEMA, CODE_KEY, SchemaRegistry


def default_normalize(df: DataFrame) -> DataFrame:
    """Vectorized cleaning of every string column (T1 sanitize) — one
    fused projection, no Python."""
    from .functions.normalize import sanitize

    exprs = []
    for f in df.schema.fields:
        if isinstance(f.dataType, T.StringType) and f.name not in ("op",):
            exprs.append(sanitize(f.name).alias(f.name))
        else:
            exprs.append(F.col(f.name))
    return df.select(*exprs)


class CdcEngine:
    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        manifest_path: str,
        keys: list[str] | None = None,
        buckets: int | None = None,
        salt_buckets: int | None = None,
        normalize: Callable[[DataFrame], DataFrame] | None = default_normalize,
        registry: SchemaRegistry | None = None,
    ) -> None:
        self.spark = spark
        self.manifest = Manifest(manifest_path)
        # Bucket-count resolution: the table's layout marker is the
        # ground truth (it is swapped atomically WITH the data, so it
        # survives a crash between a rebucket swap and its manifest
        # commit — the manifest alone can go stale there); the manifest
        # record covers pre-marker tables; an explicit mismatch is an
        # error (reading with the wrong B silently mis-prunes buckets).
        recorded = StateTable.layout_buckets(state_path)
        if recorded is None:
            recorded = self.manifest.current_buckets()
        if buckets is not None and recorded is not None and buckets != recorded:
            raise ValueError(
                f"state table has buckets={recorded} (layout/manifest) but "
                f"buckets={buckets} was requested; run `rebucket` to change B"
            )
        self.state = StateTable(
            spark, state_path, keys or CODE_KEY, buckets or recorded or 32
        )
        if salt_buckets is not None:
            import warnings

            warnings.warn(
                "salt_buckets is deprecated and ignored: the hash-agg LWW "
                "merge path collapses hot keys map-side (no salting needed)",
                DeprecationWarning,
                stacklevel=2,
            )
        self.normalize = normalize
        self.registry = registry or SchemaRegistry(CHANGELOG_SCHEMA)

    # ------------------------------------------------------------------

    def apply_batch(
        self,
        batch: DataFrame,
        batch_id: str,
        lsn_lo: int,
        lsn_hi: int,
        touched: list[int] | None = None,
    ) -> dict:
        """Normalize → dedup → MERGE → manifest-commit one micro-batch."""
        if self.manifest.is_applied(batch_id):
            return {"batch_id": batch_id, "skipped": True}
        # add-column evolution: new batch columns extend the registry;
        # batches missing known columns are fine (NULL-filled in MERGE).
        cur_names = {f.name for f in self.registry.current.fields}
        new_fields = [f for f in batch.schema.fields if f.name not in cur_names]
        added = []
        if new_fields:
            merged_schema = T.StructType(
                list(self.registry.current.fields) + new_fields
            )
            added = self.registry.evolve(merged_schema)
        if self.normalize is not None:
            batch = self.normalize(batch)
        metrics = self.state.merge(batch, touched=touched)
        entry = {
            "batch_id": batch_id,
            "lsn_lo": int(lsn_lo),
            "lsn_hi": int(lsn_hi),
            "schema_version": self.registry.version,
            "added_columns": [f.name for f in added],
            "columns": batch.columns,
            **metrics,
        }
        return self.manifest.commit(entry)

    def replay(
        self,
        changelog: DataFrame,
        batch_size: int = 1_000_000,
        lsn_col: str = "lsn",
    ) -> list[dict]:
        """Resumable replay: equal-width LSN windows above the manifest
        high watermark. Returns the committed manifest entries."""
        watermark = self.manifest.high_watermark()
        pending = changelog.filter(F.col(lsn_col) > watermark)
        # Micro-batch windows are aligned on absolute LSN
        # (window k = [k·bs, (k+1)·bs)), so batch boundaries — and hence
        # batch_ids — are stable across resumes. ONE upfront pass
        # computes every window's exact touched-bucket set (per-batch
        # partition pruning without a per-batch driver job: one
        # key+lsn-column scan at 10^10 events). Only windows that
        # actually contain events are enumerated — never the numeric
        # window range, which for sparse LSN spaces (timestamp-derived
        # sequences) can be orders of magnitude larger than the data.
        from .operators.merge import key_bucket

        # Buckets MUST be derived from the keys as merge() will see them —
        # i.e. AFTER normalization (sanitize trims/NUL-strips the key
        # columns; a key altered by it hashes to a different bucket).
        # apply_batch normalizes each batch before merging, so this probe
        # runs the same normalization. The lsn column is the engine's own
        # long and is contract-exempt from normalization. (Catalyst
        # prunes the normalize projection down to key+lsn columns — the
        # probe never touches content.)
        probe = pending if self.normalize is None else self.normalize(pending)
        bucket_col = key_bucket(self.state.keys, self.state.buckets)
        win = F.floor(F.col(lsn_col) / F.lit(batch_size)).cast("long")
        # Globally ordered via range partitioning into FEW partitions:
        # toLocalIterator launches one fetch job per partition, so
        # leaving the agg at spark.sql.shuffle.partitions would add that
        # many scheduling round-trips per replay for a table that is
        # tiny relative to the data (≤ windows × buckets rows); 8
        # partitions keeps the per-fetch driver footprint bounded at
        # scale while costing at most 8 fetches.
        pairs = (
            probe.groupBy(win.alias("__w"), bucket_col.alias("__b"))
            .agg(F.max(lsn_col).alias("__hi"), F.min(lsn_col).alias("__lo"))
            .repartitionByRange(8, F.col("__w"), F.col("__b"))
            .sortWithinPartitions("__w", "__b")
        )

        entries = []

        def flush(wid: int, buckets: list[int], lo: int, hi: int) -> None:
            start, end = wid * batch_size, (wid + 1) * batch_size - 1
            batch = pending.filter(F.col(lsn_col).between(start, end))
            # batch_id and the manifest record the REAL lsn span (not the
            # window bounds): a partially-filled tail window must not
            # advance the watermark past events that haven't arrived yet,
            # and its later events must not collide with the applied id.
            entries.append(
                self.apply_batch(
                    batch, f"lsn_{lo}_{hi}", lo, hi, touched=sorted(buckets)
                )
            )

        # toLocalIterator streams the sorted (window, bucket) rows one
        # shuffle partition at a time — driver memory is bounded by a
        # partition of 4-int rows, not by windows × buckets — and each
        # window's batch is applied as soon as its rows are exhausted
        # (the sort guarantees a window's rows are contiguous).
        cur_w: int | None = None
        cur_buckets: list[int] = []
        cur_lo = cur_hi = 0
        for r in pairs.toLocalIterator():
            w = int(r["__w"])
            if cur_w is not None and w != cur_w:
                flush(cur_w, cur_buckets, cur_lo, cur_hi)
                cur_buckets = []
            if not cur_buckets:
                cur_lo, cur_hi = int(r["__lo"]), int(r["__hi"])
            else:
                cur_lo = min(cur_lo, int(r["__lo"]))
                cur_hi = max(cur_hi, int(r["__hi"]))
            cur_w = w
            cur_buckets.append(int(r["__b"]))
        if cur_w is not None:
            flush(cur_w, cur_buckets, cur_lo, cur_hi)
        return entries

    # ------------------------------------------------------------------

    def rebucket(self, new_buckets: int) -> dict:
        """Migrate the state table to a new bucket count and record the
        new layout in the manifest. Crash safety: a crash mid-swap is
        restored by StateTable._recover (the pre-rebucket table survives
        in ``.old``); a crash between the swap and this manifest commit
        leaves the manifest stale, but the layout marker written with
        the swap is the ground truth the next engine resolves B from —
        the stale manifest record is then self-healed by the next
        committed entry."""
        metrics = self.state.rebucket(new_buckets)
        hw = self.manifest.high_watermark()
        # seq in the id keeps repeated rebuckets (32→64→32→…) distinct —
        # Manifest.commit dedups on batch_id.
        entry = {
            "batch_id": f"rebucket_{len(self.manifest.entries())}_to_{new_buckets}",
            "lsn_lo": hw,
            "lsn_hi": hw,
            "schema_version": self.registry.version,
            **metrics,
        }
        return self.manifest.commit(entry)

    def final_state(self) -> DataFrame:
        return self.state.read()

    def verify_against(self, expected: DataFrame, content_col: str = "content") -> dict:
        """Per-row sha256(content) differential vs an independently
        computed oracle state (BASELINE.json input_hint invariant)."""
        actual = self.final_state().select(
            *self.state.keys,
            F.col("content_sha256").alias("sha"),
            F.lit(1).alias("in_a"),
        )
        exp = expected.select(
            *self.state.keys,
            F.sha2(F.col(content_col).cast("string"), 256).alias("sha"),
            F.lit(1).alias("in_e"),
        )
        mismatched = (
            actual.alias("a")
            .join(exp.alias("e"), self.state.keys, "full_outer")
            .filter(
                F.col("a.in_a").isNull()
                | F.col("e.in_e").isNull()
                | ~F.col("a.sha").eqNullSafe(F.col("e.sha"))
            )
            .count()
        )
        return {
            "rows_actual": actual.count(),
            "rows_expected": exp.count(),
            "sha_mismatches": int(mismatched),
            "ok": mismatched == 0,
        }
