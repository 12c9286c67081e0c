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
        buckets: int = 32,
        salt_buckets: int | None = None,
        normalize: Callable[[DataFrame], DataFrame] | None = default_normalize,
        registry: SchemaRegistry | None = None,
    ) -> None:
        self.spark = spark
        self.state = StateTable(spark, state_path, keys or CODE_KEY, buckets)
        self.manifest = Manifest(manifest_path)
        self.salt_buckets = salt_buckets
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
        metrics = self.state.merge(
            batch, salt_buckets=self.salt_buckets, touched=touched
        )
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
        # key+lsn-column scan instead of B small jobs at 10^10 events).
        from .operators.merge import key_bucket

        bucket_col = key_bucket(self.state.keys, self.state.buckets)
        win = F.floor(F.col(lsn_col) / F.lit(batch_size)).cast("long")
        pairs = (
            pending.groupBy(win.alias("__w"), bucket_col.alias("__b"))
            .agg(F.max(lsn_col).alias("__hi"), F.min(lsn_col).alias("__lo"))
            .collect()
        )
        if not pairs:
            return []
        wins: dict[int, dict] = {}
        for r in pairs:
            w = wins.setdefault(
                int(r["__w"]), {"buckets": [], "lo": None, "hi": None}
            )
            w["buckets"].append(int(r["__b"]))
            w["lo"] = int(r["__lo"]) if w["lo"] is None else min(int(r["__lo"]), w["lo"])
            w["hi"] = int(r["__hi"]) if w["hi"] is None else max(int(r["__hi"]), w["hi"])
        entries = []
        for wid in sorted(wins):
            w = wins[wid]
            start, end = wid * batch_size, (wid + 1) * batch_size - 1
            batch = pending.filter(F.col(lsn_col).between(start, end))
            # batch_id and the manifest record the REAL lsn span (not the
            # window bounds): a partially-filled tail window must not
            # advance the watermark past events that haven't arrived yet,
            # and its later events must not collide with the applied id.
            batch_id = f"lsn_{w['lo']}_{w['hi']}"
            entries.append(
                self.apply_batch(
                    batch, batch_id, w["lo"], w["hi"], touched=sorted(w["buckets"])
                )
            )
        return entries

    # ------------------------------------------------------------------

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
