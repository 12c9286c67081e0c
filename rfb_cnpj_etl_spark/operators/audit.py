"""Integrity audits — the Spark analog of the reference's constraint
machinery.

Spark/parquet enforce no PK/FK, so the reference's deferred PK builds
(``db/postgres_builder.py:96-126``) and FK creation
(``db/postgres_builder.py:138-184``, ``db/sqlite_builder.py:109-125``)
become explicit audit jobs: key-uniqueness counts and anti-join orphan
checks. The reference's patch pass exists precisely because FK builds
failed on raw data (``docs/normalizacao.md:1-7``) — these audits are the
detection side of that loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """Keys appearing more than once (PK-uniqueness audit). Empty ⇔ the
    deferred-PK build would have succeeded."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def fk_orphans(
    child: DataFrame,
    parent: DataFrame,
    child_key: str | list[str],
    parent_key: str | list[str] | None = None,
) -> DataFrame:
    """Child rows whose FK has no parent (anti-join). Empty ⇔ the FK
    constraint build would have succeeded.

    The parent side is broadcast when small — for dimension tables this
    keeps the audit shuffle-free on the child.
    """
    child_keys = [child_key] if isinstance(child_key, str) else child_key
    parent_keys = (
        child_keys
        if parent_key is None
        else ([parent_key] if isinstance(parent_key, str) else parent_key)
    )
    cond = None
    for ck, pk in zip(child_keys, parent_keys):
        c = child[ck] == parent[pk]
        cond = c if cond is None else (cond & c)
    return child.join(F.broadcast(parent), cond, "left_anti")


def delete_orphans(
    child: DataFrame, parent: DataFrame, child_key: str | list[str],
    parent_key: str | list[str] | None = None,
) -> DataFrame:
    """M6 generalized (utils/db_patch.py:108-115): remove child rows with
    no parent — the reference hardcodes 9 orphan cnpj_basico values; the
    engine computes the set with a semi-join instead."""
    child_keys = [child_key] if isinstance(child_key, str) else child_key
    parent_keys = (
        child_keys
        if parent_key is None
        else ([parent_key] if isinstance(parent_key, str) else parent_key)
    )
    cond = None
    for ck, pk in zip(child_keys, parent_keys):
        c = child[ck] == parent[pk]
        cond = c if cond is None else (cond & c)
    return child.join(F.broadcast(parent), cond, "left_semi")


def row_count_reconciliation(df: DataFrame, expected: int, tolerance: float = 0.0) -> dict:
    """V2/V4 analog: exact count vs expected, as a manifest-able dict
    (the reference logs 196,894,499/196,894,508 — docs/logs.md:23,38)."""
    actual = df.count()
    ok = abs(actual - expected) <= tolerance * max(expected, 1)
    return {"expected": expected, "actual": actual, "ok": bool(ok)}
