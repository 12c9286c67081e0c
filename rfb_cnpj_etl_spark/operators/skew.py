"""Skew handling — salted repartition for hot keys (SURVEY P7).

The reference's only skew knob is a smaller batch size for its one hot
table (``config.py:31-34``). At cluster scale a hot repo (one key = 50%
of events) turns any key-hash shuffle into a single straggler task. AQE
rebalances *joins* at runtime but not window/write partitioning, so the
engine salts explicitly:

* ``add_salt`` / ``salted_repartition`` — spread one key over N subkeys.
* ``hot_keys`` — find keys above a frequency threshold (sampled).
* two-phase dedup lives in ``dedup.last_writer_wins_salted``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def add_salt(
    df: DataFrame, salt_col: str = "__salt", buckets: int = 16, from_col: str | None = None
) -> DataFrame:
    """Deterministic salt in [0, buckets): hash of a monotonic column if
    given (reproducible across retries — critical for exactly-once),
    else a per-row random would break idempotent replay, so a
    deterministic hash over all columns is used instead."""
    if from_col is not None:
        salt = F.pmod(F.xxhash64(F.col(from_col)), F.lit(buckets))
    else:
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))
    return df.withColumn(salt_col, salt.cast("int"))


def salted_repartition(
    df: DataFrame,
    keys: list[str],
    buckets: int = 16,
    from_col: str | None = "lsn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Repartition by (keys…, salt): a key owning 50% of rows now spans
    up to ``buckets`` partitions instead of one. Pass ``num_partitions``
    to pin the shuffle width (an explicit width is exempt from AQE
    coalescing — useful when the downstream op needs the spread)."""
    salted = add_salt(df, buckets=buckets, from_col=from_col)
    cols = [F.col(k) for k in keys] + [F.col("__salt")]
    out = (
        salted.repartition(num_partitions, *cols)
        if num_partitions
        else salted.repartition(*cols)
    )
    return out.drop("__salt")


def hot_keys(
    df: DataFrame, keys: list[str], threshold_fraction: float = 0.05
) -> DataFrame:
    """Keys holding more than ``threshold_fraction`` of all rows.

    ONE scan of the input: the total is re-aggregated from the per-key
    counts and broadcast-joined back, and because both branches share
    the identical groupBy subplan Spark reuses the exchange
    (``ReusedExchange``) instead of scanning the input twice — the
    round-2 version ran a separate ``df.count()`` action, a second full
    pass for a diagnostic helper."""
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("n") >= F.lit(threshold_fraction) * F.col("__total"))
        .drop("__total")
    )


def partition_histogram(df: DataFrame) -> DataFrame:
    """Rows per physical partition — the per-partition ingested-row
    metric recorded into the checkpoint manifest (north_rule) and used by
    skew tests to assert salting balanced the load."""
    return (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg(F.count("*").alias("rows"))
        .orderBy("__pid")
    )
