"""Deterministic synthetic change-log generator (SURVEY §7.2 M0).

Replaces the reference's network-facing discovery/download stack
(``cnpj_data/*``) for tests and benches: a seeded, fully JVM-side
generator (``spark.range`` + xxhash64-derived pseudo-randomness — no
Python row loop, no driver-side materialization) emitting upsert/delete
events with a monotonic LSN, a hot-repo skew knob, and an optional
mid-stream add-column schema-evolution event.

Determinism contract: same (n_events, seed, knobs) → identical rows on
any executor count, because every field is a pure function of the row id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["python", "rust", "go", "java", "sql"]


def _h(col, seed: int, salt: int):
    """Deterministic 64-bit hash stream i of the row id."""
    return F.abs(F.xxhash64(col, F.lit(seed), F.lit(salt)))


def synthesize_changelog(
    spark: SparkSession,
    n_events: int,
    n_repos: int = 20,
    n_paths: int = 100,
    delete_ratio: float = 0.1,
    hot_repo_fraction: float = 0.0,
    seed: int = 42,
    evolve_at: int | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Ordered change log of (repo, path, commit, lang, content, lsn, op).

    * ``lsn`` = row id (monotonic, dense, unique).
    * ``hot_repo_fraction`` routes that fraction of all events to
      ``repo_0`` (hot-key skew — reference analog: the estabelecimento
      batch-ratio knob, config.py:31-34).
    * ``evolve_at`` adds a ``branch`` column whose values are NULL for
      lsn < evolve_at and populated after — slicing the log at that LSN
      yields a genuine add-column schema evolution mid-replay.
    """
    df = spark.range(0, n_events, 1, partitions or spark.sparkContext.defaultParallelism)
    lsn = F.col("id")
    hot = (_h(lsn, seed, 1) % 1000) < int(hot_repo_fraction * 1000)
    repo = F.when(hot, F.lit("repo_0")).otherwise(
        F.concat(F.lit("repo_"), (_h(lsn, seed, 2) % n_repos).cast("string"))
    )
    path = F.concat(F.lit("path_"), (_h(lsn, seed, 3) % n_paths).cast("string"))
    op = F.when(
        (_h(lsn, seed, 4) % 1000) < int(delete_ratio * 1000), F.lit("delete")
    ).otherwise(F.lit("upsert"))
    lang = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]), (_h(lsn, seed, 5) % len(LANGS) + 1).cast("int")
    )
    content = F.concat(
        F.lit("def f_"),
        lsn.cast("string"),
        F.lit("():  # "),
        F.md5(F.concat(lsn.cast("string"), F.lit(f":{seed}"))),
    )
    out = df.select(
        repo.alias("repo"),
        path.alias("path"),
        F.md5(F.concat(F.lit("c"), lsn.cast("string"))).alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
        lsn.alias("lsn"),
        op.alias("op"),
    )
    if evolve_at is not None:
        out = out.withColumn(
            "branch",
            F.when(
                F.col("lsn") >= evolve_at,
                F.concat(F.lit("br_"), (_h(F.col("lsn"), seed, 6) % 8).cast("string")),
            ),
        )
    return out


def expected_final_state(changelog: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Oracle final state computed independently of the engine: plain
    groupBy-max-LSN semantics (used by differential tests)."""
    from .operators.dedup import last_writer_wins
    from .schema import CODE_KEY

    winners = last_writer_wins(changelog, keys or CODE_KEY)
    return winners.filter(F.col("op") != "delete").drop("op")
