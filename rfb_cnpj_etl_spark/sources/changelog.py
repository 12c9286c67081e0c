"""Change-log sources.

The reference discovers input by scraping the RFB index page and
building a {filename, url, size} manifest (``cnpj_data/
cnpj_public_data.py:57-171``). The engine's input is an ordered change
log — a table/stream of ``(repo, path, commit, lang, content, lsn, op)``
rows with a monotonic ``lsn``. Three ways to get one:

* ``read_changelog``      — parquet/table of already changelog-shaped rows;
* ``changelog_from_events`` — deterministic derivation from the driver's
  synthetic ``events`` table (shared, SQL-expressible logic: the DuckDB
  oracle computes the identical log — see ``events_changelog_sql``);
* ``gen.synthesize_changelog`` — the seeded generator (gen.py) with
  hot-key skew and schema-evolution knobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Derivation constants — keep in sync with events_changelog_sql().
N_REPOS = 20
N_PATHS = 211  # prime → (repo, path) keys recur at co-prime strides
DELETE_EVENT_TYPE = "click"


def read_changelog(spark: SparkSession, path: str) -> DataFrame:
    """Read a changelog-shaped parquet (ordered by lsn, not required to
    be sorted on disk — LSN is data, not file order)."""
    return spark.read.parquet(path)


def changelog_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a (repo, path, commit, lang, content, lsn, op) changelog
    from the driver's ``events`` parquet, purely with Catalyst
    expressions. event_id is the monotonic LSN; 'click' events are
    deletes; content is a deterministic function of the row so the final
    state has a well-defined per-key sha256.
    """
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        F.concat(F.lit("repo_"), F.pmod(F.col("user_id"), F.lit(N_REPOS)).cast("string")).alias("repo"),
        F.concat(F.lit("path_"), F.pmod(F.col("event_id"), F.lit(N_PATHS)).cast("string")).alias("path"),
        F.md5(F.col("event_id").cast("string")).alias("commit"),
        F.col("event_type").alias("lang"),
        F.concat_ws(
            "|",
            F.col("event_type"),
            F.col("props"),
            F.col("event_id").cast("string"),
        ).alias("content"),
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_type") == DELETE_EVENT_TYPE, F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
    )


def events_changelog_sql(events_rel: str = "events") -> str:
    """The DuckDB-compatible SQL twin of ``changelog_from_events`` —
    used to build oracle queries over the identical derived log."""
    return f"""
    SELECT
      'repo_' || CAST(user_id % {N_REPOS} AS VARCHAR)       AS repo,
      'path_' || CAST(event_id % {N_PATHS} AS VARCHAR)      AS path,
      md5(CAST(event_id AS VARCHAR))                         AS "commit",
      event_type                                             AS lang,
      event_type || '|' || props || '|' || CAST(event_id AS VARCHAR) AS content,
      event_id                                               AS lsn,
      CASE WHEN event_type = '{DELETE_EVENT_TYPE}' THEN 'delete' ELSE 'upsert' END AS op
    FROM {events_rel}
    """
