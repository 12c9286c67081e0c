"""CNPJ-shaped CSV source (reference S4/S5/T5/T8).

The reference streams ``;``-delimited latin-1 headerless CSV rows out of
monthly zip drops, binds columns positionally to the ``SCHEMA`` dict,
cleans them row-by-row in Python, and routes one input file to one or
two target tables (``utils/db_batch_producer.py:18-93``,
``db/schema.py:11-193``). Spark-first re-expression:

* file-stem → table routing, digits stripped (``Empresas0..9`` → one
  logical table = automatic multi-file UNION, SURVEY Q9);
* ``spark.read.csv`` with an explicit all-string StructType — columns
  bind positionally exactly like the reference (no header, no
  inference), and Spark parallelizes per file split;
* cleaning is ONE fused projection per table
  (``functions.normalize.transform_table`` — T1 sanitize everywhere,
  T4 dates, T3 BR decimals) that Catalyst pushes into the scan, not a
  producer-side Python loop;
* Estabelecimentos additionally derives the
  ``estabelecimento_cnae_sec`` bridge (T7 explode / T8 multi-target).

Zips: Spark cannot split zip members, so the scale path expects the
driver to land ``.csv`` / ``.csv.gz`` / parquet files (the reference's
download stage is out of engine scope, SURVEY S3). ``.gz`` reads fine
(one task per file — same parallelism the reference gets from
thread-per-zip, S6).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from ..functions.normalize import transform_table
from ..operators.explode import explode_delimited
from ..schema import CNPJ_SCHEMAS, FILE_STEM_TO_TABLE

#: estabelecimento key + packed column feeding the bridge
#: (db/schema.py:176-192; offsets db_batch_producer.py:41-50).
_ESTAB_KEYS = ["cnpj_basico", "cnpj_ordem", "cnpj_dv"]
_ESTAB_PACKED = "cod_cnae_secundario"
BRIDGE_TABLE = "estabelecimento_cnae_sec"


#: lowercased stem → table (the reference matches stems
#: case-insensitively: get_targets_from_zip_name lowercases both sides,
#: utils/db_batch_producer.py:18-28).
_STEM_LOWER_TO_TABLE = {k.lower(): v for k, v in FILE_STEM_TO_TABLE.items()}


def resolve_table(filename: str) -> str:
    """File name → target table: strip extension(s) and trailing digits
    from the stem, match case-insensitively (``empresas3.csv`` →
    ``empresa``). Unknown stems raise ValueError — the reference does
    the same (utils/db_batch_producer.py:18-28).
    """
    stem = os.path.basename(filename)
    stem = re.sub(r"\.[A-Za-z0-9.]+$", "", stem)  # drop .csv/.csv.gz/.zip
    stem = re.sub(r"\d+$", "", stem)
    table = _STEM_LOWER_TO_TABLE.get(stem.lower())
    if table is None:
        raise ValueError(f"no table mapping for file {filename!r} (stem {stem!r})")
    return table


def read_cnpj_csv(
    spark: SparkSession, paths: list[str] | str, table: str
) -> DataFrame:
    """Positional, headerless, latin-1, ``;``-delimited scan bound to
    the declared all-string schema (db_batch_producer.py:52-57)."""
    if table not in CNPJ_SCHEMAS:
        raise ValueError(f"unknown table {table!r}")
    return spark.read.csv(
        paths,
        schema=CNPJ_SCHEMAS[table],
        sep=";",
        encoding="ISO-8859-1",
        header=False,
    )


def load_cnpj_files(
    spark: SparkSession, files: list[str], cp1252: bool = False
) -> dict[str, DataFrame]:
    """Read + clean a batch of CNPJ CSV files into per-table DataFrames.

    Files routing to the same table are read as one multi-path scan
    (one UNION, one schema). Estabelecimentos also yields the
    ``estabelecimento_cnae_sec`` bridge. ``cp1252=True`` swaps T1
    sanitize for the T2 windows-1252 re-encode (the postgres-sink
    semantic, db_transformers.py:25-37).
    """
    by_table: dict[str, list[str]] = {}
    for f in files:
        by_table.setdefault(resolve_table(f), []).append(f)

    out: dict[str, DataFrame] = {}
    for table, paths in by_table.items():
        df = transform_table(
            read_cnpj_csv(spark, sorted(paths), table), table, cp1252=cp1252
        )
        out[table] = df
        if table == "estabelecimento":
            out[BRIDGE_TABLE] = explode_delimited(
                df, _ESTAB_KEYS, _ESTAB_PACKED, "cod_cnae"
            )
    return out
