"""Derived-relation operators (reference T7/T8).

The reference explodes the comma-packed ``cod_cnae_secundario`` column of
Estabelecimentos into the ``estabelecimento_cnae_sec`` bridge table with
a per-row Python loop (``utils/db_batch_producer.py:61-72``). Here it is
one Catalyst expression chain: split → explode → trim → drop empties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_delimited(
    df: DataFrame,
    key_cols: list[str],
    packed_col: str,
    out_col: str,
    delimiter: str = ",",
) -> DataFrame:
    """(keys…, 'a, b,,c') → one row per non-empty trimmed element.

    Exact semantics of db_batch_producer.py:61-72: split on the
    delimiter, strip each element, skip empties; rows whose packed col is
    NULL/empty produce no output rows.
    """
    return (
        df.select(
            *key_cols,
            F.explode(F.split(F.col(packed_col), delimiter)).alias(out_col),
        )
        .withColumn(out_col, F.trim(F.col(out_col)))
        .filter(F.length(F.col(out_col)) > 0)
    )


def route_multi_target(
    df: DataFrame, key_cols: list[str], packed_col: str, out_col: str = "cod_cnae"
) -> tuple[DataFrame, DataFrame]:
    """T8: one scan feeds two outputs (estabelecimento + bridge).

    Returns (main, bridge). Caller should cache/persist the input when
    both sides are materialized in the same job so the scan runs once.
    """
    bridge = explode_delimited(df, key_cols, packed_col, out_col)
    return df, bridge
