"""Field cleaners — the reference's row loops, vectorized.

The reference cleans every row in Python on the producer thread
(``utils/db_transformers.py:13-126``). Here each cleaner is either a
native Catalyst expression (preferred — whole-stage codegen, no Python)
or an Arrow-batched pandas UDF where Spark SQL genuinely can't express
the semantics (the cp1252 re-encode, T2). Per the graft contract there
is NO per-row Python anywhere.

Cleaner ↔ reference map:

* ``sanitize``            ← T1 ``sanitize_for_sqlite``  (db_transformers.py:13-22)
* ``sanitize_cp1252``     ← T2 ``sanitize_for_postgres`` (db_transformers.py:25-37)
* ``normalize_numeric_br``← T3 (db_transformers.py:40-58)
* ``normalize_date``      ← T4 (db_transformers.py:61-86)
* ``content_sha256``      ← the graft's per-row invariant (BASELINE.json input_hint)
* ``zero_pad``            ← M5 LPAD patch (utils/db_patch.py:93-106)
* ``null_if_zero`` / ``default_if_empty`` ← M4 rewrites (utils/db_patch.py:89,91)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Date sentinels that mean NULL (db_transformers.py:78-80).
DATE_SENTINELS = ["00000000", "", " ", "0"]


# ---------------------------------------------------------------------------
# Native-expression cleaners (JVM-side, codegen'd)
# ---------------------------------------------------------------------------


def sanitize(col: Column | str) -> Column:
    """T1: strip NUL bytes and surrounding whitespace from a string col."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, "\x00", ""))


def normalize_numeric_br(col: Column | str) -> Column:
    """T3: '1.234,56' → '1234.56' (string out, cast separately).

    Guarded exactly like the reference: only rewrite when the value
    contains a comma and is all-digits after removing '.' and ','
    (db_transformers.py:44-52); otherwise pass through unchanged.
    """
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.translate(c, ".,", "")
    candidate = c.contains(",") & (stripped.rlike("^[0-9]+$"))
    rewritten = F.regexp_replace(F.regexp_replace(c, "\\.", ""), ",", ".")
    return F.when(candidate, rewritten).otherwise(c)


def normalize_numeric_br_decimal(
    col: Column | str, precision: int = 16, scale: int = 2
) -> Column:
    """T3 + cast to DECIMAL(16,2) (empresa.capital_social, schema.py:61).

    ``try_cast``, not ``cast``: Spark 4 runs ANSI mode by default, where
    a plain cast of a non-numeric passthrough value would fail the whole
    job; the reference's loader is lenient (bad values load as NULL /
    unchanged), so invalid→NULL is the contract regardless of the
    session's ANSI setting."""
    return normalize_numeric_br(col).try_cast(T.DecimalType(precision, scale))


def normalize_date(col: Column | str) -> Column:
    """T4: 'YYYYMMDD' → date; sentinels and invalid dates → NULL.

    ``try_to_date`` ('20230230' → NULL, not error) reproduces the
    reference's ``except ValueError: None`` (db_transformers.py:81-84).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.trim(c).isin(DATE_SENTINELS), F.lit(None).cast("date")).otherwise(
        F.try_to_date(c, "yyyyMMdd")
    )


def content_sha256(col: Column | str) -> Column:
    """Lowercase hex sha256 of a string column (the CDC state invariant)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c.cast("string"), 256)


def zero_pad(col: Column | str, width: int = 3) -> Column:
    """M5: left-pad a code with zeros (db_patch.py:93-106)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull(), c).otherwise(F.lpad(F.trim(c), width, "0"))


def null_if_zero(col: Column | str) -> Column:
    """M4a: cod_pais='0' → NULL (db_patch.py:89)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == "0", F.lit(None).cast("string")).otherwise(c)


def default_if_empty(col: Column | str, default: str) -> Column:
    """M4b: cod_porte='' → '00' (db_patch.py:91)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when((c.isNull()) | (c == ""), F.lit(default)).otherwise(c)


# ---------------------------------------------------------------------------
# Pandas UDFs (Arrow-batched) — only where Spark SQL can't express it
# ---------------------------------------------------------------------------


@F.pandas_udf(T.StringType())
def sanitize_cp1252(s: pd.Series) -> pd.Series:
    """T2: T1 + windows-1252 round-trip with errors='ignore'.

    Byte-exact reproduction of ``sanitize_for_postgres``
    (db_transformers.py:25-37): characters that cannot be encoded in
    cp1252 are silently dropped. Not expressible in Spark SQL — this is
    the canonical custom pandas UDF of the engine.
    """
    cleaned = s.str.replace("\x00", "", regex=False).str.strip()
    return cleaned.map(
        lambda v: v.encode("windows-1252", errors="ignore").decode("windows-1252")
        if v is not None
        else None
    )


@F.pandas_udf(T.StringType())
def sha256_pandas(s: pd.Series) -> pd.Series:
    """Pandas-UDF twin of content_sha256 (used by tests to cross-check
    the JVM implementation on identical bytes)."""
    import hashlib

    return s.map(
        lambda v: hashlib.sha256(v.encode("utf-8")).hexdigest()
        if v is not None
        else None
    )


@F.pandas_udf(T.DateType())
def normalize_date_pandas(s: pd.Series) -> pd.Series:
    """Pandas-UDF twin of normalize_date (vectorized to_datetime)."""
    trimmed = s.str.strip()
    masked = trimmed.mask(trimmed.isin([x.strip() for x in DATE_SENTINELS]))
    return pd.to_datetime(masked, format="%Y%m%d", errors="coerce").dt.date


# ---------------------------------------------------------------------------
# Per-table dispatch (T5, db_transformers.py:99-126)
# ---------------------------------------------------------------------------


def transform_table(
    df: DataFrame,
    table: str,
    *,
    date_cols: dict[str, list[str]] | None = None,
    numeric_br_cols: dict[str, list[str]] | None = None,
    cp1252: bool = False,
) -> DataFrame:
    """Apply sanitize to every string col, then per-table date/decimal
    normalization — one single projection so Catalyst fuses it into the
    scan (vs the reference's producer-side per-row loop,
    db_batch_producer.py:86-87).
    """
    from ..schema import CNPJ_DATE_COLS, CNPJ_NUMERIC_BR_COLS

    date_cols = (date_cols or CNPJ_DATE_COLS).get(table, [])
    num_cols = (numeric_br_cols or CNPJ_NUMERIC_BR_COLS).get(table, [])
    exprs = []
    for f in df.schema.fields:
        if f.name in date_cols:
            exprs.append(normalize_date(f.name).alias(f.name))
        elif f.name in num_cols:
            exprs.append(normalize_numeric_br_decimal(f.name).alias(f.name))
        elif isinstance(f.dataType, T.StringType):
            base = sanitize_cp1252(F.col(f.name)) if cp1252 else sanitize(f.name)
            exprs.append(base.alias(f.name))
        else:
            exprs.append(F.col(f.name))
    return df.select(*exprs)
