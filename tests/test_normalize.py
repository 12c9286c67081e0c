"""T1–T4 / M4–M5 cleaner semantics — golden cases lifted from the
reference (utils/db_transformers.py, utils/db_patch.py)."""

from __future__ import annotations

import datetime
from decimal import Decimal

from pyspark.sql import functions as F

from rfb_cnpj_etl_spark.functions import normalize as N


def one(spark, value, expr):
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(expr.alias("out")).collect()[0]["out"]


class TestSanitize:
    def test_strips_nul_and_whitespace(self, spark):
        # db_transformers.py:13-22
        assert one(spark, "  a\x00b  ", N.sanitize("v")) == "ab"

    def test_plain_passthrough(self, spark):
        assert one(spark, "abc", N.sanitize("v")) == "abc"

    def test_null(self, spark):
        assert one(spark, None, N.sanitize("v")) is None


class TestSanitizeCp1252:
    def test_drops_unmappable(self, spark):
        # db_transformers.py:25-37: errors='ignore' drops emoji etc.
        assert one(spark, "ab☃cd", N.sanitize_cp1252(F.col("v"))) == "abcd"

    def test_keeps_cp1252_chars(self, spark):
        # ç/ã are cp1252-mappable (the data is Brazilian latin-1)
        assert one(spark, "ação", N.sanitize_cp1252(F.col("v"))) == "ação"

    def test_strips_like_t1(self, spark):
        assert one(spark, " x\x00y ", N.sanitize_cp1252(F.col("v"))) == "xy"


class TestNumericBr:
    # db_transformers.py:40-58 golden cases
    def test_thousands_and_comma(self, spark):
        assert one(spark, "1.234,56", N.normalize_numeric_br("v")) == "1234.56"

    def test_comma_only(self, spark):
        assert one(spark, "10,5", N.normalize_numeric_br("v")) == "10.5"

    def test_no_comma_unchanged(self, spark):
        # guard requires a comma: '1.234' stays as-is
        assert one(spark, "1.234", N.normalize_numeric_br("v")) == "1.234"

    def test_non_numeric_unchanged(self, spark):
        assert one(spark, "ab,cd", N.normalize_numeric_br("v")) == "ab,cd"

    def test_decimal_cast(self, spark):
        out = one(spark, "1.234,56", N.normalize_numeric_br_decimal("v"))
        assert out == Decimal("1234.56")


class TestDates:
    # db_transformers.py:61-86
    def test_valid(self, spark):
        assert one(spark, "20230115", N.normalize_date("v")) == datetime.date(
            2023, 1, 15
        )

    def test_sentinels(self, spark):
        for s in ["00000000", "", " ", "0"]:
            assert one(spark, s, N.normalize_date("v")) is None

    def test_invalid_calendar_date(self, spark):
        # '20230230' → NULL (reference: except ValueError)
        assert one(spark, "20230230", N.normalize_date("v")) is None

    def test_garbage(self, spark):
        assert one(spark, "notadate", N.normalize_date("v")) is None

    def test_pandas_twin_matches(self, spark):
        vals = ["20230115", "00000000", "20230230", "", "19991231"]
        df = spark.createDataFrame([(v,) for v in vals], "v string")
        native = [r["o"] for r in df.select(N.normalize_date("v").alias("o")).collect()]
        pandas = [
            r["o"]
            for r in df.select(N.normalize_date_pandas(F.col("v")).alias("o")).collect()
        ]
        assert native == pandas


class TestPatches:
    def test_zero_pad(self, spark):
        # db_patch.py:93-106
        assert one(spark, "76", N.zero_pad("v")) == "076"
        assert one(spark, " 5 ", N.zero_pad("v")) == "005"
        assert one(spark, None, N.zero_pad("v")) is None

    def test_null_if_zero(self, spark):
        # db_patch.py:89
        assert one(spark, "0", N.null_if_zero("v")) is None
        assert one(spark, "105", N.null_if_zero("v")) == "105"

    def test_default_if_empty(self, spark):
        # db_patch.py:91
        assert one(spark, "", N.default_if_empty("v", "00")) == "00"
        assert one(spark, None, N.default_if_empty("v", "00")) == "00"
        assert one(spark, "05", N.default_if_empty("v", "00")) == "05"


class TestSha256:
    def test_jvm_matches_pandas(self, spark):
        vals = ["hello", "ação", "", "x" * 1000]
        df = spark.createDataFrame([(v,) for v in vals], "v string")
        jvm = [r["o"] for r in df.select(N.content_sha256("v").alias("o")).collect()]
        pdu = [
            r["o"] for r in df.select(N.sha256_pandas(F.col("v")).alias("o")).collect()
        ]
        assert jvm == pdu

    def test_known_digest(self, spark):
        import hashlib

        assert one(spark, "abc", N.content_sha256("v")) == hashlib.sha256(
            b"abc"
        ).hexdigest()


class TestTransformTable:
    def test_empresa_dispatch(self, spark):
        # T5 per-table routing: capital_social → decimal, strings sanitized
        df = spark.createDataFrame(
            [("123", " ACME\x00 ", "2046", "05", "1.234,56", "", None)],
            "cnpj_basico string, razao_social string, cod_natureza_juridica string,"
            "cod_qualificacao_responsavel string, capital_social string,"
            "cod_porte string, ente_federativo string",
        )
        out = N.transform_table(df, "empresa").collect()[0]
        assert out["razao_social"] == "ACME"
        assert out["capital_social"] == Decimal("1234.56")

    def test_estabelecimento_dates(self, spark):
        df = spark.createDataFrame(
            [("1", "20200101", "00000000")],
            "cnpj_basico string, data_inicio_atividade string,"
            "data_situacao_cadastral string",
        )
        out = N.transform_table(df, "estabelecimento").collect()[0]
        assert out["data_inicio_atividade"] == datetime.date(2020, 1, 1)
        assert out["data_situacao_cadastral"] is None
