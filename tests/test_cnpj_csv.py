"""CNPJ CSV source (S4/S5/T5/T7/T8): positional latin-1 scan, stem
routing, fused cleaning, bridge derivation.

Fixture values mirror the reference's edge cases verbatim:
sentinel dates '00000000' → NULL (utils/db_transformers.py:78-80),
BR decimal '1.234,56' → 1234.56 (:55-57), NUL/strip sanitize (:13-22),
packed-CNAE explode 'a, b,,c' (utils/db_batch_producer.py:61-72).
"""

from __future__ import annotations

import datetime
from decimal import Decimal

import pytest

from rfb_cnpj_etl_spark.sources.cnpj_csv import (
    BRIDGE_TABLE,
    load_cnpj_files,
    read_cnpj_csv,
    resolve_table,
)

EMP0 = "00000001;ACME \x00 LTDA  ;2046;05;1.234,56;05;\n"
EMP1 = "00000002;SÃO JOÃO PÃES;2062;49;1000,00;01;BR\n"

# 30 positional estabelecimento columns
ESTAB = (
    "00000001;0001;91;1;LOJA MATRIZ;02;20230115;00;;105;00000000;4711302;"
    "123, 456,,789;RUA;DAS FLORES;100;;CENTRO;01310100;SP;7107;11;999999;;;;"
    ";a@b.com;;0\n"
)


class TestRouting:
    def test_stem_strip(self):
        assert resolve_table("Empresas3.csv") == "empresa"
        assert resolve_table("/data/Estabelecimentos0.csv.gz") == "estabelecimento"
        assert resolve_table("Cnaes.csv") == "cnae"

    def test_unknown_raises(self):
        with pytest.raises(ValueError, match="no table mapping"):
            resolve_table("Desconhecido0.csv")


class TestLoad:
    @pytest.fixture()
    def files(self, tmp_path):
        paths = {}
        for name, text in [
            ("Empresas0.csv", EMP0),
            ("Empresas1.csv", EMP1),
            ("Estabelecimentos0.csv", ESTAB),
        ]:
            p = tmp_path / name
            p.write_bytes(text.encode("latin-1"))
            paths[name] = str(p)
        return paths

    def test_multi_part_union_and_clean(self, spark, files):
        out = load_cnpj_files(
            spark, [files["Empresas0.csv"], files["Empresas1.csv"]]
        )
        rows = {r["cnpj_basico"]: r for r in out["empresa"].collect()}
        assert len(rows) == 2  # Q9: two part files, one table
        # T1 sanitize: NUL removed, stripped
        assert rows["00000001"]["razao_social"] == "ACME  LTDA"
        # latin-1 decode intact
        assert rows["00000002"]["razao_social"] == "SÃO JOÃO PÃES"
        # T3 BR decimal
        assert rows["00000001"]["capital_social"] == Decimal("1234.56")
        assert rows["00000002"]["capital_social"] == Decimal("1000.00")

    def test_estabelecimento_and_bridge(self, spark, files):
        out = load_cnpj_files(spark, [files["Estabelecimentos0.csv"]])
        est = out["estabelecimento"].collect()[0]
        # T4 dates: valid → date, sentinel '00000000' → NULL
        assert est["data_situacao_cadastral"] == datetime.date(2023, 1, 15)
        assert est["data_inicio_atividade"] is None
        assert est["uf"] == "SP"
        # T7/T8 bridge: trimmed, empties dropped
        bridge = out[BRIDGE_TABLE].orderBy("cod_cnae").collect()
        assert [r["cod_cnae"] for r in bridge] == ["123", "456", "789"]
        assert all(r["cnpj_basico"] == "00000001" for r in bridge)

    def test_positional_binding(self, spark, files):
        raw = read_cnpj_csv(spark, files["Empresas0.csv"], "empresa")
        assert raw.columns[:3] == ["cnpj_basico", "razao_social", "cod_natureza_juridica"]
        assert raw.count() == 1
