"""Round-2 query-surface tests: full-fidelity flagship, CNPJ e2e file
path, md5-family sketches, the n-gram DF cap, and plan-shape guards for
the scale-defaulted embedding near-dup API."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rfb_cnpj_etl_spark.operators import dedup as D
from rfb_cnpj_etl_spark.operators import similarity as SIM

SF_DIR = "/root/testdata/sf0.001"


class TestFlagshipFull:
    def test_two_string_aggs_and_nullif_builder(self, spark):
        from rfb_cnpj_etl_spark.plans.queries import flagship_full

        rows = flagship_full(spark, SF_DIR).collect()
        assert len(rows) == 20
        r = rows[0]
        # both decorrelated aggregates materialized
        assert " / " in r["part_names"] or r["part_names"] == ""
        assert "(" in r["supplier_names"]  # supplier (nation) labels
        # the NULLIF/conditional-concat builder: segment prefix + bracket
        assert " - " in r["customer_line"]
        assert r["customer_line"].endswith("]")
        locals_ = [x for x in rows if x["customer_line"].endswith("[LOCAL]")]
        tagged = [x for x in rows if not x["customer_line"].endswith("[LOCAL]")]
        assert tagged, "non-BRAZIL customers must keep their nation tag"
        # spot-check BRAZIL rewrites when present in the top-20
        for x in locals_:
            assert x["nation"] == "BRAZIL"


class TestCnpjE2E:
    def test_cleaning_and_bridge(self, spark):
        from rfb_cnpj_etl_spark.plans.queries import cnpj_etl_e2e
        from rfb_cnpj_etl_spark.sources.cnpj_fixture import N_ESTAB

        df = cnpj_etl_e2e(spark, SF_DIR)
        rows = {
            (r["cnpj_basico"], r["cnpj_ordem"], r["cnpj_dv"]): r
            for r in df.collect()
        }
        assert len(rows) == N_ESTAB
        # i=0: sentinel '0' date → NULL; packed CNAEs empty → 0
        r0 = rows[("10000000", "0001", "00")]
        assert r0["situacao_date"] is None and r0["n_sec"] == 0
        assert r0["fantasia"] == "LOJA 0"  # padding trimmed
        assert r0["razao_social"] == "EMPRESA 0 LTDA"
        # i=17: invalid 20230230 → NULL
        r17 = rows[("10000017", "0001", "17")]
        assert r17["situacao_date"] is None
        # i=1: real date parses; one secondary CNAE + trailing-space trim
        r1 = rows[("10000001", "0001", "01")]
        assert r1["situacao_date"] is not None and r1["n_sec"] == 2
        # basico ≥ 40 has no empresa row
        r45 = rows[("10000045", "0001", "45")]
        assert r45["razao_social"] == "SEM EMPRESA" and r45["capital"] is None


class TestHashFamilies:
    @pytest.fixture()
    def docs(self, spark):
        rows = [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over the lazy cat"),
            (2, "completely different text about spark engines"),
            (3, "the quick brown fox jumps over the lazy dog"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_md5_family_finds_same_dups_as_xxhash(self, spark, docs):
        for fam in ("xxhash64", "md5"):
            pairs = {
                (r["id_a"], r["id_b"])
                for r in D.minhash_lsh_pairs(
                    docs, "text", "doc_id", k=3, num_hashes=16, bands=4,
                    hash_family=fam,
                ).collect()
            }
            assert (0, 3) in pairs, fam  # exact dups always collide

    def test_simhash_md5_width(self, spark, docs):
        sh = {r["id"]: r["sh"] for r in D.simhash_table(
            docs, "text", "doc_id", hash_family="md5"
        ).collect()}
        assert all(0 <= v < (1 << 60) for v in sh.values())
        assert sh[0] == sh[3]  # identical docs → identical sketch
        pairs = {
            (r["id_a"], r["id_b"])
            for r in D.simhash_near_dups(
                docs, "text", "doc_id", hash_family="md5"
            ).collect()
        }
        assert (0, 3) in pairs

    def test_unknown_family_raises(self, spark, docs):
        with pytest.raises(ValueError):
            D.minhash_signatures(docs, "text", "doc_id", 3, 4, hash_family="nope")
        with pytest.raises(ValueError):
            D.simhash_table(docs, "text", "doc_id", hash_family="nope")


class TestMinhashIndex:
    def test_incremental_update_and_pairs(self, spark, tmp_path):
        from rfb_cnpj_etl_spark.operators.dedup import MinhashIndex

        base = spark.createDataFrame(
            [
                (0, "the quick brown fox jumps over the lazy dog tonight"),
                (1, "a completely different document about spark plans"),
                (2, "yet another unrelated text with its own words here"),
            ],
            "doc_id long, text string",
        )
        idx = MinhashIndex(spark, str(tmp_path / "mh_index"))
        idx.update(base)
        assert idx.signatures().count() == 3

        # batch 2: one near-dup of doc 0, one fresh doc
        batch = spark.createDataFrame(
            [
                (10, "the quick brown fox jumps over the lazy dog today"),
                (11, "entirely novel content nothing shares these tokens"),
            ],
            "doc_id long, text string",
        )
        idx.update(batch)
        assert idx.signatures().count() == 5
        pairs = {
            (r["id_a"], r["id_b"])
            for r in idx.incremental_pairs(batch, threshold=0.3).collect()
        }
        assert (0, 10) in pairs
        # old×old pairs are never regenerated
        assert all(a in (10, 11) or b in (10, 11) for a, b in pairs)

    def test_update_replaces_changed_doc(self, spark, tmp_path):
        from rfb_cnpj_etl_spark.operators.dedup import MinhashIndex

        idx = MinhashIndex(spark, str(tmp_path / "mh_index"))
        v1 = spark.createDataFrame(
            [(7, "original content of the document")], "doc_id long, text string"
        )
        idx.update(v1)
        sig1 = idx.signatures().collect()[0]["sig"]
        v2 = spark.createDataFrame(
            [(7, "totally rewritten content after an upsert event")],
            "doc_id long, text string",
        )
        idx.update(v2)
        rows = idx.signatures().collect()
        assert len(rows) == 1  # upsert, not append
        assert rows[0]["sig"] != sig1


class TestNgramDfCap:
    def test_cap_none_equals_uncapped_exact(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        capped = D.ngram_jaccard_pairs(docs, "text", "doc_id", k=3,
                                       threshold=0.5, max_df=10_000)
        uncapped = D.ngram_jaccard_pairs(docs, "text", "doc_id", k=3,
                                         threshold=0.5, max_df=None)
        assert capped.exceptAll(uncapped).count() == 0
        assert uncapped.exceptAll(capped).count() == 0

    def test_cap_drops_stop_shingle_fanout(self, spark):
        # 30 docs sharing one boilerplate sentence + unique tails: the
        # boilerplate shingles have df=30; with max_df=5 they are out of
        # the shingle space, so no pair survives on boilerplate alone.
        rows = [
            (i, "common header boilerplate line for every doc "
                + f"unique tail {i} alpha beta gamma delta {i}")
            for i in range(30)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = D.ngram_jaccard_pairs(
            docs, "text", "doc_id", k=3, threshold=0.5, max_df=5
        ).collect()
        assert pairs == []


class TestEmbeddingNearDupPlans:
    def test_default_api_has_no_nested_loop_join(self, spark):
        from rfb_cnpj_etl_spark.plans.queries import embedding_near_dups

        plan = embedding_near_dups(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_multi_table_lsh_improves_recall(self, spark):
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        )

        def pairs(n_tables):
            return {
                (r["id_a"], r["id_b"])
                for r in SIM.lsh_near_dup_pairs(
                    emb, "embedding", "vec_id", dim=64, n_planes=3,
                    threshold=0.4, n_tables=n_tables,
                ).collect()
            }

        one, three = pairs(1), pairs(3)
        assert one <= three, "OR-combined tables must only ADD candidates"
        assert len(three) > len(one), "3 tables should recover missed pairs"

    def test_lsh_pairs_subset_of_exact_and_nonempty(self, spark):
        from rfb_cnpj_etl_spark.plans.queries import (
            embedding_near_dups,
            embedding_near_dups_exact,
        )

        lsh = {
            (r["id_a"], r["id_b"]) for r in embedding_near_dups(spark, SF_DIR).collect()
        }
        exact = {
            (r["id_a"], r["id_b"])
            for r in embedding_near_dups_exact(spark, SF_DIR).collect()
        }
        assert lsh, "LSH bucketing found no candidate pairs at all"
        assert lsh <= exact


class TestJsonlSource:
    def test_schema_bound_scan_and_corrupt_capture(self, spark):
        from rfb_cnpj_etl_spark.sources.jsonl import (
            N_DOCS,
            ensure_jsonl_fixture,
            read_documents_jsonl,
        )

        # cache() first: Spark refuses a query that references ONLY the
        # internal corrupt-record column of an unmaterialized JSON scan
        docs = read_documents_jsonl(spark, ensure_jsonl_fixture()).cache()
        try:
            good = docs.filter(F.col("doc_id").isNotNull())
            bad = docs.filter(F.col("_corrupt").isNotNull())
            assert good.count() == N_DOCS
            captured = bad.collect()  # the planted malformed line
            assert len(captured) == 1
            assert captured[0]["_corrupt"].startswith('{"doc_id"')
            # the extra JSON key is ignored, not inferred into the schema
            assert "extra_meta" not in docs.columns
        finally:
            docs.unpersist()

    def test_stats_query_shape(self, spark):
        from rfb_cnpj_etl_spark.plans.queries import jsonl_doc_stats

        rows = jsonl_doc_stats(spark, SF_DIR).collect()
        assert sum(r["n_docs"] for r in rows) == 300
        assert all(r["n_tokens"] > 0 for r in rows)


class TestAnsiLeniency:
    def test_invalid_numeric_is_null_not_error(self, spark):
        """Spark 4 defaults to ANSI mode; the reference loader is lenient
        (bad values → NULL). normalize_numeric_br_decimal must therefore
        try_cast — a plain cast would abort the job on the first
        non-numeric passthrough value."""
        from rfb_cnpj_etl_spark.functions.normalize import (
            normalize_numeric_br_decimal,
        )

        df = spark.createDataFrame(
            [("1.234,56",), ("garbage",), ("",), (None,)], "v string"
        )
        got = [
            r["d"] and str(r["d"])
            for r in df.select(normalize_numeric_br_decimal("v").alias("d"))
            .collect()
        ]
        assert got == ["1234.56", None, None, None]


class TestRoundTwoRegistration:
    def test_every_query_has_oracle_or_is_cp1252(self):
        import __spark_entry__ as E

        qs, oracles = E.queries(), E.oracle_sql()
        missing = [k for k in qs if k not in oracles]
        assert missing == ["cnpj_cp1252_roundtrip"], missing
        dangling = [k for k in oracles if k not in qs]
        assert dangling == [], dangling
