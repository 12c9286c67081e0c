"""Text analysis + embedding similarity operators."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from rfb_cnpj_etl_spark.functions import text as TX
from rfb_cnpj_etl_spark.operators import similarity as SIM

DOCS = "doc_id long, text string"


class TestTokens:
    def test_token_count(self, spark):
        df = spark.createDataFrame([(1, "  a  b   c ")], DOCS)
        out = df.select(TX.token_count("text").alias("n")).collect()[0]["n"]
        assert out == 3

    def test_bpe_token_count(self, spark):
        df = spark.createDataFrame([(1, "don't stop99 now!")], DOCS)
        # don / ' / t / stop / 99 / now / !
        out = df.select(TX.bpe_token_count("text").alias("n")).collect()[0]["n"]
        assert out == 7


class TestLanguageId:
    def test_english(self, spark):
        df = spark.createDataFrame(
            [(1, "the cat and the dog sat in the house for it is warm")], DOCS
        )
        assert df.select(TX.language_id("text").alias("l")).collect()[0]["l"] == "en"

    def test_spanish(self, spark):
        df = spark.createDataFrame(
            [(1, "el perro y la casa de los gatos en un lugar")], DOCS
        )
        assert df.select(TX.language_id("text").alias("l")).collect()[0]["l"] == "es"

    def test_unknown(self, spark):
        df = spark.createDataFrame([(1, "zzz qqq xxx www")], DOCS)
        assert df.select(TX.language_id("text").alias("l")).collect()[0]["l"] == "und"


class TestQuality:
    def test_bounds(self, spark):
        df = spark.createDataFrame(
            [(1, "a normal sentence with reasonable words"), (2, "!!! ??? ###"),
             (3, "x x x x x x x x x x")],
            DOCS,
        )
        vals = [r["q"] for r in df.select(TX.quality_score("text").alias("q")).collect()]
        assert all(0.0 <= v <= 1.0 for v in vals)
        # real text should outscore pure punctuation
        assert vals[0] > vals[1]


class TestFingerprint:
    def test_whitespace_insensitive(self, spark):
        df = spark.createDataFrame(
            [(1, "Hello   world"), (2, "hello world "), (3, "different text")], DOCS
        )
        fps = [r["f"] for r in df.select(TX.fingerprint64("text").alias("f")).collect()]
        assert fps[0] == fps[1]
        assert fps[0] != fps[2]


EMB = "vec_id long, embedding array<float>"


def _vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
        (4, [0.7, 0.7, 0.0]),
    ]
    return spark.createDataFrame(rows, EMB)


class TestBruteForce:
    def test_matches_numpy_oracle(self, spark):
        import numpy as np

        corpus = _vecs(spark)
        queries = corpus.filter(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
        )
        got = [
            (r["vec_id"], r["rank"])
            for r in SIM.brute_force_topk(queries, corpus, k=3)
            .orderBy("rank")
            .collect()
        ]
        vecs = {r["vec_id"]: np.array(r["embedding"]) for r in corpus.collect()}
        q = vecs[0]
        scores = sorted(
            ((vid, float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v)))) for vid, v in vecs.items()),
            key=lambda t: (-t[1], t[0]),
        )
        assert got == [(vid, i + 1) for i, (vid, _) in enumerate(scores[:3])]

    def test_self_is_top1(self, spark):
        corpus = _vecs(spark)
        queries = corpus.select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
        )
        top1 = (
            SIM.brute_force_topk(queries, corpus, k=1)
            .filter(F.col("rank") == 1)
            .collect()
        )
        assert all(r["q_id"] == r["vec_id"] for r in top1)
        assert all(abs(r["score"] - 1.0) < 1e-9 for r in top1)


class TestLsh:
    def test_recall_on_real_embeddings(self, spark):
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        queries = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
        )
        exact = {
            (r["q_id"], r["vec_id"])
            for r in SIM.brute_force_topk(queries, emb, k=5).collect()
        }
        approx = {
            (r["q_id"], r["vec_id"])
            for r in SIM.lsh_topk(queries, emb, k=5, dim=64, n_planes=3).collect()
        }
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.5, f"LSH recall too low: {recall}"

    def test_self_always_found(self, spark):
        # a query shares its own bucket by construction → rank-1 self hit
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        queries = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
        )
        top1 = (
            SIM.lsh_topk(queries, emb, k=1, dim=64, n_planes=3)
            .filter(F.col("rank") == 1)
            .collect()
        )
        assert all(r["q_id"] == r["vec_id"] for r in top1)


class TestIvfTopk:
    def test_self_always_found(self, spark):
        import pyspark.sql.functions as F
        from rfb_cnpj_etl_spark.operators.similarity import ivf_topk

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        queries = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
        )
        out = ivf_topk(queries, emb, k=3, n_clusters=4, nprobe=2)
        # a query's own vector is in its probed cluster by construction
        # (it IS the nearest centroid's list) → rank 1, score ~1
        top1 = {r["q_id"]: r["vec_id"] for r in out.filter("rank = 1").collect()}
        assert top1 == {i: i for i in range(5)}

    def test_recall_vs_brute_force(self, spark):
        import pyspark.sql.functions as F
        from rfb_cnpj_etl_spark.operators.similarity import (
            brute_force_topk,
            ivf_topk,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        queries = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
        )
        exact = {
            (r["q_id"], r["vec_id"])
            for r in brute_force_topk(queries, emb, k=5).collect()
        }
        approx = {
            (r["q_id"], r["vec_id"])
            for r in ivf_topk(queries, emb, k=5, n_clusters=8, nprobe=4).collect()
        }
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.5, f"IVF recall too low: {recall}"
