"""applyInPandasWithState online LWW filter (streaming/stateful.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from rfb_cnpj_etl_spark.gen import synthesize_changelog
from rfb_cnpj_etl_spark.streaming.stateful import lww_stateful_filter


class TestLwwStatefulFilter:
    @pytest.fixture()
    def source_dir(self, spark, tmp_path):
        d = str(tmp_path / "src")
        synthesize_changelog(spark, 2000, n_repos=5, n_paths=20).write.mode(
            "overwrite"
        ).parquet(d)
        return d

    def test_emits_last_writer_per_key(self, spark, tmp_path, source_dir):
        stream = (
            spark.readStream.schema(
                "repo string, path string, commit string, lang string,"
                " content string, lsn long, op string"
            )
            .option("maxFilesPerTrigger", 4)
            .parquet(source_dir)
        )
        out = lww_stateful_filter(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("lww_out")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

        # For every key, the LAST emitted row must be the global max-LSN
        # row (earlier emissions are monotone improvements).
        emitted = spark.sql("SELECT * FROM lww_out")
        last_emit = (
            emitted.groupBy("repo", "path").agg(F.max("lsn").alias("lsn"))
        )
        expected = (
            spark.read.parquet(source_dir)
            .groupBy("repo", "path")
            .agg(F.max("lsn").alias("lsn"))
        )
        diff = last_emit.exceptAll(expected).count() + expected.exceptAll(
            last_emit
        ).count()
        assert diff == 0
        # monotone per key: every emitted lsn for a key strictly increases
        # (no stale writer ever re-emitted) — count(emitted per key) ==
        # count(distinct lsn per key) guarantees no duplicates at least
        dup = (
            emitted.groupBy("repo", "path", "lsn")
            .count()
            .filter("count > 1")
            .count()
        )
        assert dup == 0
