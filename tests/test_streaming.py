"""Structured Streaming CDC apply + watermarked aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from rfb_cnpj_etl_spark.gen import expected_final_state, synthesize_changelog
from rfb_cnpj_etl_spark.streaming.pipeline import (
    StreamingCdcPipeline,
    streaming_event_stats,
)


def write_log_files(spark, log, out_dir, n_files):
    """Write the changelog as n_files parquet files, ordered by lsn
    ranges so file arrival order ≈ log order (like monthly drops)."""
    import math

    hi = log.agg(F.max("lsn")).collect()[0][0]
    step = math.ceil((hi + 1) / n_files)
    for i in range(n_files):
        (
            log.filter(F.col("lsn").between(i * step, (i + 1) * step - 1))
            .coalesce(1)
            .write.mode("append")
            .parquet(out_dir)
        )


class TestStreamingCdc:
    def test_stream_reaches_batch_final_state(self, spark, tmp_path):
        log = synthesize_changelog(spark, 2000, n_repos=5, n_paths=30).cache()
        src = str(tmp_path / "log")
        write_log_files(spark, log, src, n_files=4)

        pipe = StreamingCdcPipeline(
            spark,
            src,
            str(tmp_path / "state"),
            str(tmp_path / "manifest.jsonl"),
            str(tmp_path / "ckpt"),
            buckets=8,
            max_files_per_trigger=1,
        )
        pipe.run_until_drained()

        exp = {
            (r["repo"], r["path"]): r["content"]
            for r in expected_final_state(log).collect()
        }
        got = {
            (r["repo"], r["path"]): r["content"]
            for r in pipe.state.read().collect()
        }
        assert got == exp
        assert len(pipe.manifest.entries()) >= 1

    def test_restart_continues_not_reapplies(self, spark, tmp_path):
        log = synthesize_changelog(spark, 1000, n_repos=4, n_paths=20).cache()
        src = str(tmp_path / "log")
        write_log_files(spark, log.filter("lsn < 500"), src, n_files=2)

        args = (
            spark,
            src,
            str(tmp_path / "state"),
            str(tmp_path / "manifest.jsonl"),
            str(tmp_path / "ckpt"),
        )
        pipe = StreamingCdcPipeline(*args, buckets=8, max_files_per_trigger=1)
        pipe.run_until_drained()
        n_entries_first = len(pipe.manifest.entries())

        # more files arrive; a NEW pipeline (restart) drains only them
        write_log_files(spark, log.filter("lsn >= 500"), src, n_files=2)
        pipe2 = StreamingCdcPipeline(*args, buckets=8, max_files_per_trigger=1)
        pipe2.run_until_drained()

        assert len(pipe2.manifest.entries()) > n_entries_first
        exp = {
            (r["repo"], r["path"]): r["content"]
            for r in expected_final_state(log).collect()
        }
        got = {
            (r["repo"], r["path"]): r["content"]
            for r in pipe2.state.read().collect()
        }
        assert got == exp


class TestStreamingStats:
    def test_watermarked_window_counts(self, spark, tmp_path):
        agg = streaming_event_stats(
            spark, "/root/testdata/sf0.001", watermark="1 hour", window_len="24 hours"
        )
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("ev_stats")
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = spark.sql(
            "SELECT event_type, sum(n) AS n FROM ev_stats GROUP BY event_type"
        ).collect()
        got = {r["event_type"]: r["n"] for r in out}
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        exp = {
            r["event_type"]: r["n"]
            for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert got == exp


class TestStreamingDedupWithinWatermark:
    def test_redelivered_events_collapse(self, spark, tmp_path):
        """A redelivered file (same event_ids) must be absorbed by
        dropDuplicatesWithinWatermark before it reaches the sink."""
        from rfb_cnpj_etl_spark.streaming.pipeline import streaming_dedup_events

        src = str(tmp_path / "events_src")
        base = spark.range(0, 500).select(
            F.col("id").alias("event_id"),
            (F.lit("2024-01-01 00:00:00").cast("timestamp")
             + F.make_interval(secs=F.col("id").cast("double"))).alias("ts"),
            (F.col("id") % 50).alias("user_id"),
            F.lit("view").alias("event_type"),
            F.lit(1.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        base.coalesce(1).write.mode("append").parquet(src)
        base.coalesce(1).write.mode("append").parquet(src)  # redelivery

        out = streaming_dedup_events(spark, src, watermark="1 hour")
        q = (
            out.writeStream.format("memory")
            .queryName("dedup_stream")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = spark.sql(
            "SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_stream"
        ).collect()[0]
        assert got["n"] == 500 and got["d"] == 500


class TestStreamingSchemaEvolution:
    def test_restart_with_evolved_schema(self, spark, tmp_path):
        """Add-column evolution across a stream restart: phase 1 streams
        the base schema; phase 2 restarts the SAME checkpoint with the
        evolved schema over newly arrived files carrying the new column.
        Old rows surface NULL, new rows populated, no reprocessing."""
        from pyspark.sql import types as T

        from rfb_cnpj_etl_spark.schema import CHANGELOG_SCHEMA
        from rfb_cnpj_etl_spark.streaming.pipeline import StreamingCdcPipeline

        src = str(tmp_path / "src")
        log = synthesize_changelog(spark, 600, n_repos=4, n_paths=20, evolve_at=300)
        log.filter("lsn < 300").drop("branch").coalesce(1).write.mode(
            "append"
        ).parquet(src)

        common = dict(
            source_dir=src,
            state_path=str(tmp_path / "state"),
            manifest_path=str(tmp_path / "m.jsonl"),
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        p1 = StreamingCdcPipeline(spark, **common)
        p1.run_until_drained()
        assert "branch" not in p1.engine.final_state().columns

        # new files arrive WITH the evolved column; restart on the same
        # checkpoint with the evolved schema
        log.filter("lsn >= 300").coalesce(1).write.mode("append").parquet(src)
        evolved = T.StructType(
            list(CHANGELOG_SCHEMA.fields)
            + [T.StructField("branch", T.StringType(), True)]
        )
        p2 = StreamingCdcPipeline(spark, schema=evolved, **common)
        p2.run_until_drained()
        fs = p2.engine.final_state()
        assert "branch" in fs.columns
        assert fs.filter("lsn < 300 AND branch IS NOT NULL").count() == 0
        assert fs.filter("lsn >= 300 AND branch IS NULL").count() == 0
        assert p2.engine.verify_against(expected_final_state(log))["ok"]


class TestStreamingWithIndex:
    def test_stream_maintains_minhash_index(self, spark, tmp_path):
        """Dedup-as-part-of-ingest on the streaming path: each epoch
        folds its winners into the index; after draining, the index
        covers exactly the live keys and the planted near-dup pair is
        reported in some epoch's manifest entry."""
        from rfb_cnpj_etl_spark.operators.dedup import MinhashIndex

        base = "the quick brown fox jumps over the lazy dog tonight again"
        rows = [
            ("r1", "a", base, 1, "upsert"),
            ("r1", "b", "unrelated words about adaptive query execution", 2, "upsert"),
            ("r2", "c", base + " truly", 11, "upsert"),
            ("r1", "b", "unrelated words about adaptive query execution", 12, "delete"),
        ]
        log = spark.createDataFrame(
            [(r, p, f"c{l}", "python", c, l, o) for (r, p, c, l, o) in rows],
            "repo string, path string, commit string, lang string, "
            "content string, lsn long, op string",
        )
        src = str(tmp_path / "log")
        write_log_files(spark, log, src, n_files=2)

        idx = MinhashIndex(
            spark, str(tmp_path / "mh"), k=2, num_hashes=16, bands=4, buckets=16
        )
        pipe = StreamingCdcPipeline(
            spark,
            src,
            str(tmp_path / "state"),
            str(tmp_path / "manifest.jsonl"),
            str(tmp_path / "ckpt"),
            buckets=8,
            max_files_per_trigger=1,
            minhash_index=idx,
        )
        pipe.run_until_drained()

        live = {(r["repo"], r["path"]) for r in pipe.state.read().collect()}
        assert live == {("r1", "a"), ("r2", "c")}
        sig_ids = {r["id"] for r in idx.signatures().collect()}
        assert sig_ids == {"r1\x1fa", "r2\x1fc"}
        total_pairs = sum(
            e.get("near_dup_pairs", 0) for e in pipe.manifest.entries()
        )
        assert total_pairs >= 1


class TestStreamingMor:
    def test_small_epochs_take_mor_and_match(self, spark, tmp_path):
        """A steady stream of small epochs over a bulk-seeded table is
        the merge-on-read shape: epochs must auto-select MOR (the epoch
        row count rides the bounds agg) and the folded final state must
        still equal the batch oracle."""
        from rfb_cnpj_etl_spark.engine import CdcEngine

        log = synthesize_changelog(spark, 6000, n_repos=5, n_paths=300).cache()
        state, man = str(tmp_path / "state"), str(tmp_path / "m.jsonl")
        # bulk seed via the batch engine (COW, populates row estimates)
        eng = CdcEngine(spark, state, man, buckets=8)
        eng.replay(log.filter(F.col("lsn") < 5700), batch_size=6000)
        # the ~300-event tail arrives as 3 streamed epochs
        src = str(tmp_path / "log")
        write_log_files(
            spark, log.filter(F.col("lsn") >= 5700), src, n_files=3
        )
        pipe = StreamingCdcPipeline(
            spark, src, state, man, str(tmp_path / "ckpt"),
            buckets=8, max_files_per_trigger=1,
        )
        pipe.run_until_drained()
        stream_modes = [
            e.get("mode")
            for e in pipe.manifest.entries()
            if str(e.get("batch_id", "")).startswith("stream_epoch_")
        ]
        assert stream_modes and all(m == "mor" for m in stream_modes), stream_modes
        exp = {
            (r["repo"], r["path"]): r["content"]
            for r in expected_final_state(log).collect()
        }
        got = {
            (r["repo"], r["path"]): r["content"]
            for r in pipe.state.read().collect()
        }
        assert got == exp
