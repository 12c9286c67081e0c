"""Round-2 regression tests: normalized-key bucket probing, the
fail-loud staging guard, bucket-count evolution (rebucket/compact),
chunked window probing, stateful-streaming chunk handling, and the CLI
edge cases flagged in ADVICE.md."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from rfb_cnpj_etl_spark.engine import CdcEngine, default_normalize
from rfb_cnpj_etl_spark.gen import expected_final_state, synthesize_changelog
from rfb_cnpj_etl_spark.operators.merge import StateTable

LOG_SCHEMA = (
    "repo string, path string, commit string, lang string, content string,"
    " lsn long, op string"
)


def log_df(spark, rows):
    return spark.createDataFrame(rows, LOG_SCHEMA)


def row(repo, path, content, lsn, op="upsert"):
    return (repo, path, f"c{lsn}", "python", content, lsn, op)


def state_dict(st):
    return {
        (r["repo"], r["path"]): (r["content"], r["lsn"])
        for r in st.read().collect()
    }


class TestNormalizedKeyBucketing:
    """ADVICE high: replay()'s upfront touched-bucket probe must see the
    keys exactly as merge() will — i.e. AFTER sanitize. Raw-key probing
    hashed dirty keys to the wrong buckets and silently dropped rows in
    the stage-and-swap."""

    def test_replay_with_dirty_keys_loses_no_rows(self, spark, tmp_path):
        # keys with whitespace/NUL padding: sanitize changes them, so the
        # raw-key bucket differs from the merged-key bucket for most rows.
        rows = [
            row(f"  repo_{i % 7}\x00", f" path_{i} ", f"v{i}", i)
            for i in range(120)
        ]
        log = log_df(spark, rows)
        eng = CdcEngine(
            spark, str(tmp_path / "s"), str(tmp_path / "m.jsonl"), buckets=8
        )
        eng.replay(log, batch_size=40)
        fs = eng.final_state()
        assert fs.count() == 120, "rows silently lost in swap"
        # every key landed sanitized
        dirty = fs.filter(
            (F.col("repo") != F.trim(F.regexp_replace("repo", "\x00", "")))
            | (F.col("path") != F.trim(F.regexp_replace("path", "\x00", "")))
        ).count()
        assert dirty == 0
        res = eng.verify_against(expected_final_state(default_normalize(log)))
        assert res["ok"], res

    def test_updates_and_deletes_land_for_dirty_keys(self, spark, tmp_path):
        eng = CdcEngine(
            spark, str(tmp_path / "s"), str(tmp_path / "m.jsonl"), buckets=8
        )
        eng.replay(
            log_df(spark, [row(" r ", " a ", "v1", 0), row(" r ", " b ", "w1", 1)]),
            batch_size=10,
        )
        eng.replay(
            log_df(
                spark,
                [row(" r ", " a ", "v2", 10), row(" r ", " b ", None, 11, "delete")],
            ),
            batch_size=10,
        )
        assert state_dict(eng.state) == {("r", "a"): ("v2", 10)}

    def test_merge_rejects_bucket_outside_touched(self, spark, tmp_path):
        st = StateTable(spark, str(tmp_path / "s"), buckets=8)
        batch = log_df(spark, [row("r", f"p{i}", "v", i) for i in range(32)])
        real = st.touched_buckets(batch)
        wrong = [b for b in range(8) if b not in real] or [real[0]]
        with pytest.raises(RuntimeError, match="outside the precomputed"):
            st.merge(batch, touched=wrong[:1])
        # fail-loud happened BEFORE any swap: state untouched
        assert not st.exists()


class TestBucketEvolution:
    def _replayed_engine(self, spark, tmp_path, n=800):
        state, man = str(tmp_path / "s"), str(tmp_path / "m.jsonl")
        log = synthesize_changelog(spark, n, n_repos=6, n_paths=40).cache()
        eng = CdcEngine(spark, state, man, buckets=4)
        eng.replay(log, batch_size=n)
        return eng, log, state, man

    def test_rebucket_preserves_state(self, spark, tmp_path):
        eng, log, state, man = self._replayed_engine(spark, tmp_path)
        before = state_dict(eng.state)
        entry = eng.rebucket(16)
        assert entry["rebucket_from"] == 4 and entry["rebucket_to"] == 16
        assert state_dict(eng.state) == before
        assert eng.state.audit_key_uniqueness() == 0
        assert eng.verify_against(expected_final_state(log))["ok"]
        # physical layout really changed
        import os

        dirs = [d for d in os.listdir(state) if d.startswith("bucket=")]
        assert max(int(d.split("=")[1]) for d in dirs) >= 4

    def test_new_engine_reads_bucket_count_from_manifest(self, spark, tmp_path):
        eng, log, state, man = self._replayed_engine(spark, tmp_path)
        eng.rebucket(16)
        eng2 = CdcEngine(spark, state, man)  # no explicit buckets
        assert eng2.state.buckets == 16
        # replay continues correctly under the new layout
        extra = log_df(spark, [row("repo_0", "path_1", "post-rebucket", 10_000)])
        eng2.replay(extra, batch_size=100)
        got = {
            (r["repo"], r["path"]): r["content"]
            for r in eng2.final_state().filter("lsn = 10000").collect()
        }
        assert got == {("repo_0", "path_1"): "post-rebucket"}

    def test_explicit_bucket_mismatch_raises(self, spark, tmp_path):
        eng, log, state, man = self._replayed_engine(spark, tmp_path)
        eng.rebucket(16)
        with pytest.raises(ValueError, match="rebucket"):
            CdcEngine(spark, state, man, buckets=4)

    def test_compact_preserves_contents(self, spark, tmp_path):
        eng, log, state, man = self._replayed_engine(spark, tmp_path)
        before = state_dict(eng.state)
        res = eng.state.compact()
        assert res["compacted_buckets"] > 0
        assert state_dict(eng.state) == before


class TestSwapCrashRecovery:
    def _table(self, spark, tmp_path, rows=32):
        st = StateTable(spark, str(tmp_path / "s"), buckets=4)
        st.merge(log_df(spark, [row("r", f"p{i}", f"v{i}", i) for i in range(rows)]))
        return st

    def test_mid_bucket_swap_crash_restores(self, spark, tmp_path):
        import os

        st = self._table(spark, tmp_path)
        before = state_dict(st)
        # simulate a crash inside _swap_in: dst renamed aside, new data
        # never landed (bucket temporarily absent, .old holds the rows)
        b = next(d for d in os.listdir(st.path) if d.startswith("bucket="))
        os.replace(f"{st.path}/{b}", f"{st.path}/{b}.old")
        st2 = StateTable(spark, st.path, buckets=4)  # recovery runs here
        assert state_dict(st2) == before
        assert not any(d.endswith(".old") for d in os.listdir(st.path))

    def test_rebucket_mid_swap_crash_restores(self, spark, tmp_path):
        import os

        st = self._table(spark, tmp_path)
        before = state_dict(st)
        # simulate a crash between rebucket's two whole-table renames
        os.replace(st.path, f"{st.path}.old")
        st2 = StateTable(spark, st.path, buckets=4)
        assert state_dict(st2) == before

    def test_layout_marker_survives_stale_manifest(self, spark, tmp_path):
        """Crash after the rebucket swap but before the manifest commit:
        the layout marker, not the manifest, must drive B resolution."""
        state, man = str(tmp_path / "s"), str(tmp_path / "m.jsonl")
        log = synthesize_changelog(spark, 400, n_repos=4, n_paths=20).cache()
        eng = CdcEngine(spark, state, man, buckets=4)
        eng.replay(log, batch_size=400)
        segs_before = set(eng.manifest._segment_files())
        eng.rebucket(16)
        # "lose" the rebucket's manifest commit: with the segmented
        # manifest a crashed commit = its segment file never landed
        import os

        for name in set(eng.manifest._segment_files()) - segs_before:
            os.remove(os.path.join(eng.manifest.segs_dir, name))
        eng2 = CdcEngine(spark, state, man)  # marker wins over manifest
        assert eng2.state.buckets == 16
        assert eng2.verify_against(expected_final_state(log))["ok"]
        with pytest.raises(ValueError, match="layout"):
            StateTable(spark, state, buckets=4)

    def test_compact_files_per_bucket(self, spark, tmp_path):
        import glob

        st = self._table(spark, tmp_path, rows=64)
        before = state_dict(st)
        st.compact(target_files_per_bucket=2)
        assert state_dict(st) == before
        per_bucket = [
            len(glob.glob(f"{st.path}/bucket={b}/*.parquet")) for b in range(4)
        ]
        assert max(per_bucket) == 2, per_bucket

    def test_cli_init_records_buckets(self, spark, tmp_path, capsys):
        from rfb_cnpj_etl_spark import cli

        state, man = str(tmp_path / "s"), str(tmp_path / "m.jsonl")
        log_path = str(tmp_path / "log")
        synthesize_changelog(spark, 200, n_repos=3, n_paths=10).write.parquet(
            log_path
        )
        assert cli.main(
            ["init", "--state", state, "--manifest", man, "--buckets", "8"]
        ) == 0
        # bare replay (no --buckets) must pick up 8, not the default 32
        assert cli.main(
            ["replay", "--state", state, "--manifest", man, "--log", log_path]
        ) == 0
        assert StateTable.layout_buckets(state) == 8


class TestWindowEnumeration:
    def test_many_windows_streamed_probe(self, spark, tmp_path):
        log = synthesize_changelog(spark, 1000, n_repos=5, n_paths=30).cache()
        eng = CdcEngine(spark, str(tmp_path / "s"), str(tmp_path / "m.jsonl"))
        entries = eng.replay(log, batch_size=100)  # 10 windows
        assert len(entries) == 10
        assert eng.verify_against(expected_final_state(log))["ok"]

    def test_sparse_lsn_space_enumerates_only_nonempty_windows(
        self, spark, tmp_path
    ):
        """Timestamp-like LSNs: 20 events spread over a 2·10⁷-window
        numeric range. Only the 20 NON-EMPTY windows may be processed —
        iterating the numeric range would mean ~2·10⁷ windows' worth of
        probe work before the first batch applies."""
        base = synthesize_changelog(spark, 20, n_repos=3, n_paths=10)
        sparse = base.withColumn("lsn", F.col("lsn") * 1_000_000)
        eng = CdcEngine(spark, str(tmp_path / "s"), str(tmp_path / "m.jsonl"))
        entries = eng.replay(sparse, batch_size=1000)
        assert len(entries) == 20  # one per event-bearing window, no more
        assert eng.verify_against(expected_final_state(sparse))["ok"]
        assert eng.manifest.high_watermark() == 19 * 1_000_000


class TestStatefulChunking:
    """ADVICE medium: a key's group spanning several Arrow chunks must
    still emit ONE row per trigger, and an LSN tie resolves to the
    delete (matching last_writer_wins_agg)."""

    def test_one_emission_per_key_across_chunks(self, spark, tmp_path):
        from rfb_cnpj_etl_spark.streaming.stateful import lww_stateful_filter

        src = str(tmp_path / "src")
        rows = [row("r", "p", f"v{i}", i) for i in range(100)]
        # tie at the top: upsert AND delete at lsn 99 → delete must win
        rows.append(row("r", "p", None, 99, "delete"))
        log_df(spark, rows).repartition(1).write.parquet(src)

        old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "8")
        try:
            stream = (
                spark.readStream.schema(LOG_SCHEMA)
                .parquet(src)
            )
            q = (
                lww_stateful_filter(stream)
                .writeStream.format("memory")
                .queryName("lww_chunked")
                .outputMode("update")
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
        finally:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
        out = spark.sql("SELECT * FROM lww_chunked").collect()
        assert len(out) == 1, f"expected 1 winner row, got {len(out)}"
        assert out[0]["lsn"] == 99 and out[0]["op"] == "delete"


class TestCliEdgeCases:
    def test_replay_nothing_pending_no_state(self, spark, tmp_path, capsys):
        from rfb_cnpj_etl_spark import cli

        log_path = str(tmp_path / "log")
        spark.createDataFrame([], LOG_SCHEMA).write.parquet(log_path)
        rc = cli.main(
            [
                "replay",
                "--state", str(tmp_path / "never_created"),
                "--manifest", str(tmp_path / "m.jsonl"),
                "--log", log_path,
            ]
        )
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["rows"] == 0 and out["batches_applied"] == 0

    def test_resolve_table_case_insensitive(self):
        from rfb_cnpj_etl_spark.sources.cnpj_csv import resolve_table

        assert resolve_table("empresas0.csv") == "empresa"
        assert resolve_table("EMPRESAS7.CSV") == "empresa"
        assert resolve_table("Estabelecimentos3.csv") == "estabelecimento"
        with pytest.raises(ValueError):
            resolve_table("Unknown9.csv")

    def test_cli_rebucket_verb(self, spark, tmp_path, capsys):
        from rfb_cnpj_etl_spark import cli

        state, man = str(tmp_path / "s"), str(tmp_path / "m.jsonl")
        log_path = str(tmp_path / "log")
        synthesize_changelog(spark, 300, n_repos=4, n_paths=20).write.parquet(
            log_path
        )
        assert cli.main(
            ["replay", "--state", state, "--manifest", man, "--log", log_path]
        ) == 0
        assert cli.main(
            ["rebucket", "--state", state, "--manifest", man, "--to-buckets", "8"]
        ) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["rebucket_to"] == 8
        assert cli.main(
            ["audit", "--state", state, "--manifest", man]
        ) == 0
