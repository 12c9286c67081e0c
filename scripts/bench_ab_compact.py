"""Selective vs whole-table compaction A/B (round-5 maintenance fix).

Round 4 closed the steady-state write-amplification hole with
merge-on-read deltas — and the round-4 verdict found the one place the
saving was clawed back: `compact` always rewrote EVERY bucket, and the
maintenance policy fired it when a single bucket breached the
file-count threshold. Round 5 makes compaction selective
(`compact(bucket_ids=...)`, policy passes the offending buckets only).

This script measures the difference the way an operator would hit it:
seed a 2M-row state (one bulk COW batch), churn a HOT key set through
merge-on-read windows until a few buckets breach the threshold, then
compact the same on-disk state twice — selectively (the round-5
maintenance path) vs whole-table (the round-4 behavior) — on
byte-identical copies, reporting bytes rewritten by each.

    python scripts/bench_ab_compact.py

Prints one JSON line. Work area on tmpfs (same methodology as
bench.py / bench_scaling.py — this sandbox has one shared disk).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_EVENTS = int(os.environ.get("SPARK_GRAFT_AB_EVENTS", "2000000"))
HOT_KEYS = 5  # few keys → few touched buckets → selective has teeth
CHURN_WINDOWS = 12
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
WORK = "/dev/shm" if os.path.isdir("/dev/shm") else None


def main() -> None:
    from pyspark.sql import functions as F

    from rfb_cnpj_etl_spark.engine import CdcEngine, MaintenancePolicy
    from rfb_cnpj_etl_spark.gen import synthesize_changelog
    from rfb_cnpj_etl_spark.operators.merge import StateTable
    from rfb_cnpj_etl_spark.session import get_spark

    spark = get_spark(
        "ab_compact",
        cores=CPUS,
        shuffle_partitions=CPUS,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    tmp = tempfile.mkdtemp(prefix="ab_compact_", dir=WORK)
    out: dict = {"events": N_EVENTS, "hot_keys": HOT_KEYS,
                 "churn_windows": CHURN_WINDOWS, "cores": CPUS}
    try:
        synthesize_changelog(
            spark, N_EVENTS, n_repos=200, n_paths=5000, delete_ratio=0.1,
            hot_repo_fraction=0.1, partitions=64,
        ).write.mode("overwrite").parquet(f"{tmp}/log")
        log = spark.read.parquet(f"{tmp}/log")
        eng = CdcEngine(spark, f"{tmp}/state", f"{tmp}/m.jsonl")
        eng.replay(log, batch_size=N_EVENTS)  # bulk COW seed

        # skewed churn: the SAME few keys updated across many windows —
        # their buckets pile up one delta file per window while the
        # other ~27/32 buckets stay clean
        hot = log.filter(F.col("op") == "upsert").limit(HOT_KEYS).collect()
        for w in range(CHURN_WINDOWS):
            batch = spark.createDataFrame(
                [
                    (
                        r["repo"], r["path"], f"churn{w}", r["lang"],
                        f"{r['content']} churn {w}",
                        N_EVENTS + w * HOT_KEYS + i, "upsert",
                    )
                    for i, r in enumerate(hot)
                ],
                log.schema,
            )
            eng.replay(batch, batch_size=HOT_KEYS)

        h = eng.state.health()
        policy = MaintenancePolicy()  # default threshold 8
        offending = policy.offending_buckets(h)
        out["buckets"] = eng.state.buckets
        out["offending_buckets"] = offending
        out["state_bytes"] = h["bytes"] + h["delta_bytes"]

        # byte-identical twin for the whole-table arm
        shutil.copytree(f"{tmp}/state", f"{tmp}/state_full")
        if os.path.isdir(f"{tmp}/state.delta"):
            shutil.copytree(f"{tmp}/state.delta", f"{tmp}/state_full.delta")

        t0 = time.time()
        sel = eng.state.compact(bucket_ids=offending)
        out["selective"] = {
            "seconds": round(time.time() - t0, 3),
            "bytes_written": sel["bytes_written"],
            "buckets_rewritten": sel["compacted_buckets"],
        }

        full_st = StateTable(spark, f"{tmp}/state_full",
                             buckets=eng.state.buckets)
        t0 = time.time()
        full = full_st.compact()
        out["whole_table"] = {
            "seconds": round(time.time() - t0, 3),
            "bytes_written": full["bytes_written"],
            "buckets_rewritten": full["compacted_buckets"],
        }
        out["write_reduction_x"] = round(
            full["bytes_written"] / max(sel["bytes_written"], 1), 1
        )
        # both arms converge to the same state (hash over the fold)
        a = eng.state.read().selectExpr(
            "sum(crc32(concat_ws('|', repo, path, content_sha256, lsn))) as h"
        ).collect()[0]["h"]
        b = full_st.read().selectExpr(
            "sum(crc32(concat_ws('|', repo, path, content_sha256, lsn))) as h"
        ).collect()[0]["h"]
        out["states_equal"] = bool(a == b)
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
