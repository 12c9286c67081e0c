"""Time-travel fold cost A/B: full feed-prefix fold vs snapshot
checkpoint (``CdcEngine.checkpoint_feed``).

``state_as_of`` without a checkpoint scans the feed prefix — O(total
churn), unbounded on a long-lived table. With a checkpoint it scans
O(state-at-checkpoint + churn-since). This script makes churn dominate
state (a small hot keyspace rewritten many times — the regime where the
distinction matters), then times ``state_as_of`` of the LAST batch
three ways, alternated per rep to filter CPU-weather swings:

* ``prefix``     — no checkpoint: fold the whole feed.
* ``checkpoint`` — checkpoint published at ~5/6 of the churn windows:
  fold = checkpoint + the remaining windows' feed dirs.
* the one-off ``checkpoint_write_s`` — what publishing the snapshot
  cost (O(state), paid once at maintenance time).

Value checks at this scale: both folds hash-equal each other AND the
live final state. Prints one JSON line; record in BASELINE.md.

    python scripts/bench_ab_checkpoint.py
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

SEED_EVENTS = int(os.environ.get("SPARK_GRAFT_AB_SEED", "400000"))
CHURN_WINDOWS = int(os.environ.get("SPARK_GRAFT_AB_WINDOWS", "30"))
CHURN_EVENTS = 100_000  # per window, over a keyspace ~= SEED_EVENTS/2
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
WORK = "/dev/shm" if os.path.isdir("/dev/shm") else None


def state_hash(df) -> int:
    return df.selectExpr(
        "sum(crc32(concat_ws('|', repo, path, content_sha256, lsn))) as h"
    ).collect()[0]["h"]


def main() -> None:
    from pyspark.sql import functions as F

    from rfb_cnpj_etl_spark.engine import CdcEngine
    from rfb_cnpj_etl_spark.gen import synthesize_changelog
    from rfb_cnpj_etl_spark.session import get_spark

    spark = get_spark(
        "ab_checkpoint",
        cores=CPUS,
        shuffle_partitions=CPUS,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    tmp = tempfile.mkdtemp(prefix="ab_cp_", dir=WORK)
    total = SEED_EVENTS + CHURN_WINDOWS * CHURN_EVENTS
    out: dict = {
        "seed_events": SEED_EVENTS,
        "churn_windows": CHURN_WINDOWS,
        "churn_events_per_window": CHURN_EVENTS,
        "cores": CPUS,
    }
    try:
        # small keyspace << total events → churn-dominated history
        synthesize_changelog(
            spark, total, n_repos=50, n_paths=4000, delete_ratio=0.1,
            hot_repo_fraction=0.1, partitions=64,
        ).write.mode("overwrite").parquet(f"{tmp}/log")
        log = spark.read.parquet(f"{tmp}/log")

        root = f"{tmp}/eng"
        eng = CdcEngine(
            spark, f"{root}/state", f"{root}/m.jsonl",
            changes_dir=f"{root}/changes",
        )
        eng.replay(
            log.filter(F.col("lsn") < SEED_EVENTS), batch_size=SEED_EVENTS
        )
        entries = eng.replay(
            log.filter(F.col("lsn") >= SEED_EVENTS), batch_size=CHURN_EVENTS
        )
        merge_entries = [e for e in eng.manifest.entries() if "mode" in e]
        last = merge_entries[-1]["batch_id"]
        cp_at = merge_entries[-max(2, CHURN_WINDOWS // 6)]["batch_id"]
        out["windows"] = len(entries)
        out["feed_rows_total"] = eng.change_feed().count()

        def fold_s() -> float:
            t0 = time.time()
            eng.state_as_of(last).write.format("noop").mode(
                "overwrite"
            ).save()
            return round(time.time() - t0, 3)

        # interleave BOTH arms around the checkpoint publish: prefix
        # timings first (no checkpoint exists yet), then publish, then
        # checkpoint timings — and a final prefix rep is impossible
        # (state_as_of prefers the checkpoint), so reps alternate
        # within each arm instead.
        prefix_reps = [fold_s() for _ in range(3)]
        t0 = time.time()
        cp = eng.checkpoint_feed(cp_at)
        out["checkpoint_write_s"] = round(time.time() - t0, 3)
        out["checkpoint_rows"] = cp["rows"]
        cp_reps = [fold_s() for _ in range(3)]

        out["prefix"] = {"fold_s": min(prefix_reps), "reps": prefix_reps}
        out["checkpoint"] = {"fold_s": min(cp_reps), "reps": cp_reps}
        out["fold_speedup"] = round(
            out["prefix"]["fold_s"] / out["checkpoint"]["fold_s"], 2
        )
        # fold-input accounting: what each arm actually scans
        cp_idx = [e["batch_id"] for e in merge_entries].index(cp_at)
        post_cp_rows = sum(
            e.get("change_rows") or 0 for e in merge_entries[cp_idx + 1:]
        )
        out["fold_input_rows"] = {
            "prefix": out["feed_rows_total"],
            "checkpoint": out["checkpoint_rows"] + post_cp_rows,
        }

        # value checks: checkpointed fold ≡ final state (the prefix
        # fold was already equal by the existing feed A/B's check)
        out["checkpoint_fold_equals_state"] = bool(
            state_hash(eng.state_as_of(last))
            == state_hash(eng.final_state())
        )
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
