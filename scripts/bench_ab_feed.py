"""Change-feed (CDC-out) overhead A/B.

The feed adds, per batch, one narrow pre-image scan (keys+lsn pruned
before the MOR fold), one left join of the batch winners against it,
and one O(net-changes) parquet write — all BEFORE the state mutates.
This script measures what that costs where a user would feel it: the
same bulk-seed + churn-windows replay, with and without
``changes_dir``, alternated twice per arm (min per arm filters the
sandbox's CPU-weather swings; same methodology as the other A/Bs:
tmpfs work area, identical input log).

Also value-checks the deliverable at this scale: the ON arm's feed,
LWW-folded (``state_as_of`` of the last batch), must hash-equal its
final state.

    python scripts/bench_ab_feed.py

Prints one JSON line.
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
CHURN_WINDOWS = 10
CHURN_EVENTS = 100_000  # per window: real batches, not toy fixed-cost
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
        "ab_feed",
        cores=CPUS,
        shuffle_partitions=CPUS,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    tmp = tempfile.mkdtemp(prefix="ab_feed_", dir=WORK)
    total = N_EVENTS + CHURN_WINDOWS * CHURN_EVENTS
    out: dict = {
        "seed_events": N_EVENTS,
        "churn_windows": CHURN_WINDOWS,
        "churn_events_per_window": CHURN_EVENTS,
        "cores": CPUS,
    }
    try:
        synthesize_changelog(
            spark, total, n_repos=200, n_paths=5000, delete_ratio=0.1,
            hot_repo_fraction=0.1, partitions=64,
        ).write.mode("overwrite").parquet(f"{tmp}/log")
        log = spark.read.parquet(f"{tmp}/log")
        seed = log.filter(F.col("lsn") < N_EVENTS)
        churn = log.filter(F.col("lsn") >= N_EVENTS)

        def run(arm: str, rep: int, feed: bool) -> dict:
            root = f"{tmp}/{arm}{rep}"
            eng = CdcEngine(
                spark,
                f"{root}/state",
                f"{root}/m.jsonl",
                changes_dir=f"{root}/changes" if feed else None,
            )
            t0 = time.time()
            eng.replay(seed, batch_size=N_EVENTS)
            t_seed = time.time() - t0
            t0 = time.time()
            entries = eng.replay(churn, batch_size=CHURN_EVENTS)
            t_churn = time.time() - t0
            res = {
                "seed_s": round(t_seed, 3),
                "churn_s": round(t_churn, 3),
                "windows": len(entries),
            }
            if feed:
                res["change_rows"] = sum(
                    e.get("change_rows") or 0 for e in entries
                )
                res["last_batch"] = entries[-1]["batch_id"]
                res["engine_root"] = root
            else:
                shutil.rmtree(root, ignore_errors=True)
            return res

        # alternate arms twice; min-per-arm filters supply swings
        reps = {"off": [], "on": []}
        for rep in range(2):
            reps["off"].append(run("off", rep, feed=False))
            reps["on"].append(run("on", rep, feed=True))
        for arm in ("off", "on"):
            out[arm] = {
                "seed_s": min(r["seed_s"] for r in reps[arm]),
                "churn_s": min(r["churn_s"] for r in reps[arm]),
                "reps": [
                    {"seed_s": r["seed_s"], "churn_s": r["churn_s"]}
                    for r in reps[arm]
                ],
            }
        out["on"]["change_rows"] = reps["on"][-1]["change_rows"]
        out["overhead_seed_pct"] = round(
            100 * (out["on"]["seed_s"] / out["off"]["seed_s"] - 1), 1
        )
        out["overhead_churn_pct"] = round(
            100 * (out["on"]["churn_s"] / out["off"]["churn_s"] - 1), 1
        )

        # deliverable value check at scale: feed fold ≡ final state
        best = reps["on"][-1]
        eng = CdcEngine(
            spark,
            f"{best['engine_root']}/state",
            f"{best['engine_root']}/m.jsonl",
            changes_dir=f"{best['engine_root']}/changes",
        )
        snap = eng.state_as_of(best["last_batch"])
        out["feed_fold_equals_state"] = bool(
            state_hash(snap) == state_hash(eng.final_state())
        )
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
