"""Per-round benchmark. Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

* headline queries from __spark_entry__.queries() run at
  $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
  local[$SPARK_GRAFT_CPUS] (default 32), each timed to a noop sink
  (full materialization, no driver collect cost);
* an end-to-end CDC replay (changelog → normalize → LWW dedup →
  bucket-pruned MERGE → manifest) timed as events/sec — the
  BASELINE.json target metric.

`--replay-only` runs just the replay and prints its JSON (used by
scripts/bench_scaling.py to measure two parallelism levels from clean
JVMs for the N vs 4N scaling-efficiency evidence).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Replay work areas (state table, staging, manifest, generated log) go
# on tmpfs when available — the same methodology bench_scaling.py has
# used since round 1 (BASELINE.md): this sandbox has ONE ~350 MB/s disk
# behind all 32 threads, so disk-backed replay measures the host disk's
# weather as much as the engine, while a real cluster adds local disks
# with every executor. The JSON output labels the area used; rounds 1-2
# ran these replays on the disk-backed default tempdir.
WORK_AREA = "/dev/shm" if os.path.isdir("/dev/shm") else None


def _work_dir(prefix: str) -> str:
    return tempfile.mkdtemp(prefix=prefix, dir=WORK_AREA)

HEADLINE = [
    "cdc_final_state",
    "cdc_repo_stats",
    "q1_pricing_summary",
    "flagship_report",
    "flagship_full",
    "q3_group_concat",
    "window_running_sum",
    "topk_per_group",
    "explode_words",
    "dedup_exact_docs",
    "doc_quality",
    "ngram_jaccard_dups",
    "minhash_dups",
    "minhash_incremental",
    "simhash_dups",
    "embedding_near_dups",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "cnpj_etl_e2e",
]


def load_prev_bench() -> dict[str, float]:
    """Per-query seconds from the newest BENCH_r*.json next to this file
    (the driver records one per round) — regressions become self-evident
    as a delta column in this round's JSON."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    best: tuple[int, dict] | None = None
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if not m:
            continue
        try:
            with open(p, encoding="utf-8") as f:
                data = json.load(f)
            queries = data.get("parsed", data).get("queries", {})
        except Exception:  # noqa: BLE001 — a malformed old record is ignorable
            continue
        n = int(m.group(1))
        if queries and (best is None or n > best[0]):
            best = (n, queries)
    return best[1] if best else {}


def cpu_calibration(threads: int = 8, seconds: float = 1.5) -> float:
    """Aggregate sha256 MB/s across ``threads`` GIL-releasing hash
    workers — the host CPU supply actually delivered at multi-thread
    width (same probe as scripts/bench_scaling.py). Callers pass the
    width of the job under test: an 8-thread probe can read healthy
    while the 32-thread supply is capped (observed r4: the same churn
    replay measured 13.8s and 58.8s across runs with flat 8-thread
    calibration). This VM is a
    multi-tenant microVM whose supply swings 2.7-6x with host tenancy,
    and WIDE jobs lose supply even when a single-thread spin looks
    healthy (r4 example: cdc_bulk_replay measured 22s under a bad
    window and 4.6-11s minutes later with no code change, with the
    1-thread spin near-flat throughout). Sampling the same fixed work
    before/mid/after the run lets a reader separate engine changes
    from host weather when comparing rounds."""
    import hashlib
    import threading

    buf = b"\x00" * (1 << 20)
    counts = [0] * threads
    deadline = time.time() + seconds

    def spin(i: int) -> None:
        h = hashlib.sha256
        while time.time() < deadline:
            h(buf).digest()
            counts[i] += 1

    ts = [threading.Thread(target=spin, args=(i,)) for i in range(threads)]
    t0 = time.time()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    dt = time.time() - t0
    return round(sum(counts) / dt, 1)  # MB/s (1 MiB per digest)


def get_session():
    from rfb_cnpj_etl_spark.session import get_spark

    return get_spark(
        "bench",
        cores=CPUS,
        shuffle_partitions=CPUS,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )


def time_replay(spark, sf_dir: str) -> dict:
    """End-to-end CDC apply: derive changelog from events, replay into a
    fresh state table in micro-batches, report events/sec."""
    from rfb_cnpj_etl_spark.engine import CdcEngine
    from rfb_cnpj_etl_spark.sources.changelog import changelog_from_events

    tmp = _work_dir("bench_state_")
    try:
        log = changelog_from_events(spark, sf_dir)
        n_events = log.count()  # not timed: the driver knows its input size
        eng = CdcEngine(spark, f"{tmp}/state", f"{tmp}/manifest.jsonl")
        t0 = time.time()
        eng.replay(log, batch_size=max(n_events // 4, 1))
        dt = time.time() - t0
        return {
            "events": int(n_events),
            "seconds": round(dt, 3),
            "events_per_sec": round(n_events / dt, 1),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def time_bulk_replay(
    spark,
    n_events: int = 2_000_000,
    churn_events: int = 100_000,
    churn_batches: int = 10,
) -> dict:
    """Engine throughput at a production-shaped batch size: one batch of
    a seeded 2M-event changelog (at the nominal 10^10 scale a micro-
    batch is >=10^8 rows, so per-batch fixed cost is noise there — the
    4-batch sf0.1 replay above measures the micro-batching overhead
    instead). Then, on the SAME warm state table, a steady-state churn
    phase: ``churn_batches`` small windows that auto-select the
    merge-on-read path (per-bucket delta appends, O(batch) write I/O) —
    the small-daily-delta shape that used to rewrite the whole corpus
    per batch under pure copy-on-write."""
    from rfb_cnpj_etl_spark.engine import CdcEngine
    from rfb_cnpj_etl_spark.gen import synthesize_changelog

    tmp = _work_dir("bench_bulk_")
    try:
        synthesize_changelog(
            spark, n_events + churn_events, n_repos=200, n_paths=5000,
            delete_ratio=0.1, hot_repo_fraction=0.1, partitions=64,
        ).write.mode("overwrite").parquet(f"{tmp}/log")
        from pyspark.sql import functions as F

        log = spark.read.parquet(f"{tmp}/log")
        eng = CdcEngine(spark, f"{tmp}/state", f"{tmp}/manifest.jsonl")
        t0 = time.time()
        eng.replay(log.filter(F.col("lsn") < n_events), batch_size=n_events)
        dt = time.time() - t0
        t1 = time.time()
        entries = eng.replay(
            log, batch_size=max(churn_events // churn_batches, 1)
        )
        churn_dt = time.time() - t1
        return {
            "events": n_events,
            "seconds": round(dt, 3),
            "events_per_sec": round(n_events / dt, 1),
            "churn_events": churn_events,
            "churn_seconds": round(churn_dt, 3),
            "churn_events_per_sec": round(churn_events / churn_dt, 1),
            "churn_mor_windows": sum(
                1 for e in entries if e.get("mode") == "mor"
            ),
            "churn_windows": len(entries),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    replay_only = "--replay-only" in sys.argv
    calib = [cpu_calibration(threads=CPUS)]
    spark = get_session()
    if replay_only:
        print(json.dumps({"cores": CPUS, **time_replay(spark, SF_DIR)}))
        return

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # Untimed warm-up: the first heavy queries otherwise absorb all of
    # the JVM's C2-compile time (long-lived executors on a real cluster
    # never pay it per-query), which this host's CPU weather amplifies.
    for warm in ("cdc_final_state", "dedup_exact_docs", "q1_pricing_summary"):
        qs[warm](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    times: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        times[name] = round(dt, 3)
        total += dt

    # round-2 watch list (q3_group_concat +1.5s, window_running_sum
    # +0.7s with no code change — suspected host weather): 3 extra timed
    # reps each so BENCH_r03 carries its own repeatability evidence
    # instead of a single noisy sample.
    watchlist: dict[str, list[float]] = {}
    for name in ("q3_group_concat", "window_running_sum"):
        reps = []
        for _ in range(3):
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            reps.append(round(time.time() - t0, 3))
        watchlist[name] = reps

    calib.append(cpu_calibration(threads=CPUS))
    # Replay rows: median of 3 (r3/r4 ask). BASELINE.md documents up to
    # 8× host-supply swings on this box; a single sample per round made
    # round-to-round deltas unreadable without a separate A/B session.
    replay_runs = [time_replay(spark, SF_DIR) for _ in range(3)]
    bulk_runs = [time_bulk_replay(spark) for _ in range(3)]
    calib.append(cpu_calibration(threads=CPUS))

    def med(vals: list[float]) -> float:
        return sorted(vals)[len(vals) // 2]

    replay_reps = {
        "cdc_replay": [r["seconds"] for r in replay_runs],
        "cdc_bulk_replay": [b["seconds"] for b in bulk_runs],
        "cdc_churn_replay": [b["churn_seconds"] for b in bulk_runs],
    }
    replay = replay_runs[0]
    bulk = bulk_runs[0]
    times["cdc_replay"] = med(replay_reps["cdc_replay"])
    total += times["cdc_replay"]
    times["cdc_bulk_replay"] = med(replay_reps["cdc_bulk_replay"])
    total += times["cdc_bulk_replay"]
    times["cdc_churn_replay"] = med(replay_reps["cdc_churn_replay"])
    total += times["cdc_churn_replay"]

    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    prev = load_prev_bench()
    delta = {
        k: round(v - prev[k], 3) for k, v in times.items() if k in prev
    }
    print(
        json.dumps(
            {
                "metric": "bench_total_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": times,
                "watchlist_reps": watchlist,
                "delta_vs_prev": delta,
                "sf": sf_val,
                "cores": CPUS,
                "cdc_events": replay["events"],
                "cdc_events_per_sec": round(
                    replay["events"] / times["cdc_replay"], 1
                ),
                "cdc_bulk_events": bulk["events"],
                "cdc_bulk_events_per_sec": round(
                    bulk["events"] / times["cdc_bulk_replay"], 1
                ),
                "cdc_churn_events": bulk["churn_events"],
                "cdc_churn_events_per_sec": round(
                    bulk["churn_events"] / times["cdc_churn_replay"], 1
                ),
                # every rep must ride MOR for all its windows — report
                # the weakest run so a silent COW regression is visible
                "cdc_churn_mor_windows": min(
                    b["churn_mor_windows"] for b in bulk_runs
                ),
                "cdc_churn_windows": bulk["churn_windows"],
                "replay_reps": replay_reps,
                "replay_work_area": "tmpfs" if WORK_AREA else "disk",
                "cpu_calib_hash_mb_s": calib,
            }
        )
    )


if __name__ == "__main__":
    main()
