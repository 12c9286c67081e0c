"""spark-submit end-to-end: the north rule's submission mode.

Packages ``rfb_cnpj_etl_spark`` into a zip, launches a FRESH JVM via the
pyspark-bundled ``spark-submit`` with ``--py-files`` and a clean
``PYTHONPATH``/cwd (so the zip is the only way the package can import),
runs a full CLI ``replay``, and verifies:

* the packaged CLI applies every batch and reports rows;
* the master is the one spark-submit passed — NOT the
  ``SPARK_GRAFT_MASTER`` env fallback we deliberately plant (the
  ``PYSPARK_GATEWAY_PORT`` guard in ``session.get_spark``), so moving
  from local[N] to a real cluster is purely a submit-flag change;
* the state the subprocess wrote is LWW-correct (in-process
  ``verify_against`` vs the pure-SQL oracle fold of the same log).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

import pyspark

from rfb_cnpj_etl_spark.engine import CdcEngine
from rfb_cnpj_etl_spark.gen import expected_final_state, synthesize_changelog

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = Path(pyspark.__file__).parent / "bin" / "spark-submit"


def _package_zip(dest: Path) -> Path:
    """Zip the package with ``rfb_cnpj_etl_spark/`` at the zip root —
    exactly what ``--py-files`` expects for an importable package."""
    zpath = dest / "rfb_cnpj_etl_spark.zip"
    src = REPO / "rfb_cnpj_etl_spark"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted(src.rglob("*.py")):
            zf.write(py, py.relative_to(REPO))
    return zpath


@pytest.mark.skipif(not SPARK_SUBMIT.exists(), reason="spark-submit not bundled")
def test_packaged_replay_via_spark_submit(spark, tmp_path):
    log_dir = str(tmp_path / "changelog")
    state = str(tmp_path / "state")
    manifest = str(tmp_path / "manifest.jsonl")
    log = synthesize_changelog(spark, 20_000, n_repos=10, n_paths=60).cache()
    log.write.parquet(log_dir)

    zpath = _package_zip(tmp_path)
    env = dict(os.environ)
    # the zip must be the ONLY import path for the package
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    # plant a decoy: if get_spark ignored the gateway and honoured this,
    # the reported master would be local[1]
    env["SPARK_GRAFT_MASTER"] = "local[1]"
    proc = subprocess.run(
        [
            str(SPARK_SUBMIT),
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zpath),
            str(REPO / "scripts" / "submit_replay.py"),
            "replay",
            "--state", state,
            "--manifest", manifest,
            "--log", log_dir,
            "--batch-size", "8000",
            "--buckets", "8",
        ],
        env=env,
        cwd=str(tmp_path),  # repo dir NOT on sys.path[0]
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    # last stdout line is the CLI's JSON report
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["batches_applied"] == 3  # 20k events / 8k windows
    assert out["batches_skipped"] == 0
    assert out["rows"] > 0
    assert out["master"] == "local[4]"  # submit flag won over the decoy env

    # the subprocess-written table is LWW-correct under an independent
    # in-process read (also proves layout markers/manifest are portable
    # across driver processes)
    eng = CdcEngine(spark, state, manifest)
    assert eng.state.buckets == 8
    assert eng.verify_against(expected_final_state(log))["ok"]
