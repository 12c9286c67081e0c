"""JSONL (newline-delimited JSON) document source.

The reference ingests only ``;``-CSV (SURVEY S4), but the training-data
side of this engine (documents table) is normally fed from JSONL dumps.
Spark-first rules applied:

* **explicit schema, never inference** — ``spark.read.json`` without a
  schema runs a full inference pre-scan (twice the I/O at 100 TB) and
  can silently widen types between drops; the declared StructType is
  the contract, extra keys are ignored, missing keys are NULL
  (add-column evolution stays an explicit registry operation, as with
  the CSV path);
* uncompressed/zstd-seekable JSONL is line-splittable, so one file
  still parallelizes across tasks; ``.gz`` falls back to one task per
  file (same caveat as the reference's zips, sources/cnpj_csv.py);
* ``mode=PERMISSIVE`` + ``columnNameOfCorruptRecord`` keeps the
  reference's lenient-loader semantics: a malformed line lands as a
  NULL row with the raw text captured, instead of failing the job.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: documents-table schema, plus the corrupt-record capture column.
DOCUMENTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("_corrupt", T.StringType(), True),
    ]
)

FIXTURE_DIR = "/tmp/rfb_jsonl_fixture_v1"
N_DOCS = 300


def read_documents_jsonl(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """Schema-bound JSONL scan of document records."""
    return (
        spark.read.schema(DOCUMENTS_JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(paths)
    )


def _doc(i: int) -> dict:
    words = [
        f"w{(i * 13 + j) % 97}" for j in range(5 + i % 40)
    ]
    return {
        "doc_id": i,
        "text": " ".join(words),
        "lang": ["en", "pt", "es"][i % 3],
        "source": f"crawl-{i % 7}",
        # extra key the schema intentionally ignores (forward compat)
        "extra_meta": hashlib.md5(str(i).encode()).hexdigest()[:8],
    }


def ensure_jsonl_fixture(base_dir: str = FIXTURE_DIR) -> list[str]:
    """Two deterministic JSONL parts (multi-file union) with one
    deliberately corrupt line; write-to-temp + rename, rewritten when
    on-disk bytes differ from the generator's current output (a stale
    fixture from an older generator must not survive an edit)."""
    os.makedirs(base_dir, exist_ok=True)
    half = N_DOCS // 2
    parts = {
        "docs0.jsonl": [json.dumps(_doc(i), sort_keys=True) for i in range(half)],
        "docs1.jsonl": [json.dumps(_doc(i), sort_keys=True) for i in range(half, N_DOCS)]
        + ['{"doc_id": broken'],  # malformed line → PERMISSIVE capture
    }
    out = []
    for name, lines in parts.items():
        path = os.path.join(base_dir, name)
        out.append(path)
        content = "\n".join(lines) + "\n"
        if os.path.exists(path):
            with open(path, encoding="utf-8") as f:
                if f.read() == content:
                    continue
        tmp = path + ".part"
        with open(tmp, "w", encoding="utf-8", newline="\n") as f:
            f.write(content)
        os.replace(tmp, path)
    return out
