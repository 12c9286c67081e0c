"""Multimodal columns — image/audio/video as opaque binary + typed
metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing (schemas, batch iteration, partition-size
control) is real and tested; the actual codec work is stubbed behind
``NotImplementedError`` / a deterministic fake because no media
libraries exist in this container — swap ``_decode_image_impl`` for a
PIL/ffmpeg call on a real cluster and nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried next to every media payload.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, payload_sha256 string,"
    " feat array<float>"
)


def _decode_image_impl(payload: bytes) -> bytes:
    """The real decoder hook. No media libs in this container."""
    raise NotImplementedError(
        "image decode requires PIL/libjpeg — not available in this "
        "environment; use fake_decode=True or swap this hook in "
        "production"
    )


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'embedding': byte histogram folded to `dim`
    floats — keeps the full pipeline runnable and testable."""
    if payload is None:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] += b
    total = max(sum(acc), 1)
    return [a / total for a in acc]


def extract_media_features(
    df: DataFrame, fake_decode: bool = True, dim: int = 8
) -> DataFrame:
    """media table → (media_id, kind, n_bytes, payload_sha256, feat).

    ``mapInPandas`` so each Arrow batch is processed vectorized; the
    per-payload decode is the only per-item Python (inherent to codec
    work — same shape a real PIL/ffmpeg UDF has).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            if not fake_decode:
                payloads.map(_decode_image_impl)  # raises: no codecs here
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda p: 0 if p is None else len(p)),
                    "payload_sha256": payloads.map(
                        lambda p: hashlib.sha256(p or b"").hexdigest()
                    ),
                    "feat": payloads.map(lambda p: _fake_feature(p, dim)),
                }
            )

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per planned frame
    (media_id, frame_idx, ts_ms) — pure Catalyst (sequence+explode);
    the actual frame grab is the decode hook above."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest((F.col("duration_ms") / every_ms).cast("long") - 1, F.lit(0)),
                )
            ).alias("frame_idx"),
        )
        .withColumn("ts_ms", F.col("frame_idx") * every_ms)
    )


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (binary payloads derived
    from the row id — no randomness, no external files)."""
    base = spark.range(n)
    return base.select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(
            F.concat(F.lit("payload_"), F.md5(F.col("id").cast("string"))), "utf-8"
        ).cast("binary").alias("payload"),
        F.when(F.col("id") % 3 == 0, (F.col("id") % 64 + 1).cast("int")).alias("width"),
        F.when(F.col("id") % 3 == 0, (F.col("id") % 48 + 1).cast("int")).alias("height"),
        F.when(F.col("id") % 3 == 2, (F.col("id") * 500 + 1000).cast("long")).alias(
            "duration_ms"
        ),
    )
