"""Multimodal plumbing: binary payloads through mapInPandas."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from rfb_cnpj_etl_spark.operators.multimodal import (
    extract_media_features,
    frame_sample_plan,
    synth_media,
)


class TestMediaFeatures:
    def test_schema_and_hashes(self, spark):
        media = synth_media(spark, 30)
        out = extract_media_features(media).collect()
        assert len(out) == 30
        by_id = {r["media_id"]: r for r in out}
        # cross-check sha256 against driver-side recomputation
        src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
        for mid, payload in src.items():
            assert by_id[mid]["payload_sha256"] == hashlib.sha256(payload).hexdigest()
            assert by_id[mid]["n_bytes"] == len(payload)
            feat = by_id[mid]["feat"]
            assert len(feat) == 8
            assert abs(sum(feat) - 1.0) < 1e-5  # histogram normalized

    def test_deterministic(self, spark):
        media = synth_media(spark, 10)
        a = {r["media_id"]: r["feat"] for r in extract_media_features(media).collect()}
        b = {r["media_id"]: r["feat"] for r in extract_media_features(media).collect()}
        assert a == b

    def test_real_decode_is_explicit_stub(self, spark):
        media = synth_media(spark, 3)
        with pytest.raises(Exception, match="NotImplementedError|image decode"):
            extract_media_features(media, fake_decode=False).collect()


class TestFrameSampling:
    def test_plan_rows(self, spark):
        media = synth_media(spark, 12)
        plan = frame_sample_plan(media, every_ms=1000)
        rows = plan.collect()
        vids = {r["media_id"]: r["duration_ms"] for r in media.filter(
            F.col("kind") == "video").collect()}
        assert {r["media_id"] for r in rows} == set(vids)
        for mid, dur in vids.items():
            frames = [r for r in rows if r["media_id"] == mid]
            expected = max(int(dur // 1000), 1)
            assert len(frames) == expected
            assert all(r["ts_ms"] == r["frame_idx"] * 1000 for r in frames)
