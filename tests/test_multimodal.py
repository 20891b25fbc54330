"""Multimodal plumbing tests (operators/multimodal.py).

The decode step is a deterministic fake (no codec libs in this
container — the NotImplementedError gate is itself under test); the
Spark plumbing — binary columns, Arrow batch shapes, schema, no-shuffle
plan — is real.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from searchengine_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    fake_decoder,
    real_decoder,
    sample_frames,
    synthetic_media,
)


@pytest.fixture(scope="module")
def media(spark):
    df = synthetic_media(spark, n_items=48)
    df.persist().count()
    return df


class TestFakeDecoder:
    def test_deterministic_and_unit_norm(self):
        data = pd.Series([b"abc", b"", b"abc", bytes(range(256))])
        f1, f2 = fake_decoder(data), fake_decoder(data)
        assert f1.shape == (4, FEATURE_DIM)
        np.testing.assert_array_equal(f1, f2)
        np.testing.assert_array_equal(f1[0], f1[2])
        assert not np.array_equal(f1[0], f1[3])
        np.testing.assert_allclose(np.linalg.norm(f1, axis=1), 1.0, atol=1e-5)


class TestExtractFeatures:
    def test_schema_and_rows(self, spark, media):
        feats = extract_features(media)
        assert feats.schema.simpleString() == (
            "struct<doc_id:bigint,media_type:string,n_bytes:int,"
            "payload_sha256:string,features:array<float>>"
        )
        rows = feats.collect()
        assert len(rows) == media.count()
        import hashlib

        payloads = {r["doc_id"]: bytes(r["data"]) for r in media.collect()}
        for r in rows:
            assert len(r["features"]) == FEATURE_DIM
            assert r["n_bytes"] > 0
            assert r["payload_sha256"] == hashlib.sha256(payloads[r["doc_id"]]).hexdigest()

    def test_matches_local_decoder(self, spark, media):
        """Engine features == driver-side decode of the same bytes."""
        local = media.select("doc_id", "data").toPandas().sort_values("doc_id")
        expect = fake_decoder(local["data"])
        got = (
            extract_features(media)
            .select("doc_id", "features")
            .toPandas()
            .sort_values("doc_id")
        )
        np.testing.assert_allclose(
            np.stack(got["features"].to_numpy()), expect, atol=1e-6
        )

    def test_narrow_plan_no_shuffle(self, spark, media):
        plan = extract_features(media)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # decode must not shuffle

    def test_small_batch_rows_chunking(self, spark, media):
        a = extract_features(media, batch_rows=7).orderBy("doc_id").collect()
        b = extract_features(media, batch_rows=256).orderBy("doc_id").collect()
        assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
        np.testing.assert_allclose(
            np.array([r["features"] for r in a]),
            np.array([r["features"] for r in b]),
            atol=1e-6,
        )


class TestRealDecoderGate:
    def test_missing_codecs_fail_fast(self):
        for mt in ("audio", "video", "unknown"):
            with pytest.raises(NotImplementedError):
                real_decoder(mt)


class TestSampleFrames:
    def test_schedule(self, spark, media):
        frames = sample_frames(media, every_ms=1000)
        pdf = frames.toPandas()
        vids = media.where(F.col("media_type") == "video").select(
            "doc_id", "duration_ms"
        ).toPandas()
        assert set(pdf["doc_id"]) == set(vids["doc_id"])
        for _, v in vids.iterrows():
            sub = pdf[pdf["doc_id"] == v["doc_id"]]
            assert len(sub) == (max(int(v["duration_ms"]) - 1, 0)) // 1000 + 1
            assert (sub["frame_ts_ms"] % 1000 == 0).all()
            assert sub["frame_idx"].tolist() == list(range(len(sub)))
