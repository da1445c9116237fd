"""Multimodal plumbing (operators/multimodal.py): schema, determinism,
decode stub gating, metadata-driven frame sampling and resize planning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.operators.multimodal import (
    deterministic_fake_decoder,
    extract_media_features,
    frame_sample,
    resize_plan,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    df = synth_media(spark, 60, seed=42)
    df.cache().count()
    return df


def test_media_schema_and_determinism(spark, media):
    assert media.count() == 60
    assert set(r.kind for r in media.select("kind").distinct().collect()) == {
        "image",
        "audio",
        "video",
    }
    again = synth_media(spark, 60, seed=42)
    a = {r.media_id: bytes(r.payload) for r in media.collect()}
    b = {r.media_id: bytes(r.payload) for r in again.collect()}
    assert a == b  # bit-identical across runs


def test_feature_extraction_fake_path(media):
    feats = extract_media_features(media)
    rows = {r.media_id: r for r in feats.collect()}
    assert len(rows) == 60
    sample = [r for r in media.collect() if r.media_id == 5][0]
    expect = deterministic_fake_decoder(bytes(sample.payload), sample.kind)
    assert rows[5].features == expect
    assert len(rows[5].features) == 8
    assert rows[5].n_bytes == len(bytes(sample.payload))


def test_real_decode_is_explicitly_stubbed(media):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.base import PySparkException

    with pytest.raises((Py4JJavaError, PySparkException, Exception)) as exc:
        extract_media_features(media, decoder=None, allow_fake=False).count()
    assert "NotImplementedError" in str(exc.value) or "real media decode" in str(exc.value)


def test_frame_sampling_from_metadata(media):
    frames = frame_sample(media, every_n=24)
    got = frames.where(F.col("media_id") == 2).orderBy("frame_idx").collect()
    n_frames = int(
        [r for r in media.collect() if r.media_id == 2][0].meta["n_frames"]
    )
    assert [r.frame_idx for r in got] == list(range(0, n_frames, 24))


def test_resize_plan_arithmetic(media):
    plans = {r.media_id: r for r in resize_plan(media, 224, 224).collect()}
    r = plans[0]  # media 0 is an image
    scale = min(224 / r.w, 224 / r.h)
    assert r.new_w == int(r.w * scale + 0.5)
    assert r.new_h == int(r.h * scale + 0.5)
    assert r.pad_x == (224 - r.new_w) // 2
    assert max(r.new_w, r.new_h) <= 224


def test_custom_decoder_injection(media):
    # a real decoder plugs in via the decoder parameter; its outputs flow
    # through the same Arrow plumbing
    def byte_len_features(payload: bytes, kind: str) -> list[float]:
        return [float(len(payload)), float(payload[0]), 1.0 if kind == "image" else 0.0]

    feats = {r.media_id: r for r in extract_media_features(media, decoder=byte_len_features).collect()}
    sample = [r for r in media.collect() if r.media_id == 3][0]
    assert feats[3].features == byte_len_features(bytes(sample.payload), sample.kind)
    assert len(feats[3].features) == 3
