"""Multimodal plumbing: binary columns, metadata, frame sampling, Arrow
featurization, decode stub."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from ondine_spark.operators.multimodal import (
    byte_histogram_features,
    decode_images,
    frame_sample,
    media_meta,
    with_binary_column,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [(i, "x" * (10 + i) + "payload" + chr(65 + i) * i) for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return with_binary_column(df, "text")


def test_media_meta_matches_bytes(media_df):
    out = media_meta(media_df, "media_bytes").collect()
    for r in out:
        raw = r["text"].encode("utf-8")
        m = r["media_meta"]
        assert m["byte_len"] == len(raw)
        assert m["md5"] == hashlib.md5(raw).hexdigest()
        assert m["width"] == len(raw) % 640 + 16
        assert m["mime"] == "application/octet-stream"


def test_frame_sample_covers_all_bytes(media_df):
    out = frame_sample(media_df, "media_bytes", n_frames=4).collect()
    for r in out:
        raw = r["text"].encode("utf-8")
        flen = max(len(raw) // 4, 1)
        assert len(r["frames"]) == 4
        total = 0
        for f in r["frames"]:
            i = f["frame_idx"]
            start = i * flen
            end = len(raw) if i == 3 else start + flen
            want = raw[start:end]
            assert f["frame_len"] == len(want)
            assert f["frame_md5"] == hashlib.md5(want).hexdigest()
            total += f["frame_len"]
        assert total == len(raw)  # frames cover the payload exactly


def test_byte_histogram_features_oracle(media_df):
    out = byte_histogram_features(media_df, "media_bytes", buckets=16).collect()
    for r in out:
        raw = np.frombuffer(r["text"].encode("utf-8"), dtype=np.uint8)
        want = np.bincount(raw % 16, minlength=16) / len(raw)
        got = np.array(r["features"])
        assert got.shape == (16,)
        np.testing.assert_allclose(got, want, rtol=1e-6)
        assert abs(got.sum() - 1.0) < 1e-6


def test_decode_stub_raises_without_codec(media_df):
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_images(media_df, "media_bytes")


def test_decode_fake_runs_real_plumbing(media_df):
    out = decode_images(media_df, "media_bytes", fake=True).collect()
    for r in out:
        raw = r["text"].encode("utf-8")
        d = r["decoded"]
        assert d["mode"] == "FAKE"
        assert d["width"] == len(raw) % 640 + 16
        assert d["mean_luma"] == pytest.approx(sum(raw) / len(raw))
