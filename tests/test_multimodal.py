"""Multimodal plumbing tests: binary columns, metadata sniffing,
mapInPandas feature extraction, frame sampling."""

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from feast_hive_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, b"\x89PNG\r\n\x1a\n" + b"x" * 100),
        (2, b"\xff\xd8\xff\xe0" + b"y" * 50),
        (3, b"RIFF" + b"z" * 20),
        (4, b"plain bytes"),
    ]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_attach_metadata(media):
    got = M.attach_metadata(media, "payload", ["media_id"]).toPandas()
    by_id = got.set_index("media_id")
    assert by_id.loc[1, "media_type"] == "image/png"
    assert by_id.loc[2, "media_type"] == "image/jpeg"
    assert by_id.loc[3, "media_type"] == "riff"
    assert by_id.loc[4, "media_type"] == "application/octet-stream"
    assert by_id.loc[1, "n_bytes"] == 108
    assert by_id.loc[4, "content_md5"] == hashlib.md5(b"plain bytes").hexdigest()


def test_extract_features_deterministic(media):
    got = M.extract_features(media, "payload", "media_id", dim=8).toPandas()
    assert len(got) == 4
    assert all(len(f) == 8 for f in got.feature)
    # deterministic: same payload -> same features
    again = M.extract_features(media, "payload", "media_id", dim=8).toPandas()
    a = [list(f) for f in got.sort_values("media_id").feature]
    b = [list(f) for f in again.sort_values("media_id").feature]
    assert a == b
    # matches the documented fake derivation
    exp0 = M._fake_features(b"plain bytes", 8)
    got4 = got[got.media_id == 4].feature.iloc[0]
    assert list(got4) == pytest.approx(list(exp0))


def test_extract_features_stub_gate(media):
    if not M._HAS_PIL:
        with pytest.raises(NotImplementedError):
            M.extract_features(media, "payload", "media_id", allow_fake=False).collect()


def test_sample_frames(spark):
    vids = spark.createDataFrame(
        [(1, 25), (2, 3), (3, 0)], "video_id long, n_frames long"
    )
    got = M.sample_frames(vids, "video_id", "n_frames", every_n=10).toPandas()
    by_vid = got.groupby("video_id").frame_index.apply(list).to_dict()
    assert by_vid[1] == [0, 10, 20]
    assert by_vid[2] == [0]
    assert by_vid[3] == [0]


def test_resize_images_plumbing(media):
    """Resize plumbing: schema, deterministic fake payload sized
    exactly width*height, repeatable across runs."""
    got = M.resize_images(media, "payload", "media_id", width=8, height=4).toPandas()
    assert set(got.columns) == {"media_id", "thumb", "width", "height", "n_bytes_in"}
    assert (got.width == 8).all() and (got.height == 4).all()
    assert all(len(t) == 32 for t in got.thumb)  # 8*4 bytes per thumb
    by_id = got.set_index("media_id")
    assert by_id.loc[1, "n_bytes_in"] == 108
    again = M.resize_images(media, "payload", "media_id", width=8, height=4).toPandas()
    a = {r.media_id: bytes(r.thumb) for r in got.itertuples()}
    b = {r.media_id: bytes(r.thumb) for r in again.itertuples()}
    assert a == b  # deterministic

    if not M._HAS_PIL:
        with pytest.raises(NotImplementedError):
            M.resize_images(media, "payload", "media_id", allow_fake=False)
