"""MJPEG AVI container tests: RIFF round-trip, tolerant walk, and the
real video frame-extraction/decode operators."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sensordatapipelines_spark.sources.avi import (
    parse_avi_mjpeg,
    write_avi_mjpeg,
)
from sensordatapipelines_spark.sources.jpeg import decode_jpeg, encode_jpeg

RNG = np.random.default_rng(20260816)


def _mjpeg(values, w=8, h=8):
    return [encode_jpeg(np.full((h, w), int(v), np.uint8)) for v in values]


def test_avi_roundtrip_frames_and_meta():
    vals = RNG.integers(0, 256, size=16)
    frames = _mjpeg(vals)
    avi = write_avi_mjpeg(frames, 8, 8, fps=5)
    out, meta = parse_avi_mjpeg(avi)
    assert out == frames
    assert (meta["width"], meta["height"], meta["n_frames"]) == (8, 8, 16)
    assert meta["usec_per_frame"] == 200_000
    # every frame decodes to its constant value
    for f, v in zip(out, vals):
        px, w, h, c = decode_jpeg(f)
        assert (w, h, c) == (8, 8, 1)
        assert (px == v).all()


def test_avi_odd_sized_frames_pad_correctly():
    # JPEG streams are arbitrary length; odd ones force the RIFF pad byte
    frames = _mjpeg(RNG.integers(0, 256, size=5), w=24, h=16)
    if not any(len(f) % 2 for f in frames):
        frames[2] = frames[2] + b""  # extremely unlikely; keep test honest
    out, _ = parse_avi_mjpeg(write_avi_mjpeg(frames, 24, 16))
    assert out == frames


def test_avi_rejects_garbage_and_empty():
    with pytest.raises(ValueError, match="RIFF form"):
        parse_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="at least one"):
        write_avi_mjpeg([], 8, 8)
    # a truncated chunk size is a typed error, not an IndexError
    avi = bytearray(write_avi_mjpeg(_mjpeg([1, 2]), 8, 8))
    movi = avi.index(b"00dc")
    struct.pack_into("<I", avi, movi + 4, 1 << 30)
    with pytest.raises(ValueError, match="overruns"):
        parse_avi_mjpeg(bytes(avi))


def test_frame_sample_real_avi(spark):
    from pyspark.sql import functions as F

    from sensordatapipelines_spark.operators.multimodal import frame_sample

    vals = list(range(0, 160, 10))  # 16 frames
    avi = write_avi_mjpeg(_mjpeg(vals), 8, 8)
    df = spark.createDataFrame([(7, "video", bytearray(avi))],
                               "media_id long, kind string, payload binary")
    media = df.select(F.struct("media_id", "kind", "payload").alias("media"))
    rows = frame_sample(media, every_n=5, fake=False).collect()
    assert [r.frame_idx for r in rows] == [0, 5, 10, 15]
    for r in rows:
        px, *_ = decode_jpeg(bytes(r.frame_bytes))
        assert (px == vals[r.frame_idx]).all()


def test_video_frame_profile_exact(spark):
    from pyspark.sql import functions as F

    from sensordatapipelines_spark.operators.multimodal import (
        video_frame_profile,
    )

    vals = RNG.integers(0, 256, size=6)
    avi = write_avi_mjpeg(_mjpeg(vals), 8, 8)
    df = spark.createDataFrame([(3, "video", bytearray(avi))],
                               "media_id long, kind string, payload binary")
    media = df.select(F.struct("media_id", "kind", "payload").alias("media"))
    rows = {r.frame_idx: r for r in video_frame_profile(media, every_n=2).collect()}
    assert sorted(rows) == [0, 2, 4]
    for idx, r in rows.items():
        assert (r.width, r.height, r.n_px) == (8, 8, 64)
        assert r.sum_val == 64 * int(vals[idx])
