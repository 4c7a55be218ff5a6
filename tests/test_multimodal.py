"""Multimodal plumbing tests: schema, mapInPandas batch shape, stub gating."""

import pytest
from pyspark.sql import functions as F

from sensordatapipelines_spark.operators.multimodal import (
    attach_fake_media,
    frame_sample,
    media_features,
)


def test_media_schema_and_features(spark):
    base = spark.range(10).withColumnRenamed("id", "doc_id")
    media = attach_fake_media(base, "doc_id")
    field_names = {f.name for f in media.schema["media"].dataType.fields}
    assert field_names == {"media_id", "kind", "payload", "meta"}
    feats = media_features(media)
    rows = feats.collect()
    assert len(rows) == 10
    assert all(r["n_bytes"] > 0 for r in rows)
    # deterministic: re-running produces identical features
    again = {r["media_id"]: r["mean_val"] for r in media_features(media).collect()}
    assert {r["media_id"]: r["mean_val"] for r in rows} == again


def test_real_decode_is_stubbed(spark):
    media = attach_fake_media(spark.range(2).withColumnRenamed("id", "doc_id"), "doc_id")
    with pytest.raises(Exception):  # NotImplementedError surfaces as PythonException
        media_features(media, fake=False).collect()


def test_frame_sample_explodes_rows(spark):
    media = attach_fake_media(spark.range(3).withColumnRenamed("id", "doc_id"), "doc_id")
    frames = frame_sample(media, every_n=50)
    rows = frames.collect()
    assert len(rows) >= 3  # ≥1 frame per item
    assert all(r["frame_idx"] % 50 == 0 for r in rows)


def test_decode_ppm_p6_p5_and_comments():
    """Pure-python netpbm parse: P6 RGB with header comments, P5 gray."""
    import numpy as np

    from sensordatapipelines_spark.operators.multimodal import decode_ppm

    raster = bytes(range(24))
    px, w, h, c = decode_ppm(b"P6\n# a comment\n4 2\n# another\n255\n" + raster)
    assert (w, h, c) == (4, 2, 3)
    assert px[0, 0].tolist() == [0, 1, 2] and px[1, 3].tolist() == [21, 22, 23]
    g, w, h, c = decode_ppm(b"P5\n3 2\n255\n" + bytes(range(6)))[0], 3, 2, 1
    assert g.ravel().tolist() == [0, 1, 2, 3, 4, 5]
    import pytest as _pt

    with _pt.raises(ValueError):
        decode_ppm(b"JUNK")
    # 16-bit samples: big-endian 2-byte per the netpbm spec
    wide = decode_ppm(
        b"P5\n2 1\n65535\n" + (1000).to_bytes(2, "big") + (65535).to_bytes(2, "big")
    )[0]
    assert wide.dtype == np.uint16 and wide.ravel().tolist() == [1000, 65535]
    px16 = decode_ppm(
        b"P6\n1 1\n65535\n"
        + b"".join(v.to_bytes(2, "big") for v in (256, 512, 40000))
    )[0]
    assert px16[0, 0].tolist() == [256, 512, 40000]
    with _pt.raises(ValueError):
        decode_ppm(b"P5\n1 1\n70000\n" + bytes(2))


def test_decode_wav_pcm16_and_chunk_walk():
    """RIFF chunk walk: LIST chunk skipped (incl. odd-size word padding),
    PCM16 stereo deinterleaved, sample_rate surfaced."""
    import struct

    import numpy as np

    from sensordatapipelines_spark.operators.multimodal import decode_wav

    data = struct.pack("<6h", 100, -100, 200, -200, 300, -300)  # 3 stereo frames
    wav = (
        b"RIFF" + struct.pack("<I", 0) + b"WAVE"
        + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size + pad
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 2, 44100, 44100 * 4, 4, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    frames, sr, ch, ba = decode_wav(wav)
    assert (sr, ch, ba) == (44100, 2, 4)
    assert frames.shape == (3, 2)
    assert frames[:, 0].tolist() == [100, 200, 300]
    assert frames[:, 1].tolist() == [-100, -200, -300]


def test_decode_wav_pcm24_pcm32_and_float():
    """24-bit PCM widens with sign propagation; 32-bit PCM and IEEE
    float32/float64 (format 3) decode exactly; ADPCM stays typed."""
    import struct

    import numpy as np
    import pytest

    from sensordatapipelines_spark.operators.multimodal import decode_wav

    def wav(fmt_code, channels, bits, data):
        ba = channels * bits // 8
        return (
            b"RIFF" + struct.pack("<I", 0) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", fmt_code, channels, 8000, 8000 * ba, ba, bits)
            + b"data" + struct.pack("<I", len(data)) + data
        )

    # 24-bit: +1, -1, max positive, min negative
    vals = [1, -1, 2**23 - 1, -(2**23)]
    data24 = b"".join(v.to_bytes(3, "little", signed=True) for v in vals)
    frames, _, _, _ = decode_wav(wav(1, 1, 24, data24))
    assert frames.ravel().tolist() == vals

    data32 = struct.pack("<2i", -(2**31), 2**31 - 1)
    frames32, _, _, _ = decode_wav(wav(1, 1, 32, data32))
    assert frames32.ravel().tolist() == [-(2**31), 2**31 - 1]

    dataf = struct.pack("<4f", 0.5, -0.25, 1.0, -1.0)
    ff, _, _, _ = decode_wav(wav(3, 2, 32, dataf))
    assert ff.dtype == np.float32 and ff.ravel().tolist() == [0.5, -0.25, 1.0, -1.0]

    datad = struct.pack("<2d", 0.125, -0.5)
    fd, _, _, _ = decode_wav(wav(3, 1, 64, datad))
    assert fd.dtype == np.float64 and fd.ravel().tolist() == [0.125, -0.5]

    with pytest.raises(NotImplementedError, match="format 85"):
        decode_wav(wav(85, 1, 0, b"\x00\x00"))  # MP3 stays typed


def test_decode_wav_g711_alaw_mulaw():
    """G.711 expansion tables bit-match the stdlib ``audioop`` reference
    (all 256 codes, both laws) and format-6/7 payloads decode through the
    normal chunk walk."""
    import struct

    import numpy as np

    from sensordatapipelines_spark.operators.multimodal import (
        _ALAW_LUT,
        _MULAW_LUT,
        decode_wav,
    )

    try:
        import warnings

        with warnings.catch_warnings():
            # Removed in Python 3.13; the landmark asserts below self-pin
            # the tables, so this cross-check is best-effort only.
            warnings.simplefilter("ignore", DeprecationWarning)
            import audioop

        codes = bytes(range(256))
        assert np.array_equal(
            np.frombuffer(audioop.ulaw2lin(codes, 2), dtype="<i2"), _MULAW_LUT
        )
        assert np.array_equal(
            np.frombuffer(audioop.alaw2lin(codes, 2), dtype="<i2"), _ALAW_LUT
        )
    except ModuleNotFoundError:
        pass
    # self-pinned landmark values (ITU-T G.711 / CCITT reference tables)
    assert (_MULAW_LUT[0x00], _MULAW_LUT[0x80], _MULAW_LUT[0xFF]) == (
        -32124, 32124, 0,
    )
    assert (_ALAW_LUT[0x55], _ALAW_LUT[0xD5], _ALAW_LUT[0xAA]) == (-8, 8, 32256)

    def wav(fmt_code, data):
        return (
            b"RIFF" + struct.pack("<I", 0) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", fmt_code, 1, 8000, 8000, 1, 8)
            + b"data" + struct.pack("<I", len(data)) + data
        )

    payload = bytes([0x00, 0x55, 0x80, 0xD5, 0xFF])
    fu, sr, ch, ba = decode_wav(wav(7, payload))
    assert (sr, ch, ba) == (8000, 1, 1)
    assert fu.ravel().tolist() == [_MULAW_LUT[c] for c in payload]
    fa, _, _, _ = decode_wav(wav(6, payload))
    assert fa.ravel().tolist() == [_ALAW_LUT[c] for c in payload]


def test_media_features_real_ppm_channel_means(spark):
    """fake=False on a staged P6 payload: real decode, per-channel means."""
    from sensordatapipelines_spark.operators.multimodal import media_features

    raster = bytes([10, 20, 30] * 8)  # every pixel RGB=(10,20,30)
    payload = b"P6\n4 2\n255\n" + raster
    df = spark.createDataFrame(
        [(1, "image", bytearray(payload))], "media_id long, kind string, payload binary"
    ).select(F.struct("media_id", "kind", "payload").alias("media"))
    r = media_features(df, fake=False).collect()[0]
    assert (r["width"], r["height"], r["n_channels"]) == (4, 2, 3)
    assert (r["mean_c0"], r["mean_c1"], r["mean_c2"]) == (10.0, 20.0, 30.0)
    assert r["mean_val"] == 20.0 and r["n_bytes"] == len(payload)


def test_resize_nearest_mapping_and_media_resize(spark):
    """Nearest-neighbor floor mapping: out (i,j) = in (i*h//oh, j*w//ow);
    media_resize re-encodes a decodable netpbm payload."""
    import numpy as np

    from sensordatapipelines_spark.operators.multimodal import (
        decode_ppm,
        media_resize,
        resize_nearest,
    )

    px = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    small = resize_nearest(px, 2, 1)
    assert small.shape == (1, 2, 3)
    assert small[0, 0].tolist() == [0, 1, 2]     # in (0,0)
    assert small[0, 1].tolist() == [6, 7, 8]     # in (0,2)
    up = resize_nearest(px, 8, 4)                # upscale repeats pixels
    assert up.shape == (4, 8, 3) and up[0, 0].tolist() == up[1, 1].tolist()

    payload = b"P6\n4 2\n255\n" + px.tobytes()
    df = spark.createDataFrame(
        [(7, "image", bytearray(payload))], "media_id long, kind string, payload binary"
    ).select(F.struct("media_id", "kind", "payload").alias("media"))
    r = media_resize(df, out_w=2, out_h=1).collect()[0]
    out_px, w, h, c = decode_ppm(bytes(r["payload"]))
    assert (w, h, c) == (2, 1, 3)
    assert out_px[0, 0].tolist() == [0, 1, 2] and out_px[0, 1].tolist() == [6, 7, 8]


def test_audio_resample_decimation(spark):
    """WAV decimation: every_n frames survive, sample_rate divides, and
    the re-encoded payload decodes back losslessly (stereo preserved)."""
    import struct

    import numpy as np

    from sensordatapipelines_spark.operators.multimodal import (
        audio_resample,
        decode_wav,
    )

    data = struct.pack("<8h", 1, -1, 2, -2, 3, -3, 4, -4)  # 4 stereo frames
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    df = spark.createDataFrame(
        [(3, "audio", bytearray(wav))], "media_id long, kind string, payload binary"
    ).select(F.struct("media_id", "kind", "payload").alias("media"))
    r = audio_resample(df, every_n=2).collect()[0]
    assert (r["sample_rate"], r["n_frames"]) == (4000, 2)
    frames, sr, ch, ba = decode_wav(bytes(r["payload"]))
    assert (sr, ch, ba) == (4000, 2, 4)
    assert frames.tolist() == [[1, -1], [3, -3]]  # frames 0 and 2


def test_image_dhash_properties(spark):
    """dHash is identical for identical images, differs across different
    ones, and is invariant to uniform brightness shifts (the property that
    makes it a PERCEPTUAL hash)."""
    import numpy as np

    from sensordatapipelines_spark.operators.multimodal import image_dhash

    def ppm(seed, shift=0):
        rng = np.random.RandomState(seed)
        px = rng.randint(0, 200, (8, 8, 3)).astype(np.int64) + shift
        return b"P6\n8 8\n255\n" + px.astype(np.uint8).tobytes()

    rows = [
        (1, ppm(1)),
        (2, ppm(1)),          # identical
        (3, ppm(2)),          # different content
        (4, ppm(1, shift=40)),  # same content, uniformly brighter
    ]
    df = spark.createDataFrame(
        [(i, ("image", p)) for i, p in rows],
        "media_id long, media struct<kind:string, payload:binary>",
    ).select(
        F.struct(
            F.col("media_id"),
            F.col("media.kind").alias("kind"),
            F.col("media.payload").alias("payload"),
        ).alias("media")
    )
    out = {r.media_id: r.dhash for r in image_dhash(df).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]
    assert out[1] == out[4]  # brightness-shift invariant
    assert len(out[1]) == 16  # 64 bits -> 16 hex chars


def test_audio_fingerprint_properties(spark):
    """Identical clips share a fingerprint, different clips differ, and a
    uniform gain shift preserves it (contour compares adjacent windows)."""
    import struct

    import numpy as np

    from sensordatapipelines_spark.operators.multimodal import audio_fingerprint

    def wav(samples):
        data = b"".join(struct.pack("<h", s) for s in samples)
        return (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data
        )

    rng = np.random.RandomState(3)
    base = [int(v) for v in rng.randint(-3000, 3000, 64)]
    rows = [
        (1, wav(base)),
        (2, wav(base)),                       # identical
        (3, wav([int(v) for v in rng.randint(-3000, 3000, 64)])),  # different
        (4, wav([v * 2 for v in base])),      # uniform gain x2
    ]
    df = spark.createDataFrame(
        [(i, ("audio", p)) for i, p in rows],
        "media_id long, media struct<kind:string, payload:binary>",
    ).select(
        F.struct(
            F.col("media_id"),
            F.col("media.kind").alias("kind"),
            F.col("media.payload").alias("payload"),
        ).alias("media")
    )
    out = {r.media_id: r for r in audio_fingerprint(df, n_windows=8).collect()}
    assert out[1].fingerprint == out[2].fingerprint
    assert out[1].fingerprint != out[3].fingerprint
    assert out[1].fingerprint == out[4].fingerprint  # gain-invariant contour
    assert out[1].n_frames == 64


def test_media_channel_histogram_known_image(spark):
    from sensordatapipelines_spark.operators.multimodal import (
        media_channel_histogram,
    )

    # 2×1 P6: pixel0 = (0, 100, 200), pixel1 = (63, 128, 255)
    payload = b"P6\n2 1\n255\n" + bytes([0, 100, 200, 63, 128, 255])
    df = spark.createDataFrame(
        [(1, "image", bytearray(payload))],
        "media_id long, kind string, payload binary",
    ).select(F.struct("media_id", "kind", "payload").alias("media"))
    out = {(r.channel, r.bin): r.n_px
           for r in media_channel_histogram(df, n_bins=4).collect()}
    # channel 0: 0→bin0, 63→bin0 ; channel 1: 100→bin1, 128→bin2 ;
    # channel 2: 200→bin3, 255→bin3
    assert out == {(0, 0): 2, (1, 1): 1, (1, 2): 1, (2, 3): 2}


def test_audio_zcr_known_wave(spark):
    import struct

    from sensordatapipelines_spark.operators.multimodal import audio_zcr

    samples = [100, -5, 3, 0, -7, -2, 8, 8]
    data = b"".join(struct.pack("<h", s) for s in samples)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    df = spark.createDataFrame(
        [(7, "audio", bytearray(wav))],
        "media_id long, kind string, payload binary",
    ).select(F.struct("media_id", "kind", "payload").alias("media"))
    r = audio_zcr(df).collect()[0]
    assert r.n_samples == 8
    # strict sign products < 0: (100,-5), (-5,3), (-2,8) → 3 crossings
    # (3,0) and (0,-7) are NOT strict crossings
    assert r.n_zero_cross == 3
    assert r.sum_abs == sum(abs(s) for s in samples)


def test_decode_wav_ima_adpcm_spec_vector():
    """IMA ADPCM (format 17): hand-computed spec walk from predictor=0,
    index=0 over nibbles [0,4,8,7,0,0,0,0] — every intermediate step
    (step table, diff shifts, index adaptation) pinned by hand."""
    import struct

    from sensordatapipelines_spark.operators.multimodal import decode_wav

    data = bytes([0, 0, 0, 0]) + bytes([0x40, 0x78, 0x00, 0x00])
    block_align = len(data)
    wav = (
        b"RIFF" + struct.pack("<I", 0) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 17, 1, 8000, 4000, block_align, 4)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    frames, sr, ch, ba = decode_wav(wav)
    assert (sr, ch, ba) == (8000, 1, block_align)
    # walk: (0) d=0 i->0; (4) d=7 i->2; (8) step9 d=1 sign -> 6, i->1;
    # (7) step8 d=1+8+4+2=15 -> 21, i->9; (0)x4: steps 17,16,14,13 ->
    # +2,+2,+1,+1
    assert frames.ravel().tolist() == [0, 0, 7, 6, 21, 23, 25, 26, 27]


def test_decode_wav_ms_adpcm_spec_vector():
    """MS ADPCM (format 2): coefficient pair (256,0), delta=16,
    s1=100, s2=50, nibbles (1, 0) — output (s2, s1, 116, 116), with the
    delta floor at 16 exercised."""
    import struct

    from sensordatapipelines_spark.operators.multimodal import decode_wav

    block = bytes([0]) + struct.pack("<hhh", 16, 100, 50) + bytes([0x10])
    wav = (
        b"RIFF" + struct.pack("<I", 0) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 2, 1, 8000, 4000, len(block), 4)
        + b"data" + struct.pack("<I", len(block)) + block
    )
    frames, _, _, _ = decode_wav(wav)
    assert frames.ravel().tolist() == [50, 100, 116, 116]


def test_decode_wav_ima_adpcm_stereo_interleave():
    """Stereo IMA: per-channel headers then channel-interleaved 4-byte
    nibble groups; channels decode independently."""
    import struct

    from sensordatapipelines_spark.operators.multimodal import decode_wav

    hdr = struct.pack("<hBB", 0, 0, 0) + struct.pack("<hBB", 1000, 10, 0)
    data = hdr + bytes([0x40, 0x78, 0x00, 0x00]) + bytes([0x00] * 4)
    wav = (
        b"RIFF" + struct.pack("<I", 0) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 17, 2, 8000, 4000, len(data), 4)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    frames, _, ch, _ = decode_wav(wav)
    assert ch == 2
    # channel 0: the mono spec vector; channel 1: eight zero nibbles from
    # predictor 1000 at index 10 (steps 19,17,16,14,13,12,11,10 ->
    # diffs 2,2,2,1,1,1,1,1), index decaying by 1 each
    assert frames[:, 0].tolist() == [0, 0, 7, 6, 21, 23, 25, 26, 27]
    assert frames[:, 1].tolist() == [
        1000, 1002, 1004, 1006, 1007, 1008, 1009, 1010, 1011,
    ]


def test_decode_wav_adpcm_fuzz_typed_errors_only():
    """Corrupt/truncated ADPCM payloads must raise ValueError (or decode
    to a shorter frame set), never escape a raw struct/Index error from
    an executor task — the same contract the GeoTIFF parser carries."""
    import struct

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from sensordatapipelines_spark.operators.multimodal import decode_wav

    def wav(fmt_code, channels, block_align, data):
        return (
            b"RIFF" + struct.pack("<I", 0) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", fmt_code, channels, 8000, 4000,
                          block_align, 4)
            + b"data" + struct.pack("<I", len(data)) + data
        )

    @settings(max_examples=200, deadline=None)
    @given(
        fmt=st.sampled_from([2, 17]),
        channels=st.integers(1, 2),
        block_align=st.integers(0, 40),
        data=st.binary(min_size=0, max_size=64),
    )
    def run(fmt, channels, block_align, data):
        try:
            frames, _, ch, _ = decode_wav(wav(fmt, channels, block_align, data))
            assert frames.shape[1] == ch
        except (ValueError, NotImplementedError):
            pass  # the typed contract

    run()


def test_decode_aiff_and_au():
    """AIFF (big-endian PCM, 80-bit-extended rate) and Sun AU (mu-law /
    PCM8 / PCM16BE) decoders."""
    import struct

    import numpy as np
    import pytest

    from sensordatapipelines_spark.operators.multimodal import (
        _MULAW_LUT,
        decode_aiff,
        decode_au,
        decode_audio,
    )

    def f80(v):
        e = v.bit_length() - 1
        return struct.pack(">HQ", 16383 + e, v << (63 - e))

    # AIFF 16-bit stereo
    frames = np.array([[100, -200], [32767, -32768], [0, 5]], ">i2")
    comm = struct.pack(">HIH", 2, 3, 16) + f80(44100)
    ssnd = struct.pack(">II", 0, 0) + frames.tobytes()
    body = (b"AIFF" + b"COMM" + struct.pack(">I", len(comm)) + comm
            + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
    payload = b"FORM" + struct.pack(">I", len(body)) + body
    out, rate, ch, ba = decode_aiff(payload)
    assert (rate, ch, ba) == (44100, 2, 4)
    np.testing.assert_array_equal(out, frames.astype(np.int16))

    # AIFF 24-bit mono incl. negative sign extension
    vals = np.array([-(1 << 22), 1 << 22, -1], np.int64)
    raw = b"".join(int(v & 0xFFFFFF).to_bytes(3, "big") for v in vals)
    comm = struct.pack(">HIH", 1, 3, 24) + f80(8000)
    ssnd = struct.pack(">II", 0, 0) + raw
    body = (b"AIFF" + b"COMM" + struct.pack(">I", len(comm)) + comm
            + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
    out, *_ = decode_aiff(b"FORM" + struct.pack(">I", len(body)) + body)
    np.testing.assert_array_equal(out[:, 0], vals)

    # AU mu-law + PCM16BE, dispatched through decode_audio
    codes = bytes(range(16))
    au = b".snd" + struct.pack(">IIIII", 24, 16, 1, 8000, 1) + codes
    out, rate, ch, _ = decode_audio(au)
    assert (rate, ch) == (8000, 1)
    np.testing.assert_array_equal(out[:, 0], _MULAW_LUT[np.frombuffer(codes, np.uint8)])
    pcm = np.array([1000, -1000], ">i2").tobytes()
    au16 = b".snd" + struct.pack(">IIIII", 24, 4, 3, 16000, 1) + pcm
    out, *_ = decode_au(au16)
    np.testing.assert_array_equal(out[:, 0], [1000, -1000])

    with pytest.raises(ValueError, match="magic"):
        decode_au(b"nope" + bytes(32))
    with pytest.raises(ValueError, match="FORM"):
        decode_aiff(b"RIFF" + bytes(32))
    with pytest.raises(NotImplementedError, match="encoding"):
        decode_au(b".snd" + struct.pack(">IIIII", 24, 4, 27, 8000, 1) + bytes(4))


def test_media_features_real_decodes_aiff_au_flac(spark):
    """media_features(fake=False) fills sample_rate / channel means for
    every audio container, not just RIFF/WAVE."""
    import struct

    import numpy as np
    from pyspark.sql import functions as F

    from sensordatapipelines_spark.operators.multimodal import media_features
    from sensordatapipelines_spark.sources.flac import encode_flac

    def f80(v):
        e = v.bit_length() - 1
        return struct.pack(">HQ", 16383 + e, v << (63 - e))

    pcm = np.array([100, -100, 50, -50], ">i2")
    comm = struct.pack(">HIH", 1, 4, 16) + f80(8000)
    ssnd = struct.pack(">II", 0, 0) + pcm.tobytes()
    body = (b"AIFF" + b"COMM" + struct.pack(">I", len(comm)) + comm
            + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
    aiff = b"FORM" + struct.pack(">I", len(body)) + body
    au = b".snd" + struct.pack(">IIIII", 24, 4, 3, 16000, 1) + pcm.tobytes()
    flac = encode_flac(pcm.astype(np.int64), sample_rate=22050)
    rows = [(1, "audio", bytearray(aiff)), (2, "audio", bytearray(au)),
            (3, "audio", bytearray(flac))]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    media = df.select(F.struct("media_id", "kind", "payload").alias("media"))
    got = {r.media_id: r for r in media_features(media, fake=False).collect()}
    assert got[1].sample_rate == 8000 and got[1].mean_c0 == 0.0
    assert got[2].sample_rate == 16000
    assert got[3].sample_rate == 22050 and got[3].n_channels == 1


def test_probe_media_all_containers():
    """Header-only probe reports format/dims/rate for every container
    without touching pixel or sample data."""
    import struct
    import tempfile, os

    import numpy as np
    import pytest

    from sensordatapipelines_spark.operators.multimodal import probe_media
    from sensordatapipelines_spark.sources.avi import write_avi_mjpeg
    from sensordatapipelines_spark.sources.flac import encode_flac
    from sensordatapipelines_spark.sources.geotiff import write_geotiff
    from sensordatapipelines_spark.sources.imagecodecs import (
        encode_bmp,
        encode_gif,
        encode_png,
    )
    from sensordatapipelines_spark.sources.jpeg import (
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, (2, 4, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)

    def chk(payload, **want):
        got = probe_media(payload)
        for k, v in want.items():
            assert got[k] == v, (k, got)

    chk(encode_png(px), format="png", width=4, height=2, channels=3)
    chk(encode_gif(rng.integers(0, 16, (4, 4), dtype=np.uint8), pal),
        format="gif", width=4, height=4)
    chk(encode_bmp(px), format="bmp", width=4, height=2)
    chk(encode_jpeg(gray), format="jpeg", width=32, height=32, channels=1)
    chk(encode_jpeg_progressive(gray), format="jpeg-progressive", width=32)
    chk(write_avi_mjpeg([encode_jpeg(np.full((8, 8), 5, np.uint8))] * 3, 8, 8),
        format="avi", width=8, height=8, n_frames=3)
    chk(encode_flac(np.arange(16, dtype=np.int64), sample_rate=44100),
        format="flac", sample_rate=44100, n_frames=16, channels=1)
    chk(b"P6\n4 2\n255\n" + bytes(24), format="netpbm", width=4, height=2)
    d = tempfile.mkdtemp()
    write_geotiff(os.path.join(d, "t.tif"), np.zeros((8, 16)), dtype="u1")
    chk(open(os.path.join(d, "t.tif"), "rb").read(),
        format="tiff", width=16, height=8)
    wav = (b"RIFF" + struct.pack("<I", 52) + b"WAVE" + b"fmt "
           + struct.pack("<I", 16) + struct.pack("<HHIIHH", 1, 2, 48000, 0, 4, 16)
           + b"data" + struct.pack("<I", 16) + bytes(16))
    chk(wav, format="wav", channels=2, sample_rate=48000)
    chk(b".snd" + struct.pack(">IIIII", 24, 16, 1, 8000, 1) + bytes(16),
        format="au", sample_rate=8000, n_frames=16)
    with pytest.raises(ValueError, match="magic"):
        probe_media(b"????" + bytes(32))
