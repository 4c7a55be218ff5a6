"""FLAC codec tests: CRC test vectors, lossless round-trips through the
encoder, and hand-built frames exercising the decoder-only paths (LPC,
stereo decorrelations, Rice escape codes, wasted bits, partitions)."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sensordatapipelines_spark.sources.flac import (
    _BitW,
    _crc8,
    _crc16,
    _utf8_number,
    decode_flac,
    encode_flac,
)

RNG = np.random.default_rng(20260816)


def test_crc_test_vectors():
    assert _crc8(b"123456789") == 0xF4           # CRC-8/SMBUS
    assert _crc16(b"123456789") == 0xFEE8        # CRC-16/UMTS (BUYPASS)


def test_mono_roundtrip_random():
    x = RNG.integers(-32768, 32768, size=1500, dtype=np.int64)
    out, rate, ch, bps = decode_flac(encode_flac(x, sample_rate=44100))
    assert (rate, ch, bps) == (44100, 1, 16)
    np.testing.assert_array_equal(out[:, 0], x)


def test_stereo_multiblock_smooth():
    t = np.arange(9000)
    sig = np.stack(
        [(1000 * np.sin(t / 50)).astype(np.int64), (t % 255 - 128)], axis=1
    )
    out, *_ = decode_flac(encode_flac(sig, block_size=1024))
    np.testing.assert_array_equal(out, sig)


def test_8bit_roundtrip():
    x = RNG.integers(-128, 128, size=300, dtype=np.int64)
    out, _, _, bps = decode_flac(encode_flac(x, bps=8))
    assert bps == 8
    np.testing.assert_array_equal(out[:, 0], x)


@settings(max_examples=20, deadline=None)
@given(n=st.integers(1, 400), seed=st.integers(0, 2**31),
       smooth=st.booleans())
def test_roundtrip_property(n, seed, smooth):
    rng = np.random.default_rng(seed)
    if smooth:
        x = np.cumsum(rng.integers(-50, 51, size=n)).astype(np.int64)
        x = np.clip(x, -32768, 32767)
    else:
        x = rng.integers(-32768, 32768, size=n, dtype=np.int64)
    out, *_ = decode_flac(encode_flac(x, block_size=128))
    np.testing.assert_array_equal(out[:, 0], x)


# ---------------------------------------------------------------------------
# hand-built frames for the decoder-only paths
# ---------------------------------------------------------------------------


def _streaminfo(rate, channels, bps, total, block_size):
    si = _BitW()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    body = bytes(si.out) + bytes(16)
    return b"fLaC" + bytes([0x80]) + struct.pack(">I", len(body))[1:] + body


def _frame_header(w, bsz, channels_code, bps_code):
    w.write(0x3FFE, 14)
    w.write(0, 1)
    w.write(0, 1)
    w.write(7, 4)          # 16-bit blocksize field follows
    w.write(0, 4)          # rate from STREAMINFO
    w.write(channels_code, 4)
    w.write(bps_code, 3)
    w.write(0, 1)
    for b in _utf8_number(0):
        w.write(b, 8)
    w.write(bsz - 1, 16)
    hdr = bytes(w.out)
    assert w.n == 0
    w.write(_crc8(hdr), 8)


def _rice_residual(w, resid, param, po=0, order=0, bsz=None):
    w.write(0, 2)
    w.write(po, 4)
    nparts = 1 << po
    idx = 0
    for p in range(nparts):
        cnt = (bsz >> po) - (order if p == 0 else 0)
        w.write(param, 4)
        for _ in range(cnt):
            r = int(resid[idx]); idx += 1
            zz = (r << 1) ^ (r >> 63)
            w.unary(zz >> param)
            if param:
                w.write(zz & ((1 << param) - 1), param)


def _finish(w):
    w.align()
    frame = bytes(w.out)
    w.write(_crc16(frame), 16)
    return bytes(w.out)


def test_lpc_subframe_reconstruction():
    # signal + chosen LPC (order 2, precision 6, shift 4); residual
    # computed with the spec formula, decoder must invert it exactly
    bsz = 64
    rng = np.random.default_rng(3)
    x = np.cumsum(rng.integers(-80, 81, size=bsz)).astype(np.int64)
    coefs = [25, -10]  # /16 under shift 4
    shift = 4
    order = 2
    resid = [
        int(x[i]) - (sum(c * int(x[i - 1 - j]) for j, c in enumerate(coefs)) >> shift)
        for i in range(order, bsz)
    ]
    w = _BitW()
    _frame_header(w, bsz, 0, 4)  # mono, 16-bit
    w.write(0, 1)
    w.write(32 | (order - 1), 6)  # LPC subframe
    w.write(0, 1)
    for k in range(order):
        w.write(int(x[k]), 16)
    w.write(6 - 1, 4)   # precision 6
    w.write(shift, 5)
    for c in coefs:
        w.write(c, 6)
    _rice_residual(w, resid, param=7, order=order, bsz=bsz)
    payload = _streaminfo(8000, 1, 16, bsz, bsz) + _finish(w)
    out, *_ = decode_flac(payload)
    np.testing.assert_array_equal(out[:, 0], x)


@pytest.mark.parametrize("mode", [8, 9, 10])
def test_stereo_decorrelation_modes(mode):
    bsz = 32
    rng = np.random.default_rng(mode)
    left = rng.integers(-30000, 30000, size=bsz).astype(np.int64)
    right = rng.integers(-30000, 30000, size=bsz).astype(np.int64)
    side = left - right
    mid = (left + right) >> 1
    w = _BitW()
    _frame_header(w, bsz, mode, 4)

    def verbatim(vals, bps):
        w.write(0, 1)
        w.write(1, 6)
        w.write(0, 1)
        for v in vals:
            w.write(int(v), bps)

    if mode == 8:      # left/side
        verbatim(left, 16)
        verbatim(side, 17)
    elif mode == 9:    # side/right
        verbatim(side, 17)
        verbatim(right, 16)
    else:              # mid/side
        verbatim(mid, 16)
        verbatim(side, 17)
    payload = _streaminfo(8000, 2, 16, bsz, bsz) + _finish(w)
    out, *_ = decode_flac(payload)
    np.testing.assert_array_equal(out[:, 0], left)
    np.testing.assert_array_equal(out[:, 1], right)


def test_escape_code_and_partitions():
    bsz = 64
    rng = np.random.default_rng(9)
    x = rng.integers(-2000, 2000, size=bsz).astype(np.int64)
    w = _BitW()
    _frame_header(w, bsz, 0, 4)
    w.write(0, 1)
    w.write(8, 6)  # FIXED order 0: residual == samples
    w.write(0, 1)
    # partition order 2 → 4 partitions of 16; escape-coded raw 13 bits
    w.write(0, 2)
    w.write(2, 4)
    for p in range(4):
        w.write(0xF, 4)   # escape
        w.write(13, 5)    # raw bit width
        for v in x[16 * p : 16 * (p + 1)]:
            w.write(int(v), 13)
    payload = _streaminfo(8000, 1, 16, bsz, bsz) + _finish(w)
    out, *_ = decode_flac(payload)
    np.testing.assert_array_equal(out[:, 0], x)


def test_wasted_bits():
    bsz = 16
    x = (RNG.integers(-2000, 2000, size=bsz) << 3).astype(np.int64)
    w = _BitW()
    _frame_header(w, bsz, 0, 4)
    w.write(0, 1)
    w.write(1, 6)   # VERBATIM
    w.write(1, 1)   # wasted-bits flag
    w.unary(2)      # k-1 = 2 → 3 wasted bits
    for v in x:
        w.write(int(v) >> 3, 13)  # 16 - 3 effective bits
    payload = _streaminfo(8000, 1, 16, bsz, bsz) + _finish(w)
    out, *_ = decode_flac(payload)
    np.testing.assert_array_equal(out[:, 0], x)


def test_corruption_is_typed():
    x = RNG.integers(-32768, 32768, size=500, dtype=np.int64)
    enc = bytearray(encode_flac(x))
    with pytest.raises(ValueError, match="magic"):
        decode_flac(b"nope" + bytes(40))
    # flip an entropy byte: CRC must catch it with a typed error
    buf = bytearray(enc)
    buf[-20] ^= 0xFF
    with pytest.raises(ValueError):
        decode_flac(bytes(buf))
    rng = np.random.default_rng(1)
    for _ in range(200):
        buf = bytearray(enc)
        for _ in range(int(rng.integers(1, 6))):
            buf[int(rng.integers(4, len(buf)))] = int(rng.integers(0, 256))
        try:
            decode_flac(bytes(buf))
        except (ValueError, NotImplementedError):
            pass


def test_many_frames_multibyte_frame_numbers():
    """>127 frames per file exercises the multi-byte UTF-8 frame-number
    coding on both sides."""
    rng = np.random.default_rng(2)
    x = np.clip(
        np.cumsum(rng.integers(-40, 41, size=20000)).astype(np.int64),
        -32768, 32767,
    )
    out, *_ = decode_flac(encode_flac(x, block_size=128))  # 157 frames
    np.testing.assert_array_equal(out[:, 0], x)
