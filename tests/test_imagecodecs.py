"""PNG / GIF / BMP codec tests: round-trips through every filter and
color-type path, hand-computed LZW vectors, interlace, and corruption
typing. No Spark session needed — these are the pure executor kernels."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sensordatapipelines_spark.sources.imagecodecs import (
    _ADAM7,
    _PNG_SIG,
    _gif_lzw_decode,
    _gif_lzw_encode,
    _png_chunk,
    decode_bmp,
    decode_gif,
    decode_png,
    encode_bmp,
    encode_gif,
    encode_png,
)

RNG = np.random.default_rng(20260816)


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_every_filter(ft, channels):
    px = RNG.integers(0, 256, size=(5, 7, channels), dtype=np.uint8)
    out, w, h, c = decode_png(encode_png(px, filters=(ft,)))
    assert (w, h, c) == (7, 5, channels)
    np.testing.assert_array_equal(out, px)


def test_png_roundtrip_mixed_filter_schedule():
    px = RNG.integers(0, 256, size=(16, 9, 3), dtype=np.uint8)
    out, *_ = decode_png(encode_png(px, filters=(0, 1, 2, 3, 4)))
    np.testing.assert_array_equal(out, px)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_16bit(channels):
    px = RNG.integers(0, 65536, size=(4, 6, channels), dtype=np.uint16)
    out, w, h, c = decode_png(encode_png(px, filters=(4,)))
    assert out.dtype == np.uint16 and (w, h, c) == (6, 4, channels)
    np.testing.assert_array_equal(out, px)


def test_png_palette_roundtrip():
    pal = RNG.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = RNG.integers(0, 16, size=(6, 5, 1), dtype=np.uint8)
    out, w, h, c = decode_png(encode_png(idx, palette=pal, filters=(1,)))
    assert c == 3
    np.testing.assert_array_equal(out, pal[idx[:, :, 0]])


def _manual_png(width, height, depth, ctype, raw_scanlines, extra=b""):
    ihdr = struct.pack(">IIBBBBB", width, height, depth, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + extra
        + _png_chunk(b"IDAT", zlib.compress(raw_scanlines))
        + _png_chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_png_subbyte_grayscale(depth):
    # 5 px wide so the last byte is partially used (MSB-first packing)
    width, height = 5, 3
    vals = RNG.integers(0, 1 << depth, size=(height, width), dtype=np.uint8)
    raw = bytearray()
    for y in range(height):
        bits = np.unpackbits(vals[y][:, None].astype(np.uint8), axis=1)[
            :, 8 - depth :
        ].ravel()
        packed = np.packbits(bits)
        raw.append(0)
        raw += packed.tobytes()
    out, w, h, c = decode_png(_manual_png(width, height, depth, 0, bytes(raw)))
    assert (w, h, c) == (width, height, 1)
    np.testing.assert_array_equal(out[:, :, 0], vals)


def test_png_adam7_interlaced():
    # build an interlaced file by hand: the 7 passes are independently
    # filtered sub-images concatenated in the single zlib stream
    width, height = 9, 10
    px = RNG.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = px[y0::dy, x0::dx, :]
        if sub.size == 0:
            continue
        for y in range(sub.shape[0]):
            raw.append(0)
            raw += sub[y].tobytes()
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 1)
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )
    out, w, h, c = decode_png(payload)
    assert (w, h, c) == (width, height, 3)
    np.testing.assert_array_equal(out, px)


def test_png_trns_appends_alpha():
    pal = np.arange(12, dtype=np.uint8).reshape(4, 3)
    idx = np.array([[0, 1], [2, 3]], np.uint8)[:, :, None]
    raw = b"".join(b"\x00" + idx[y, :, 0].tobytes() for y in range(2))
    extra = _png_chunk(b"PLTE", pal.tobytes()) + _png_chunk(
        b"tRNS", bytes([10, 20])
    )
    out, w, h, c = decode_png(_manual_png(2, 2, 8, 3, raw, extra))
    assert c == 4
    np.testing.assert_array_equal(out[:, :, 3], [[10, 20], [255, 255]])


def test_png_crc_corruption_raises():
    buf = bytearray(encode_png(np.zeros((2, 2, 3), np.uint8)))
    buf[40] ^= 0xFF  # flip an IDAT byte, CRC now stale
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(buf))


def test_png_bad_signature_and_underrun_raise():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" * 4)
    # valid chunks but IDAT holding one scanline for a 2-row image
    raw = b"\x00\x01\x02\x03"
    with pytest.raises(ValueError, match="underrun"):
        decode_png(_manual_png(1, 2, 8, 2, raw))


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    c=st.integers(1, 4),
    data=st.data(),
)
def test_png_roundtrip_property(w, h, c, data):
    px = np.array(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * c, max_size=w * h * c
            )
        ),
        np.uint8,
    ).reshape(h, w, c)
    fts = tuple(data.draw(st.lists(st.integers(0, 4), min_size=1, max_size=5)))
    out, *_ = decode_png(encode_png(px, filters=fts))
    np.testing.assert_array_equal(out, px)


# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------


def test_gif_lzw_hand_vector():
    # mcs=2: clear=4, eoi=5, first free=6, width starts at 3.
    # indices 1,1,1,2 → codes: CLEAR(4), 1, 6 (="11"), 2, EOI(5)
    # widths: all 3 bits (table reaches 8 only later).
    # LSB-first packing of [100, 001, 110, 010, 101]:
    #   bits (lsb→msb): 001|100... → byte0 = 0b10001100? compute:
    #   stream: 4(=100b) first → bits 0..2 = 100 (lsb-first: bit0=0,bit1=0,bit2=1)
    out = _gif_lzw_decode(_gif_lzw_encode(bytes([1, 1, 1, 2]), 2), 2)
    assert out == bytes([1, 1, 1, 2])
    # and the exact first byte: codes 4 then 1 then 6 → lsb-first
    enc = _gif_lzw_encode(bytes([1, 1, 1, 2]), 2)
    # code4=0b100 at bits0-2, code1=0b001 at bits3-5, code6=0b110 at bits6-8
    assert enc[0] == (0b100) | (0b001 << 3) | ((0b110 & 0b11) << 6)


def test_gif_lzw_kwkwk_case():
    # classic KwKwK: 'aaaa...' forces the decoder's code==len(table) branch
    data = bytes([3] * 50)
    assert _gif_lzw_decode(_gif_lzw_encode(data, 2), 2) == data


def test_gif_lzw_width_growth_roundtrip():
    # enough distinct pairs to push the table past 512 and 1024 entries
    data = bytes(RNG.integers(0, 256, size=6000, dtype=np.uint8))
    assert _gif_lzw_decode(_gif_lzw_encode(data, 8), 8) == data


def test_gif_lzw_table_reset_roundtrip():
    # >4096 table entries worth of novel pairs forces the encoder's
    # mid-stream CLEAR; the decoder must resynchronize
    data = bytes(RNG.integers(0, 256, size=40000, dtype=np.uint8))
    assert _gif_lzw_decode(_gif_lzw_encode(data, 8), 8) == data


@pytest.mark.parametrize("interlace", [False, True])
def test_gif_roundtrip(interlace):
    pal = RNG.integers(0, 256, size=(64, 3), dtype=np.uint8)
    idx = RNG.integers(0, 64, size=(11, 7), dtype=np.uint8)
    out, w, h, c = decode_gif(encode_gif(idx, pal, interlace=interlace))
    assert (w, h, c) == (7, 11, 3)
    np.testing.assert_array_equal(out, pal[idx])


def test_gif_extension_blocks_skipped():
    pal = np.zeros((2, 3), np.uint8)
    pal[1] = 255
    idx = np.array([[1, 0], [0, 1]], np.uint8)
    payload = bytearray(encode_gif(idx, pal))
    # inject a Graphic Control Extension right before the image block
    img_at = payload.index(0x2C, 13 + 6)
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    payload[img_at:img_at] = gce
    out, *_ = decode_gif(bytes(payload))
    np.testing.assert_array_equal(out, pal[idx])


def test_gif_bad_signature_and_underrun_raise():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTGIF" + bytes(20))
    pal = np.zeros((4, 3), np.uint8)
    good = bytearray(encode_gif(np.ones((4, 4), np.uint8), pal))
    # truncate the LZW stream: keep header + descriptor, gut the data
    mcs_at = good.index(0x2C, 13 + 12) + 10
    bad = good[: mcs_at + 1] + bytearray([1, 0x04, 0x00, 0x3B])
    with pytest.raises(ValueError, match="underrun"):
        decode_gif(bytes(bad))


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------


def test_bmp_roundtrip_with_row_padding():
    px = RNG.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)  # 9B rows → 3B pad
    out, w, h, c = decode_bmp(encode_bmp(px))
    assert (w, h, c) == (3, 5, 3)
    np.testing.assert_array_equal(out, px)


def test_bmp_topdown_and_32bit():
    w, h = 3, 2
    bgra = RNG.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
    body = bgra.tobytes()  # 12B rows: already 4-aligned
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, -h, 1, 32, 0, len(body), 0, 0, 0, 0
    )
    out, ww, hh, c = decode_bmp(hdr + body)
    assert (ww, hh, c) == (w, h, 4)
    np.testing.assert_array_equal(out, bgra[:, :, [2, 1, 0, 3]])


def test_bmp_8bit_palette():
    w, h = 5, 2
    pal = RNG.integers(0, 256, size=(256, 4), dtype=np.uint8)
    idx = RNG.integers(0, 256, size=(h, w), dtype=np.uint8)
    rowbytes = (w + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):
        body += idx[y].tobytes() + bytes(rowbytes - w)
    data_off = 54 + 1024
    hdr = b"BM" + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
    hdr += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(body), 0, 0, 256, 0)
    out, ww, hh, c = decode_bmp(hdr + pal.tobytes() + bytes(body))
    assert (ww, hh, c) == (w, h, 3)
    np.testing.assert_array_equal(out, pal[idx][:, :, [2, 1, 0]])


def test_bmp_rejects_compressed():
    px = np.zeros((2, 2, 3), np.uint8)
    buf = bytearray(encode_bmp(px))
    buf[30] = 1  # BI_RLE8
    with pytest.raises(ValueError, match="compression"):
        decode_bmp(bytes(buf))
