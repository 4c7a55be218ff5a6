"""Baseline JPEG codec tests: exactness on constant blocks (the gate
fixture's contract), bounded round-trip error, IDCT vs a naive
double-loop reference, subsampling/restart/marker handling."""

from __future__ import annotations

import numpy as np
import pytest

from sensordatapipelines_spark.sources.jpeg import (
    _DCT_C,
    decode_jpeg,
    encode_jpeg,
)

RNG = np.random.default_rng(20260816)


def _naive_idct(block: np.ndarray) -> np.ndarray:
    """Straight T.81 A.3.3 double sum, written independently of the
    matrix form used by the codec."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                for u in range(8):
                    cu = np.sqrt(0.5) if u == 0 else 1.0
                    cv = np.sqrt(0.5) if v == 0 else 1.0
                    s += (
                        cu * cv * block[v, u]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[y, x] = s / 4.0
    return out


def test_idct_matches_naive_reference():
    block = RNG.normal(0, 100, size=(8, 8))
    np.testing.assert_allclose(
        _DCT_C.T @ block @ _DCT_C, _naive_idct(block), atol=1e-9
    )


def test_gray_constant_blocks_exact():
    v = RNG.integers(0, 256, size=(4, 4), dtype=np.uint8)
    px = np.repeat(np.repeat(v, 8, 0), 8, 1)
    out, w, h, c = decode_jpeg(encode_jpeg(px))
    assert (w, h, c) == (32, 32, 1)
    np.testing.assert_array_equal(out[:, :, 0], px)


def test_gray_constant_blocks_exact_with_custom_qtable():
    q = np.clip(np.arange(64).reshape(8, 8) + 1, 1, 64)  # q[0,0] == 1
    v = RNG.integers(0, 256, size=(2, 5), dtype=np.uint8)
    px = np.repeat(np.repeat(v, 8, 0), 8, 1)
    out, *_ = decode_jpeg(encode_jpeg(px, qtable=q))
    np.testing.assert_array_equal(out[:, :, 0], px)


def test_gray_random_bounded_error():
    px = RNG.integers(0, 256, size=(24, 16), dtype=np.uint8)
    out, *_ = decode_jpeg(encode_jpeg(px))
    assert np.abs(out[:, :, 0].astype(int) - px.astype(int)).max() <= 2


def test_rgb_444_bounded_error_odd_dims():
    px = RNG.integers(0, 256, size=(17, 19, 3), dtype=np.uint8)
    out, w, h, c = decode_jpeg(encode_jpeg(px))
    assert (w, h, c) == (19, 17, 3)
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 3


def test_rgb_420_neutral_chroma_exact_luma():
    # R==G==B → Cb=Cr=128 exactly; 4:2:0 averaging of a constant plane is
    # lossless, so the decoded image must match bit-for-bit per block
    gray3 = np.repeat(
        RNG.integers(0, 256, size=(4, 6, 1), dtype=np.uint8), 3, axis=2
    )
    px = np.repeat(np.repeat(gray3, 8, 0), 8, 1)
    out, w, h, c = decode_jpeg(encode_jpeg(px, subsample="420"))
    assert (w, h, c) == (48, 32, 3)
    np.testing.assert_array_equal(out, px)


def test_rgb_420_smooth_bounded_error():
    base = RNG.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    px = np.repeat(np.repeat(base, 4, 0), 4, 1)  # chroma-flat 4×4 tiles
    out, *_ = decode_jpeg(encode_jpeg(px, subsample="420"))
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 3


def test_restart_markers_exact():
    v = RNG.integers(0, 256, size=(3, 5), dtype=np.uint8)
    px = np.repeat(np.repeat(v, 8, 0), 8, 1)
    enc = encode_jpeg(px, restart_interval=2)
    assert b"\xff\xdd" in enc and b"\xff\xd0" in enc  # DRI + RST0 present
    out, *_ = decode_jpeg(enc)
    np.testing.assert_array_equal(out[:, :, 0], px)


def test_restart_with_420_and_ragged_dims():
    px = RNG.integers(0, 256, size=(33, 29, 3), dtype=np.uint8)
    out, w, h, c = decode_jpeg(
        encode_jpeg(px, subsample="420", restart_interval=1)
    )
    assert (w, h, c) == (29, 33, 3)  # dims survive MCU padding


def test_mislabeled_progressive_and_lossless_markers_are_typed():
    # a baseline-coded scan relabeled SOF2 is structurally invalid for
    # the progressive scan rules (DC scan must have Se=0) → ValueError
    enc = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    sof = enc.index(b"\xff\xc0")
    enc[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(bytes(enc))
    # lossless (SOF3) stays a NotImplementedError boundary
    enc[sof + 1] = 0xC3
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg(bytes(enc))


def test_truncated_stream_raises():
    enc = encode_jpeg(np.full((16, 16), 77, np.uint8))
    with pytest.raises(ValueError):
        decode_jpeg(enc[: len(enc) // 2])
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")


def test_byte_stuffing_roundtrip():
    # values near 255 drive large DC magnitudes whose Huffman bits often
    # produce 0xFF bytes → stuffing; decode must unstuff transparently
    px = np.full((8, 16), 255, np.uint8)
    px[:, 8:] = 0
    out, *_ = decode_jpeg(encode_jpeg(px))
    np.testing.assert_array_equal(out[:, :, 0], px)


# ---------------------------------------------------------------------------
# Progressive (SOF2)
# ---------------------------------------------------------------------------


def test_progressive_bit_identical_to_baseline():
    """A progressive stream carries the same quantized coefficients as
    the baseline stream of the same pixels, so both must decode
    bit-for-bit identically — grayscale and RGB, ragged dims."""
    from sensordatapipelines_spark.sources.jpeg import encode_jpeg_progressive

    for shape in [(32, 32), (24, 17), (8, 24), (15, 37), (19, 13, 3)]:
        px = RNG.integers(0, 256, size=shape, dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(px))[0]
        prog = decode_jpeg(encode_jpeg_progressive(px))[0]
        np.testing.assert_array_equal(base, prog)


def test_progressive_approximation_ladders_and_bands():
    """Deeper successive-approximation ladders and arbitrary spectral
    band splits (incl. the single full band that exercises refinement
    ZRL runs) all reconstruct exactly."""
    from sensordatapipelines_spark.sources.jpeg import encode_jpeg_progressive

    px = RNG.integers(0, 256, size=(41, 14), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(px))[0]
    for dc_al, ac_al, bands in [
        (0, 0, ((1, 63),)),
        (3, 1, ((1, 63),)),            # the refinement-ZRL regression case
        (2, 2, ((1, 2), (3, 9), (10, 63))),
        (1, 2, ((1, 31), (32, 63))),
    ]:
        prog = decode_jpeg(
            encode_jpeg_progressive(px, dc_al=dc_al, ac_al=ac_al, bands=bands)
        )[0]
        np.testing.assert_array_equal(base, prog)


def test_progressive_rgb_with_quant_table():
    from sensordatapipelines_spark.sources.jpeg import encode_jpeg_progressive

    q = np.clip(np.arange(64).reshape(8, 8) + 1, 1, 48)
    px = RNG.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(px, qtable=q))[0]
    prog = decode_jpeg(encode_jpeg_progressive(px, qtable=q))[0]
    np.testing.assert_array_equal(base, prog)


def test_progressive_constant_blocks_exact():
    from sensordatapipelines_spark.sources.jpeg import encode_jpeg_progressive

    v = RNG.integers(0, 256, size=(4, 4), dtype=np.uint8)
    px = np.repeat(np.repeat(v, 8, 0), 8, 1)
    out, w, h, c = decode_jpeg(encode_jpeg_progressive(px))
    assert (w, h, c) == (32, 32, 1)
    np.testing.assert_array_equal(out[:, :, 0], px)


def test_progressive_randomized_sweep():
    from sensordatapipelines_spark.sources.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(4242)
    for _ in range(20):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        nc = int(rng.choice([1, 3]))
        px = rng.integers(0, 256, (h, w, nc) if nc == 3 else (h, w), dtype=np.uint8)
        dc_al = int(rng.integers(0, 4))
        ac_al = int(rng.integers(0, 3))
        nb = int(rng.integers(1, 4))
        cuts = (
            sorted(rng.choice(np.arange(2, 63), size=nb - 1, replace=False).tolist())
            if nb > 1 else []
        )
        edges = [1] + cuts + [64]
        bands = tuple((edges[i], edges[i + 1] - 1) for i in range(len(edges) - 1))
        base = decode_jpeg(encode_jpeg(px))[0]
        prog = decode_jpeg(
            encode_jpeg_progressive(px, dc_al=dc_al, ac_al=ac_al, bands=bands)
        )[0]
        np.testing.assert_array_equal(base, prog)
