"""CCITT G3-1D / G4 fax codec tests: table integrity (prefix-free,
canonical pinned entries), every mode path, and hypothesis round-trips."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sensordatapipelines_spark.sources.ccitt import (
    _BLACK_MAKEUP,
    _BLACK_TERM,
    _EXT_MAKEUP,
    _WHITE_MAKEUP,
    _WHITE_TERM,
    g4_decode,
    g4_encode,
    mh_decode,
    mh_encode,
)

RNG = np.random.default_rng(20260816)


def _prefix_free(codes):
    codes = sorted(codes)
    for a, b in zip(codes, codes[1:]):
        assert not b.startswith(a), f"{a} is a prefix of {b}"


def test_tables_prefix_free_per_colour():
    # a decoder reads one colour class at a time, so prefix-freeness is
    # required within {white term + white makeup + ext} and the black set
    _prefix_free(
        list(_WHITE_TERM.values()) + list(_WHITE_MAKEUP.values())
        + list(_EXT_MAKEUP.values())
    )
    _prefix_free(
        list(_BLACK_TERM.values()) + list(_BLACK_MAKEUP.values())
        + list(_EXT_MAKEUP.values())
    )


def test_canonical_entries_pinned():
    # the entries every published T.4 table lists (typo canaries)
    assert _WHITE_TERM[0] == "00110101"
    assert _WHITE_TERM[1] == "000111"
    assert _WHITE_TERM[63] == "00110100"
    assert _WHITE_MAKEUP[64] == "11011"
    assert _WHITE_MAKEUP[1728] == "010011011"
    assert _BLACK_TERM[0] == "0000110111"
    assert _BLACK_TERM[1] == "010"
    assert _BLACK_TERM[2] == "11"
    assert _BLACK_TERM[3] == "10"
    assert _BLACK_MAKEUP[64] == "0000001111"
    assert _EXT_MAKEUP[2560] == "000000011111"
    # every code fits the decoder's 14-bit scan window
    for t in (_WHITE_TERM, _WHITE_MAKEUP, _BLACK_TERM, _BLACK_MAKEUP,
              _EXT_MAKEUP):
        assert all(len(c) <= 14 for c in t.values())


def test_mh_all_white_all_black_rows():
    rows = np.zeros((3, 1728), np.uint8)
    assert np.array_equal(mh_decode(mh_encode(rows), 1728, 3), rows)
    rows[1] = 1
    assert np.array_equal(mh_decode(mh_encode(rows), 1728, 3), rows)


def test_mh_long_runs_use_multiple_makeups():
    # width > 2560+63 forces chained makeup codes in one run
    rows = np.zeros((1, 6000), np.uint8)
    rows[0, 5000:] = 1
    assert np.array_equal(mh_decode(mh_encode(rows), 6000, 1), rows)


def test_g4_vertical_modes():
    # diagonal edge drifting ±1 px per row: pure V-code coding
    width = 64
    rows = np.zeros((10, width), np.uint8)
    for y in range(10):
        rows[y, 20 + y :] = 1
    enc = g4_encode(rows)
    assert np.array_equal(g4_decode(enc, width, 10), rows)


def test_g4_pass_and_horizontal_modes():
    width = 80
    rows = np.zeros((4, width), np.uint8)
    rows[0, 10:30] = 1          # run that disappears (pass mode below)
    rows[1, 50:60] = 1          # far jump → horizontal mode
    rows[2, 5:6] = 1
    rows[2, 70:75] = 1
    # row 3 all white
    enc = g4_encode(rows)
    assert np.array_equal(g4_decode(enc, width, 4), rows)


def test_g4_first_pixel_black():
    rows = np.ones((3, 40), np.uint8)
    rows[1, :20] = 0
    enc = g4_encode(rows)
    assert np.array_equal(g4_decode(enc, 40, 3), rows)


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 120),
    h=st.integers(1, 12),
    seed=st.integers(0, 2**31),
    density=st.sampled_from([0.05, 0.3, 0.5, 0.9]),
)
def test_g4_roundtrip_property(w, h, seed, density):
    rng = np.random.default_rng(seed)
    rows = (rng.random((h, w)) < density).astype(np.uint8)
    assert np.array_equal(g4_decode(g4_encode(rows), w, h), rows)


@settings(max_examples=25, deadline=None)
@given(w=st.integers(1, 200), h=st.integers(1, 8), seed=st.integers(0, 2**31))
def test_mh_roundtrip_property(w, h, seed):
    rng = np.random.default_rng(seed)
    rows = (rng.random((h, w)) < 0.4).astype(np.uint8)
    assert np.array_equal(mh_decode(mh_encode(rows), w, h), rows)


def test_truncation_is_typed():
    rows = (RNG.random((6, 100)) < 0.5).astype(np.uint8)
    enc = g4_encode(rows)
    with pytest.raises(ValueError):
        g4_decode(enc[: len(enc) // 3], 100, 6)
