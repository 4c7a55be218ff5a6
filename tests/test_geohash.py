"""Geohash encode/decode: canonical vectors, clamping, inverse property."""

import pytest
from pyspark.sql import functions as F

from sensordatapipelines_spark.operators.geohash import (
    geohash_decode,
    geohash_encode,
)

# Canonical published test vectors (Wikipedia / original geohash.org).
VECTORS = [
    (10.40744, 57.64911, "u4pruydqqvj"),
    (-5.6, 42.6, "ezs42e44yx9"),
    (0.0, 0.0, "s0000000000"),
    (-74.0060, 40.7128, "dr5regw3ppy"),
    (139.6917, 35.6895, "xn774c06kt1"),
]


def test_known_vectors(spark):
    df = spark.createDataFrame(
        [(lon, lat) for lon, lat, _ in VECTORS], "lon double, lat double"
    )
    got = [r.geohash for r in geohash_encode(df, precision=11).collect()]
    assert got == [g for _, _, g in VECTORS]


def test_prefix_is_coarser_cell(spark):
    df = spark.createDataFrame([(10.40744, 57.64911)], "lon double, lat double")
    for p in (1, 3, 5, 8):
        got = geohash_encode(df, precision=p).collect()[0].geohash
        assert got == "u4pruydqqvj"[:p]


def test_domain_bounds_clamp(spark):
    df = spark.createDataFrame(
        [(180.0, 90.0), (-180.0, -90.0)], "lon double, lat double"
    )
    got = [r.geohash for r in geohash_encode(df, precision=5).collect()]
    assert got == ["zzzzz", "00000"]


def test_out_of_range_coords_clamp_to_boundary_cells(spark):
    """Coordinates past either edge clamp to the boundary cell instead of
    quantizing to negative (invalid) axis bits."""
    df = spark.createDataFrame(
        [(-180.5, 0.0), (0.0, -90.5), (181.0, 91.0), (-999.0, -999.0)],
        "lon double, lat double",
    )
    got = [r.geohash for r in geohash_encode(df, precision=5).collect()]
    ref = [
        r.geohash
        for r in geohash_encode(
            spark.createDataFrame(
                [(-180.0, 0.0), (0.0, -90.0), (180.0, 90.0), (-180.0, -90.0)],
                "lon double, lat double",
            ),
            precision=5,
        ).collect()
    ]
    assert got == ref


def test_decode_center_reencodes_identically(spark):
    # Cell-center decode must be a right inverse of encode at the same
    # precision, for a spread of precisions (odd and even bit totals).
    df = spark.createDataFrame(
        [(lon, lat) for lon, lat, _ in VECTORS] + [(179.9, -89.9), (-0.001, 0.001)],
        "lon double, lat double",
    )
    for p in (2, 5, 6, 7):
        rt = geohash_decode(geohash_encode(df, precision=p))
        chk = geohash_encode(
            rt, lon_col="cell_lon", lat_col="cell_lat", precision=p, out_col="gh2"
        )
        # Compare collected values: a FILTER on gh2 would get pushed through
        # the staged ladder projections and re-inlined exponentially by
        # PushPredicateThroughNonJoin.trimAliases (see module docstring).
        for r in chk.collect():
            assert r.geohash == r.gh2, f"precision {p}: decode center left its cell"


def test_decode_mixed_precision_column(spark):
    df = spark.createDataFrame(
        [("u4pruy",), ("ezs42",), ("d",)], "geohash string"
    )
    out = {r.geohash: (r.cell_lon, r.cell_lat) for r in geohash_decode(df).collect()}
    assert abs(out["u4pruy"][0] - 10.40744) < 0.011
    assert abs(out["u4pruy"][1] - 57.64911) < 0.006
    assert abs(out["ezs42"][0] - -5.6) < 0.05
    # single char 'd': lon cell [-90, -45), lat cell [0, 45)
    assert out["d"] == (-67.5, 22.5)


def test_registry_and_bad_precision(spark):
    from sensordatapipelines_spark.registry import get_operation

    assert get_operation("geohash_encode") is geohash_encode
    assert get_operation("geohash_decode") is geohash_decode
    df = spark.createDataFrame([(0.0, 0.0)], "lon double, lat double")
    with pytest.raises(ValueError):
        geohash_encode(df, precision=13)


def test_probe_cells_nine_neighbors_and_wrap(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0), (179.99, 0.0), (0.0, 89.99)], "lon double, lat double"
    )
    from sensordatapipelines_spark.operators.geohash import geohash_probe_cells

    out = geohash_probe_cells(df, precision=3)
    by_pt = {}
    for r in out.collect():
        by_pt.setdefault((r.lon, r.lat), set()).add(r.geohash)
    # interior point: 9 distinct cells, own cell included
    assert len(by_pt[(0.0, 0.0)]) == 9
    assert "s00" in by_pt[(0.0, 0.0)]
    # antimeridian: still 9 (longitude wraps)
    assert len(by_pt[(179.99, 0.0)]) == 9
    assert any(g.startswith("x") or g.startswith("8") for g in by_pt[(179.99, 0.0)])
    # near north pole: top row clamps away -> 6
    assert len(by_pt[(0.0, 89.99)]) == 6


def test_probe_cells_cover_radius_join(spark):
    # Every point within one cell-span of a center must share a probe cell
    # with it (the candidate-completeness contract of the radius join).
    from sensordatapipelines_spark.operators.geohash import (
        geohash_encode,
        geohash_probe_cells,
    )

    import itertools
    center = [(10.0, 45.0)]
    span_lon, span_lat = 360.0 / (1 << 8), 180.0 / (1 << 7)  # precision 3
    pts = [
        (10.0 + fx * span_lon, 45.0 + fy * span_lat)
        for fx, fy in itertools.product((-0.9, -0.3, 0.0, 0.4, 0.9), repeat=2)
    ]
    probe = {
        r.geohash
        for r in geohash_probe_cells(
            spark.createDataFrame(center, "lon double, lat double"), precision=3
        ).collect()
    }
    enc = geohash_encode(
        spark.createDataFrame(pts, "lon double, lat double"), precision=3
    ).collect()
    for r in enc:
        assert r.geohash in probe, (r.lon, r.lat, r.geohash)
