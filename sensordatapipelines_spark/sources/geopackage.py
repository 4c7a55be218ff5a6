"""GeoPackage (.gpkg) ingestion via the python stdlib — no GDAL.

A GeoPackage is a SQLite database (OGC 12-128r19) whose feature tables
store geometry as a GeoPackageBinary (GPB) blob: an 8-byte header
(``GP`` magic, version, flags, srs_id) + optional envelope + standard
WKB. ``sqlite3`` ships with CPython and WKB decode already exists
(``parse_wkb_polygons``), so the reference's third vector format
(``gpd.read_file`` accepts .gpkg, ``/root/reference/src/
data_preprocessing.py:471-475``) closes with ~100 lines of glue.

Scale contract: the read is DRIVER-side (SQLite files are single-node by
nature — the same escape-hatch contract as the xlsx fallback reader and
the GeoJSON sink); the decoded layer lands in a distributed DataFrame and
everything downstream is the normal broadcast-dim zonal path. A layer too
big to collect should be exported to WKB parquet once and read natively.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession


def strip_gpb_header(blob: bytes) -> bytes:
    """GeoPackageBinary → the embedded standard WKB. Envelope size is
    keyed by flag bits 1-3 (0 none, 1 XY, 2 XYZ, 3 XYM, 4 XYZM)."""
    if len(blob) < 8 or blob[:2] != b"GP":
        raise ValueError("not a GeoPackageBinary blob")
    flags = blob[3]
    envelope_ind = (flags >> 1) & 0x07
    env_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}.get(envelope_ind)
    if env_len is None:
        raise ValueError(f"invalid GPB envelope indicator {envelope_ind}")
    return blob[8 + env_len :]


def wrap_gpb(wkb: bytes, srs_id: int = 4326) -> bytes:
    """Standard WKB → a minimal GPB blob (no envelope, little-endian) —
    the staging/export twin of ``strip_gpb_header``."""
    return b"GP" + bytes([0, 0x01]) + struct.pack("<i", srs_id) + wkb


def list_feature_tables(path: str) -> list[str]:
    """Feature-table names registered in ``gpkg_contents``."""
    import sqlite3

    con = sqlite3.connect(path)
    try:
        return [
            r[0]
            for r in con.execute(
                "SELECT table_name FROM gpkg_contents "
                "WHERE data_type = 'features' ORDER BY table_name"
            )
        ]
    finally:
        con.close()


def open_geopackage(
    spark: SparkSession,
    path: str,
    table: str | None = None,
    keep_holes: bool = False,
    max_rows: int = 1_000_000,
) -> DataFrame:
    """Read one feature table of a .gpkg into the engine's ring-format
    vector model — same output contract as ``open_geojson`` /
    ``open_shapefile``: one row per polygon part with ``fid``,
    ``properties`` (raw-text map), ``part``, outer ``xs``/``ys`` and,
    with ``keep_holes``, the full ``rings`` array. Geometry flows
    GPB → WKB → ``parse_wkb_polygons`` (the existing Arrow decode), so
    MultiPolygons and interior rings come for free.

    ``table`` defaults to the single feature table registered in
    ``gpkg_contents`` (ambiguity raises — list with
    ``list_feature_tables``). ``max_rows`` guards the driver-side SQLite
    read, the same contract as the GeoJSON sink's collect guard."""
    import sqlite3

    from sensordatapipelines_spark.operators.spatial import parse_wkb_polygons

    if table is None:
        tables = list_feature_tables(path)
        if len(tables) != 1:
            raise ValueError(
                f"gpkg has {len(tables)} feature tables {tables}; pass table="
            )
        table = tables[0]
    con = sqlite3.connect(path)
    try:
        (geom_col,) = con.execute(
            "SELECT column_name FROM gpkg_geometry_columns WHERE table_name = ?",
            (table,),
        ).fetchone()
        cur = con.execute(f'SELECT * FROM "{table}" LIMIT {int(max_rows) + 1}')
        names = [d[0] for d in cur.description]
        raw = cur.fetchall()
    finally:
        con.close()
    if len(raw) > max_rows:
        raise ValueError(
            f"{table} exceeds max_rows={max_rows}; export to WKB parquet "
            "for the distributed path"
        )
    gi = names.index(geom_col)
    attr_names = [n for i, n in enumerate(names) if i != gi]
    rows = []
    for fid, r in enumerate(raw):
        props = {
            n: (None if r[i] is None else str(r[i]))
            for i, n in zip(
                (i for i in range(len(names)) if i != gi), attr_names
            )
        }
        wkb = strip_gpb_header(bytes(r[gi])) if r[gi] is not None else None
        rows.append((fid, props, bytearray(wkb) if wkb else None))
    df = spark.createDataFrame(
        rows, "fid long, properties map<string,string>, geometry binary"
    )
    out = parse_wkb_polygons(df, keep_holes=keep_holes)
    return out.filter(out["xs"].isNotNull())
