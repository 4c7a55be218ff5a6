"""Sinks (reference S5/S6).

Canonical sink is partitioned Parquet (``df.write.parquet``). The reference's
GeoJSON/Shapefile export (``/root/reference/src/data_preprocessing.py:126-128``
and the per-operator ``out_file`` params) survives as a small-result escape
hatch: GeoJSON written driver-side from collected rows — explicitly NOT the
scale path, mirroring SURVEY.md §2.2 S5.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    writer = df.write.format(fmt).mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Bucketed managed-table sink: pre-shuffles the data into ``n_buckets``
    hash buckets on ``bucket_cols`` at write time so that later equi-joins and
    aggregations on those keys run **without an Exchange** — the pay-once
    co-location strategy for repeatedly-joined 100 TB fact tables (asserted
    in ``tests/test_plans.py``). Bucketing requires ``saveAsTable`` (the
    bucket spec lives in the catalog, not the files)."""
    writer = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def write_geojson(
    df: DataFrame,
    path: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    max_rows: int = 100_000,
) -> None:
    """Point-feature GeoJSON export. Collects to the driver — guarded by
    ``max_rows`` because this is a small-result convenience, not a sink for
    distributed output (use ``write_table`` for that)."""
    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"GeoJSON export is a small-result escape hatch ({n} rows > {max_rows}); "
            "write parquet instead"
        )
    props_cols = [c for c in df.columns if c not in (lon_col, lat_col)]
    features = []
    for row in df.collect():
        features.append(
            {
                "type": "Feature",
                "geometry": {
                    "type": "Point",
                    "coordinates": [row[lon_col], row[lat_col]],
                },
                "properties": {c: row[c] for c in props_cols},
            }
        )
    Path(path).write_text(
        json.dumps({"type": "FeatureCollection", "features": features}, default=str)
    )
