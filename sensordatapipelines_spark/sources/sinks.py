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


def write_zordered(
    df: DataFrame,
    path: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    cell_size: float = 0.005,
    bits: int = 8,
    n_files: int | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Spatially-clustered parquet sink: range-partition + sort the rows by
    their Z-order (Morton) key before writing, so each file/row-group covers
    a compact spatial tile and its lon/lat min-max footer statistics become
    TIGHT. A later ``bbox_filter`` then skips most row groups at scan time —
    the write-side half of the engine's read-side pruning story (SCALE.md).

    ``repartitionByRange`` on the key gives globally ordered files (file k's
    key range precedes file k+1's); ``sortWithinPartitions`` orders rows
    inside each row group. The Morton key itself is not persisted."""
    from pyspark.sql import functions as F

    from sensordatapipelines_spark.operators.spatial import morton_key_expr

    key = morton_key_expr(
        F.floor(F.col(lon_col) / F.lit(cell_size)),
        F.floor(F.col(lat_col) / F.lit(cell_size)),
        bits=bits,
    )
    out = df.withColumn("__zkey", key)
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    (
        out.repartitionByRange(n, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.format(fmt)
        .mode(mode)
        .save(path)
    )


def compact_dir(
    spark,
    path: str,
    target_files: int,
    fmt: str = "parquet",
) -> None:
    """Small-files compaction: rewrite a directory into ``target_files``
    balanced files. The operational fix for streaming/micro-batch sinks that
    accumulate thousands of tiny files (each file costs a task + a footer
    read at every scan; at 100 TB the metadata walk alone dominates).
    Rewrites via a temp directory so a crash mid-compaction never leaves the
    source half-deleted."""
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="compact_")
    df = spark.read.format(fmt).load(path)
    df.repartition(target_files).write.format(fmt).mode("overwrite").save(tmp)
    shutil.rmtree(path)
    shutil.move(tmp, path)
