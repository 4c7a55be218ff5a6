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

from sensordatapipelines_spark.errors import DataIOError


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
    inside each row group. The Morton key itself is not persisted.

    Cell indices are rebased to a non-negative origin (per-write min — one
    tiny driver-side aggregate that becomes plan literals) and ``bits`` is
    sized from the ACTUAL index range, so real-world coordinates (negative
    west/south of 0, ranges far beyond 2^8 cells) never wrap mod 2^bits or
    violate the interleave's non-negative precondition; the caller's
    ``bits`` is only a floor. Keys stay within a long (bits capped at 31)."""
    import math

    from pyspark.sql import functions as F

    from sensordatapipelines_spark.operators.spatial import morton_key_expr

    ix = F.floor(F.col(lon_col) / F.lit(cell_size))
    iy = F.floor(F.col(lat_col) / F.lit(cell_size))
    # floor(x / cell) is monotonic in x, so the index range follows from the
    # raw coordinate min/max — an aggregate parquet footer stats can answer.
    mn_lon, mx_lon, mn_lat, mx_lat = df.agg(
        F.min(lon_col), F.max(lon_col), F.min(lat_col), F.max(lat_col)
    ).first()
    lo_x = math.floor((mn_lon or 0.0) / cell_size)
    lo_y = math.floor((mn_lat or 0.0) / cell_size)
    span = max(
        math.floor((mx_lon or 0.0) / cell_size) - lo_x,
        math.floor((mx_lat or 0.0) / cell_size) - lo_y,
        1,
    )
    bits = min(max(bits, math.ceil(math.log2(span + 1))), 31)
    key = morton_key_expr(ix - F.lit(lo_x), iy - F.lit(lo_y), bits=bits)
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
    target_files: int | None = None,
    fmt: str = "parquet",
    target_bytes: int = 128 << 20,
) -> None:
    """Small-files compaction: rewrite a directory into ``target_files``
    balanced files — or, when ``target_files`` is None, into
    ``ceil(total_data_bytes / target_bytes)`` files (default 128 MB, the
    HDFS-block-sized sweet spot where one file ≈ one task ≈ one scan
    split). The operational fix for streaming/micro-batch sinks that
    accumulate thousands of tiny files (each file costs a task + a footer
    read at every scan; at 100 TB the metadata walk alone dominates).

    Crash safety (LOCAL FILESYSTEM ONLY — the sibling temp/old dirs live
    next to ``path``, so this helper targets local paths; on an object
    store use a table format's atomic commit instead): the compacted copy
    is written to a sibling temp dir, the original is RENAMED aside (atomic
    on a local fs), the new dir is moved into place, and only then is the
    old copy deleted. A crash at any step leaves at least one complete copy
    on disk: before the rename the original is untouched; between rename
    and move the data survives intact at ``<path>.__compact_old__``
    (documented recovery: rename it back)."""
    import shutil

    tmp = path.rstrip("/") + ".__compact_tmp__"
    old = path.rstrip("/") + ".__compact_old__"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    df = spark.read.format(fmt).load(path)
    if target_files is None:
        import math
        import os
        from urllib.parse import unquote, urlparse

        total = 0
        unmeasurable = []
        for f in df.inputFiles():
            # inputFiles() returns URIs; 'file:/p', 'file:///p' and bare
            # paths all occur — parse properly instead of slicing a fixed
            # prefix length (which breaks on single-slash URIs).
            parsed = urlparse(f)
            if parsed.scheme in ("", "file"):
                local = unquote(parsed.path) or f
            else:
                unmeasurable.append(f)
                continue
            try:
                total += os.path.getsize(local)
            except OSError:
                unmeasurable.append(f)
        if unmeasurable or total == 0:
            # Refusing beats silently compacting everything into ONE file
            # because the sizes could not be read (the old behavior).
            raise DataIOError(
                "compact_dir: cannot size "
                f"{len(unmeasurable) or 'any'} input file(s) "
                f"(first: {unmeasurable[0] if unmeasurable else path!r}); "
                "pass target_files explicitly"
            )
        target_files = max(1, math.ceil(total / max(1, int(target_bytes))))
    df.repartition(target_files).write.format(fmt).mode("overwrite").save(tmp)
    shutil.move(path, old)
    shutil.move(tmp, path)
    shutil.rmtree(old)
