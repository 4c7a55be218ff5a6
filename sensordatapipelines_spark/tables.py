"""Canonical loaders for the driver's test tables (TESTDATA.md).

One compatibility shim lives here: ``events.parquet``'s ``ts`` column has
shipped in two physical encodings across driver data generations, and the
engine normalizes BOTH to a session-timezone ``TIMESTAMP`` (instant) type:

- ``TIMESTAMP(NANOS)``: Spark's vectorized parquet reader rejects it
  (``PARQUET_TYPE_ILLEGAL``), so we read nanos as int64
  (``spark.sql.legacy.parquet.nanosAsLong``) and convert via
  ``timestamp_micros`` — an epoch→epoch mapping, timezone-independent.
- ``TIMESTAMP(MICROS, isAdjustedToUTC=false)``: loads as ``TIMESTAMP_NTZ``,
  which breaks ``withWatermark`` / ``unix_micros`` / long casts downstream.
  Cast to ``TIMESTAMP``: the session timezone is pinned to UTC everywhere
  (session.py), so the naive wall-clock is reinterpreted as the same UTC
  instant — value-preserving, and identical to what the DuckDB oracle sees.

Oracle-facing queries compare timestamps at second granularity, so the
ns→µs truncation in the first case is not observable in correctness checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table; normalizes the events timestamp column."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":  # nanosAsLong fired: ns since epoch
            # EXACT integer ns→µs: `/ 1000` would be a DOUBLE division, and
            # at epoch-ns magnitude (~1.7e18, ULP 256) the rounded quotient
            # can land one µs off — enough to flip a FLOOR-second near a
            # boundary and silently reorder (ts, tiebreak) streams vs the
            # oracle. `DIV` truncates in exact int64 arithmetic, matching
            # DuckDB's ns→µs truncation for post-epoch data.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_type == "timestamp_ntz":  # naive micros; session TZ is UTC
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
