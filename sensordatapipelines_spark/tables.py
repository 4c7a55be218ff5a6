"""Canonical loaders for the driver's test tables (TESTDATA.md).

One compatibility shim lives here: ``events.parquet`` stores
``TIMESTAMP(NANOS)`` which Spark's vectorized parquet reader rejects
(``PARQUET_TYPE_ILLEGAL``). We read nanos as int64
(``spark.sql.legacy.parquet.nanosAsLong`` — a runtime SQL conf) and convert
to a proper timestamp at microsecond precision via ``timestamp_micros`` —
an epoch→epoch mapping, independent of session timezone. Oracle-facing
queries compare timestamps at second granularity, so the ns→µs truncation is
not observable in correctness checks.
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
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
