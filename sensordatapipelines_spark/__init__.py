"""sensordatapipelines_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first reimplementation of the *capabilities* of the
reference library ``scapulomancy/SensorDataPipelines`` (a single-process
pandas/geopandas sensor-data pipeline, see ``/root/reference/src/data_preprocessing.py``),
extended with large-scale LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) and Structured Streaming.

Design stance (SURVEY.md §7):

- Declarative DataFrame/SQL plans; Catalyst picks physical strategy.
- Geometry as lon/lat double columns (point sensors + circular buffers),
  with WKB as the upgrade path; CRS tracked explicitly by the engine.
- No row-at-a-time Python in hot paths: builtin ``pyspark.sql.functions``
  everywhere, Arrow-batched ``mapInPandas`` only where a fitted model must
  run (kriging).
- The reference's ``Pipeline`` (a reified, JSON-serializable logical plan;
  reference ``src/data_preprocessing.py:22-150``) becomes a lazy fold over
  DataFrame transforms backed by a name→operator registry.
"""

from sensordatapipelines_spark.errors import (
    ColumnException,
    DataIOError,
    MissingCRS,
    UnknownOperation,
    UnvalidatedPipeline,
)
from sensordatapipelines_spark.pipeline import OpSpec, Pipeline
from sensordatapipelines_spark.registry import get_operation, list_operations, register
from sensordatapipelines_spark.session import get_spark

# Importing the operator package populates the registry.
from sensordatapipelines_spark import operators as _operators  # noqa: E402,F401

__all__ = [
    "ColumnException",
    "DataIOError",
    "MissingCRS",
    "OpSpec",
    "Pipeline",
    "UnknownOperation",
    "UnvalidatedPipeline",
    "get_operation",
    "get_spark",
    "list_operations",
    "register",
]

__version__ = "0.1.0"
