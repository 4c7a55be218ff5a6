"""Executor-side package shipping.

Python workers deserialize ``mapInPandas``/pandas-UDF closures by importing
this package — which fails whenever the driver's ``sys.path`` entry for the
repo isn't on the workers' ``PYTHONPATH`` (different cwd in local mode, and
*always* on a real cluster unless the wheel is pre-installed). The canonical
fix is to ship the package with the job: zip it once and ``addPyFile`` it —
idempotent, cheap (pure-Python package, a few tens of KB), and exactly what
``spark-submit --py-files`` would do.
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from pathlib import Path

from pyspark.sql import SparkSession

_SHIPPED: set[int] = set()


def ensure_shipped(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers."""
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    pkg_dir = Path(__file__).resolve().parent
    zip_path = Path(tempfile.gettempdir()) / f"sensordatapipelines_spark_{os.getpid()}.zip"
    if not zip_path.exists():
        with zipfile.ZipFile(zip_path, "w") as zf:
            for py in sorted(pkg_dir.rglob("*.py")):
                zf.write(py, arcname=str(py.relative_to(pkg_dir.parent)))
    spark.sparkContext.addPyFile(str(zip_path))
    _SHIPPED.add(key)
