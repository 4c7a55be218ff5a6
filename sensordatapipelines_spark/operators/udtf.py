"""Python UDTF surface (SURVEY.md §2.6 "UDF/UDAF/UDTF surface").

The reference's whole extension model is "any Python callable of the right
shape" (``/root/reference/README.md:16-20``; enforced at
``/root/reference/src/data_preprocessing.py:110-111``). Scalar callables map
to pandas UDFs and series→scalar aggregates to the GROUPED_AGG escape hatch
(``operators/aggregates.py``); this module covers the third leg — a
table-valued row→rows generator exposed through Spark's native Python UDTF
API and consumed via LATERAL join.

Slow path by design: set-returning logic that CAN be an ``explode()`` of an
array expression should be (stays in whole-stage codegen); the UDTF is the
escape hatch for generators with genuine Python logic. At scale the UDTF
runs partition-parallel with no shuffle of its own — cost is the Python
boundary, not the plan shape.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="word string, wlen int")
class WordExplode:
    """One output row per whitespace-delimited token: ``(word, wlen)``.

    Mirrors Python ``str.split()`` semantics (runs of whitespace collapse,
    leading/trailing whitespace ignored) — the oracle side reproduces this
    with ``regexp_split_to_array(text, '\\s+')`` + empty-token filter.
    """

    def eval(self, text: str):
        for w in (text or "").split():
            yield w, len(w)


def register_udtfs(spark: SparkSession) -> None:
    """Register the UDTF library on a session (idempotent)."""
    spark.udtf.register("word_explode", WordExplode)
