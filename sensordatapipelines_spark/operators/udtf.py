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
import re

from pyspark.sql.functions import udtf

#: the engine's explicit ASCII whitespace class (see operators/text.py)
_WS_RE = re.compile("[ \t\n\x0b\f\r]+")


# useArrow: batches cross the Python boundary as Arrow instead of pickled
# rows (guide §4.3; eval is still called per row — a UDTF property, §4.1).
# Return values are exact (str, int) matches for the declared schema, so
# the Arrow path's stricter coercion changes nothing. This removes the
# suite's last BatchEvalPython node (PLAN_AUDIT r10: 1 → 0 outside Arrow).
@udtf(returnType="word string, wlen int", useArrow=True)
class WordExplode:
    """One output row per whitespace-delimited token: ``(word, wlen)``.

    Tokenizes on the ENGINE'S explicit ASCII whitespace class (runs
    collapse, edge whitespace ignored) — Python ``str.split()`` would
    also split Unicode whitespace (U+2028, NBSP, ideographic space...)
    that neither the Spark expression tokenizer nor the RE2 oracle
    splits, silently diverging on such content.
    """

    def eval(self, text: str):
        for w in _WS_RE.split((text or "").strip(" ")):
            if w:
                yield w, len(w)


def register_udtfs(spark: SparkSession) -> None:
    """Register the UDTF library on a session (idempotent)."""
    spark.udtf.register("word_explode", WordExplode)
