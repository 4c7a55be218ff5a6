"""Sequential pattern mining: frequent ordered subsequences per actor.

Charter extension (SURVEY.md §2.7 — behavior analytics). The ordered
counterpart to ``market_basket_pairs``/``cooccurrence_edges``: support
counts ACTORS whose (time-ordered, capped) event sequence contains the
subsequence — the core of GSP/PrefixSpan-style mining (Srikant &
Agrawal 1996, public) restricted to short patterns, which is the shape
that matters for funnel discovery ("view > click > purchase emerges in
14% of users") and for curriculum/session analysis over training logs.

Reference parity: the reference's temporal analysis is per-row pandas
(``/root/reference/src/data_preprocessing.py:199``); this operator is
the scale path for the same "what orderings recur" question.

Scale shape: ONE keyed shuffle collects each actor's capped ordered
item list; subsequence candidates explode JVM-side from index
combinations (fan-out ≤ C(max_events, L) per actor — a CONSTANT, never
corpus-shaped); per-actor ``array_distinct`` before the explode makes
the final count a support count without a second dedup shuffle. The
cap is the skew knob AND the semantic contract (first ``max_events``
events per actor count), exactly like ``theil_sen_trend``'s
``max_points``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sensordatapipelines_spark.registry import register


def _subseq_expr(xs: str, length: int, sep: str) -> str:
    """SQL expression string: all index-ordered subsequences of ``length``
    (2 or 3) from array column ``xs``, joined with ``sep``. Built on
    ``sequence``/``element_at`` so the DuckDB oracle mirrors it with
    ``range``/list indexing verbatim."""
    n = f"size({xs})"
    if length == 2:
        return (
            f"flatten(transform(sequence(1, {n} - 1), i ->"
            f" transform(sequence(i + 1, {n}), j ->"
            f" concat(element_at({xs}, i), '{sep}', element_at({xs}, j)))))"
        )
    if length == 3:
        return (
            f"flatten(flatten(transform(sequence(1, {n} - 2), i ->"
            f" transform(sequence(i + 1, {n} - 1), j ->"
            f" transform(sequence(j + 1, {n}), k ->"
            f" concat(element_at({xs}, i), '{sep}', element_at({xs}, j),"
            f" '{sep}', element_at({xs}, k)))))))"
        )
    raise ValueError(f"subsequence length must be 2 or 3, got {length}")


@register("frequent_sequences")
def frequent_sequences(
    df: DataFrame,
    actor_col: str,
    ts_col: str,
    item_col: str,
    tiebreak_col: str,
    lengths: tuple[int, ...] = (2, 3),
    max_events: int = 12,
    min_support: int = 2,
    sep: str = ">",
) -> DataFrame:
    """Mine frequent ordered item subsequences → ``(seq, seq_len,
    support)`` where ``support`` = number of actors whose first
    ``max_events`` events (ordered by ``ts_col``, ties by
    ``tiebreak_col`` — fully deterministic) contain the subsequence.
    Subsequences need not be contiguous (the GSP semantics)."""
    for length in lengths:
        if length not in (2, 3):
            raise ValueError("only lengths 2 and 3 are supported")
    # Duplicate lengths would double-count support in the concat form
    # (each candidate would appear twice in one actor's combined array;
    # the old union form emitted duplicate ROWS with correct per-branch
    # support) — dedupe order-preservingly (ADVICE r9).
    lengths = tuple(dict.fromkeys(lengths))
    w = Window.partitionBy("__a").orderBy(
        F.col("__ts").asc_nulls_last(), F.col("__tb").asc_nulls_last()
    )
    capped = (
        df.select(
            F.col(actor_col).alias("__a"),
            F.col(ts_col).alias("__ts"),
            F.col(item_col).cast("string").alias("__it"),
            F.col(tiebreak_col).alias("__tb"),
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.lit(int(max_events)))
    )
    lists = capped.groupBy("__a").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("__rn", "__it"))),
            lambda s: s["__it"],
        ).alias("__xs")
    )
    # ONE traversal for every length: tag each per-length distinct
    # candidate array with its length and explode the concatenation —
    # the per-actor window + collect_list pipeline and the support
    # aggregate's exchange run once instead of once per length (the
    # union-of-branches form re-evaluated the list build per branch;
    # guide §2.4). Per-length ``array_distinct`` BEFORE the concat keeps
    # the original per-length support semantics bit-identically, and the
    # size guard (empty array when the list is shorter than the pattern)
    # replays the old ``size >= length`` row filter — ``explode`` drops
    # empty arrays.
    def _tag(L: int):
        # single-arg lambda on purpose: a two-parameter function makes
        # ``transform`` pass the ELEMENT INDEX as the second argument,
        # silently overriding a default-bound length
        return lambda s: F.struct(s.alias("seq"), F.lit(L).alias("len"))

    tagged = []
    for length in lengths:
        arr = F.array_distinct(
            F.when(
                F.size("__xs") >= length,
                F.expr(_subseq_expr("__xs", length, sep)),
            ).otherwise(F.array().cast("array<string>"))
        )
        tagged.append(F.transform(arr, _tag(length)))
    combined = tagged[0] if len(tagged) == 1 else F.concat(*tagged)
    subs = lists.select(F.explode(combined).alias("__p")).select(
        F.col("__p.seq").alias("seq"), F.col("__p.len").alias("seq_len")
    )
    return (
        subs.groupBy("seq", "seq_len")
        .agg(F.count(F.lit(1)).alias("support"))
        .select("seq", "seq_len", "support")
        .filter(F.col("support") >= F.lit(int(min_support)))
    )
