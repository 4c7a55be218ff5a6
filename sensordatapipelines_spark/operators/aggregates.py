"""Multi-function / multi-column aggregation with deterministic naming.

The reference accepts "any iterable→scalar callable" as an aggregation
function (``/root/reference/src/data_preprocessing.py:176-177``) and names the
output columns as the func-major cartesian product
``{func}_{source_stem}_{col}`` (``:195-197``, ``:224-226``, ``:263-265``;
SURVEY.md §2.5 U6). The engine supports the named builtin set declaratively
(JVM-side, whole-stage-codegen-able) and arbitrary callables only via a
GROUPED_AGG pandas UDF escape hatch — the documented slow path.

Null semantics: standard SQL null-skipping aggregates; the reference's
``fillna(0)``-before-agg (``:600``) is an explicit opt-in ``zero_fill`` here.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sensordatapipelines_spark.registry import register

# Named builtin aggregation functions → Column builders (JVM-side).
BUILTIN_AGGS: dict[str, Callable[[Column], Column]] = {
    "mean": F.mean,
    "avg": F.mean,
    "max": F.max,
    "min": F.min,
    "sum": F.sum,
    "count": F.count,
    "std": F.stddev_samp,
    "stddev": F.stddev_samp,
    "var": F.var_samp,
    "median": F.median,
    "first": F.first,
    "last": F.last,
}


def agg_func_name(func: str | Callable) -> str:
    return func if isinstance(func, str) else func.__name__


def stat_column_name(func: str | Callable, source: str, col: str) -> str:
    """``{func}_{source}_{col}`` — reference naming scheme (U6), func-major."""
    return f"{agg_func_name(func)}_{source}_{col}"


def build_agg_exprs(
    columns: Sequence[str],
    funcs: Sequence[str | Callable],
    source: str,
    zero_fill: bool = False,
) -> list[Column]:
    """Func-major product of aggregate expressions with reference naming.

    ``zero_fill`` applies ``coalesce(col, 0)`` *before* aggregating —
    the explicit version of the reference's ``fillna(0)`` in
    ``geometries_interesect`` (``:600``).
    """
    exprs: list[Column] = []
    for func in funcs:  # func-major order matches the reference's
        fname = agg_func_name(func)
        if isinstance(func, str):
            if func not in BUILTIN_AGGS:
                raise ValueError(
                    f"unknown aggregation {func!r}; builtin set: {sorted(BUILTIN_AGGS)}"
                )
            builder = BUILTIN_AGGS[func]
        elif callable(func):
            builder = _grouped_agg_udf(func)
        else:
            raise TypeError(f"aggregation must be a name or callable, got {func!r}")
        for col in columns:
            c = F.coalesce(F.col(col), F.lit(0.0)) if zero_fill else F.col(col)
            exprs.append(builder(c).alias(stat_column_name(fname, source, col)))
    return exprs


def grouped_aggregate(
    df,
    keys: Sequence[str],
    columns: Sequence[str],
    funcs: Sequence[str | Callable],
    source: str,
    zero_fill: bool = False,
):
    """``groupBy(keys).agg(...)`` supporting MIXED named-builtin and
    arbitrary-callable aggregation functions in one call (the reference's
    ``funcs=`` contract, ``:176-177``).

    Spark forbids GROUPED_AGG pandas UDFs alongside JVM aggregates in a
    single aggregation operator (``INVALID_PANDAS_UDF_PLACEMENT``), so the
    builder splits the function list into the two classes, runs each as its
    own aggregation over the same grouping, and equi-joins the results on
    the group keys — both aggregations shuffle on the same keys, so AQE
    plans the join without a third exchange. Output column order is the
    reference's func-major product (U6) regardless of the split."""
    keys = list(keys)
    builtin = [f for f in funcs if isinstance(f, str)]
    custom = [f for f in funcs if not isinstance(f, str)]
    parts = [
        df.groupBy(*keys).agg(*build_agg_exprs(columns, fs, source, zero_fill))
        for fs in (builtin, custom)
        if fs
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.join(p, keys)
    ordered = keys + [stat_column_name(f, source, c) for f in funcs for c in columns]
    return out.select(*ordered)


def _grouped_agg_udf(func: Callable):
    """Escape hatch for arbitrary series→scalar callables (reference
    ``:176-177``): Arrow-batched GROUPED_AGG pandas UDF. Slow path by design —
    prefer the named builtins, which stay in whole-stage codegen."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _udaf(s: pd.Series) -> float:
        return float(func(s))

    def builder(c: Column) -> Column:
        return _udaf(c)

    return builder


@register("weighted_percentile")
def weighted_percentile(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    q: float = 0.5,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Exact weighted percentile per group: the smallest value whose
    cumulative weight reaches ``q`` of the group's total — the
    token-weighted median/quantile a corpus report needs (an unweighted
    median over documents misstates what the TOKENS experience when long
    docs dominate).

    One window exchange on the group key (ordered cumulative weight, with
    an optional unique ``tiebreak_col`` making per-row order total), then
    a min-aggregate over the qualifying rows — two passes over the
    already-shuffled group, no self-join. Weights must be non-negative;
    zero-total groups are OMITTED from the output (no row emitted — a
    NULL percentile row would claim a quantile no weight supports)."""
    w = F.col(weight_col).cast("double")
    order = [F.col(value_col).asc_nulls_last()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc_nulls_last())
    win = (
        Window.partitionBy(group_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy(group_col)
    cum = df.withColumn("__cw", F.sum(w).over(win)).withColumn(
        "__tw", F.sum(w).over(tot)
    )
    hit = cum.filter(
        (F.col("__tw") > 0) & (F.col("__cw") >= F.lit(float(q)) * F.col("__tw"))
    )
    return hit.groupBy(F.col(group_col).alias(group_col)).agg(
        F.min(F.col(value_col)).alias(f"p{int(q * 100)}_weighted")
    )


@register("grouped_linregress")
def grouped_linregress(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    scale: float = 1e3,
    max_rows_per_group: int = 1_000_000,
) -> DataFrame:
    """Per-group ordinary-least-squares line: ``slope``, ``intercept``,
    ``r2`` and ``n`` from the five moment sums — the declarative
    regression every monitoring pipeline wants (trend per sensor/
    segment) without ever collecting a group.

    100 TB shape: ONE map-side-combined aggregate; the five sums are
    the whole shuffle payload per group. Determinism: x and y quantize
    to 1e-6-scaled BIGINTs per row (engine-identical rounding of
    identical doubles), the moment sums are exact integer sums
    (order-free), and every reported statistic is IEEE arithmetic on
    those exact sums — engine-identical even where not exact-rational.
    Degenerate groups (n < 2 or zero x-variance) emit NULL slope/
    intercept/r2.

    Overflow bound, now ENFORCED and ROW-BUDGETED (ADVICE r8): quantized
    values clamp to ±⌊√(9e18 / max_rows_per_group)⌋ (±3e6 at the default
    1e6-row budget), so every squared moment sum stays exact int64
    through the declared budget — and clamping is never silent: the
    ``n_clamped`` output column counts rows whose |round(v·scale)|
    exceeded the bound, so a degraded fit is detectable instead of
    quietly wrong. The clamp is part of the operator contract and every
    oracle mirrors it — without it, adversarial magnitudes silently wrap
    Spark's sums while DuckDB widens to HUGEINT (found by the round-8
    adversarial twin)."""
    import math

    qb_val = float(math.isqrt(int(9e18) // int(max_rows_per_group)))
    qb = F.lit(qb_val)

    def rq(col):
        c = F.col(col).cast("double")
        return F.when(
            c.isNull() | F.isnan(c), F.lit(None).cast("double")
        ).otherwise(F.round(c * F.lit(float(scale))))

    rx = rq(x_col)
    ry = rq(y_col)
    base = df.select(
        F.col(group_col), rx.alias("__rx"), ry.alias("__ry")
    ).filter(F.col("__rx").isNotNull() & F.col("__ry").isNotNull())
    clamp = lambda c: F.least(F.greatest(c, -qb), qb).cast("long")  # noqa: E731
    base = base.select(
        group_col,
        clamp(F.col("__rx")).alias("__x"),
        clamp(F.col("__ry")).alias("__y"),
        (
            (F.abs(F.col("__rx")) > qb) | (F.abs(F.col("__ry")) > qb)
        ).cast("long").alias("__cl"),
    )
    agg = base.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum("__cl").alias("n_clamped"),
    )
    nd = F.col("n").cast("double")
    s1 = float(scale)
    s2 = float(scale) * float(scale)
    sx = F.col("__sx").cast("double") / F.lit(s1)
    sy = F.col("__sy").cast("double") / F.lit(s1)
    sxx = F.col("__sxx").cast("double") / F.lit(s2)
    syy = F.col("__syy").cast("double") / F.lit(s2)
    sxy = F.col("__sxy").cast("double") / F.lit(s2)
    denx = nd * sxx - sx * sx
    deny = nd * syy - sy * sy
    num = nd * sxy - sx * sy
    slope = F.when((F.col("n") >= 2) & (denx > 0), num / denx)
    intercept = F.when(
        (F.col("n") >= 2) & (denx > 0), (sy - (num / denx) * sx) / nd
    )
    r2 = F.when(
        (F.col("n") >= 2) & (denx > 0) & (deny > 0),
        (num * num) / (denx * deny),
    )
    return agg.select(
        group_col,
        F.col("n").cast("long").alias("n"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
        F.col("n_clamped").cast("long").alias("n_clamped"),
    )
