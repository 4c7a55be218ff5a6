"""Mergeable summary sketches: count-min (heavy hitters) and KMV distinct.

Charter extension (SURVEY.md §2.7 — training-pipeline observability at
100 TB). Both sketches here are *mergeable, fixed-size aggregates*: the
whole point at scale is that each mapper folds its partition into a bounded
summary (``depth × width`` cells for CMS, ``k`` hashes per group for KMV)
and the shuffle moves summaries, not rows. Spark's partial aggregation
gives that for free once the sketch is expressed as a ``groupBy().agg()``:
the map side combines to at most one cell row per (row, cell) per task.

Determinism contract: every hash here is the engine-portable polynomial
rolling hash (``poly_hash_expr`` — pure int64 arithmetic, replicated in
DuckDB oracle SQL with ``list_reduce``), so the sketch *values* — not just
their error guarantees — are reproducible across engines and runs. A
production deployment would swap ``F.xxhash64`` in via the ``hasher``
parameter for better mixing; the shape of the plan is unchanged.

Reference parity: the reference engine has no sketches — its profiling is
exact pandas ``value_counts`` over in-memory frames
(/root/reference/src/data_preprocessing.py:199 row-at-a-time apply); these
operators are the scale path for the same "what is heavy / how many
distinct" questions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sensordatapipelines_spark.operators.text import POLY_MOD, poly_hash_expr
from sensordatapipelines_spark.operators.utility import canon_key_str
from sensordatapipelines_spark.registry import register

# Fixed hash rows for CMS: cell_j(h) = ((A[j]*h + B[j]) mod P) mod width.
# The multipliers MUST be large (~1e9-3.5e9): clustered key hashes (short
# digit ids span a few million values) only decorrelate across rows when
# A[j]*h wraps P thousands of times — a small odd multiplier is invertible
# mod a power-of-two width, so a mod-width collision would survive EVERY
# row and the min-fold would never repair it (measured: 926/1500 false
# positives with small A, 247 with these). Max product 3.5e9 × (2^31-1)
# ≈ 7.5e18 stays inside int64.
CMS_A = (
    1000000007,
    1500000001,
    1999999973,
    2147483629,
    2500000001,
    3000000019,
    3500000017,
)
CMS_B = (271, 541, 1087, 2161, 4327, 8647, 17293)


def _cms_cell(h: Column, j: int, width: int) -> Column:
    return ((F.lit(CMS_A[j]) * h + F.lit(CMS_B[j])) % F.lit(POLY_MOD)) % F.lit(width)


def uniform_poly_hash_expr(text: Column) -> Column:
    """Poly hash scrambled to near-uniform over [0, P): ``(A·h + B) mod P``
    with the same large-multiplier reasoning as ``CMS_A`` — raw poly hashes
    of short keys sit in a narrow band, which is fine for equality joins
    but fatal for order-statistic estimators (KMV's ``(k-1)·M/h_k`` read
    9038 for a true 5000 on the raw hash, 4385 after the scramble)."""
    return (F.lit(CMS_A[0]) * poly_hash_expr(text) + F.lit(CMS_B[0])) % F.lit(POLY_MOD)


@register("cms_sketch")
def cms_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
    hasher: Callable[[Column], Column] = poly_hash_expr,
) -> DataFrame:
    """Build a count-min sketch over ``key_col``: ``depth × width`` cells,
    ``cnt`` = total weight of keys hashing into the cell.

    100 TB shape: one ``groupBy(j, cell).sum`` — the explode multiplies rows
    by ``depth`` but map-side partial aggregation caps each task's shuffle
    output at ``depth × width`` rows regardless of input size, and sketches
    from different days/sources merge by adding cells (the CMS guarantee is
    preserved under +). No key ever crosses the wire.
    """
    if depth > len(CMS_A):
        raise ValueError(f"depth <= {len(CMS_A)} supported, got {depth}")
    h = hasher(canon_key_str(df, key_col))
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    cells = F.array(*[
        F.struct(F.lit(j).alias("j"), _cms_cell(h, j, width).alias("cell"))
        for j in range(depth)
    ])
    return (
        df.select(F.explode(cells).alias("jc"), w.alias("__w"))
        .groupBy(F.col("jc.j").alias("j"), F.col("jc.cell").alias("cell"))
        .agg(F.sum("__w").alias("cnt"))
    )


@register("cms_estimate")
def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    hasher: Callable[[Column], Column] = poly_hash_expr,
) -> DataFrame:
    """Point-estimate counts for a candidate-key frame against a built
    sketch: est(key) = min over the ``depth`` cells the key hashes into
    (the classic CMS upper-bound estimate — never under, over only on
    collision).

    The ``depth``/``width``/``hasher`` MUST match the ones the sketch was
    built with. Join shape: candidates explode to ``depth`` rows and
    equi-join the (tiny, ≤ depth×width-row) sketch — Spark broadcasts the
    sketch side; the min-fold is a key-local groupBy.
    """
    h = hasher(canon_key_str(keys, key_col))
    cells = F.array(*[
        F.struct(F.lit(j).alias("j"), _cms_cell(h, j, width).alias("cell"))
        for j in range(depth)
    ])
    exploded = keys.select(F.col(key_col), F.explode(cells).alias("jc")).select(
        key_col, F.col("jc.j").alias("j"), F.col("jc.cell").alias("cell")
    )
    return (
        exploded.join(F.broadcast(sketch), ["j", "cell"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


@register("cms_heavy_hitters")
def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold: int,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
    candidates: DataFrame | None = None,
    hasher: Callable[[Column], Column] = poly_hash_expr,
) -> DataFrame:
    """Keys whose CMS estimate meets ``threshold``, with the estimate.

    ``candidates`` defaults to ``df``'s distinct keys — fine up to the
    cardinality a distinct can carry. At 100 TB pass an explicit candidate
    frame (e.g. per-partition local top-k, or yesterday's heavy set): CMS's
    value is that the *sketch build* never shuffles keys, so candidates can
    be screened against it for the cost of a broadcast join. Estimates are
    upper bounds: the result may include false positives near the
    threshold, never false negatives (ε·N overestimate with ε = e/width).
    """
    sk = cms_sketch(df, key_col, depth, width, weight_col, hasher)
    cand = candidates if candidates is not None else df.select(key_col).distinct()
    est = cms_estimate(sk, cand, key_col, depth, width, hasher)
    return est.filter(F.col("est") >= F.lit(threshold))


@register("kmv_distinct")
def kmv_distinct(
    df: DataFrame,
    key_col: str,
    k: int = 64,
    group_by: str | None = None,
    hasher: Callable[[Column], Column] = uniform_poly_hash_expr,
) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch, optionally per group:
    keep the ``k`` smallest distinct hash values; if fewer than ``k``
    distinct hashes exist the count is exact, else estimate
    ``(k-1) * M / h_k`` with ``h_k`` the k-th smallest hash and ``M`` the
    hash modulus.

    Output: one row per group — ``n_kept`` (≤ k), ``kth_hash`` (null when
    exact), ``est_distinct`` (double).

    100 TB shape: the distinct-hash dedup and the top-k window both key on
    the group, so the shuffle carries at most (distinct keys) rows and the
    state per group is k values — and KMV sketches merge (union the hash
    sets, re-take the k smallest), so per-source/per-day sketches roll up
    without touching raw data. KMV and the portable ``hll_sketch`` below
    are both strictly replayable in oracle SQL; the Datasketches gate
    (``events_hll_mergeable``) keeps the built-in, engine-opaque path
    honest alongside them.
    """
    g = F.col(group_by) if group_by else F.lit("__all__")
    hashed = df.select(
        g.alias("grp"), hasher(canon_key_str(df, key_col)).alias("h")
    ).distinct()
    w = Window.partitionBy("grp").orderBy(F.col("h").asc_nulls_last())
    topk = hashed.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    return topk.groupBy("grp").agg(
        F.count("*").alias("n_kept"),
        F.when(F.count("*") == k, F.max("h")).alias("kth_hash"),
        F.when(
            F.count("*") == k,
            (F.lit(float(k - 1)) * F.lit(float(POLY_MOD))) / F.max("h").cast("double"),
        )
        .otherwise(F.count("*").cast("double"))
        .alias("est_distinct"),
    )


@register("kmv_intersect_pairs")
def kmv_intersect_pairs(
    df: DataFrame,
    key_col: str,
    k: int = 64,
    group_by: str = "grp",
    hasher: Callable[[Column], Column] = uniform_poly_hash_expr,
) -> DataFrame:
    """Pairwise distinct-set overlap between every two groups, estimated
    ON THE SKETCHES: each group keeps its k smallest distinct hashes
    (the KMV sketch), then every pair (a < b) merges the two k-sets,
    re-takes the k smallest, and estimates ``|A ∪ B|`` via the KMV
    formula and ``|A ∩ B| = ρ·|A ∪ B|`` with ρ the fraction of the
    merged k-set present in both sides (Beyer et al.'s KMV set
    algebra). When the merged set holds fewer than k distinct hashes
    everything degenerates to EXACT counts.

    100 TB shape: the raw data is touched once (per-group distinct +
    top-k window — the ``kmv_distinct`` scan); the G² pair stage runs
    entirely on G×k sketch rows, so comparing every pair of sources/
    days/shards costs nothing no matter how big the underlying corpus.

    Output per pair: ``(grp_a, grp_b, n_kept, n_common, est_union,
    est_intersection)``.
    """
    hashed = df.select(
        F.col(group_by).alias("grp"),
        hasher(canon_key_str(df, key_col)).alias("h"),
    ).distinct()
    wg = Window.partitionBy("grp").orderBy(F.col("h").asc_nulls_last())
    topk = (
        hashed.withColumn("rn", F.row_number().over(wg))
        .filter(F.col("rn") <= k)
        .select("grp", "h")
    )
    groups = topk.select("grp").distinct()
    pairs = (
        groups.select(F.col("grp").alias("grp_a"))
        .join(groups.select(F.col("grp").alias("grp_b")))
        .filter(F.col("grp_a") < F.col("grp_b"))
    )
    tag_a = pairs.join(
        topk.withColumnRenamed("grp", "grp_a"), "grp_a"
    ).select("grp_a", "grp_b", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    tag_b = pairs.join(
        topk.withColumnRenamed("grp", "grp_b"), "grp_b"
    ).select("grp_a", "grp_b", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    merged = (
        tag_a.unionByName(tag_b)
        .groupBy("grp_a", "grp_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    wp = Window.partitionBy("grp_a", "grp_b").orderBy(F.col("h").asc_nulls_last())
    kept = merged.withColumn("rn", F.row_number().over(wp)).filter(F.col("rn") <= k)
    agg = kept.groupBy("grp_a", "grp_b").agg(
        F.count("*").alias("n_kept"),
        F.sum((F.col("in_a") + F.col("in_b") == 2).cast("long")).alias("n_common"),
        F.max("h").alias("__hk"),
    )
    at_k = F.col("n_kept") == k
    est_union = F.when(
        at_k,
        (F.lit(float(k - 1)) * F.lit(float(POLY_MOD))) / F.col("__hk").cast("double"),
    ).otherwise(F.col("n_kept").cast("double"))
    return agg.select(
        "grp_a",
        "grp_b",
        "n_kept",
        "n_common",
        (F.round((est_union) * F.lit(1e6)) / F.lit(1e6)).alias("est_union"),
        (F.round((F.when(
                at_k,
                (F.col("n_common").cast("double") * est_union) / F.lit(float(k)),
            ).otherwise(F.col("n_common").cast("double"))) * F.lit(1e6)) / F.lit(1e6)).alias("est_intersection"),
    )


# ---------------------------------------------------------------------------
# Portable HyperLogLog: register-level, strictly oracle-replayable.
# The Datasketches-backed gate (events_hll_mergeable) proves the built-in
# path; this one makes the REGISTERS the contract — max-mergeable rows a
# DuckDB oracle (or any engine) reproduces bit-for-bit, the same
# determinism promise as the CMS/KMV sketches above. Flajolet et al. 2007
# (public); rho uses TRAILING zeros of the post-register bits — same
# distribution as leading zeros under a uniform hash, and exactly
# computable with integer indicator sums (no libm, no float).
# ---------------------------------------------------------------------------


def hll_alpha(m: int) -> float:
    """The standard HLL bias constant for m >= 128 registers."""
    return 0.7213 / (1.0 + 1.079 / m)


@register("hll_sketch")
def hll_sketch(
    df: DataFrame,
    key_col: str,
    p: int = 8,
    group_by: str | None = None,
    hasher: Callable[[Column], Column] = uniform_poly_hash_expr,
) -> DataFrame:
    """Build per-group HLL registers: ``(grp, register, rho)`` with
    ``register`` = low ``p`` hash bits and ``rho`` = 1 + trailing zeros
    of the remaining 31-p bits (all-zero rest saturates naturally at
    ``31 - p + 1`` — no special case).

    100 TB shape: one map-side-combined ``groupBy().max()`` — each task
    emits at most ``2^p`` rows per group regardless of input size, and
    sketches from different days/sources merge by ``MAX(rho)`` per
    register (the HLL guarantee is preserved under max). The hash column
    is staged ONCE as a projected column: the 23 trailing-zero indicator
    terms each reference it, and a multi-referenced non-trivial alias
    blocks CollapseProject from re-inlining the hash fold per term.
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    rest_bits = 31 - p  # uniform_poly_hash_expr yields h in [0, 2^31 - 1)
    g = F.col(group_by) if group_by else F.lit("__all__")
    # NULL keys carry no distinct value: dropped (a NULL hash would ride
    # as a NULL register with engine-dependent rho arithmetic)
    staged = df.filter(F.col(key_col).isNotNull()).select(
        g.alias("grp"), hasher(canon_key_str(df, key_col)).alias("__h")
    )
    rest = F.shiftright(F.col("__h"), p)
    rho = F.lit(1)
    for t in range(1, rest_bits + 1):
        rho = rho + (rest % F.lit(1 << t) == 0).cast("int")
    return (
        staged.withColumn("register", F.col("__h").bitwiseAND(F.lit(m - 1)))
        .withColumn("rho", rho)
        .groupBy("grp", "register")
        .agg(F.max("rho").alias("rho"))
    )


@register("hll_merge")
def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union per-source/per-day register tables into one sketch:
    ``MAX(rho)`` per (grp, register). Rows in, rows out — raw data is
    never revisited, the whole point of a mergeable summary."""
    if not sketches:
        raise ValueError("hll_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("grp", "register").agg(F.max("rho").alias("rho"))


@register("hll_estimate")
def hll_estimate(sketch: DataFrame, p: int = 8) -> DataFrame:
    """Estimate distinct counts from a register table: per group emit
    ``n_registers`` (non-empty), ``z_num`` — the EXACT integer harmonic
    numerator ``sum(2^(RMAX - rho)) + empty * 2^RMAX`` with
    ``RMAX = 31 - p + 1`` (so ``Z = z_num / 2^RMAX``) — and ``est_raw =
    alpha * m^2 / Z``, computed as ONE division of a Python-literal
    numerator by the exact integer: bit-identical across engines, no
    accumulation-order float hazard. The small-range linear-counting
    correction needs ``ln`` (not cross-engine bit-stable); callers apply
    it from ``n_registers`` when they want it — the raw estimate and its
    exact inputs are the contract here.
    """
    m = 1 << p
    rmax = 31 - p + 1
    numerator = hll_alpha(m) * m * m * float(1 << rmax)
    pow2 = F.array(*[F.lit(1 << k) for k in range(rmax + 1)])
    term = F.element_at(pow2, (F.lit(rmax) - F.col("rho")) + 1).cast("long")
    return (
        sketch.withColumn("__t", term)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_registers"),
            F.sum("__t").alias("__sum_t"),
        )
        .select(
            "grp",
            "n_registers",
            (
                F.col("__sum_t")
                + (F.lit(m) - F.col("n_registers")) * F.lit(1 << rmax)
            ).alias("z_num"),
            (
                F.lit(numerator)
                / (
                    F.col("__sum_t")
                    + (F.lit(m) - F.col("n_registers")) * F.lit(1 << rmax)
                ).cast("double")
            ).alias("est_raw"),
        )
    )


@register("histogram_quantiles")
def histogram_quantiles(
    df: DataFrame,
    key_col: str,
    value_col: str,
    scale: int = 1,
    qs: tuple = (25, 50, 75, 90),
) -> DataFrame:
    """MERGEABLE exact-histogram quantiles for integer-valued columns →
    per key one row per requested percentile ``(key, q, value_at_q,
    n_rows)``. The state is the (value → count) histogram — a fixed-size
    mergeable aggregate whenever the value domain is bounded (quantities,
    ratings, ages, bucketed prices), so partial histograms combine
    map-side and quantiles come from one cumulative pass over the TINY
    histogram, never a sort of the fact table. ``value_at_q`` is the
    standard inverted-CDF (type-1) quantile: the smallest value whose
    cumulative count reaches ceil(q·n/100) — all-integer, no
    interpolation, bit-exact cross-engine."""
    vc = F.col(value_col).cast("double")
    v = F.when(vc.isNull() | F.isnan(vc), F.lit(None).cast("long")).otherwise(
        F.round(vc * F.lit(float(scale))).cast("long")
    )
    hist = (
        df.select(F.col(key_col).alias("key"), v.alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy("key", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("key").orderBy(F.asc_nulls_last("v")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = Window.partitionBy("key")
    cum = hist.withColumn("cum", F.sum("c").over(w)).withColumn(
        "n_rows", F.sum("c").over(tot)
    )
    qlit = F.explode(F.array(*[F.lit(int(q)) for q in qs])).alias("q")
    marked = cum.select("key", "v", "cum", "n_rows", qlit).filter(
        # smallest v with cum >= ceil(q*n/100) — exact integer ceil in BOTH
        # engines ((q*n + 99) DIV 100); a float division here could round a
        # hair above/below the exact threshold and flip the selected value
        F.col("cum") >= F.expr("(q * n_rows + 99) DIV 100")
    )
    return (
        marked.groupBy("key", "q", "n_rows")
        .agg(F.min("v").alias("value_at_q"))
        .select("key", F.col("q").cast("long").alias("q"), "value_at_q", "n_rows")
    )
