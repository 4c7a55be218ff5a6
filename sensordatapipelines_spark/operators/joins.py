"""Join operators beyond Catalyst's built-ins: as-of join, salted skew join.

- ``asof_join`` — the time-series linkage the reference approximates by
  joining readings to sensors by id (SURVEY.md §2.6 "as-of-like linkage of
  series to sensors"), generalized to the standard as-of semantics: for each
  left row, the most recent right row with ``right.ts <= left.ts`` per key.

  **Scale shape:** implemented as union + windowed last-non-null — a single
  shuffle on (key), NO range-join cross product. At 100 TB this is the only
  formulation that doesn't explode: a range join of two big fact tables is
  quadratic in the worst case, while this is O(n log n) within key partitions
  (sort inside the window). Skewed keys are handled by AQE; monotonic state
  is bounded by the window frame.

- ``salted_join`` — equi-join with key salting for heavy-hitter skew: the
  big side's key is salted with a random-ish (deterministic, hash-derived)
  suffix, and the small side is replicated ``salt`` times. Use when one key
  dominates (a single sensor/zone with a large share of rows) and AQE's
  skew-split isn't enough (e.g. the skew is in a broadcast-ineligible side).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sensordatapipelines_spark.registry import register


@register("asof_join")
def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = (),
    tolerance: int | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join: attach to each left row the latest right row with
    ``right_ts <= left_ts`` (inclusive) sharing the key ``on``.

    Returns all left columns plus ``right_cols`` (NULL when no earlier right
    row exists). ``tolerance`` (in the ts column's own unit, after cast to
    long) drops matches older than ``left_ts - tolerance``. ``tiebreak``
    orders right rows with identical timestamps (latest-by-tiebreak wins) —
    pass a unique column for full determinism.
    """
    lcols = left.columns
    # The right payload rides as ONE struct: per-column last(ignorenulls)
    # would TEAR columns apart when the latest right row carries a NULL in
    # one of them (value from an older row, id from the newest — found by
    # the round-8 adversarial twin). A right row's struct is always
    # non-null, so one last(ignorenulls) carries the whole row atomically.
    r = right.select(
        F.col(on),
        F.col(right_ts).alias(left_ts),
        F.lit(0).alias("__is_left"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).cast("long").alias("__tb"),
        F.struct(
            *[F.col(c).alias(f"r_{c}") for c in right_cols],
            # timestamp→timestamp cast is a no-op; NTZ→timestamp makes the
            # long cast legal (NTZ→long is CAST_WITHOUT_SUGGESTION)
            F.col(right_ts).cast("timestamp").cast("long").alias("r_ts_match"),
        ).alias("__rrow"),
    )
    rrow_type = r.schema["__rrow"].dataType
    l = left.select(
        "*",
        F.lit(1).alias("__is_left"),
        F.lit(0).cast("long").alias("__tb"),
        F.lit(None).cast(rrow_type).alias("__rrow"),
    )
    for c in lcols:  # left-only columns ride along as NULL on right rows
        if c not in (on, left_ts):
            r = r.withColumn(c, F.lit(None))
    u = l.unionByName(r.select(*l.columns))
    # Right rows sort BEFORE left rows at equal ts (__is_left 0 < 1) so the
    # match is inclusive; among right ties the larger tiebreak wins (it is
    # the last one the running last() sees).
    w = (
        Window.partitionBy(on)
        .orderBy(F.asc_nulls_last(F.col(left_ts)), F.asc_nulls_last(F.col("__is_left")), F.asc_nulls_last(F.col("__tb")))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = u.withColumn("__lastrow", F.last("__rrow", ignorenulls=True).over(w))
    for c in right_cols:
        out = out.withColumn(f"__last_{c}", F.col("__lastrow")[f"r_{c}"])
    out = out.withColumn("__last_ts", F.col("__lastrow")["r_ts_match"])
    out = out.filter(F.col("__is_left") == 1)
    if tolerance is not None:
        in_tol = F.col("__last_ts") >= (
            F.col(left_ts).cast("timestamp").cast("long") - F.lit(tolerance)
        )
        for c in right_cols:
            out = out.withColumn(
                f"__last_{c}", F.when(in_tol, F.col(f"__last_{c}"))
            )
    # a left row with NULL ts has no as-of position: SQL's p.ts <= NULL
    # matches nothing, while the union window would have handed it every
    # right row (NULLs order last)
    return out.select(
        *lcols,
        *[
            F.when(F.col(left_ts).isNotNull(), F.col(f"__last_{c}"))
            .alias(f"{c}_asof")
            for c in right_cols
        ],
    )


@register("salted_join")
def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side's key into ``salt``
    sub-keys (derived from a hash of the full row for determinism) and
    replicate the small side across every salt value. The shuffle then
    spreads a heavy-hitter key over ``salt`` reducers.

    Semantics are identical to ``big.join(small, on, how)`` for 1:N joins
    (small side unique on the key)."""
    b = big.withColumn("__salt", F.pmod(F.xxhash64(*big.columns), F.lit(salt)))
    s = small.crossJoin(
        big.sparkSession.range(salt).select(F.col("id").cast("int").alias("__salt"))
    ).withColumn("__salt", F.col("__salt").cast(b.schema["__salt"].dataType))
    out = b.join(s, on=[on, "__salt"], how=how)
    return out.drop("__salt")


@register("range_join")
def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 86400,
    extra_keys: Sequence[str] = (),
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join (``start ≤ ts < end``) as a shuffle-safe
    EQUI-join: bucket time into ``bucket_seconds`` chunks, explode each
    interval to the buckets it overlaps, equi-join on the bucket id (+ any
    ``extra_keys``), then apply the exact range predicate as a residual
    filter.

    Scale rationale: the naive formulation is a theta-join — Spark can only
    run it as a (Broadcast)NestedLoopJoin, O(|points|·|intervals|) once the
    interval side outgrows broadcast. Bucketing turns it into a hash join
    whose cost is O(matching bucket pairs); the fan-out factor is
    ``interval_length / bucket_seconds + 1`` rows per interval, so pick the
    bucket near the typical interval length. Same trick as Databricks'
    range-join hints / Sedona grid partitioning, expressed in plain
    DataFrame ops.
    """
    b = F.lit(int(bucket_seconds))
    pb = points.withColumn("__b", F.floor(F.unix_timestamp(F.col(ts_col)) / b))
    ib = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / b),
                F.floor(F.unix_timestamp(F.col(end_col)) / b),
            )
        ),
    )
    out = pb.join(ib, ["__b", *extra_keys], how=how).filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return out.drop("__b")


@register("runtime_filter_semi_join")
def runtime_filter_semi_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_buckets: int = 4096,
) -> DataFrame:
    """Semi-join with an explicit Bloom-style runtime pre-filter: hash the
    small side's keys into ``n_buckets`` coarse buckets (one tiny agg job,
    broadcast as a 1-row array), drop big-side rows whose key hashes into
    no occupied bucket, then confirm survivors with the exact left-semi
    join. Bucket collisions (false positives) are removed by the exact
    join, so the result is identical to ``big.join(small, on,
    'left_semi')`` — the sketch only prunes.

    Scale rationale: at 100 TB the pre-filter runs inside the big side's
    scan stage and eliminates most non-matching rows *before* the
    semi-join shuffle — the same runtime-filter idea Spark's AQE bloom
    rewrite applies internally (``bloom_filter_agg`` is not a public SQL
    function, so the sketch here is an occupied-bucket set built from
    public API only). Mirrors the reference's bbox pre-filter philosophy
    (SURVEY §4: emit a cheap coarse predicate the scan can exploit,
    /root/reference/src/data_preprocessing.py:222-223) applied to key
    joins. A production variant would swap the array for a real bitmap;
    the plan shape (broadcast scalar sketch → scan-side filter → exact
    confirm) is the part that matters.
    """
    bucket = lambda col: F.pmod(F.xxhash64(F.col(col)), F.lit(n_buckets))  # noqa: E731
    sketch = (
        small.select(bucket(on).alias("__b"))
        .distinct()
        .agg(F.sort_array(F.collect_set("__b")).alias("__bs"))
    )
    pruned = (
        big.join(F.broadcast(sketch))
        .where(F.array_contains(F.col("__bs"), bucket(on)))
        .drop("__bs")
    )
    return pruned.join(small.select(on).distinct(), on, "left_semi")


@register("fuzzy_join")
def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_col: str,
    right_id: str,
    right_col: str,
    max_distance: int = 2,
    q: int = 3,
) -> DataFrame:
    """Fuzzy string (record-linkage) join: pairs whose edit distance is at
    most ``max_distance`` — matching misspelled names, OCR noise, vendor
    aliases across tables.

    Scale shape: the naive formulation is an all-pairs Levenshtein cross
    join — quadratic and undistributable. Instead, candidates come from a
    positional q-gram equi-join (the banded-LSH shape of
    ``minhash_pairs``): two strings within edit distance ``k`` share a
    q-gram at positions differing by ≤ k whenever
    ``len − q + 1 > k·q`` (each edit destroys at most ``q`` grams and
    shifts positions by ≤ 1) — the standard completeness precondition;
    strings shorter than that bound may be missed, which is part of this
    operator's CONTRACT (the oracle replays the identical candidate
    scheme). Exact ``levenshtein`` scores candidates only, after a
    distinct on the id pair so each pair is scored once."""
    lt = left.select(F.col(left_id).alias("__lid"), F.col(left_col).alias("__ls"))
    rt = right.select(F.col(right_id).alias("__rid"), F.col(right_col).alias("__rs"))

    def grams(df: DataFrame, sid: str, s: str) -> DataFrame:
        n = F.length(F.col(s))
        # guard, don't clamp: sequence(1, 0) DESCENDS in Spark, so a
        # sub-q string must produce an empty gram set explicitly
        idx = F.when(
            n >= q, F.sequence(F.lit(1), n - (q - 1))
        ).otherwise(F.array().cast("array<int>"))
        return df.select(
            sid,
            F.posexplode(
                F.transform(idx, lambda i: F.substring(F.col(s), i, q))
            ).alias("__pos", "__g"),
        )

    lg = grams(lt, "__lid", "__ls")
    rg = grams(rt, "__rid", "__rs")
    cand = (
        lg.join(
            rg,
            on=(lg["__g"] == rg["__g"])
            & (F.abs(lg["__pos"] - rg["__pos"]) <= max_distance),
        )
        .select("__lid", "__rid")
        .distinct()
    )
    pairs = (
        cand.join(lt, "__lid")
        .join(rt, "__rid")
        .withColumn("__dist", F.levenshtein(F.col("__ls"), F.col("__rs")))
        .filter(F.col("__dist") <= max_distance)
    )
    return pairs.select(
        F.col("__lid").alias("left_id"),
        F.col("__rid").alias("right_id"),
        F.col("__dist").cast("long").alias("edit_distance"),
    )


@register("cogroup_asof")
def cogroup_asof(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    left_cols: "Sequence[str]" = (),
    right_cols: "Sequence[str]" = (),
    right_tiebreak: str | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """The COGROUPED_MAP extension surface: per-key as-of alignment in
    pandas via ``groupBy(k).cogroup(groupBy(k)).applyInPandas`` — both
    sides of a key arrive as ONE pandas frame each and a
    ``pd.merge_asof`` runs inside the worker. Semantics are the backward
    inclusive as-of of ``asof_join`` (latest right at-or-before each left
    row), so the declarative twin is its exact oracle.

    This op exists to gate the custom-two-sided-Python path (the same
    reason ``grouped_zscore`` gates GROUPED_MAP): real uses are
    alignment logic that SQL can't express — per-key model replay,
    bidirectional tolerance matching.

    Granularity: cogrouping on the RAW key hands pandas one tiny frame
    pair per key — measured per-call overhead dominated the gate (1500
    users ≈ 1500 Python invocations). The cogroup key is therefore a
    HASH BUCKET of the key (``n_buckets`` co-shuffled groups) and the
    per-key alignment happens inside ``pd.merge_asof(by=on)`` — same
    results, ~n_keys/n_buckets× fewer Python calls; each BUCKET's two
    frames must fit a worker (same contract as any applyInPandas,
    tunable via ``n_buckets``)."""
    import pandas as pd

    lc = list(left_cols) or [c for c in left.columns if c != on]
    rc = list(right_cols)
    # the key keeps its REAL type — hardcoding e.g. long would Arrow-error
    # on string/date keys at runtime
    out_fields = (
        [f"{on} {dict(left.dtypes)[on]}"]
        + [f"{c} {dict(left.dtypes)[c]}" for c in lc]
        + [f"r_{c} {dict(right.dtypes)[c]}" for c in rc]
    )
    schema = ", ".join(out_fields)

    def merge(l_pdf: "pd.DataFrame", r_pdf: "pd.DataFrame") -> "pd.DataFrame":
        if len(l_pdf) == 0:
            return pd.DataFrame(columns=[on] + lc + [f"r_{c}" for c in rc])
        # NULL-aware split (adversarial data): a left row with a NULL ts
        # or NULL key can never match (SQL: NULL <= x / NULL = x is
        # false) but must SURVIVE with NULL right columns — merge_asof
        # would instead raise on unsorted/NaT keys. Right rows with NULL
        # ts/key can never be matched and drop.
        l_bad = l_pdf[l_pdf[left_ts].isna() | l_pdf[on].isna()]
        l_pdf = l_pdf[~(l_pdf[left_ts].isna() | l_pdf[on].isna())]
        r_pdf = r_pdf[~(r_pdf[right_ts].isna() | r_pdf["__ron"].isna())]
        if len(l_pdf) == 0 and len(l_bad) == 0:
            return pd.DataFrame(columns=[on] + lc + [f"r_{c}" for c in rc])

        def with_null_right(frame):
            out = frame[[on] + lc].copy()
            for c in rc:
                out[f"r_{c}"] = None
            return out

        if len(l_pdf) == 0:
            return with_null_right(l_bad)
        # Arrow delivers int64-with-NULLs as float64; a bucket whose other
        # side had no NULLs stays int64 — merge_asof requires matching
        # key dtypes, so promote both sides of each numeric key together.
        for lcol, rcol in ((on, "__ron"), (left_ts, right_ts)):
            lk, rk = l_pdf[lcol].dtype.kind, r_pdf[rcol].dtype.kind
            if {lk, rk} == {"i", "f"}:
                l_pdf = l_pdf.assign(**{lcol: l_pdf[lcol].astype("float64")})
                r_pdf = r_pdf.assign(**{rcol: r_pdf[rcol].astype("float64")})
        l_sorted = l_pdf.sort_values([left_ts, on], kind="mergesort")
        if len(r_pdf) == 0:
            if len(l_bad):
                return pd.concat(
                    [with_null_right(l_sorted), with_null_right(l_bad)],
                    ignore_index=True,
                )
            out = l_sorted[[on] + lc].copy()
            for c in rc:
                out[f"r_{c}"] = None
            return out
        r_keys = [right_ts] + ([right_tiebreak] if right_tiebreak else [])
        # sort by (ts, tiebreak): merge_asof takes the LAST right row at an
        # equal timestamp, so ascending tiebreak == larger-tiebreak-wins —
        # the same tie rule as asof_join. The right ts renames to a private
        # name so same-named ts columns never collide into _x/_y suffixes;
        # the right key arrives under the private "__ron" (see below) and
        # renames back to ``on`` for merge_asof's by=.
        r_sorted = (
            r_pdf.sort_values(r_keys, kind="mergesort")[["__ron", right_ts] + rc]
            .rename(
                columns={
                    "__ron": on,
                    right_ts: "__rts",
                    **{c: f"r_{c}" for c in rc},
                }
            )
        )
        merged = pd.merge_asof(
            l_sorted,
            r_sorted,
            left_on=left_ts,
            right_on="__rts",
            by=on,
            direction="backward",
            allow_exact_matches=True,
        )
        merged = merged[[on] + lc + [f"r_{c}" for c in rc]]
        if len(l_bad):
            merged = pd.concat(
                [merged, with_null_right(l_bad)], ignore_index=True
            )
        return merged

    lb = left.withColumn(
        "__bkt", F.pmod(F.xxhash64(F.col(on)), F.lit(n_buckets))
    )
    # the right key rides under a PRIVATE name: Spark's cogroup Arrow
    # transfer drops a right-side data column that duplicates a left-side
    # name in some partitions (observed on the shared key column) — a
    # unique name sidesteps the dedup entirely
    rb = right.select(
        F.col(on).alias("__ron"),
        *[F.col(c) for c in right.columns if c != on],
    ).withColumn("__bkt", F.pmod(F.xxhash64(F.col("__ron")), F.lit(n_buckets)))
    return (
        lb.groupBy("__bkt")
        .cogroup(rb.groupBy("__bkt"))
        .applyInPandas(merge, schema=schema)
    )


@register("market_basket_pairs")
def market_basket_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 3,
    top_n: int = 20,
) -> DataFrame:
    """Market-basket co-occurrence: item pairs appearing in the same
    basket, scored by lift = P(a,b) / (P(a)·P(b)) → the top ``top_n``
    pairs ``(item_a, item_b, n_baskets_both, lift)``.

    Shapes: dedup to distinct (basket, item) FIRST, then the pair
    generation is a self-EQUI-join on the basket key with ``a < b`` —
    fan-out bounded by basket width squared, never a corpus cross
    product; supports are keyed aggregates. Determinism: lift =
    ``(n_ab · n_baskets) / (n_a · n_b)`` — both sides exact BIGINT
    products (< 2^63 at any real scale) in ONE IEEE division; ranking
    ties break on the item pair."""
    # NULL basket or item keys pair nothing in a SQL equi-join and count
    # in no support — dropped on both engines
    items = (
        df.filter(
            F.col(basket_col).isNotNull() & F.col(item_col).isNotNull()
        )
        .select(F.col(basket_col).alias("__b"), F.col(item_col).alias("__i"))
        .distinct()
        # Materialize the distinct (basket, item) table once: it feeds the
        # EAGER n_baskets count (a separate action ReuseExchange cannot
        # bridge) plus three main-plan consumers (supp ×2 broadcast sides,
        # lists) whose subtrees are not byte-identical — without the cut
        # the source scan + distinct aggregate ran 4× per query
        # (guide §2.4/§5). Storage is O(distinct pairs), the same
        # contract as the graph-loop checkpoints.
        .localCheckpoint()
    )
    n_baskets = items.select("__b").distinct().count()
    supp = items.groupBy("__i").agg(F.count(F.lit(1)).alias("__n"))
    # pair generation: collect each basket's sorted item set and explode
    # the a<b combinations JVM-side — ONE keyed shuffle (by basket) and
    # fan-out bounded by width²/2, instead of a self-join that shuffles
    # the item stream twice; A/B-measured equal-output and faster, and
    # the per-basket state is the basket width (same contract as any
    # collect_set). Skewed mega-baskets would cap via a width filter.
    # Pin the basket-list aggregate's exchange to a user-numbered
    # repartition (AQE-exempt): the per-basket lists are tiny, so AQE
    # coalesced the aggregate's exchange to a handful of partitions and
    # the width²/2 pair EXPLODE above it (the expensive stage) inherited
    # that serialization — the theil_sen `_ordered_pairs` lesson
    # (guide §2.5: parallelism for the amplified stage, not its input).
    # ADVICE r9: the conf can be non-numeric on some platforms (e.g.
    # "auto" under vendor AQE modes) — fall back to defaultParallelism.
    try:
        n_part = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    except ValueError:
        n_part = df.sparkSession.sparkContext.defaultParallelism or 200
    lists = items.repartition(n_part, "__b").groupBy("__b").agg(
        F.sort_array(F.collect_set("__i")).alias("__xs")
    )
    combos = lists.select(
        F.explode(
            F.expr(
                "flatten(transform(__xs, (x, k) ->"
                " transform(slice(__xs, k + 2, size(__xs)),"
                " y -> struct(x as item_a, y as item_b))))"
            )
        ).alias("__p")
    ).select(F.col("__p.item_a"), F.col("__p.item_b"))
    pairs = (
        combos.groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_baskets_both"))
        .filter(F.col("n_baskets_both") >= F.lit(int(min_pair_count)))
    )
    scored = (
        pairs.join(
            F.broadcast(supp.select(F.col("__i").alias("item_a"), F.col("__n").alias("__na"))),
            "item_a",
        )
        .join(
            F.broadcast(supp.select(F.col("__i").alias("item_b"), F.col("__n").alias("__nb"))),
            "item_b",
        )
        .select(
            "item_a",
            "item_b",
            "n_baskets_both",
            (
                (F.col("n_baskets_both") * F.lit(int(n_baskets))).cast("double")
                / (F.col("__na") * F.col("__nb")).cast("double")
            ).alias("lift"),
        )
    )
    return (
        scored.orderBy(F.col("lift").desc(), F.col("item_a").asc_nulls_last(), F.col("item_b").asc_nulls_last())
        .limit(top_n)
    )
