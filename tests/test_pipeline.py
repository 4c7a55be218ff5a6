"""Pipeline framework tests (SURVEY.md §5.3 round-trips + §2.1 semantics)."""

import pytest
from pyspark.sql import functions as F

from sensordatapipelines_spark import Pipeline, UnknownOperation, register


@register("add_one")
def add_one(df, col="x"):
    return df.withColumn(col, F.col(col) + 1)


@register("mult")
def mult(df, factor=2, col="x"):
    return df.withColumn(col, F.col(col) * factor)


@register("bad_op")
def bad_op(df):
    return 42  # not a DataFrame


def test_process_folds_lazily(spark):
    df = spark.range(5).withColumnRenamed("id", "x")
    p = Pipeline("p").add_operation("inc", add_one).add_operation("double", "mult")
    out = p.process(df)
    assert [r["x"] for r in out.orderBy("x").collect()] == [2, 4, 6, 8, 10]
    assert p.valid


def test_json_round_trip_same_result(spark):
    """The reference's from_json cannot re-execute (fn names never resolve,
    src/data_preprocessing.py:38-48,108-109); the engine's registry closes it."""
    df = spark.range(4).withColumnRenamed("id", "x")
    p = Pipeline("rt").add_operation("inc", add_one).add_operation("x3", mult, factor=3)
    p2 = Pipeline.from_json(p.to_json())
    a = [r["x"] for r in p.process(df).orderBy("x").collect()]
    b = [r["x"] for r in p2.process(df).orderBy("x").collect()]
    assert a == b == [3, 6, 9, 12]


def test_from_json_unknown_op_fails_at_load():
    p = Pipeline("bad")
    p.operations.append(
        __import__("sensordatapipelines_spark").OpSpec("step", "no_such_op")
    )
    with pytest.raises(UnknownOperation):
        Pipeline.from_json(p.to_json())


def test_pop_operation_removes_by_name():
    """Intent of the reference's buggy pop (iterates the 2-key dict, :68-73)."""
    p = Pipeline("p").add_operation("a", add_one).add_operation("b", mult)
    popped = p.pop_operation("a")
    assert popped.function == "add_one"
    assert [o.name for o in p.operations] == ["b"]
    with pytest.raises(UnknownOperation):
        p.pop_operation("zzz")


def test_move_and_set_kwarg(spark):
    df = spark.range(3).withColumnRenamed("id", "x")
    p = Pipeline("p").add_operation("inc", add_one).add_operation("scale", mult, factor=2)
    p.move_operation("scale", 0)
    assert [o.name for o in p.operations] == ["scale", "inc"]
    p.set_kwarg("scale", "factor", 10)
    out = [r["x"] for r in p.process(df).orderBy("x").collect()]
    assert out == [1, 11, 21]  # (x*10)+1
    with pytest.raises(UnknownOperation):
        p.set_kwarg("nope", "factor", 1)


def test_non_dataframe_result_raises(spark):
    df = spark.range(2).withColumnRenamed("id", "x")
    p = Pipeline("p").add_operation("bad", bad_op)
    with pytest.raises(TypeError):
        p.process(df)


def test_process_generator_sweep(spark):
    df = spark.range(3).withColumnRenamed("id", "x")
    p = Pipeline("p").add_operation("scale", mult, factor=1)
    results = p.process_generator(df, "scale", "factor", [1, 2, 3])
    sums = {k: v.agg(F.sum("x")).first()[0] for k, v in results.items()}
    assert sums == {1: 3, 2: 6, 3: 9}


def test_pipeline_runs_round2_operators(spark):
    """Integration: the round-2 operators are registry citizens — a JSON
    pipeline chaining chunking after a quality gate round-trips and runs."""
    from sensordatapipelines_spark.pipeline import Pipeline

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog " * 30), (2, "")],
        "doc_id long, text string",
    )
    p = Pipeline("round2")
    p.add_operation("quality", "quality_score", text_col="text")
    p.add_operation("gate", "sql_filter", predicate="quality >= 0.5")
    p.add_operation("chunk", "chunk_documents", chunk_chars=100, overlap_chars=10)
    p2 = Pipeline.from_json(p.to_json())  # name->op resolution round-trip
    out = p2.process(docs)
    rows = out.collect()
    assert len(rows) > 1                      # doc 1 chunked, doc 2 dropped
    assert {r["doc_id"] for r in rows} == {1}
    assert all(r["chunk_len"] <= 100 for r in rows)
    # the constructor rejects the ops-as-name misuse that silently built an
    # empty (identity) pipeline
    import pytest as _pytest

    with _pytest.raises(TypeError):
        Pipeline([("quality_score", {})])


def test_pipeline_drives_round4_dedup_ops(spark):
    """The reference Pipeline API (JSON plan -> registry resolution -> lazy
    fold) drives the round-4 operators: paragraph dedup, span dedup and
    quality scoring chained as one deserialized plan equals the direct
    composition."""
    from sensordatapipelines_spark import Pipeline
    from sensordatapipelines_spark.operators.dedup import (
        paragraph_dedup,
        substring_dedup,
    )
    from sensordatapipelines_spark.operators.text import quality_score

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog\nalpha beta"),
            (2, "alpha beta\nthe quick brown fox jumps over the lazy dog"),
            (3, "completely different content here now today folks"),
        ],
        "doc_id long, text string",
    )
    plan = """
    {"pipe": "dedup_stack", "operations": [
      {"name": "paras", "function": "paragraph_dedup", "args": [], "kwargs": {}},
      {"name": "spans", "function": "substring_dedup", "args": [],
       "kwargs": {"span_tokens": 4}},
      {"name": "score", "function": "quality_score", "args": [], "kwargs": {}}
    ]}
    """
    got = Pipeline.from_json(plan).process(docs)
    want = quality_score(
        substring_dedup(paragraph_dedup(docs), span_tokens=4)
    )
    g = {r["doc_id"]: (r["text"], r["quality"]) for r in got.collect()}
    w = {r["doc_id"]: (r["text"], r["quality"]) for r in want.collect()}
    assert g == w
    # doc 2's both paragraphs were seen in doc 1 -> empty after the stack
    assert g[2][0] == ""


def test_pipeline_json_drives_term_blocklist(spark):
    """The C4-style banned-term gate is a registry op, so a JSON plan can
    carry it (terms ride as a plain kwargs list) — exactly how a curation
    recipe ships between teams."""
    from sensordatapipelines_spark import Pipeline
    from sensordatapipelines_spark.operators.webfilter import (
        term_blocklist_score,
    )

    docs = spark.createDataFrame(
        [(1, "clean words here"), (2, "a slow leak appears")],
        "doc_id long, text string",
    )
    plan = """
    {"pipe": "term_gate", "operations": [
      {"name": "gate", "function": "term_blocklist_score", "args": [],
       "kwargs": {"terms": ["slow", "leak"], "max_banned_frac": 0.0}}
    ]}
    """
    got = {r["doc_id"]: r["keep"] for r in Pipeline.from_json(plan).process(docs).collect()}
    want = {
        r["doc_id"]: r["keep"]
        for r in term_blocklist_score(
            docs, terms=["slow", "leak"], max_banned_frac=0.0
        ).collect()
    }
    assert got == want == {1: True, 2: False}


def test_registry_every_operator_takes_dataframe_first():
    """Registry hygiene (round-6 advice): a misplaced ``@register`` decorator
    once bound a zero-arg helper under an operator name (``audio_zcr``),
    breaking JSON-plan resolution for that name while direct imports kept
    gates green. Pin the contract: every registered name resolves to a
    callable whose FIRST parameter is the DataFrame (named ``df``), so
    ``Pipeline.process`` can always fold it."""
    import inspect

    import sensordatapipelines_spark  # noqa: F401  (populates the registry)
    from sensordatapipelines_spark.registry import _REGISTRY

    bad = {}
    for name, fn in _REGISTRY.items():
        params = list(inspect.signature(fn).parameters.values())
        if not params:
            bad[name] = []
            continue
        first = params[0]
        ann = first.annotation
        ann_ok = ann is inspect.Parameter.empty or "DataFrame" in str(ann)
        if not ann_ok or first.default is not inspect.Parameter.empty:
            bad[name] = [f"{p.name}: {p.annotation}" for p in params[:2]]
    assert not bad, f"registered operators without a DataFrame-first signature: {bad}"
