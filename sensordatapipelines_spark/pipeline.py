"""Pipeline — a reified, JSON-serializable logical plan over DataFrames.

Re-expresses the reference's ``Pipeline`` class
(``/root/reference/src/data_preprocessing.py:22-150``) Spark-first:

- The IR is the same JSON-able shape
  ``{"pipe": <name>, "operations": [{"name", "function", "args", "kwargs"}]}``
  (reference ``:30-36``, ``:64-66``) so plans written by either system are
  mutually readable.
- ``process`` is a **lazy fold**: each op contributes DataFrame transforms,
  nothing materializes between ops, and Catalyst optimizes across op
  boundaries — unlike the reference, which eagerly materializes and prints
  ``head()`` between every op (``:102-116``). ``debug=True`` reproduces that
  per-op introspection (`explain` + `show`).
- ``from_json`` resolves function *names* against the operator registry at
  load time ("analysis"), fixing the reference's broken round-trip
  (``:38-48`` + ``:108-109`` — deserialized plans carried bare strings;
  SURVEY.md §1.4).
- ``pop_operation`` implements the documented intent (remove the op by name);
  the reference's version is buggy (iterates/pops the 2-key dict, ``:68-73``;
  SURVEY.md §2.1 P5).
"""

from __future__ import annotations

import json
from collections.abc import Callable
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame

from sensordatapipelines_spark.errors import UnknownOperation
from sensordatapipelines_spark.registry import get_operation


@dataclass
class OpSpec:
    """One pipeline step: ``{name, function, args, kwargs}``.

    ``function`` is stored as the registry *name* (string); the callable is
    resolved lazily so specs serialize cleanly (reference ``CustomEncoder``,
    ``src/data_preprocessing.py:683-689``, did callable→name with no inverse).
    """

    name: str
    function: str
    args: tuple[Any, ...] = ()
    kwargs: dict[str, Any] = field(default_factory=dict)

    def resolve(self) -> Callable[..., DataFrame]:
        return get_operation(self.function)

    def to_dict(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "function": self.function,
            "args": list(self.args),
            "kwargs": dict(self.kwargs),
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> OpSpec:
        fn = d["function"]
        if callable(fn):  # accept callables for symmetry with the reference API
            fn = fn.__name__
        return cls(
            name=d["name"],
            function=fn,
            args=tuple(d.get("args", ())),
            kwargs=dict(d.get("kwargs", {})),
        )


class Pipeline:
    """Named sequence of registered DataFrame→DataFrame operations.

    Reference API parity: ``add_operation`` (``:64-66``), ``pop_operation``
    (intent of ``:68-73``), ``move_operation`` (``:75-82``), ``set_kwarg``
    (``:84-90``), ``to_json``/``from_json`` (``:38-55``), ``process``
    (``:92-129``), ``process_generator`` (``:131-146``).
    """

    def __init__(self, name: str, operations: list[OpSpec] | None = None):
        if not isinstance(name, str):
            # Catch Pipeline([...ops...]) misuse at construction: a non-str
            # name silently produced an EMPTY pipeline whose process() is
            # the identity — the worst failure mode (no error, wrong data).
            raise TypeError(
                f"Pipeline name must be a string, got {type(name).__name__}; "
                "pass operations as the second argument"
            )
        self.name = name
        self.operations: list[OpSpec] = list(operations or [])
        self.valid = False

    # -- plan construction -------------------------------------------------
    def add_operation(
        self, name: str, function: Callable | str, *args: Any, **kwargs: Any
    ) -> Pipeline:
        fn_name = function if isinstance(function, str) else function.__name__
        # Analysis-time check: the op must exist in the registry.
        get_operation(fn_name)
        self.operations.append(OpSpec(name, fn_name, args, kwargs))
        self.valid = False
        return self

    def pop_operation(self, name: str) -> OpSpec:
        """Remove the first op with this step-name (documented intent of the
        reference's buggy version, ``src/data_preprocessing.py:68-73``)."""
        for i, op in enumerate(self.operations):
            if op.name == name:
                self.valid = False
                return self.operations.pop(i)
        raise UnknownOperation(f"no operation named {name!r} in pipeline {self.name!r}")

    def move_operation(self, name: str, position: int) -> Pipeline:
        """Reorder the named op to ``position`` (reference ``:75-82``)."""
        op = self.pop_operation(name)
        self.operations.insert(position, op)
        return self

    def set_kwarg(self, op_name: str, kwarg_name: str, new_value: Any) -> Pipeline:
        """Mutate one kwarg of one op (reference ``:84-90``; unlike the
        reference, raise if the op is absent so sweeps can't silently no-op)."""
        for op in self.operations:
            if op.name == op_name:
                op.kwargs[kwarg_name] = new_value
                self.valid = False
                return self
        raise UnknownOperation(f"no operation named {op_name!r} in pipeline {self.name!r}")

    def get_args(self, op: OpSpec) -> tuple[Callable, tuple, dict]:
        """Unpack an OpSpec (reference ``get_args``, ``:148-150``)."""
        return op.resolve(), op.args, op.kwargs

    # -- serialization -----------------------------------------------------
    def to_dict(self) -> dict[str, Any]:
        return {"pipe": self.name, "operations": [op.to_dict() for op in self.operations]}

    def to_json(self, filename: str | Path | None = None) -> str:
        text = json.dumps(self.to_dict(), indent=2, default=_encode)
        if filename is not None:
            Path(filename).write_text(text)
        return text

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> Pipeline:
        pipe = cls(d["pipe"], [OpSpec.from_dict(o) for o in d.get("operations", [])])
        # Analysis: resolve every function name now so bad plans fail at load
        # time, not mid-run (SURVEY.md §3.2).
        for op in pipe.operations:
            op.resolve()
        return pipe

    @classmethod
    def from_json(cls, source: str | Path) -> Pipeline:
        """Load a plan from a JSON file path or a JSON string."""
        text = str(source)
        p = Path(text)
        if not text.lstrip().startswith("{") and p.is_file():
            text = p.read_text()
        return cls.from_dict(json.loads(text))

    # -- execution ---------------------------------------------------------
    def process(
        self,
        df: DataFrame,
        debug: bool = False,
        plan_file: str | Path | None = None,
        out_path: str | Path | None = None,
        out_format: str = "parquet",
    ) -> DataFrame:
        """Fold all ops over ``df`` lazily; Catalyst plans the fused query.

        ``debug=True`` mirrors the reference's per-op introspection
        (``:102-116``: prints name/shape/head) with ``explain`` + ``show(5)``.
        ``plan_file`` dumps the plan JSON (the reference always dumps,
        ``:117-125``; here it is opt-in). ``out_path`` writes the final
        DataFrame (canonical sink = parquet; reference wrote GeoJSON,
        ``:126-128``).
        """
        for op in self.operations:
            fn, args, kwargs = self.get_args(op)
            if debug:
                print(f"-- op {op.name!r} ({op.function})")
            df = fn(df, *args, **kwargs)
            if not isinstance(df, DataFrame):
                # Same contract as the reference (``:110-111``).
                raise TypeError(
                    f"operation {op.name!r} returned {type(df).__name__}, "
                    "expected pyspark.sql.DataFrame"
                )
            if debug:
                df.explain()
                df.show(5)
        self.valid = True
        if plan_file is not None:
            self.to_json(plan_file)
        if out_path is not None:
            df.write.format(out_format).mode("overwrite").save(str(out_path))
        return df

    def process_generator(
        self,
        df: DataFrame,
        op_name: str,
        modified_kwarg: str,
        values: list[Any],
        out_dir: str | Path | None = None,
        out_format: str = "parquet",
    ) -> dict[Any, DataFrame]:
        """Parameter sweep (reference ``process_generator``, ``:131-146``):
        run the pipeline once per value of one kwarg; optionally write each
        result to ``{out_dir}/pipe_result_{kwarg}_{value}``. Returns the lazy
        result DataFrames keyed by value."""
        results: dict[Any, DataFrame] = {}
        for value in values:
            self.set_kwarg(op_name, modified_kwarg, value)
            out = self.process(df)
            if out_dir is not None:
                path = Path(out_dir) / f"pipe_result_{modified_kwarg}_{value}"
                out.write.format(out_format).mode("overwrite").save(str(path))
            results[value] = out
        return results


def _encode(obj: Any) -> Any:
    """JSON fallback: callables → ``__name__`` (reference ``CustomEncoder``,
    ``src/data_preprocessing.py:683-689``)."""
    if callable(obj):
        return obj.__name__
    return str(obj)
