"""Name → operator registry.

The reference's extension model is "any Python callable of the right shape"
(``/root/reference/README.md:16-20``; enforced at
``src/data_preprocessing.py:110-111``) and its plan serialization maps
callables to bare ``__name__`` strings (``CustomEncoder``,
``src/data_preprocessing.py:683-689``) with **no** way to resolve them back
(SURVEY.md §1.4). The engine closes that loop: operators register under a
stable name, and plan load resolves names against this registry at analysis
time — unknown names fail at ``Pipeline.from_json``, not mid-run.

An operator is ``fn(df: DataFrame, *args, **kwargs) -> DataFrame`` — the same
contract as the reference's pipe operations, but lazily composed so Catalyst
optimizes across op boundaries.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from sensordatapipelines_spark.errors import UnknownOperation

_REGISTRY: dict[str, Callable[..., Any]] = {}


def register(name: str | None = None) -> Callable:
    """Decorator: register an operator under ``name`` (default ``fn.__name__``)."""

    def deco(fn: Callable) -> Callable:
        key = name or fn.__name__
        _REGISTRY[key] = fn
        return fn

    return deco


def register_operation(name: str, fn: Callable) -> None:
    _REGISTRY[name] = fn


def get_operation(name: str) -> Callable:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise UnknownOperation(
            f"operation {name!r} is not registered; known: {sorted(_REGISTRY)}"
        ) from None


def list_operations() -> list[str]:
    return sorted(_REGISTRY)
