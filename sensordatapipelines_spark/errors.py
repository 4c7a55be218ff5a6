"""Typed error surface.

Mirrors the reference's exception hierarchy
(``/root/reference/src/data_preprocessing.py:655-677``: ``DataIOError``,
``MissingCRS``, ``UnvalidatedPipeline``, ``ColumnException``), plus
engine-specific analysis errors.
"""


class EngineError(Exception):
    """Base class for all engine errors."""


class DataIOError(EngineError):
    """Raised when data could not be loaded/decoded from any supported format.

    Reference: ``src/data_preprocessing.py:655-658``.
    """


class MissingCRS(EngineError):
    """Raised when a spatial operation runs on a frame without a CRS.

    Reference: ``src/data_preprocessing.py:661-664`` (raised at ``:184-185``,
    ``:239-240``).
    """


class UnvalidatedPipeline(EngineError):
    """Raised when a pipeline is used in a way requiring prior validation.

    Reference: ``src/data_preprocessing.py:667-670`` (declared, never raised);
    the engine raises it when serializing a plan that has never successfully run
    with ``strict_validation=True``.
    """


class ColumnException(EngineError):
    """Raised when requested columns are absent and cannot be derived.

    Reference: ``src/data_preprocessing.py:673-677`` (declared, never raised);
    the engine raises it at analysis time for unknown aggregation columns.
    """


class CRSUnitMismatch(EngineError):
    """Raised when auto-reprojection would silently change the units of a
    radius/size column.

    Reprojection rewrites the coordinate columns only; a per-row radius
    column authored in the layer's original CRS (e.g. meters for 3857)
    cannot be linearly rescaled into the target CRS (degree↔meter scale
    varies with latitude), so comparing the reprojected coordinates against
    the unconverted radii would silently produce wrong intersections. The
    engine refuses and requires the caller to supply radii already in the
    sensors' CRS units (or pre-reproject the layer and recompute radii)."""


class StateSchemaMismatch(EngineError):
    """Raised when a persisted mergeable-aggregation state does not match
    the current state contract (ADVICE r8): ``aggregate_state`` switched
    s1/s2 from raw double sums to e6/e2-scaled BIGINTs, so merging or
    finalizing state written by the old format would be silently off by
    ~1e6/1e4. ``merge_aggregate_states``/``finalize_aggregate_state``
    assert the integer-typed contract and raise this instead of
    producing wrong numbers."""


class UnknownOperation(EngineError):
    """Raised at plan load ("analysis") time for an op name absent from the
    registry — fixing the reference's broken ``from_json`` round-trip
    (``src/data_preprocessing.py:38-48`` never resolves names back to
    callables; SURVEY.md §1.4)."""
