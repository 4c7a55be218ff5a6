"""Operator library: spatial / temporal / interpolation / text / dedup /
similarity / multimodal, all DataFrame→DataFrame and registry-backed."""

# Importing submodules registers their operators.
from sensordatapipelines_spark.operators import (  # noqa: F401
    aggregates,
    dedup,
    geohash,
    graph,
    interpolate,
    joins,
    multimodal,
    sequence,
    similarity,
    sketches,
    spatial,
    temporal,
    text,
    utility,
    webfilter,
)
