"""Multimodal column plumbing: image/audio/video as opaque binary columns.

Charter extension (SURVEY.md §2.7). The container has no image/audio codecs,
so the *decode kernels* are stubs (a clearly-marked ``NotImplementedError``
path plus a deterministic fake decoder for tests), while everything
Spark-side is real and tested: the typed schema, Arrow-batched
``mapInPandas`` plumbing, batch shapes, and partition behavior. Swapping the
fake kernel for PIL/ffmpeg is a one-function change on the executor side.

Schema convention::

    media: struct<
        media_id   bigint,
        kind       string,      -- 'image' | 'audio' | 'video'
        payload    binary,      -- opaque encoded bytes
        meta       struct<format string, width int, height int,
                         sample_rate int, n_frames int>
    >
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sensordatapipelines_spark.registry import register

MEDIA_META_SCHEMA = (
    "format string, width int, height int, sample_rate int, n_frames int"
)


@register("attach_fake_media")
def attach_fake_media(
    df: DataFrame, id_col: str, kind: str = "image", payload_bytes: int = 256
) -> DataFrame:
    """Test/fixture helper: attach a deterministic fake binary payload derived
    from the id (xxhash64-seeded byte pattern) plus typed metadata — lets the
    full multimodal plumbing run without codec libraries."""
    h = F.xxhash64(F.col(id_col))
    payload = F.encode(
        F.concat_ws("", *[F.conv(((h + F.lit(i)) % 256).cast("string"), 10, 16) for i in range(8)]),
        "utf-8",
    )
    return df.withColumn(
        "media",
        F.struct(
            F.col(id_col).cast("long").alias("media_id"),
            F.lit(kind).alias("kind"),
            payload.alias("payload"),
            F.struct(
                F.lit("fake").alias("format"),
                (F.pmod(h, F.lit(1920)) + 1).cast("int").alias("width"),
                (F.pmod(h, F.lit(1080)) + 1).cast("int").alias("height"),
                F.lit(16000).cast("int").alias("sample_rate"),
                (F.pmod(h, F.lit(300)) + 1).cast("int").alias("n_frames"),
            ).alias("meta"),
        ),
    )


def _decode_kernel(payload: bytes, kind: str, fake: bool) -> np.ndarray:
    """Decode encoded media bytes to an array. Real decoding requires codec
    libraries not present in this environment — STUB."""
    if fake:
        # Deterministic fake: interpret the payload bytes directly.
        return np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    raise NotImplementedError(
        "real media decoding requires PIL/soundfile/ffmpeg (not installed); "
        "run with fake=True for the deterministic test kernel"
    )


@register("media_features")
def media_features(df: DataFrame, media_col: str = "media", fake: bool = True) -> DataFrame:
    """Decode + feature-extract media payloads via Arrow-batched
    ``mapInPandas``: per item emits ``(media_id, kind, n_bytes, mean_val,
    std_val)``. The Spark-side batch shape, schema and partitioning are the
    real production plumbing; only the decode kernel is stubbed."""
    schema = "media_id long, kind string, n_bytes long, mean_val double, std_val double"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for m in pdf[media_col]:
                arr = _decode_kernel(m["payload"], m["kind"], fake)
                rows.append(
                    {
                        "media_id": int(m["media_id"]),
                        "kind": m["kind"],
                        "n_bytes": int(len(m["payload"])),
                        "mean_val": float(arr.mean()) if arr.size else 0.0,
                        "std_val": float(arr.std()) if arr.size else 0.0,
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(media_col).mapInPandas(extract, schema=schema)


@register("frame_sample")
def frame_sample(
    df: DataFrame, media_col: str = "media", every_n: int = 10, fake: bool = True
) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame index
    ``(media_id, frame_idx, frame_bytes)``. Frame *extraction* is stubbed
    (deterministic slices of the payload in fake mode); the row-explosion
    shape and partition behavior are real."""
    schema = "media_id long, frame_idx int, frame_bytes binary"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for m in pdf[media_col]:
                if not fake:
                    raise NotImplementedError("real frame extraction requires ffmpeg")
                n_frames = int(m["meta"]["n_frames"] or 0)
                payload = bytes(m["payload"])
                for idx in range(0, n_frames, every_n):
                    lo = idx % max(len(payload), 1)
                    rows.append(
                        {
                            "media_id": int(m["media_id"]),
                            "frame_idx": idx,
                            "frame_bytes": payload[lo : lo + 16],
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_bytes"])

    return df.select(media_col).mapInPandas(sample, schema=schema)
