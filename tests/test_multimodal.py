"""Multimodal plumbing tests: schema, mapInPandas batch shape, stub gating."""

import pytest
from pyspark.sql import functions as F

from sensordatapipelines_spark.operators.multimodal import (
    attach_fake_media,
    frame_sample,
    media_features,
)


def test_media_schema_and_features(spark):
    base = spark.range(10).withColumnRenamed("id", "doc_id")
    media = attach_fake_media(base, "doc_id")
    field_names = {f.name for f in media.schema["media"].dataType.fields}
    assert field_names == {"media_id", "kind", "payload", "meta"}
    feats = media_features(media)
    rows = feats.collect()
    assert len(rows) == 10
    assert all(r["n_bytes"] > 0 for r in rows)
    # deterministic: re-running produces identical features
    again = {r["media_id"]: r["mean_val"] for r in media_features(media).collect()}
    assert {r["media_id"]: r["mean_val"] for r in rows} == again


def test_real_decode_is_stubbed(spark):
    media = attach_fake_media(spark.range(2).withColumnRenamed("id", "doc_id"), "doc_id")
    with pytest.raises(Exception):  # NotImplementedError surfaces as PythonException
        media_features(media, fake=False).collect()


def test_frame_sample_explodes_rows(spark):
    media = attach_fake_media(spark.range(3).withColumnRenamed("id", "doc_id"), "doc_id")
    frames = frame_sample(media, every_n=50)
    rows = frames.collect()
    assert len(rows) >= 3  # ≥1 frame per item
    assert all(r["frame_idx"] % 50 == 0 for r in rows)
