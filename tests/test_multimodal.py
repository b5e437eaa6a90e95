"""Multimodal plumbing tests: binary columns + mapInPandas feature
extraction with the deterministic stub codec (real codecs absent in this
environment — the Spark-side schema/batching/partitioning is what's under
test)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from brontes_spark.operators.multimodal import (
    extract_image_features,
    frame_sample_plan,
    stub_decode,
)


@pytest.fixture(scope="module")
def items(spark):
    rows = [
        (1, b"\x89PNG fake image payload 1", "png"),
        (2, b"\xff\xd8 fake jpeg payload 22", "jpeg"),
        (3, b"", "png"),  # corrupt → dropped
        (4, b"\x89PNG fake image payload 1", "png"),  # duplicate payload of 1
    ]
    return spark.createDataFrame(rows, "item_id long, content binary, format string")


def test_extract_image_features(items):
    out = {r["item_id"]: r.asDict() for r in extract_image_features(items).collect()}
    assert set(out) == {1, 2, 4}  # corrupt item quarantined
    expected = stub_decode(b"\x89PNG fake image payload 1")
    assert out[1]["width"] == expected["width"]
    assert out[1]["height"] == expected["height"]
    assert out[1]["mean_intensity"] == pytest.approx(expected["mean_intensity"])
    assert len(out[1]["feature_vec"]) == 16
    # determinism: identical payloads → identical features
    assert out[1]["feature_vec"] == out[4]["feature_vec"]
    assert out[1]["n_bytes"] == 25


def test_frame_sample_plan(spark):
    vids = spark.createDataFrame([(1, 95), (2, 10)], "item_id long, n_frames int")
    got = {
        (r["item_id"], r["frame_idx"]) for r in frame_sample_plan(vids, every_k=30).collect()
    }
    assert got == {(1, 0), (1, 30), (1, 60), (1, 90), (2, 0)}
