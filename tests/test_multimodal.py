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


def _ppm_bytes(w, h, rgb):
    header = f"P6\n# test comment\n{w} {h}\n255\n".encode()
    return header + bytes(bytearray(c for px in rgb for c in px))


def _bmp_bytes(w, h, rgb_rows_topdown):
    import struct

    stride = (w * 3 + 3) & ~3
    pixel_data = bytearray()
    for row in reversed(rgb_rows_topdown):  # bottom-up storage
        for r, g, b in row:
            pixel_data += bytes((b, g, r))  # BGR
        pixel_data += b"\x00" * (stride - w * 3)
    off = 54
    size = off + len(pixel_data)
    header = b"BM" + struct.pack("<IHHI", size, 0, 0, off)
    header += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0)
    return bytes(header + pixel_data)


def test_decode_ppm_and_bmp_real_pixels(spark):
    from brontes_spark.operators.multimodal import decode_bmp, decode_image, decode_ppm

    # 2x2 image: white, black / white, black -> mean 0.5, left col 1.0, right 0.0
    px = [(255, 255, 255), (0, 0, 0), (255, 255, 255), (0, 0, 0)]
    ppm = decode_ppm(_ppm_bytes(2, 2, px))
    assert (ppm["width"], ppm["height"]) == (2, 2)
    assert ppm["mean_intensity"] == 0.5
    rows = [[(255, 255, 255), (0, 0, 0)], [(255, 255, 255), (0, 0, 0)]]
    bmp = decode_bmp(_bmp_bytes(2, 2, rows))
    assert (bmp["width"], bmp["height"], bmp["mean_intensity"]) == (2, 2, 0.5)
    # same image, both containers -> identical features end-to-end
    assert ppm["feature_vec"] == bmp["feature_vec"]
    # sniffing dispatch + quarantine
    assert decode_image(_ppm_bytes(2, 2, px)) == ppm
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_image(b"\x89PNG compressed")


def test_extract_image_features_real_codec(spark):
    from brontes_spark.operators.multimodal import decode_image, extract_image_features

    px = [(10, 20, 30)] * 9
    rows = [
        (1, _ppm_bytes(3, 3, px), "ppm"),
        (2, _bmp_bytes(2, 2, [[(0, 0, 0), (255, 255, 255)], [(0, 0, 0), (255, 255, 255)]]), "bmp"),
        (3, b"\x89PNG needs a plugged codec", "png"),  # quarantined
    ]
    df = spark.createDataFrame(rows, "item_id long, content binary, format string")
    out = {r["item_id"]: r.asDict() for r in
           extract_image_features(df, decode_fn=decode_image).collect()}
    assert set(out) == {1, 2}
    assert (out[1]["width"], out[1]["height"]) == (3, 3)
    assert abs(out[2]["mean_intensity"] - 0.5) < 1e-12
