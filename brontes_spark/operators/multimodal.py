"""Multimodal column processing for training-data pipelines.

Images/audio/video ride through Spark as opaque `binary` columns with typed
metadata structs; per-item compute (decode, resize, frame-sample, feature
extraction) runs as Arrow-batched pandas iterators via ``mapInPandas`` — the
pattern that scales: the JVM moves bytes, Python touches each batch once,
and partition sizing (bytes per partition, not rows) bounds worker memory.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this environment, so
the decode kernel is pluggable: `decode_fn` defaults to a deterministic
stub that derives pseudo pixel statistics from the bytes themselves
(md5-seeded), keeping schemas, batch shapes, and partitioning REAL and
testable while the codec is swapped in production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of extract_image_features
IMAGE_FEATURES_SCHEMA = (
    "item_id long, n_bytes int, format string, width int, height int, "
    "mean_intensity double, feature_vec array<float>"
)


def stub_decode(data: bytes) -> dict:
    """Deterministic fake decoder: pseudo dimensions/statistics derived from
    a hash of the payload. Swap for a real codec in production; raises on
    empty payloads the way a real decoder raises on corrupt files."""
    if not data:
        raise ValueError("empty payload")
    h = hashlib.md5(data).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    mean_intensity = h[2] / 255.0
    feature_vec = [((b / 255.0) * 2 - 1) for b in h]
    return {
        "width": width,
        "height": height,
        "mean_intensity": mean_intensity,
        "feature_vec": feature_vec,
    }


def extract_image_features(
    df: DataFrame,
    id_col: str = "item_id",
    bytes_col: str = "content",
    format_col: str = "format",
    decode_fn: Callable[[bytes], dict] = stub_decode,
    bytes_per_partition: int = 256 << 20,
) -> DataFrame:
    """Decode + featurize binary items via mapInPandas.

    Corrupt/empty items are dropped (a real pipeline would route them to a
    quarantine sink). Partitioning note: repartition upstream by cumulative
    byte size, not row count — a 256MB target keeps Arrow batches bounded
    regardless of item-size skew.
    """
    selected = df.select(
        F.col(id_col).alias("item_id"),
        F.col(bytes_col).alias("content"),
        F.col(format_col).alias("format"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for item_id, content, fmt in zip(pdf["item_id"], pdf["content"], pdf["format"]):
                try:
                    feats = decode_fn(bytes(content) if content is not None else b"")
                except Exception:
                    continue  # quarantine path in production
                out.append(
                    {
                        "item_id": int(item_id),
                        "n_bytes": len(content),
                        "format": fmt,
                        "width": feats["width"],
                        "height": feats["height"],
                        "mean_intensity": feats["mean_intensity"],
                        "feature_vec": feats["feature_vec"],
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "item_id", "n_bytes", "format", "width", "height",
                    "mean_intensity", "feature_vec",
                ],
            )

    return selected.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    id_col: str = "item_id",
    n_frames_col: str = "n_frames",
    every_k: int = 30,
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame index.

    The frame indices are pure column math (sequence + explode, JVM-side);
    only the eventual frame DECODE joins back through mapInPandas — so the
    expensive Python boundary touches exactly the sampled frames, not the
    whole video.
    """
    return df.select(
        F.col(id_col).alias("item_id"),
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col(n_frames_col) - 1, F.lit(0)), F.lit(every_k))
        ).alias("frame_idx"),
    )
