"""Multimodal column processing for training-data pipelines.

Images/audio/video ride through Spark as opaque `binary` columns with typed
metadata structs; per-item compute (decode, resize, frame-sample, feature
extraction) runs as Arrow-batched pandas iterators via ``mapInPandas`` — the
pattern that scales: the JVM moves bytes, Python touches each batch once,
and partition sizing (bytes per partition, not rows) bounds worker memory.

Codec story: the dependency-free containers decode FOR REAL (`decode_ppm` /
`decode_bmp` / `decode_png` — pure bytes + numpy (+ stdlib zlib for PNG),
real pixels, real spatial features; `decode_image` sniffs and dispatches).
JPEG/video need PIL/ffmpeg, which are NOT in this environment, so the
kernel stays pluggable: pass a production codec via `decode_fn`;
undecodable payloads raise into the quarantine path. `stub_decode` remains
as the deterministic fake for plumbing tests. Schemas, Arrow batch shapes,
and partitioning are identical across all of them.
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


def _gray_stats(px) -> dict:
    """width/height/mean/16-dim grid features from an (H, W, 3) uint8 array."""
    import numpy as np

    h, w = px.shape[0], px.shape[1]
    gray = px.astype(np.float64).mean(axis=2) / 255.0
    # 4x4 grid means: a real (if tiny) spatial feature vector
    ys = np.linspace(0, h, 5).astype(int)
    xs = np.linspace(0, w, 5).astype(int)
    vec = [
        float(gray[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)].mean())
        for i in range(4)
        for j in range(4)
    ]
    return {
        "width": int(w),
        "height": int(h),
        "mean_intensity": float(gray.mean()),
        "feature_vec": vec,
    }


def decode_ppm(data: bytes) -> dict:
    """Real decoder for binary PPM (P6): pure bytes + numpy, no codec libs.

    Full header grammar (whitespace/comment tokens), 8-bit maxval only.
    """
    import numpy as np

    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # tokenize header: 3 integers (w, h, maxval), '#' comments run to EOL
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(data):
            raise ValueError("truncated PPM header")
        c = data[pos : pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":
            pos = data.index(b"\n", pos) + 1
        else:
            end = pos
            while end < len(data) and not data[end : end + 1].isspace():
                end += 1
            tokens.append(int(data[pos:end]))
            pos = end
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    pos += 1  # single whitespace after maxval
    need = w * h * 3
    raw = data[pos : pos + need]
    if len(raw) != need:
        raise ValueError("truncated PPM pixel data")
    return _gray_stats(np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3))


def decode_bmp(data: bytes) -> dict:
    """Real decoder for uncompressed 24-bit BMP: pure bytes + numpy."""
    import struct

    import numpy as np

    if not data.startswith(b"BM") or len(data) < 54:
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", data, 10)[0]
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    comp = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    need = stride * h
    raw = data[off : off + need]
    if len(raw) != need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)[:, : w * 3]
    px = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if not top_down:
        px = px[::-1]  # bottom-up storage
    return _gray_stats(px)


def decode_png(data: bytes) -> dict:
    """Real decoder for 8-bit non-interlaced gray/RGB/RGBA PNG: stdlib
    `zlib` inflate + the five scanline unfilters (None/Sub/Up/Average/
    Paeth) — no codec libraries. Covers the most common real container;
    palette/16-bit/Adam7 images raise into the quarantine path (plug PIL
    via `decode_fn` in production — this pure-Python unfilter is for
    correctness-grade workloads, not JPEG-farm throughput).
    """
    import struct
    import zlib

    import numpy as np

    if not data.startswith(b"\x89PNG\r\n\x1a\n"):
        raise ValueError("not a PNG")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in (0, 2, 6) or comp or filt or interlace:
        raise ValueError("only 8-bit non-interlaced gray/RGB/RGBA PNG supported")
    ch = {0: 1, 2: 3, 6: 4}[color]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * h or w == 0 or h == 0:
        raise ValueError("bad PNG pixel payload")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = int(arr[y, 0])
        rec = arr[y, 1:].astype(np.int32)
        prior = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:
            pass
        elif f == 1:  # Sub: left neighbor, sequential within the row
            for x in range(ch, stride):
                rec[x] = (rec[x] + rec[x - ch]) & 0xFF
        elif f == 2:  # Up: fully vectorized
            rec = (rec + prior) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                rec[x] = (rec[x] + ((a + prior[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                b = int(prior[x])
                c = int(prior[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = rec.astype(np.uint8)
    px = out.reshape(h, w, ch)
    if ch == 1:
        px = np.repeat(px, 3, axis=2)
    elif ch == 4:
        px = px[:, :, :3]  # alpha dropped for intensity stats
    return _gray_stats(px)


def decode_image(data: bytes) -> dict:
    """Container-sniffing decoder: REAL decode for the dependency-free
    formats (PPM P6, uncompressed 24-bit BMP, 8-bit PNG — pure bytes +
    numpy + stdlib zlib); anything else raises for the caller's quarantine
    path, where a production deployment plugs PIL/ffmpeg via `decode_fn`.
    The Spark-side plumbing (schema, Arrow batching, partitioning) is
    identical either way.
    """
    if not data:
        raise ValueError("empty payload")
    if data.startswith(b"P6"):
        return decode_ppm(data)
    if data.startswith(b"BM"):
        return decode_bmp(data)
    if data.startswith(b"\x89PNG\r\n\x1a\n"):
        return decode_png(data)
    raise ValueError("unsupported container (plug a codec via decode_fn)")


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
    # zero-frame items yield NO rows (greatest(n-1, 0) would otherwise emit
    # a phantom frame 0 that does not exist, sending the decoder a dead index)
    return df.filter(F.col(n_frames_col) > 0).select(
        F.col(id_col).alias("item_id"),
        F.explode(
            F.sequence(F.lit(0), F.col(n_frames_col) - 1, F.lit(every_k))
        ).alias("frame_idx"),
    )
