"""Deterministic multimodal fixture: real container bytes (BMP/PPM/PNG/
JPEG/GIF) with ANALYTIC golden features, materialized once as parquet.

Every image is constructed so its decoded statistics are computable in
closed form (solid colors whose channel sum divides by 3, integer gray
gradients, DC-only JPEGs) — the driver-gate oracles are therefore closed-
form VALUES relations, independent of the decoder implementation. The one
exception: JPEG mean intensity is pinned to 9 decimals only by the pytest
tolerance goldens (IDCT float truncation makes the last ulp encoder-
specific), so the JPEG gate rows carry width/height and a NULL mean.

The encoders here are fixture-side golden sources (forward PNG filtering,
CLEAR-per-pixel GIF LZW, DC-only baseline JPEG) — intentionally separate
code paths from the decoders in operators/multimodal.py, mirroring how the
test suite builds its bitstream goldens.
"""

from __future__ import annotations

import hashlib
import math
import os
import struct
import zlib
from decimal import ROUND_HALF_UP, Decimal
from fractions import Fraction

from pyspark.sql import DataFrame, SparkSession

# ---------------------------------------------------------------------------
# container encoders
# ---------------------------------------------------------------------------


def bmp_solid(w: int, h: int, rgb: tuple[int, int, int]) -> bytes:
    stride = (w * 3 + 3) & ~3
    row = bytes(reversed(rgb)) * w + b"\x00" * (stride - 3 * w)
    px = row * h
    header = (
        b"BM" + struct.pack("<IHHI", 54 + len(px), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px), 0, 0, 0, 0)
    )
    return header + px


def ppm_solid(w: int, h: int, rgb: tuple[int, int, int]) -> bytes:
    return f"P6\n{w} {h}\n255\n".encode() + bytes(rgb) * (w * h)


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body)))


def _filter_row(row: list[int], prior: list[int], f: int, ch: int) -> bytes:
    out = bytearray([f])
    for x in range(len(row)):
        a = row[x - ch] if x >= ch else 0
        b = prior[x]
        c = prior[x - ch] if x >= ch else 0
        if f == 0:
            enc = row[x]
        elif f == 1:
            enc = row[x] - a
        elif f == 2:
            enc = row[x] - b
        elif f == 3:
            enc = row[x] - ((a + b) >> 1)
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc = row[x] - pred
        out.append(enc & 0xFF)
    return bytes(out)


def png_gray_gradient(w: int, h: int, step: int, filters: list[int]) -> bytes:
    """8-bit grayscale PNG whose row y is the solid value (y*step) % 256,
    forward-filtered with the given per-row filter cycle (exercises the
    decoder's Sub/Up/Average/Paeth paths on real deltas)."""
    raw = bytearray()
    prior = [0] * w
    for y in range(h):
        row = [(y * step) % 256] * w
        raw += _filter_row(row, prior, filters[y % len(filters)], 1)
        prior = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


def png_rgb_solid(w: int, h: int, rgb: tuple[int, int, int], f: int) -> bytes:
    raw = bytearray()
    prior = [0] * (w * 3)
    for _ in range(h):
        row = list(rgb) * w
        raw += _filter_row(row, prior, f, 3)
        prior = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


def _lzw_pack(indices: list[int], min_code: int) -> bytes:
    """CLEAR-before-every-pixel LZW: a valid stream whose codes stay at
    min_code+1 bits (the fixture optimizes for decode WORK, not size)."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    codes: list[int] = []
    for px in indices:
        codes.append(clear)
        codes.append(px)
    codes.append(end)
    acc = nbits = 0
    stream = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += min_code + 1
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        stream.append(acc & 0xFF)
    return bytes(stream)


def gif_solid_frames(w: int, h: int, colors: list[tuple[int, int, int]],
                     frame_color_idx: list[int]) -> bytes:
    """Multi-frame GIF89a: full-screen solid frames, global color table."""
    n = max(2, 1 << math.ceil(math.log2(max(len(colors), 2))))
    min_code = max(2, n.bit_length() - 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (min_code - 1), 0, 0)
    for i in range(1 << min_code):
        out += bytes(colors[i] if i < len(colors) else (0, 0, 0))
    for ci in frame_color_idx:
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE, no transparency
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        stream = _lzw_pack([ci] * (w * h), min_code)
        out += bytes([min_code])
        for i in range(0, len(stream), 255):
            blk = stream[i : i + 255]
            out += bytes([len(blk)]) + blk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def jpeg_solid_gray(w: int, h: int, v: int) -> bytes:
    """DC-only baseline grayscale JPEG of solid value v (q[DC]=8, tiny
    canonical Huffman tables, spec-conformant markers)."""
    q = bytes([8] + [16] * 63)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + q
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + bytes([1, 0x11, 0])
    dc_counts = bytes([0, 0, 0, 12] + [0] * 12)
    ac_counts = bytes([0, 0, 0, 1] + [0] * 12)
    out += (b"\xff\xc4" + struct.pack(">H", 31) + b"\x00" + dc_counts
            + bytes(range(12)))
    out += b"\xff\xc4" + struct.pack(">H", 20) + b"\x10" + ac_counts + b"\x00"
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00]) + b"\x00\x3f\x00"
    # entropy: first block codes the DC diff (v-128), every later block 0
    bits: list[tuple[int, int]] = []

    def emit(val: int, n: int) -> None:
        bits.append((val & ((1 << n) - 1), n))

    diff = v - 128
    t = diff.bit_length() if diff else 0  # |diff| <= 127 -> category <= 7
    if diff < 0:
        t = (-diff).bit_length()
    n_blocks = (-(-w // 8)) * (-(-h // 8))
    for i in range(n_blocks):
        if i == 0 and t:
            emit(t, 4)  # DC symbol t <-> 4-bit code t
            emit(diff if diff > 0 else diff + (1 << t) - 1, t)
        else:
            emit(0, 4)  # DC category 0 (no diff bits)
        emit(0, 4)  # AC EOB (the single AC symbol, code 0000)
    acc, nacc, payload = 0, 0, bytearray()
    for val, n in bits:
        acc = (acc << n) | val
        nacc += n
        while nacc >= 8:
            byte = (acc >> (nacc - 8)) & 0xFF
            payload.append(byte)
            if byte == 0xFF:
                payload.append(0x00)  # byte stuffing
            nacc -= 8
    if nacc:
        byte = ((acc << (8 - nacc)) | ((1 << (8 - nacc)) - 1)) & 0xFF
        payload.append(byte)
        if byte == 0xFF:
            payload.append(0x00)
    return bytes(out) + bytes(payload) + b"\xff\xd9"


# ---------------------------------------------------------------------------
# fixture definition with analytic goldens
# ---------------------------------------------------------------------------


def _mean9(frac: Fraction) -> str:
    """Exact rational mean -> 9-dp HALF_UP decimal string, asserting the
    value sits safely away from the rounding boundary (the Spark side's
    pairwise float summation drifts ~1 ulp; 1e-6 of a 9th-decimal step is
    ~8 orders of magnitude of margin)."""
    d = Decimal(frac.numerator) / Decimal(frac.denominator)
    q = d.quantize(Decimal("1e-9"), rounding=ROUND_HALF_UP)
    dist = abs((d - q) * Decimal(10) ** 9)  # in [0, 0.5]
    if abs(dist - Decimal("0.5")) < Decimal("1e-6"):
        raise AssertionError(f"mean {frac} too close to 9dp boundary")
    return format(q, "f")


def _solid_mean(rgb: tuple[int, int, int]) -> Fraction:
    s = sum(rgb)
    assert s % 3 == 0, "solid fixture colors must have channel-sum % 3 == 0"
    return Fraction(s // 3, 255)


def build_media() -> tuple[list[dict], list[dict], list[dict], list[dict]]:
    """Returns (image_rows, image_goldens, gif_rows, gif_goldens)."""
    images: list[dict] = []
    igold: list[dict] = []
    item = 0

    def add(fmt: str, content: bytes, w: int, h: int, mean: Fraction | None):
        nonlocal item
        item += 1
        images.append({"item_id": item, "format": fmt,
                       "content": bytearray(content)})
        igold.append({"item_id": item, "format": fmt, "width": w, "height": h,
                      "mean9": _mean9(mean) if mean is not None else None})

    for i in range(24):  # BMP solids, channel sums divisible by 3
        c = ((i * 31) % 256, (i * 57 + 10) % 256, 0)
        c = (c[0], c[1], (3 - (c[0] + c[1]) % 3) % 3)
        w, h = 48 + 2 * i, 40 + i
        add("bmp", bmp_solid(w, h, c), w, h, _solid_mean(c))
    for i in range(16):  # PPM solids
        g = (i * 16 + 7) % 256
        c = (g, g, g)
        w, h = 40 + i, 32 + 2 * i
        add("ppm", ppm_solid(w, h, c), w, h, _solid_mean(c))
    for i in range(20):  # gray gradient PNGs through every filter path
        w, h, step = 96, 96, 3 + i
        filters = [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]][i % 6]
        total = sum(((y * step) % 256) * w for y in range(h))
        add("png", png_gray_gradient(w, h, step, filters), w, h,
            Fraction(total, w * h * 255))
    for i in range(6):  # RGB solid PNGs, Paeth/Average filtered
        c = (60 + 30 * i, 90, (3 - (150 + 30 * i) % 3) % 3 + 120)
        add("png", png_rgb_solid(64, 64, c, 3 + (i % 2)), 64, 64,
            _solid_mean(c))
    for i in range(12):  # DC-only JPEGs: width/height golden, mean pytest-pinned
        v = 16 + i * 18
        w, h = 120, 104
        add("jpeg", jpeg_solid_gray(w, h, v), w, h, None)

    gifs: list[dict] = []
    ggold: list[dict] = []
    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (30, 60, 90),
              (120, 120, 120), (200, 100, 0), (0, 200, 100), (90, 90, 90)]
    for i in range(8):  # multi-frame GIFs (12 frames, 64x64)
        n_frames = 12
        frame_idx = [(i + k) % len(colors) for k in range(n_frames)]
        gid = 1000 + i
        gifs.append({"item_id": gid, "format": "gif",
                     "content": bytearray(gif_solid_frames(64, 64, colors,
                                                           frame_idx))})
        for k in range(n_frames):
            ggold.append({"item_id": gid, "frame_idx": k,
                          "n_frames": n_frames, "width": 64, "height": 64,
                          "mean9": _mean9(_solid_mean(colors[frame_idx[k]]))})
    return images, igold, gifs, ggold


# ---------------------------------------------------------------------------
# parquet materialization (same per-user atomic-rename cache pattern as
# sources/fixtures.py: content-hashed dir, 0700, rename-or-discard)
# ---------------------------------------------------------------------------

_handles: dict[int, dict[str, DataFrame]] = {}

_IMG_DDL = "item_id long, format string, content binary"


def _media_dir(content_key: str) -> str:
    base = os.path.join(
        "/tmp", f"brontes_spark_media_{os.getuid()}"
    )
    os.makedirs(base, mode=0o700, exist_ok=True)
    os.chmod(base, 0o700)
    return os.path.join(base, content_key)


def load_media(spark: SparkSession) -> dict[str, DataFrame]:
    """{'images': DataFrame, 'gifs': DataFrame} read from the cached
    parquet materialization (pure JVM scans after first write)."""
    key = id(spark)
    if key not in _handles:
        images, _, gifs, _ = build_media()
        digest = hashlib.md5(
            b"".join(bytes(r["content"]) for r in images + gifs)
        ).hexdigest()[:16]
        base = _media_dir(f"v1_{digest}")
        if not os.path.isdir(base):
            tmp = f"{base}.tmp{os.getpid()}"
            try:
                spark.createDataFrame(images, _IMG_DDL).coalesce(4).write.mode(
                    "overwrite"
                ).parquet(f"{tmp}/images")
                spark.createDataFrame(gifs, _IMG_DDL).coalesce(2).write.mode(
                    "overwrite"
                ).parquet(f"{tmp}/gifs")
                os.rename(tmp, base)
            except OSError:
                import shutil

                shutil.rmtree(tmp, ignore_errors=True)
        _handles[key] = {
            name: spark.read.schema(_IMG_DDL).parquet(f"{base}/{name}")
            for name in ("images", "gifs")
        }
    return _handles[key]
