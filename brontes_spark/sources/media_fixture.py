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


#: nearest-resize target shared by the fixture goldens and mm_resize_features
RESIZE_H, RESIZE_W = 24, 16


def _rmean_gradient(h: int, step: int, out_h: int) -> Fraction:
    """Closed-form mean intensity of the gray-gradient image after
    resize_nearest to out_h rows: row i samples source row floor(i*h/out_h),
    whose solid value is (y*step) % 256; columns are constant so out_w
    cancels."""
    vals = [((i * h // out_h) * step) % 256 for i in range(out_h)]
    return Fraction(sum(vals), out_h * 255)


def _dhash_gradient(w: int, h: int, step: int) -> int:
    """Closed-form 9x8 vertical dHash of the gray-gradient image whose row
    y is the solid value (y*step) % 256: rows are solid, so every column
    shares one bit per row band; band means compare by exact integer
    cross-multiplication (the per-pixel x3 channel sum and the x(w/8)
    column width cancel on both sides)."""
    rb = [r * h // 9 for r in range(10)]
    sums = [sum((y * step) % 256 for y in range(rb[r], rb[r + 1]))
            for r in range(9)]
    cnts = [rb[r + 1] - rb[r] for r in range(9)]
    v = 0
    for r in range(8):
        if sums[r] * cnts[r + 1] < sums[r + 1] * cnts[r]:
            for c in range(8):
                v |= 1 << (r * 8 + c)
    return v - (1 << 64) if v >= (1 << 63) else v


def build_media() -> tuple[list[dict], list[dict], list[dict], list[dict]]:
    """Returns (image_rows, image_goldens, gif_rows, gif_goldens). Image
    goldens carry an analytic perceptual hash (`dhash`) for every item
    whose pixel statistics are closed-form: solids hash to 0 (all cells
    equal — no strict darker-than), gradients to _dhash_gradient; JPEG
    rows carry None (IDCT exception) and stay out of the phash gate."""
    images: list[dict] = []
    igold: list[dict] = []
    item = 0

    def add(fmt: str, content: bytes, w: int, h: int, mean: Fraction | None,
            dhash: int | None = None, rmean: Fraction | None = None):
        nonlocal item
        item += 1
        images.append({"item_id": item, "format": fmt,
                       "content": bytearray(content)})
        igold.append({"item_id": item, "format": fmt, "width": w, "height": h,
                      "mean9": _mean9(mean) if mean is not None else None,
                      "dhash": dhash,
                      "rmean9": _mean9(rmean) if rmean is not None else None})

    for i in range(24):  # BMP solids, channel sums divisible by 3
        c = ((i * 31) % 256, (i * 57 + 10) % 256, 0)
        c = (c[0], c[1], (3 - (c[0] + c[1]) % 3) % 3)
        w, h = 48 + 2 * i, 40 + i
        add("bmp", bmp_solid(w, h, c), w, h, _solid_mean(c), dhash=0,
            rmean=_solid_mean(c))
    for i in range(16):  # PPM solids
        g = (i * 16 + 7) % 256
        c = (g, g, g)
        w, h = 40 + i, 32 + 2 * i
        add("ppm", ppm_solid(w, h, c), w, h, _solid_mean(c), dhash=0,
            rmean=_solid_mean(c))
    for i in range(20):  # gray gradient PNGs through every filter path
        w, h, step = 96, 96, 3 + i
        filters = [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]][i % 6]
        total = sum(((y * step) % 256) * w for y in range(h))
        add("png", png_gray_gradient(w, h, step, filters), w, h,
            Fraction(total, w * h * 255), dhash=_dhash_gradient(w, h, step),
            rmean=_rmean_gradient(h, step, RESIZE_H))
    for i in range(6):  # RGB solid PNGs, Paeth/Average filtered
        c = (60 + 30 * i, 90, (3 - (150 + 30 * i) % 3) % 3 + 120)
        add("png", png_rgb_solid(64, 64, c, 3 + (i % 2)), 64, 64,
            _solid_mean(c), dhash=0, rmean=_solid_mean(c))
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
# audio + video (MJPEG/AVI) fixture: square waves at codec-exact levels and
# DC-only-JPEG video frames, with closed-form goldens
# ---------------------------------------------------------------------------


def _riff_chunk(cid: bytes, body: bytes) -> bytes:
    return (cid + struct.pack("<I", len(body)) + body
            + (b"\x00" if len(body) & 1 else b""))


def _riff_list(ltype: bytes, body: bytes) -> bytes:
    return _riff_chunk(b"LIST", ltype + body)


def avi_mjpeg(w: int, h: int, jpeg_frames: list[bytes], fps: int = 30) -> bytes:
    """Minimal spec-conformant MJPEG AVI writer (fixture-side golden
    source): RIFF('AVI ' hdrl(avih, strl(strh 'vids'/'MJPG', strf
    BITMAPINFOHEADER)) movi('00dc' JPEG ...))."""
    avih = struct.pack(
        "<14I", 1_000_000 // fps, 0, 0, 0x10, len(jpeg_frames), 0, 1, 0,
        w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4H", b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0,
        len(jpeg_frames), 0, 0x7FFFFFFF, 0, 0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)),
    )
    movi = _riff_list(b"movi", b"".join(_riff_chunk(b"00dc", f) for f in jpeg_frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_dib_solid(w: int, h: int, frame_rgbs: list[tuple[int, int, int]],
                  fps: int = 30) -> bytes:
    """Uncompressed AVI writer: '00db' raw DIB frames (24-bit BGR rows
    padded to 4 bytes, bottom-up), BI_RGB strf — the no-codec video path,
    solid-color frames so decoded means are exact rationals."""
    stride = (w * 3 + 3) & ~3
    frames = [
        (bytes(reversed(rgb)) * w + b"\x00" * (stride - 3 * w)) * h
        for rgb in frame_rgbs
    ]
    avih = struct.pack(
        "<14I", 1_000_000 // fps, 0, 0, 0x10, len(frames), 0, 1, 0,
        w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4H", b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0,
        len(frames), 0, 0x7FFFFFFF, 0, 0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"\x00\x00\x00\x00",
        stride * h, 0, 0, 0, 0
    )
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)),
    )
    movi = _riff_list(b"movi", b"".join(_riff_chunk(b"00db", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_container(fmt_tag: int, n_ch: int, rate: int, bits: int,
                  payload: bytes, block_align: int | None = None,
                  extra: bytes = b"") -> bytes:
    """RIFF/WAVE writer for any format tag (fixture-side)."""
    if block_align is None:
        block_align = n_ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", fmt_tag, n_ch, rate, rate * block_align, block_align, bits
    ) + (struct.pack("<H", len(extra)) + extra if extra or fmt_tag != 1 else b"")
    out = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        out += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(out)) + b"WAVE" + out


def _g711_expand(law: str, b: int) -> int:
    """Independent G.711 expansion (fixture-side; the decoder builds its own
    LUT from the same public spec)."""
    if law == "ulaw":
        v = ~b & 0xFF
        t = (((v & 0x0F) << 3) + 0x84) << ((v & 0x70) >> 4)
        return 0x84 - t if v & 0x80 else t - 0x84
    v = b ^ 0x55
    t = (v & 0x0F) << 4
    seg = (v & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if v & 0x80 else -t


#: IMA ADPCM tables (public IMA recommended-practice constants)
_IMA_STEPS_FX = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41,
    45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190,
    209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724,
    796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272,
    2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
    7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500,
    20350, 22385, 24623, 27086, 29794, 32767,
)
_IMA_INDEX_FX = (-1, -1, -1, -1, 2, 4, 6, 8)


def ima_adpcm_encode(samples: list[int], n_ch: int, spb: int) -> bytes:
    """Independent fixture-side IMA ADPCM encoder producing WAV block
    layout (4-byte per-channel headers + 4-byte-per-channel nibble groups,
    low nibble first). For the fixture's constant signals the encoder emits
    all-zero nibbles, which the decoder reproduces bit-exactly."""
    x = [samples[i : i + n_ch] for i in range(0, len(samples), n_ch)]
    out = bytearray()
    idxs = [0] * n_ch
    for b0 in range(0, len(x), spb):
        chunk = x[b0 : b0 + spb]
        while len(chunk) < spb:
            chunk.append(chunk[-1])
        preds = [int(chunk[0][c]) for c in range(n_ch)]
        for c in range(n_ch):
            out += struct.pack("<hBB", preds[c], idxs[c], 0)
        nibs: list[list[int]] = [[] for _ in range(n_ch)]
        for s in range(1, spb):
            for c in range(n_ch):
                step = _IMA_STEPS_FX[idxs[c]]
                diff = int(chunk[s][c]) - preds[c]
                nib = 8 if diff < 0 else 0
                diff = abs(diff)
                if diff >= step:
                    nib |= 4
                    diff -= step
                if diff >= step >> 1:
                    nib |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    nib |= 1
                # decoder-mirror predictor update
                d = step >> 3
                if nib & 1:
                    d += step >> 2
                if nib & 2:
                    d += step >> 1
                if nib & 4:
                    d += step
                preds[c] = max(-32768, min(32767, preds[c] - d if nib & 8 else preds[c] + d))
                idxs[c] = max(0, min(88, idxs[c] + _IMA_INDEX_FX[nib & 7]))
                nibs[c].append(nib)
        for c in range(n_ch):
            while len(nibs[c]) % 8:
                nibs[c].append(0)  # pad group; decoder stops at spb
        for g in range(len(nibs[0]) // 8):
            for c in range(n_ch):
                seg = nibs[c][g * 8 : g * 8 + 8]
                for k in range(0, 8, 2):
                    out.append(seg[k] | (seg[k + 1] << 4))
    return bytes(out)


def flac_constant_square(rate: int, n: int, period: int, amp: int,
                         n_ch: int = 1) -> bytes:
    """Fixture-side FLAC encoder for +-amp square waves, built ONLY from
    CONSTANT subframes: block size = period/2, so every frame is one solid
    value per channel — a genuinely different code path from the test
    suite's fixed-predictor/Rice encoder, and exact by construction
    (FLAC is lossless, CONSTANT trivially so)."""
    bs = period // 2
    assert bs >= 16 and n % bs == 0, "blocksize must be >=16 and divide n"

    class W:
        def __init__(self):
            self.buf, self.acc, self.n = bytearray(), 0, 0

        def w(self, v, nbits):
            self.acc = (self.acc << nbits) | (v & ((1 << nbits) - 1))
            self.n += nbits
            while self.n >= 8:
                self.buf.append((self.acc >> (self.n - 8)) & 0xFF)
                self.n -= 8
            self.acc &= (1 << self.n) - 1

    def crc8(data):
        c = 0
        for b in data:
            c ^= b
            for _ in range(8):
                c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        return c

    def crc16(data):
        c = 0
        for b in data:
            c ^= b << 8
            for _ in range(8):
                c = (((c << 1) ^ 0x8005) if c & 0x8000 else (c << 1)) & 0xFFFF
        return c

    hdr = W()
    hdr.w(bs, 16)
    hdr.w(bs, 16)
    hdr.w(0, 24)
    hdr.w(0, 24)
    hdr.w(rate, 20)
    hdr.w(n_ch - 1, 3)
    hdr.w(15, 5)  # 16 bps
    hdr.w(n, 36)
    for _ in range(16):
        hdr.w(0, 8)
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(hdr.buf).to_bytes(3, "big") + bytes(hdr.buf)
    for fno in range(n // bs):
        val = amp if fno % 2 == 0 else -amp
        w = W()
        w.w(0x3FFE, 14)
        w.w(0, 2)
        w.w(6, 4)  # blocksize: 8-bit field
        w.w(0, 4)  # rate from streaminfo
        w.w(n_ch - 1, 4)  # independent channels
        w.w(4, 3)  # 16 bps explicit
        w.w(0, 1)
        if fno < 0x80:  # UTF-8 coded frame number
            w.w(fno, 8)
        else:
            w.w(0xC0 | (fno >> 6), 8)
            w.w(0x80 | (fno & 0x3F), 8)
        w.w(bs - 1, 8)
        w.w(crc8(w.buf), 8)
        for _ in range(n_ch):
            w.w(0, 8)  # subframe hdr: pad 0, type CONSTANT, no wasted bits
            w.w(val, 16)
        if w.n:
            w.w(0, 8 - w.n)
        w.w(crc16(w.buf), 16)
        out += bytes(w.buf)
    return bytes(out)


def _square(n: int, period: int, hi: int, lo: int) -> list[int]:
    half = period // 2
    cyc = [hi] * half + [lo] * half
    return [cyc[i % period] for i in range(n)]


#: item_ids of the ADPCM audio rows: their dominant_freq is FFT-noise-
#: determined (constant signal -> zero spectrum), so the gate NULLs it
ADPCM_AUDIO_IDS = (2009, 2010)

#: item_ids of the raw-DIB (uncompressed) AVI rows: their frame means are
#: exact rationals, so the gate goldens them; MJPEG rows stay NULL (the
#: documented JPEG IDCT exception)
DIB_AVI_IDS = (3007, 3008)


def build_av_media() -> tuple[list[dict], list[dict], list[dict], list[dict]]:
    """Returns (avi_rows, video_goldens, audio_rows, audio_goldens).

    Video: MJPEG AVIs whose frames are DC-only solid-gray JPEGs — frame
    geometry and count are analytic; mean intensity is the documented JPEG
    exception (pytest-pinned), so video goldens carry geometry only.

    Audio: square waves with n % period == 0 at codec-exact amplitudes.
    Every feature is a closed-form rational: duration n/rate, RMS exactly
    the amplitude (|x| constant), zero-cross (2n/P - 1)/(n - 1), dominant
    frequency rate/P (square-wave fundamental dominates: harmonics fall
    off 1/k). G.711 rows store raw code bytes whose expansion is exact by
    construction; ADPCM rows store constant signals the predictor tracks
    bit-exactly (all-zero nibbles at step 7 add step>>3 = 0)."""
    avis: list[dict] = []
    vgold: list[dict] = []
    for i in range(6):
        vid = 3001 + i
        w, h = 48 + 16 * i, 32 + 8 * i
        n_frames = 10 + (i % 3)  # 10/11/12: exercises tail-inclusive sampling
        frames = [
            jpeg_solid_gray(w, h, (23 + 37 * i + 19 * k) % 239)
            for k in range(n_frames)
        ]
        avis.append({"item_id": vid, "format": "avi",
                     "content": bytearray(avi_mjpeg(w, h, frames))})
        for k in range(n_frames):
            vgold.append({"item_id": vid, "frame_idx": k,
                          "n_frames": n_frames, "width": w, "height": h,
                          "mean9": None})  # MJPEG: IDCT exception
    for j, vid in enumerate(DIB_AVI_IDS):  # uncompressed '00db' AVIs
        w, h, n_frames = 40 + 24 * j, 36 + 12 * j, 9 + j
        rgbs = []
        for k in range(n_frames):
            c = ((40 * j + 29 * k) % 256, (90 + 17 * k) % 256, 0)
            rgbs.append((c[0], c[1], (3 - (c[0] + c[1]) % 3) % 3))
        avis.append({"item_id": vid, "format": "avi",
                     "content": bytearray(avi_dib_solid(w, h, rgbs))})
        for k in range(n_frames):
            vgold.append({"item_id": vid, "frame_idx": k,
                          "n_frames": n_frames, "width": w, "height": h,
                          "mean9": _mean9(_solid_mean(rgbs[k]))})

    audio: list[dict] = []
    agold: list[dict] = []

    def add_audio(aid: int, fmt: str, content: bytes, rate: int, n_ch: int,
                  n: int, period: int | None, amp: Fraction) -> None:
        dur = Fraction(n, rate)
        if period is None:  # constant signal (ADPCM rows)
            zc: Fraction = Fraction(0)
            dom: Fraction | None = None
        else:
            zc = Fraction(2 * n // period - 1, n - 1)
            dom = Fraction(rate, period)
        agold.append({
            "item_id": aid, "fmt": fmt, "n_bytes": len(content),
            "sample_rate": rate, "n_channels": n_ch, "n_samples": n,
            "dur9": _mean9(dur), "rms9": _mean9(amp), "zc9": _mean9(zc),
            "dom9": _mean9(dom) if dom is not None else None,
        })
        audio.append({"item_id": aid, "format": fmt,
                      "content": bytearray(content)})

    rate, n = 8000, 4096
    # integer PCM square waves (16/8/32-bit, mono + stereo)
    for aid, a, period in ((2001, 20001, 32), (2002, 11113, 64)):
        pcm = _square(n, period, a, -a)
        add_audio(aid, "pcm16", wav_container(1, 1, rate, 16,
                  struct.pack(f"<{n}h", *pcm)), rate, 1, n, period,
                  Fraction(a, 32768))
    a8 = 101
    pcm8 = _square(n, 128, 128 + a8, 128 - a8)
    add_audio(2003, "pcm8", wav_container(1, 1, rate, 8, bytes(pcm8)),
              rate, 1, n, 128, Fraction(a8, 128))
    a32 = (1 << 29) + 12345
    pcm32 = _square(4500, 50, a32, -a32)
    inter: list[int] = []
    for v in pcm32:
        inter += [v, v]  # channel-identical stereo: average == either channel
    add_audio(2004, "pcm32", wav_container(1, 2, 44100, 32,
              struct.pack(f"<{2*4500}i", *inter)), 44100, 2, 4500, 50,
              Fraction(a32, 1 << 31))
    # G.711: raw code bytes; amplitude = the code's exact expansion, and the
    # negated code (sign bit flip) expands to exactly -amplitude
    for aid, law, tag, code, period in (
        (2005, "ulaw", 7, 0x90, 32), (2006, "ulaw", 7, 0xA3, 64),
        (2007, "alaw", 6, 0xB5, 32), (2008, "alaw", 6, 0x99, 16),
    ):
        amp = _g711_expand(law, code)
        if amp < 0:
            code ^= 0x80
            amp = -amp
        assert _g711_expand(law, code ^ 0x80) == -amp
        stream = bytes(_square(n, period, code, code ^ 0x80))
        add_audio(aid, law, wav_container(tag, 1, rate, 8, stream),
                  rate, 1, n, period, Fraction(amp, 32768))
    # FLAC square waves (lossless -> every feature exact, like PCM)
    for aid, n_ch, period, amp in ((2011, 1, 32, 19993), (2012, 2, 64, 8117)):
        n_fl = 4096
        data = flac_constant_square(rate, n_fl, period, amp, n_ch=n_ch)
        add_audio(aid, "flac", data, rate, n_ch, n_fl, period,
                  Fraction(amp, 32768))
    # IMA ADPCM constants (mono + stereo)
    spb = 505
    for aid, n_ch, level in ((2009, 1, 12347), (2010, 2, -7321)):
        n_ad = spb * (4 if n_ch == 1 else 3)
        enc = ima_adpcm_encode([level] * (n_ad * n_ch), n_ch, spb)
        block_align = 4 * n_ch + ((spb - 1 + 7) // 8) * 4 * n_ch
        data = wav_container(0x11, n_ch, rate, 4, enc,
                             block_align=block_align,
                             extra=struct.pack("<H", spb))
        add_audio(aid, "adpcm", data, rate, n_ch, n_ad, None,
                  Fraction(abs(level), 32768))
    return avis, vgold, audio, agold


# ---------------------------------------------------------------------------
# compressed-container fixtures (MP3 frame streams, MP4 box trees) — header
# structure is real and exact; payloads are deliberately inert (zeros) since
# the engine's metadata pass never decodes them
# ---------------------------------------------------------------------------

#: mirror of operators/multimodal._MP3_BITRATES/_MP3_RATES (fixture side)
_MP3_KBPS = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_MP3_SR = [44100, 48000, 32000]


def mp3_stream(specs: list[tuple[int, int, int]], id3_size: int | None = None) -> bytes:
    """MPEG-1 Layer III frame stream: one (bitrate_idx, rate_idx, padding)
    per frame, zero payloads, optional ID3v2 tag of the given body size."""
    out = bytearray()
    if id3_size is not None:
        out += b"ID3" + bytes([3, 0, 0])
        out += bytes([(id3_size >> 21) & 0x7F, (id3_size >> 14) & 0x7F,
                      (id3_size >> 7) & 0x7F, id3_size & 0x7F])
        out += bytes((i * 37 + 5) % 256 for i in range(id3_size))
    for bi, ri, pad in specs:
        h = (0x7FF << 21) | (0x3 << 19) | (0x1 << 17) | (1 << 16)
        h |= (bi << 12) | (ri << 10) | (pad << 9) | (0x3 << 6)
        frame_len = (144000 * _MP3_KBPS[bi]) // _MP3_SR[ri] + pad
        out += h.to_bytes(4, "big") + bytes(frame_len - 4)
    return bytes(out)


def _mp4_box(four: bytes, payload: bytes, largesize: bool = False) -> bytes:
    if largesize:
        return (b"\x00\x00\x00\x01" + four
                + struct.pack(">Q", len(payload) + 16) + payload)
    return struct.pack(">I", len(payload) + 8) + four + payload


def mp4_file(brand: bytes, timescale: int, duration: int,
             tracks: list[tuple[bytes, bytes]], mvhd_v1: bool = False,
             largesize_moov: bool = False) -> bytes:
    """Minimal ISO-BMFF: ftyp + free + moov(mvhd + trak*) + mdat(junk).
    tracks: (handler_kind, sample_entry_fourcc) pairs."""
    ftyp = _mp4_box(b"ftyp", brand + b"\x00\x00\x02\x00" + b"isomiso2")
    if mvhd_v1:
        mvhd_body = (b"\x01\x00\x00\x00" + b"\x00" * 16
                     + struct.pack(">I", timescale)
                     + struct.pack(">Q", duration) + b"\x00" * 80)
    else:
        mvhd_body = (b"\x00\x00\x00\x00" + b"\x00" * 8
                     + struct.pack(">II", timescale, duration) + b"\x00" * 80)
    traks = b""
    for kind, codec in tracks:
        hdlr = _mp4_box(b"hdlr", b"\x00" * 8 + kind + b"\x00" * 12 + b"t\x00")
        entry = struct.pack(">I", 16) + codec + b"\x00" * 8
        stsd = _mp4_box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1) + entry)
        minf = _mp4_box(b"minf", _mp4_box(b"stbl", stsd))
        traks += _mp4_box(b"trak", _mp4_box(b"mdia", hdlr + minf))
    moov = _mp4_box(b"moov", _mp4_box(b"mvhd", mvhd_body) + traks,
                    largesize=largesize_moov)
    mdat = _mp4_box(b"mdat", bytes((i * 11) % 256 for i in range(64)))
    return ftyp + _mp4_box(b"free", b"\x00" * 12) + moov + mdat


def build_container_media() -> tuple[list[dict], list[dict]]:
    """Returns (container_rows, container_goldens): every golden field is
    closed-form from the construction parameters — duration n*1152/rate
    (MP3) or duration/timescale (MP4) — never from running the parser."""
    rows: list[dict] = []
    gold: list[dict] = []

    def add(item_id: int, fmt: str, content: bytes, codec: str, n_units: int,
            sample_rate: int | None, dur: Fraction) -> None:
        rows.append({"item_id": item_id, "format": fmt,
                     "content": bytearray(content)})
        gold.append({"item_id": item_id, "container": fmt, "codec": codec,
                     "n_units": n_units, "sample_rate": sample_rate,
                     "dur9": _mean9(dur)})

    # MP3: CBR / VBR / padded / ID3-tagged, across all three sample rates
    mp3s = [
        (4001, [(9, 0, 0)] * 25, None),            # CBR 128k @ 44100
        (4002, [(14, 1, 0)] * 40, None),           # CBR 320k @ 48000
        (4003, [(1 + (k % 14), 2, 0) for k in range(33)], None),  # VBR @ 32k
        (4004, [(9, 0, k % 2) for k in range(21)], None),  # alternating pad
        (4005, [(5, 1, 0)] * 17, 0),               # empty ID3v2 tag
        (4006, [(11, 0, 1)] * 29, 341),            # ID3v2 tag with body
    ]
    for item_id, specs, id3 in mp3s:
        rate = _MP3_SR[specs[0][1]]
        add(item_id, "mp3", mp3_stream(specs, id3_size=id3), "mp3",
            len(specs), rate, Fraction(len(specs) * 1152, rate))

    # MP4: video-only, audio-only, muxed, v1 mvhd, largesize moov
    mp4s = [
        (4101, b"isom", 90000, 123457, [(b"vide", b"avc1")], False, False),
        (4102, b"M4A ", 44100, 977531, [(b"soun", b"mp4a")], False, False),
        (4103, b"mp42", 1000, 73211,
         [(b"vide", b"avc1"), (b"soun", b"mp4a")], False, False),
        (4104, b"isom", 600, 44449,
         [(b"soun", b"mp4a"), (b"vide", b"hvc1")], True, False),
        (4105, b"isom", 30000, 299993, [(b"vide", b"av01")], False, True),
    ]
    for item_id, brand, ts, dur, tracks, v1, large in mp4s:
        codec = "+".join(sorted(
            f"{k.decode()}:{c.decode()}" for k, c in tracks))
        add(item_id, "mp4",
            mp4_file(brand, ts, dur, tracks, mvhd_v1=v1, largesize_moov=large),
            codec, len(tracks), None, Fraction(dur, ts))
    return rows, gold


# ---------------------------------------------------------------------------
# MPEG-1 Layer I/II fixtures — an INDEPENDENT encoder (own bit writer, own
# layout walk) so the decoder gate is a genuine round-trip, mirroring the
# separate-implementation pattern of flac_constant_square
# ---------------------------------------------------------------------------


class _MpegBits:
    """MSB-first bit writer (independent of the decoder's _FlacBits)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def w(self, v: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                self.acc = self.n = 0

    def frame(self, total_bytes: int) -> bytes:
        if self.n:
            self.buf.append(self.acc << (8 - self.n))
            self.acc = self.n = 0
        if len(self.buf) > total_bytes:
            raise ValueError("planted payload overflows the frame")
        return bytes(self.buf) + bytes(total_bytes - len(self.buf))


#: fixture-side mirror of the decoder's Table B.2a columns
_FIX_B2A = [
    (4, (3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191, 16383,
         32767, 65535)),
    (4, (3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191,
         65535)),
    (3, (3, 5, 7, 9, 15, 31, 65535)),
    (2, (3, 5, 65535)),
]


def _fix_b2a_row(sb: int) -> tuple[int, tuple[int, ...]]:
    return _FIX_B2A[0 if sb < 3 else 1 if sb < 11 else 2 if sb < 23 else 3]


_MP2_FIX_KBPS = [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
                 320, 384]
_MP1_FIX_KBPS = [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
                 384, 416, 448]


def mp2_planted(n_frames: int, kbps_idx: int, plant: list[tuple],
                n_ch: int = 1) -> bytes:
    """MPEG-1 Layer II 48 kHz stream with planted subband content.

    `plant` rows are (sb, steps, scfsi, sf_idx_by_third, hi_code, lo_code):
    subband `sb` gets the quantizer with `steps` levels, scalefactor
    indices per granule-third consistent with `scfsi` (0: three, 1: two
    applied a,a,b; 2: one; 3: two applied a,b,b), and granule-alternating
    codes hi (even granules) / lo (odd). Grouped quantizers (3/5/9) pack
    the code three-identical base-`steps`; channels are planted
    identically (channel-average == either channel)."""
    out = bytearray()
    frame_len = (144 * _MP2_FIX_KBPS[kbps_idx] * 1000) // 48000
    by_sb = {p[0]: p for p in plant}
    for _ in range(n_frames):
        b = _MpegBits()
        b.w(0x7FF, 11)
        b.w(0x3, 2)        # MPEG-1
        b.w(0x2, 2)        # Layer II
        b.w(1, 1)          # no CRC
        b.w(kbps_idx, 4)
        b.w(1, 2)          # 48 kHz
        b.w(0, 1)          # no padding
        b.w(0, 1)          # private
        b.w(0x3 if n_ch == 1 else 0x0, 2)  # mono / stereo
        b.w(0, 2); b.w(0, 1); b.w(0, 1); b.w(0, 2)
        for sb in range(27):  # allocation
            nbal, col = _fix_b2a_row(sb)
            code = col.index(by_sb[sb][1]) + 1 if sb in by_sb else 0
            for _c in range(n_ch):
                b.w(code, nbal)
        for sb in range(27):  # scfsi
            if sb in by_sb:
                for _c in range(n_ch):
                    b.w(by_sb[sb][2], 2)
        for sb in range(27):  # scalefactors
            if sb in by_sb:
                _, _, scfsi, sf3, _, _ = by_sb[sb]
                sent = {0: (sf3[0], sf3[1], sf3[2]), 1: (sf3[0], sf3[2]),
                        2: (sf3[0],), 3: (sf3[0], sf3[1])}[scfsi]
                for _c in range(n_ch):
                    for s in sent:
                        b.w(s, 6)
        for gr in range(12):  # sample codes
            for sb in range(27):
                if sb not in by_sb:
                    continue
                _, steps, _, _, hi, lo = by_sb[sb]
                c = hi if gr % 2 == 0 else lo
                for _c in range(n_ch):
                    if steps in (3, 5, 9):
                        b.w(c + steps * c + steps * steps * c,
                            {3: 5, 5: 7, 9: 10}[steps])
                    else:
                        for _j in range(3):
                            b.w(c, steps.bit_length())
        out += b.frame(frame_len)
    return bytes(out)


def mp1_planted(n_frames: int, kbps_idx: int, plant: list[tuple]) -> bytes:
    """Mono MPEG-1 Layer I 48 kHz stream; `plant` rows are
    (sb, alloc, sf_idx, hi_code, lo_code) — allocation `alloc` means
    alloc+1-bit codes (2^(alloc+1)-1 levels), samples alternate hi (even
    sample index) / lo (odd)."""
    out = bytearray()
    frame_len = ((12 * _MP1_FIX_KBPS[kbps_idx] * 1000) // 48000) * 4
    by_sb = {p[0]: p for p in plant}
    for _ in range(n_frames):
        b = _MpegBits()
        b.w(0x7FF, 11); b.w(0x3, 2); b.w(0x3, 2); b.w(1, 1)
        b.w(kbps_idx, 4); b.w(1, 2); b.w(0, 1); b.w(0, 1)
        b.w(0x3, 2); b.w(0, 2); b.w(0, 1); b.w(0, 1); b.w(0, 2)
        for sb in range(32):
            b.w(by_sb[sb][1] if sb in by_sb else 0, 4)
        for sb in range(32):
            if sb in by_sb:
                b.w(by_sb[sb][2], 6)
        for t in range(12):
            for sb in range(32):
                if sb in by_sb:
                    _, alloc, _, hi, lo = by_sb[sb]
                    b.w(hi if t % 2 == 0 else lo, alloc + 1)
        out += b.frame(frame_len)
    return bytes(out)


def _mp12_exact(code: int, steps: int, sf_idx: int) -> Fraction:
    """EXACT rational decode of one planted code: C*(s'''+D)*SF with
    C = 2^nb/steps, s''' = code/2^(nb-1) - 1, D = 1/2 (grouped) or
    2^(1-nb), SF = 2^(1 - idx/3) — fixture golds only use sf_idx
    multiples of 3, where the scalefactor is an exact dyadic."""
    assert sf_idx % 3 == 0
    nb = steps.bit_length()
    s3 = Fraction(code, 1 << (nb - 1)) - 1
    d = Fraction(1, 2) if steps in (3, 5, 9) else Fraction(2, 1 << nb)
    sf = Fraction(2, 1 << (sf_idx // 3))
    return Fraction(1 << nb, steps) * (s3 + d) * sf


def build_mp12_media() -> tuple[list[dict], list[dict]]:
    """Returns (mpeg_rows, mpeg_goldens): Layer I/II streams whose
    dominant-subband RMS is closed-form — each item plants symmetric
    +-v codes (|v| constant per third), so dom_rms is an exact rational
    computed by _mp12_exact, never by running the decoder."""
    rows: list[dict] = []
    gold: list[dict] = []

    def add(item_id: int, layer: int, content: bytes, n_ch: int,
            n_frames: int, dom_sb: int, rms: Fraction) -> None:
        rows.append({"item_id": item_id, "format": f"mp{layer}",
                     "content": bytearray(content)})
        gold.append({"item_id": item_id, "layer": layer,
                     "sample_rate": 48000, "n_channels": n_ch,
                     "n_frames": n_frames,
                     "n_granules": (36 if layer == 2 else 12) * n_frames,
                     "dom_subband": dom_sb, "rms9": _mean9(rms)})

    # Layer II mono: one planted subband per quantizer family, each in a
    # different Table B.2a allocation class (codes chosen so hi = -lo)
    l2 = [
        (5001, 0, 3, 2, 0, 2, 3),        # grouped 3-level, LOW class
        (5002, 7, 5, 2, 4, 0, 6),        # grouped 5-level, MID class
        (5003, 12, 9, 2, 8, 0, 3),       # grouped 9-level, HIGH class
        (5004, 2, 15, 2, 14, 0, 0),      # ungrouped 4-bit, LOW class
        (5005, 25, 65535, 2, (1 << 15) + (1 << 12) - 1,
         (1 << 15) - (1 << 12) - 1, 9),  # ungrouped 16-bit, TOP class
    ]
    for item_id, sb, steps, scfsi, hi, lo, sfi in l2:
        nf = 3 + item_id % 3
        content = mp2_planted(nf, 6, [(sb, steps, scfsi, (sfi,) * 3, hi, lo)])
        v = _mp12_exact(hi, steps, sfi)
        assert v == -_mp12_exact(lo, steps, sfi)
        add(item_id, 2, content, 1, nf, sb, abs(v))
    # Layer II stereo (mode 00), channel-identical: average == either
    nf = 4
    content = mp2_planted(nf, 10, [(0, 3, 2, (3, 3, 3), 2, 0)], n_ch=2)
    add(5006, 2, content, 2, nf, 0, abs(_mp12_exact(2, 3, 3)))
    # Layer II scfsi variety: sb0 dominates with a constant scalefactor
    # (scfsi=0, three identical transmitted); sb4 exercises the 2-of-3
    # scfsi=1 spread (thirds a,a,b with b quieter) — a mis-spread desyncs
    # the whole payload, so dom stays closed-form while scfsi is exercised
    nf = 5
    content = mp2_planted(nf, 6, [
        (0, 3, 0, (3, 3, 3), 2, 0),
        (4, 3, 1, (6, 6, 12), 2, 0),
    ])
    add(5007, 2, content, 1, nf, 0, abs(_mp12_exact(2, 3, 3)))
    # scfsi=3 spread (thirds a,b,b), dominant on the OTHER subband
    nf = 3
    content = mp2_planted(nf, 6, [
        (1, 3, 3, (9, 15, 15), 2, 0),
        (11, 3, 2, (3, 3, 3), 2, 0),
    ])
    add(5008, 2, content, 1, nf, 11, abs(_mp12_exact(2, 3, 3)))

    # Layer I: 3-bit and 15-bit quantizers
    for item_id, sb, alloc, sfi, hi, lo, kbps_idx, nf in (
        (5011, 5, 2, 6, 6, 0, 2, 4),
        (5012, 30, 14, 0, (1 << 14) + (1 << 11) - 1,
         (1 << 14) - (1 << 11) - 1, 4, 3),
    ):
        content = mp1_planted(nf, kbps_idx, [(sb, alloc, sfi, hi, lo)])
        steps = (1 << (alloc + 1)) - 1
        v = _mp12_exact(hi, steps, sfi)
        assert v == -_mp12_exact(lo, steps, sfi)
        add(item_id, 1, content, 1, nf, sb, abs(v))
    return rows, gold


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
    """{'images'|'gifs'|'avis'|'audio': DataFrame} read from the cached
    parquet materialization (pure JVM scans after first write)."""
    key = id(spark)
    if key not in _handles:
        images, _, gifs, _ = build_media()
        avis, _, audio, _ = build_av_media()
        containers, _ = build_container_media()
        mpeg_audio, _ = build_mp12_media()
        tables = {"images": (images, 4), "gifs": (gifs, 2),
                  "avis": (avis, 2), "audio": (audio, 2),
                  "containers": (containers, 2),
                  "mpeg_audio": (mpeg_audio, 2)}
        digest = hashlib.md5(
            b"".join(bytes(r["content"])
                     for r in images + gifs + avis + audio + containers
                     + mpeg_audio)
        ).hexdigest()[:16]
        base = _media_dir(f"v2_{digest}")
        if not os.path.isdir(base):
            tmp = f"{base}.tmp{os.getpid()}"
            try:
                for name, (rows, n_files) in tables.items():
                    spark.createDataFrame(rows, _IMG_DDL).coalesce(
                        n_files
                    ).write.mode("overwrite").parquet(f"{tmp}/{name}")
                os.rename(tmp, base)
            except OSError:
                import shutil

                shutil.rmtree(tmp, ignore_errors=True)
        _handles[key] = {
            name: spark.read.schema(_IMG_DDL).parquet(f"{base}/{name}")
            for name in tables
        }
    return _handles[key]
