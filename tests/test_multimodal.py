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


def _png_bytes(w, h, px_rows, color_type, filters):
    """Hand-built PNG: `px_rows` is h rows of per-pixel channel tuples;
    `filters` gives the filter byte per scanline, and the scanlines are
    FORWARD-filtered here (independently of the decoder) so the test
    round-trips the real unfilter math."""
    import struct
    import zlib

    ch = {0: 1, 2: 3, 6: 4}[color_type]
    stride = w * ch
    flat = [list(b for px in row for b in (px if isinstance(px, tuple) else (px,)))
            for row in px_rows]
    raw = bytearray()
    prior = [0] * stride
    for y, row in enumerate(flat):
        f = filters[y]
        raw.append(f)
        for x in range(stride):
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
            raw.append(enc & 0xFF)
        prior = row

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def test_decode_png_roundtrip_all_filters():
    """8-bit RGB PNG through every scanline filter type: the decoder must
    recover the exact pixels (compared via the PPM decode of the same
    image, an independent code path)."""
    from brontes_spark.operators.multimodal import decode_image, decode_png

    import random

    rng = random.Random(7)
    w, h = 6, 5
    px_rows = [[(rng.randrange(256), rng.randrange(256), rng.randrange(256))
                for _ in range(w)] for _ in range(h)]
    png = _png_bytes(w, h, px_rows, color_type=2, filters=[0, 1, 2, 3, 4])
    got = decode_png(png)
    ref = decode_ppm_of(px_rows, w, h)
    assert (got["width"], got["height"]) == (w, h)
    assert got["mean_intensity"] == ref["mean_intensity"]
    assert got["feature_vec"] == ref["feature_vec"]
    # sniffing dispatch picks the PNG path
    assert decode_image(png) == got


def decode_ppm_of(px_rows, w, h):
    from brontes_spark.operators.multimodal import decode_ppm

    flat = [px for row in px_rows for px in row]
    return decode_ppm(_ppm_bytes(w, h, flat))


def test_decode_png_gray_and_rgba():
    from brontes_spark.operators.multimodal import decode_png

    # grayscale ramp, Sub+Paeth filters
    g = decode_png(_png_bytes(2, 2, [[0, 128], [255, 64]], 0, [1, 4]))
    assert (g["width"], g["height"]) == (2, 2)
    assert abs(g["mean_intensity"] - (0 + 128 + 255 + 64) / 4 / 255) < 1e-12
    # RGBA: alpha ignored for intensity — equals the RGB twin
    rgb_rows = [[(10, 20, 30), (200, 100, 0)], [(0, 0, 0), (255, 255, 255)]]
    rgba_rows = [[(10, 20, 30, 7), (200, 100, 0, 255)],
                 [(0, 0, 0, 0), (255, 255, 255, 128)]]
    a = decode_png(_png_bytes(2, 2, rgba_rows, 6, [4, 3]))
    b = decode_png(_png_bytes(2, 2, rgb_rows, 2, [2, 1]))
    assert a["feature_vec"] == b["feature_vec"]
    assert a["mean_intensity"] == b["mean_intensity"]


def test_decode_png_rejects_unsupported():
    import struct
    import zlib

    import pytest as _pytest

    from brontes_spark.operators.multimodal import decode_png

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    # 16-bit depth raises; palette (color 3) is supported since r5 but a
    # palette image WITHOUT a PLTE chunk is invalid and still raises
    for depth, color in ((16, 2), (8, 3)):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, color, 0, 0, 0)
        data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(b"\x00" * 20)))
        with _pytest.raises(ValueError):
            decode_png(data)
    with _pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\n")  # no chunks at all


def test_decode_png_palette():
    """8-bit palette PNG: indices resolve through PLTE to the same pixels
    (and features) as the equivalent truecolor PNG."""
    import struct
    import zlib

    from brontes_spark.operators.multimodal import decode_png

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    idx_rows = [[0, 1], [2, 3]]
    raw = b"".join(bytes([0] + row) for row in idx_rows)  # filter 0 rows
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    pal = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"PLTE", bytes(c for rgb in colors for c in rgb))
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    got = decode_png(pal)
    rgb_rows = [[colors[i] for i in row] for row in idx_rows]
    want = decode_png(_png_bytes(2, 2, rgb_rows, 2, [0, 0]))
    assert got == want


def test_extract_image_features_real_codec(spark):
    from brontes_spark.operators.multimodal import decode_image, extract_image_features

    px = [(10, 20, 30)] * 9
    rows = [
        (1, _ppm_bytes(3, 3, px), "ppm"),
        (2, _bmp_bytes(2, 2, [[(0, 0, 0), (255, 255, 255)], [(0, 0, 0), (255, 255, 255)]]), "bmp"),
        (3, b"\xff\xd8 jpeg needs a plugged codec", "jpeg"),  # quarantined
        (4, _png_bytes(3, 3, [px[:3]] * 3, 2, [0, 2, 4]), "png"),
    ]
    df = spark.createDataFrame(rows, "item_id long, content binary, format string")
    out = {r["item_id"]: r.asDict() for r in
           extract_image_features(df, decode_fn=decode_image).collect()}
    assert set(out) == {1, 2, 4}
    assert (out[1]["width"], out[1]["height"]) == (3, 3)
    assert abs(out[2]["mean_intensity"] - 0.5) < 1e-12
    # PNG and PPM of the same pixels agree end-to-end through mapInPandas
    assert out[4]["feature_vec"] == out[1]["feature_vec"]
    assert out[4]["mean_intensity"] == out[1]["mean_intensity"]


# ---- minimal baseline JPEG encoder (test-side golden source) ----
# DC-only blocks with tiny custom Huffman tables: enough to produce REAL
# spec-conformant baseline files (quant, canonical Huffman, byte stuffing,
# optional 4:2:0 sampling and restart markers) without any codec library.

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value, n):
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self):
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)  # pad 1s


#: AC Huffman symbols shared by the test encoders, canonical codes 0..8 of
#: length 4: EOB, (run,size) pairs used by the planted-coefficient tests,
#: ZRL, and an EOBRUN-2 symbol for multi-block runs in progressive scans.
_AC_SYMS = [0x00, 0x01, 0x11, 0x21, 0x02, 0x41, 0x22, 0xF0, 0x20]


def _ac_code(sym):
    return format(_AC_SYMS.index(sym), "04b")


def _dc_cat(v):
    return v.bit_length() if v > 0 else (-v).bit_length()


def _jpeg_bytes(w, h, comps, sampling, dri=0):
    """comps: list of per-component flat pixel values (len 1 or 3, YCbCr);
    sampling: [(hs, vs)] per component. DC-only, q[DC]=8."""
    import struct

    q = bytes([8] + [16] * 63)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + q
    ncomp = len(comps)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for i, (hs, vs) in enumerate(sampling):
        out += bytes([i + 1, (hs << 4) | vs, 0])
    # DC table: 12 codes of length 4 (symbol k <-> code k); AC: the 9
    # symbols of _AC_SYMS as codes 0..8 of length 4 (EOB is code 0000)
    dc_counts = bytes([0, 0, 0, 12] + [0] * 12)
    ac_counts = bytes([0, 0, 0, len(_AC_SYMS)] + [0] * 12)
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 12) + b"\x00" + dc_counts + bytes(range(12))
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(_AC_SYMS)) + b"\x10" + ac_counts + bytes(_AC_SYMS)
    if dri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, dri)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for i in range(ncomp):
        out += bytes([i + 1, 0x00])
    out += b"\x00\x3f\x00"

    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    bw = _BitWriter()
    dc_pred = [0] * ncomp
    n_mcu = 0
    rst = 0
    for _ in range(mcux * mcuy):
        if dri and n_mcu and n_mcu % dri == 0:
            bw.flush()
            out += bw.out + bytes([0xFF, 0xD0 + rst % 8])
            bw = _BitWriter()
            rst += 1
            dc_pred = [0] * ncomp
        for ci, (hs, vs) in enumerate(sampling):
            dc_q = round(8 * (comps[ci] - 128) / 8)  # quantized DC
            for _ in range(hs * vs):
                diff = dc_q - dc_pred[ci]
                dc_pred[ci] = dc_q
                t = _dc_cat(diff)
                bw.write(t, 4)  # DC huffman: symbol t <-> 4-bit code t
                if t:
                    bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
                bw.write(0, 4)  # AC EOB (code 0000)
        n_mcu += 1
    bw.flush()
    out += bw.out + b"\xff\xd9"
    return bytes(out)


def test_decode_jpeg_grayscale_solid():
    from brontes_spark.operators.multimodal import decode_image, decode_jpeg

    data = _jpeg_bytes(16, 16, [200], [(1, 1)])
    got = decode_jpeg(data)
    assert (got["width"], got["height"]) == (16, 16)
    assert abs(got["mean_intensity"] - 200 / 255) < 2 / 255
    # every 4x4 grid cell of a solid image has the same feature value
    assert max(got["feature_vec"]) - min(got["feature_vec"]) < 1e-12
    assert decode_image(data) == got  # sniffing dispatch


def test_decode_jpeg_color_444_and_420_agree():
    from brontes_spark.operators.multimodal import decode_jpeg

    # solid RGB (60, 120, 180) -> YCbCr per the JFIF formulas
    r, g, b = 60, 120, 180
    y = round(0.299 * r + 0.587 * g + 0.114 * b)
    cb = round(128 - 0.168736 * r - 0.331264 * g + 0.5 * b)
    cr = round(128 + 0.5 * r - 0.418688 * g - 0.081312 * b)
    j444 = decode_jpeg(_jpeg_bytes(16, 16, [y, cb, cr], [(1, 1), (1, 1), (1, 1)]))
    j420 = decode_jpeg(_jpeg_bytes(16, 16, [y, cb, cr], [(2, 2), (1, 1), (1, 1)]))
    # _gray_stats grays via the CHANNEL MEAN (not luma), so the expected
    # intensity is mean(r, g, b) after the YCbCr round trip
    want = (r + g + b) / 3 / 255
    for got in (j444, j420):
        assert (got["width"], got["height"]) == (16, 16)
        assert abs(got["mean_intensity"] - want) < 4 / 255
    # solid image: subsampling must not change the reconstruction
    assert abs(j444["mean_intensity"] - j420["mean_intensity"]) < 1e-9


def test_decode_jpeg_restart_markers_and_rejects():
    import pytest

    from brontes_spark.operators.multimodal import decode_jpeg

    # DRI=1: three restart segments across a 32x8 gray image; DC predictors
    # reset per segment, result identical to the unsegmented encoding
    plain = decode_jpeg(_jpeg_bytes(32, 8, [90], [(1, 1)]))
    rst = decode_jpeg(_jpeg_bytes(32, 8, [90], [(1, 1)], dri=1))
    assert rst == plain

    # SOF3 (lossless) stays rejected; SOF2 is handled since r5 (see the
    # progressive tests below). A SOF2 header with no scan also raises.
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xc3" + b"\x00\x0b" + b"\x08" + b"\x00\x10" * 2 + b"\x01\x01\x11\x00")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xc2" + b"\x00\x0b" + b"\x08" + b"\x00\x10" * 2 + b"\x01\x01\x11\x00" + b"\xff\xd9")
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")


# ---- WAV/PCM audio ----

def _wav_bytes(samples, rate=8000, bits=16, n_ch=1):
    """Minimal RIFF/WAVE PCM writer (test-side golden source)."""
    import struct

    import numpy as np

    x = np.asarray(samples, dtype=np.float64)
    if bits == 16:
        raw = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
    elif bits == 8:
        raw = (np.clip(x, -1, 1) * 127 + 128).astype(np.uint8).tobytes()
    else:
        raise ValueError(bits)
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * n_ch * bits // 8,
                      n_ch * bits // 8, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(raw)) + raw + (b"\x00" if len(raw) % 2 else b"")
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_decode_wav_sine_features():
    """A 440 Hz sine at 8 kHz: decoded features must recover the duration,
    the RMS of a sine (1/sqrt(2) of amplitude), and the dominant frequency
    from the FFT peak."""
    import numpy as np

    from brontes_spark.operators.multimodal import audio_features, decode_wav

    rate, secs, freq, amp = 8000, 1.0, 440.0, 0.5
    t = np.arange(int(rate * secs)) / rate
    wav = _wav_bytes(amp * np.sin(2 * np.pi * freq * t), rate=rate)
    f = audio_features(decode_wav(wav))
    assert f["sample_rate"] == rate and f["n_channels"] == 1
    assert f["duration_sec"] == 1.0
    assert abs(f["rms"] - amp / np.sqrt(2)) < 1e-3
    assert abs(f["dominant_freq_hz"] - freq) < 1.0
    # 440 Hz sine crosses zero ~2*440 times/sec -> rate-normalized ~0.11
    assert abs(f["zero_cross_rate"] - 2 * freq / rate) < 0.01


def test_decode_wav_8bit_stereo_and_rejects():
    import numpy as np
    import pytest

    from brontes_spark.operators.multimodal import audio_features, decode_wav

    t = np.arange(800) / 8000.0
    x = 0.25 * np.sin(2 * np.pi * 100 * t)
    stereo = np.repeat(x, 2)  # L == R
    wav = _wav_bytes(stereo, rate=8000, bits=8, n_ch=2)
    f = audio_features(decode_wav(wav))
    assert f["n_channels"] == 2 and f["n_samples"] == 800
    assert abs(f["rms"] - 0.25 / np.sqrt(2)) < 0.01  # channel-avg keeps level

    with pytest.raises(ValueError):
        decode_wav(b"ID3\x03mp3 data is not pcm")
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x00\x00\x00\x00WAVEjunk")


def test_extract_audio_features_mapinpandas(spark):
    """Arrow-batched plumbing: good WAVs land with features, corrupt bytes
    quarantine (dropped), schema is stable."""
    import numpy as np

    from brontes_spark.operators.multimodal import extract_audio_features

    t = np.arange(4000) / 8000.0
    rows = [
        (1, bytearray(_wav_bytes(0.5 * np.sin(2 * np.pi * 440 * t)))),
        (2, bytearray(b"not audio at all")),
        (3, bytearray(_wav_bytes(0.1 * np.sin(2 * np.pi * 1000 * t)))),
    ]
    df = spark.createDataFrame(rows, "item_id long, content binary")
    out = {r["item_id"]: r.asDict() for r in extract_audio_features(df).collect()}
    assert set(out) == {1, 3}
    assert out[1]["duration_sec"] == 0.5
    assert abs(out[3]["dominant_freq_hz"] - 1000.0) < 2.0



# ---- progressive JPEG (SOF2) ----

def _prog_jpeg(w, h, scans, dri=0):
    """Minimal progressive grayscale JPEG: same quant/Huffman tables as
    _jpeg_bytes, SOF2, and caller-supplied (ss, se, ah, al, bit_string)
    scans — entropy payloads are '01' strings so tests can hand-author
    exact multi-scan streams."""
    import struct

    q = bytes([8] + [16] * 63)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + q
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, h, w, 1) + bytes([1, 0x11, 0])
    dc_counts = bytes([0, 0, 0, 12] + [0] * 12)
    ac_counts = bytes([0, 0, 0, len(_AC_SYMS)] + [0] * 12)
    out += b"\xff\xc4" + struct.pack(">H", 31) + b"\x00" + dc_counts + bytes(range(12))
    out += b"\xff\xc4" + struct.pack(">H", 19 + len(_AC_SYMS)) + b"\x10" + ac_counts + bytes(_AC_SYMS)
    if dri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, dri)
    for ss, se, ah, al, bits in scans:
        out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00])
        out += bytes([ss, se, (ah << 4) | al])
        bw = _BitWriter()
        for b in bits:
            bw.write(int(b), 1)
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _bits_of(value, n):
    return format(value & ((1 << n) - 1), f"0{n}b") if n else ""


def _dc_sym(diff):
    t = diff.bit_length() if diff > 0 else (-diff).bit_length()
    lo = diff if diff > 0 else diff + (1 << t) - 1
    return _bits_of(t, 4) + _bits_of(lo, t)


def test_progressive_jpeg_dc_split_matches_baseline():
    """Solid gray through DC-first (Al=1) + DC-refinement (Al=0) + one AC
    scan whose single EOBRUN-4 symbol covers all four blocks: must equal
    the baseline encoding of the same image exactly. gray=101 makes the
    quantized DC negative and odd, exercising the arithmetic >>/<< and the
    |=1 refinement on a negative coefficient."""
    from brontes_spark.operators.multimodal import decode_image, decode_jpeg

    gray = 101            # dc_q = -27: -27 >> 1 = -14, refine bit = 1
    dc_q = gray - 128
    hi, lo = dc_q >> 1, dc_q & 1
    scans = [
        (0, 0, 0, 1, _dc_sym(hi) + _dc_sym(0) * 3),   # DC first, Al=1
        (0, 0, 1, 0, f"{lo}" * 4),                    # DC refinement
        (1, 63, 0, 0, _ac_code(0x20) + "00"),         # EOBRUN = 4 blocks
    ]
    prog = decode_jpeg(_prog_jpeg(16, 16, scans))
    base = decode_jpeg(_jpeg_bytes(16, 16, [gray], [(1, 1)]))
    assert prog == base
    assert abs(prog["mean_intensity"] - gray / 255) < 2 / 255
    assert decode_image(_prog_jpeg(16, 16, scans)) == prog  # sniffing


def test_progressive_jpeg_ac_first_and_refinement():
    """Single 8x8 block: an AC coefficient sent coarse (Al=1) then given its
    correction bit, plus a coefficient that becomes newly significant ONLY
    in the refinement scan. Decoded output must equal the independently
    computed IDCT of the target dequantized coefficients."""
    import numpy as np

    from brontes_spark.operators.multimodal import _ZIGZAG, _gray_stats, decode_jpeg

    dc_q, ac3 = 40, 6  # zigzag slot 3 target 6 = 0b110; slot 6 target +1
    scans = [
        (0, 0, 0, 0, _dc_sym(dc_q)),  # full DC
        # AC first at Al=1: run 2 zeros then value 6>>1 = 3 (symbol r=2,s=2)
        (1, 63, 0, 1, _ac_code(0x22) + "11" + _ac_code(0x00)),
        # AC refinement at Al=0: symbol (r=4,s=1)+sign makes slot 6 newly
        # significant (+1); along the way slot 3 (history 6) reads its
        # correction bit (0: 6 is already exact); then EOB
        (1, 63, 1, 0, _ac_code(0x41) + "1" + "0" + _ac_code(0x00)),
    ]
    got = decode_jpeg(_prog_jpeg(8, 8, scans))

    # independent reconstruction of the target coefficients
    q = np.full(64, 16.0); q[0] = 8.0
    zz = np.zeros(64); zz[0], zz[3], zz[6] = dc_q, ac3, 1
    blk = np.zeros(64)
    blk[_ZIGZAG] = zz * q
    u = np.arange(8)
    B = np.cos((2 * u[None, :] + 1) * u[:, None] * np.pi / 16) / 2
    B[0, :] /= np.sqrt(2)
    px = B.T @ blk.reshape(8, 8) @ B + 128.0
    rgb = np.repeat(np.clip(px, 0, 255)[:, :, None], 3, axis=2).astype(np.uint8)
    assert got == _gray_stats(rgb)


# ---- GIF ----

def _gif_bytes(w, h, colors, indices, clear_every=1, extension=True):
    """Minimal GIF89a writer: global color table + one frame whose LZW
    stream emits a CLEAR before every `clear_every` pixels (a valid stream
    that keeps codes at min+1 bits), packed LSB-first."""
    import math
    import struct

    n = max(2, 1 << math.ceil(math.log2(max(len(colors), 2))))
    min_code = max(2, n.bit_length() - 1)
    clear, end = 1 << min_code, (1 << min_code) + 1

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (min_code - 1), 0, 0)
    for i in range(1 << min_code):
        out += bytes(colors[i] if i < len(colors) else (0, 0, 0))
    if extension:  # graphic-control extension: must be skipped cleanly
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out += bytes([min_code])

    bits = []
    width = min_code + 1
    codes = []
    for j, px in enumerate(indices):
        if j % clear_every == 0:
            codes.append(clear)
        codes.append(px)
    codes.append(end)
    # NOTE: with clear_every=1 the dictionary never grows past the two
    # reserved codes, so every code stays at min_code+1 bits
    acc = nbits = 0
    stream = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        stream.append(acc & 0xFF)
    out += bytes([len(stream)]) + bytes(stream) + b"\x00\x3b"
    return bytes(out)


def test_decode_gif_matches_ppm_twin():
    from brontes_spark.operators.multimodal import decode_gif, decode_image

    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    indices = [0, 1, 2, 3]  # 2x2
    gif = _gif_bytes(2, 2, colors, indices)
    got = decode_gif(gif)
    want = decode_ppm_of([[colors[0], colors[1]], [colors[2], colors[3]]], 2, 2)
    assert got == want
    assert decode_image(gif) == got  # sniffing dispatch


def test_gif_lzw_dictionary_growth_and_kwkwk():
    """Hand-authored LZW streams exercising real dictionary growth and the
    KwKwK (code == next unassigned) special case."""
    from brontes_spark.operators.multimodal import _lzw_decode

    def pack(codes, width):
        acc = nbits = 0
        stream = bytearray()
        for c in codes:
            acc |= c << nbits
            nbits += width
            while nbits >= 8:
                stream.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            stream.append(acc & 0xFF)
        return bytes(stream)

    # min=2: clear=4, end=5. codes [CLEAR, 0, 0, END]: second 0 adds "00"
    assert _lzw_decode(pack([4, 0, 0, 5], 3), 2, 2) == [0, 0]
    # [CLEAR, 0, 6, END]: 6 is the NEXT unassigned code -> KwKwK: "00"
    assert _lzw_decode(pack([4, 0, 6, 5], 3), 2, 3) == [0, 0, 0]
    # growth then reuse: [CLEAR, 0, 1, 6, END]: 6 = "01"
    assert _lzw_decode(pack([4, 0, 1, 6, 5], 3), 2, 4) == [0, 1, 0, 1]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _lzw_decode(pack([4, 0, 9, 5], 3), 2, 4)  # code beyond table


def test_decode_gif_rejects():
    import pytest as _pytest

    from brontes_spark.operators.multimodal import decode_gif

    with _pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b"\x00" * 7)  # no image data
    with _pytest.raises(ValueError):
        decode_gif(b"not a gif")


def test_decode_png_16bit():
    """16-bit RGB PNG (big-endian samples, byte-level filters with the
    widened left-neighbor distance): high-byte downscale must reproduce the
    8-bit twin exactly when low bytes echo the high bytes."""
    import struct
    import zlib

    from brontes_spark.operators.multimodal import decode_png

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    rgb_rows = [[(10, 200, 30), (250, 5, 90)], [(0, 128, 255), (60, 61, 62)]]
    # forward-filter with Sub (f=1) on row 0 and Up (f=2) on row 1, at the
    # 16-bit byte distances, independently of the decoder
    raw = bytearray()
    flat16 = [[b for px in row for v in px for b in ((v << 8) | v).to_bytes(2, "big")]
              for row in rgb_rows]
    stride, chb = len(flat16[0]), 6
    prior = [0] * stride
    for y, row in enumerate(flat16):
        f = 1 if y == 0 else 2
        raw.append(f)
        for x in range(stride):
            if f == 1:
                enc = row[x] - (row[x - chb] if x >= chb else 0)
            else:
                enc = row[x] - prior[x]
            raw.append(enc & 0xFF)
        prior = row
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    png16 = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
             + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))
    got = decode_png(png16)
    want = decode_png(_png_bytes(2, 2, rgb_rows, 2, [1, 2]))
    assert got == want


def _filter_rows(flat_rows, stride, ch, filters):
    """Forward-filter scanlines (independent reimplementation of the PNG
    filter math, mirroring _png_bytes) -> bytes of (filter + filtered row)*."""
    raw = bytearray()
    prior = [0] * stride
    for y, row in enumerate(flat_rows):
        f = filters[y % len(filters)]
        raw.append(f)
        for x in range(stride):
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
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc = row[x] - pred
            raw.append(enc & 0xFF)
        prior = row
    return bytes(raw)


def _png_interlaced_bytes(w, h, px_rows, color_type, filters):
    """Adam7-interlaced PNG encoder: split the image into the seven passes
    (spec §8.2 grid), forward-filter each pass independently, concatenate."""
    import struct
    import zlib

    ch = {0: 1, 2: 3, 6: 4}[color_type]
    adam7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
             (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    raw = bytearray()
    for xs, ys, xstep, ystep in adam7:
        sub = []
        for y in range(ys, h, ystep):
            row = []
            for x in range(xs, w, xstep):
                px = px_rows[y][x]
                row.extend(px if isinstance(px, tuple) else (px,))
            if row:
                sub.append(row)
        if sub:
            raw += _filter_rows(sub, len(sub[0]), ch, filters)

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def test_decode_png_adam7_matches_sequential_twin():
    """An Adam7-interlaced PNG must decode identically to its
    non-interlaced twin (the palette/16-bit test pattern): random RGB
    pixels, every filter type exercised inside the passes, and a size
    (11x9) that leaves several passes ragged/non-uniform."""
    import random

    from brontes_spark.operators.multimodal import decode_png

    rng = random.Random(42)
    for w, h in [(11, 9), (8, 8), (1, 1), (2, 3), (16, 5)]:
        px_rows = [[(rng.randrange(256), rng.randrange(256), rng.randrange(256))
                    for _ in range(w)] for _ in range(h)]
        seq = _png_bytes(w, h, px_rows, 2, [y % 5 for y in range(h)])
        lace = _png_interlaced_bytes(w, h, px_rows, 2, [0, 1, 2, 3, 4])
        got, want = decode_png(lace), decode_png(seq)
        assert got == want, (w, h)


def test_decode_png_adam7_grayscale():
    """Interlaced 8-bit grayscale: single-channel pass geometry (ch_b=1)."""
    from brontes_spark.operators.multimodal import decode_png

    w, h = 9, 10
    px_rows = [[(x * 7 + y * 13) % 256 for x in range(w)] for y in range(h)]
    seq = _png_bytes(w, h, px_rows, 0, [2] * h)
    lace = _png_interlaced_bytes(w, h, px_rows, 0, [4, 3])
    assert decode_png(lace) == decode_png(seq)


def _lzw_pack(indices, min_code, clear_every=1):
    """CLEAR-before-every-pixel LZW stream (codes stay at min_code+1 bits)."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    codes = []
    for j, px in enumerate(indices):
        if j % clear_every == 0:
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


def _gif_multi_bytes(sw, sh, colors, frames, bg=0):
    """Multi-frame GIF89a writer: each frame = (left, top, w, h, indices,
    disposal, transparent_idx_or_None, interlaced)."""
    import math
    import struct

    n = max(2, 1 << math.ceil(math.log2(max(len(colors), 2))))
    min_code = max(2, n.bit_length() - 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | (min_code - 1), bg, 0)
    for i in range(1 << min_code):
        out += bytes(colors[i] if i < len(colors) else (0, 0, 0))
    for left, top, w, h, indices, disposal, transparent, interlaced in frames:
        flags = (disposal << 2) | (1 if transparent is not None else 0)
        out += bytes([0x21, 0xF9, 4, flags, 0, 0, transparent or 0, 0])
        out += b"\x2c" + struct.pack(
            "<HHHHB", left, top, w, h, 0x40 if interlaced else 0
        )
        if interlaced:  # writer emits rows in pass order
            order = (list(range(0, h, 8)) + list(range(4, h, 8))
                     + list(range(2, h, 4)) + list(range(1, h, 2)))
            rows = [indices[r * w:(r + 1) * w] for r in range(h)]
            indices = [px for r in order for px in rows[r]]
        stream = _lzw_pack(indices, min_code)
        out += bytes([min_code])
        # split into sub-blocks of <=255
        for i in range(0, len(stream), 255):
            blk = stream[i:i + 255]
            out += bytes([len(blk)]) + blk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_gif_multiframe_compositing_golden():
    """Frame k of an N-frame GIF must match its single-frame twin: frame 2
    paints a sub-rect over frame 1's canvas, so the composited result
    equals a hand-assembled full-frame image."""
    from brontes_spark.operators.multimodal import (
        decode_gif, gif_frame_count, gif_parse_frames,
    )

    R, G, B, W = (255, 0, 0), (0, 255, 0), (0, 0, 255), (200, 200, 200)
    colors = [R, G, B, W]
    # frame 0: full 4x2 screen of RED; frame 1: 2x1 GREEN patch at (1,1);
    # frame 2: full screen BLUE
    gif = _gif_multi_bytes(4, 2, colors, [
        (0, 0, 4, 2, [0] * 8, 0, None, False),
        (1, 1, 2, 1, [1, 1], 0, None, False),
        (0, 0, 4, 2, [2] * 8, 0, None, False),
    ])
    assert gif_frame_count(gif) == 3
    frames = gif_parse_frames(gif)
    assert len(frames) == 3
    f0 = decode_ppm_of([[R] * 4, [R] * 4], 4, 2)
    f1 = decode_ppm_of([[R] * 4, [R, G, G, R]], 4, 2)
    f2 = decode_ppm_of([[B] * 4, [B] * 4], 4, 2)
    from brontes_spark.operators.multimodal import _gray_stats

    assert _gray_stats(frames[0]) == f0
    assert _gray_stats(frames[1]) == f1
    assert _gray_stats(frames[2]) == f2
    # first-frame wrapper = frame 0
    assert decode_gif(gif) == f0
    # max_frames bounds the decode work
    assert len(gif_parse_frames(gif, max_frames=2)) == 2


def test_gif_disposal_and_transparency():
    """Disposal 2 restores the rect to background; disposal 3 restores the
    pre-frame canvas; transparent pixels keep the prior canvas."""
    from brontes_spark.operators.multimodal import _gray_stats, gif_parse_frames

    R, G, B, W = (255, 0, 0), (0, 255, 0), (0, 0, 255), (200, 200, 200)
    colors = [R, G, B, W]
    # bg=3 (W). frame 0 fills RED with disposal 2 (restore to bg after) ->
    # frame 1 paints a GREEN pixel at (0,0) on a WHITE canvas, with
    # disposal 3 -> frame 2's transparent-0 patch keeps the restored canvas
    gif = _gif_multi_bytes(2, 1, colors, [
        (0, 0, 2, 1, [0, 0], 2, None, False),
        (0, 0, 1, 1, [1], 3, None, False),
        (0, 0, 2, 1, [0, 2], 0, 0, False),  # idx0 transparent, idx2 = BLUE
    ], bg=3)
    frames = gif_parse_frames(gif)
    assert _gray_stats(frames[0]) == decode_ppm_of([[R, R]], 2, 1)
    assert _gray_stats(frames[1]) == decode_ppm_of([[G, W]], 2, 1)
    # disposal 3 dropped frame 1's GREEN; transparent slot shows WHITE
    assert _gray_stats(frames[2]) == decode_ppm_of([[W, B]], 2, 1)


def test_gif_interlaced_frame():
    """A 4-pass interlaced frame decodes identically to its sequential
    twin (was a quarantine raise before multi-frame support)."""
    from brontes_spark.operators.multimodal import decode_gif

    import random

    rng = random.Random(3)
    w, h = 3, 11  # >8 rows so all four passes are non-trivial
    colors = [(i * 60 % 256, i * 90 % 256, i * 30 % 256) for i in range(4)]
    indices = [rng.randrange(4) for _ in range(w * h)]
    seq = _gif_multi_bytes(w, h, colors, [(0, 0, w, h, indices, 0, None, False)])
    lace = _gif_multi_bytes(w, h, colors, [(0, 0, w, h, indices, 0, None, True)])
    assert decode_gif(lace) == decode_gif(seq)


def test_extract_gif_frame_features_spark(spark):
    """The fused frame-sampling bridge: every_k=2 over a 5-frame GIF
    samples frames 0/2/4 with per-frame composited means; corrupt payloads
    quarantine; the index math matches frame_sample_plan."""
    from brontes_spark.operators.multimodal import (
        extract_gif_frame_features, frame_sample_plan,
    )

    R, G = (255, 0, 0), (0, 255, 0)
    colors = [R, G]
    frames = [(0, 0, 2, 2, [i % 2] * 4, 0, None, False) for i in range(5)]
    gif5 = _gif_multi_bytes(2, 2, colors, frames)
    rows = [(1, bytearray(gif5)), (2, bytearray(b"not a gif"))]
    df = spark.createDataFrame(rows, "item_id long, content binary")
    got = {(r["item_id"], r["frame_idx"]): r
           for r in extract_gif_frame_features(df, every_k=2).collect()}
    assert set(got) == {(1, 0), (1, 2), (1, 4)}
    for (item, k), r in got.items():
        assert (r["width"], r["height"], r["n_frames"]) == (2, 2, 5)
        want = (255 / 3) / 255.0 if k % 2 == 0 else (255 / 3) / 255.0
        assert abs(r["mean_intensity"] - want) < 1e-12
    # index arithmetic parity with the plan-level operator
    meta = spark.createDataFrame([(1, 5)], "item_id long, n_frames int")
    plan = {(r["item_id"], r["frame_idx"])
            for r in frame_sample_plan(meta, every_k=2).collect()}
    assert plan == set(got)


# ---- progressive vs baseline property test (VERDICT r5 directive 8) ----
# A general coefficient-level encoder pair: the same random zigzag
# coefficients encoded as (a) one baseline scan and (b) a 4-scan
# successive-approximation progressive stream (DC first Al=1, DC refine,
# AC first Al=1, AC refine). Both must decode BIT-IDENTICALLY, and match
# an independent numpy IDCT of the target coefficients.

#: AC table for arbitrary low-magnitude coefficients: EOB, ZRL, and (r,s)
#: for r 0..15 x s 1..2 — 34 symbols, all 6-bit canonical codes
_PROP_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in (1, 2)
]


def _prop_ac_dht():
    counts = bytes([0, 0, 0, 0, 0, len(_PROP_AC_SYMS)] + [0] * 10)
    return counts, bytes(_PROP_AC_SYMS)


def _prop_ac_code(sym):
    return format(_PROP_AC_SYMS.index(sym), "06b")


def _size_bits(v):
    """(category, offset-bits) per JPEG F.1.2.1 for a nonzero value."""
    t = v.bit_length() if v > 0 else (-v).bit_length()
    lo = v if v > 0 else v + (1 << t) - 1
    return t, _bits_of(lo, t)


def _enc_block_ac(zz, lo=1, hi=63):
    """Baseline/first-scan AC run-length coding of zz[lo..hi]."""
    bits = ""
    run = 0
    for k in range(lo, hi + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            bits += _prop_ac_code(0xF0)
            run -= 16
        s, off = _size_bits(v)
        bits += _prop_ac_code((run << 4) | s) + off
        run = 0
    if run:
        bits += _prop_ac_code(0x00)  # EOB
    return bits


def _enc_refine_ac(zz, al):
    """AC successive-approximation refinement scan bits for one block:
    newly-significant coefficients as (run-over-zero-history, 1)+sign, with
    correction bits for nonzero-history coefficients interleaved in the
    order the decoder's walk consumes them (T.81 G.1.2.3)."""
    bits = ""
    run = 0    # zero-history slots consumed in the OPEN span
    pend = ""  # correction bits encountered in the open span, positional order
    emitted = False
    for k in range(1, 64):
        v = int(zz[k])
        hist = abs(v) >> (al + 1)  # magnitude known after the first scan
        if hist != 0:
            pend += "1" if (abs(v) >> al) & 1 else "0"
        elif (abs(v) >> al) & 1:  # newly significant (+-p1 at this level)
            bits += (_prop_ac_code((run << 4) | 1)
                     + ("1" if v > 0 else "0") + pend)
            pend, run, emitted = "", 0, True
        else:
            run += 1
            if run == 16:  # this slot completes a ZRL span (decoder breaks
                bits += _prop_ac_code(0xF0) + pend  # on the 16th zero slot)
                pend, run, emitted = "", 0, True
    if run or pend or not emitted:
        bits += _prop_ac_code(0x00) + pend  # EOB(run=1) + EOB-span corrections
    return bits


def _prop_jpeg_pair(w, h, blocks):
    """(baseline_bytes, progressive_bytes) for per-block zigzag coefficient
    arrays `blocks` (row-major MCU order, grayscale)."""
    import struct

    q = bytes([8] + [16] * 63)
    dc_counts = bytes([0, 0, 0, 12] + [0] * 12)
    ac_counts, ac_syms = _prop_ac_dht()

    def headers(sof):
        out = bytearray(b"\xff\xd8")
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + q
        out += sof + struct.pack(">HBHHB", 11, 8, h, w, 1) + bytes([1, 0x11, 0])
        out += (b"\xff\xc4" + struct.pack(">H", 31) + b"\x00" + dc_counts
                + bytes(range(12)))
        out += (b"\xff\xc4" + struct.pack(">H", 19 + len(ac_syms)) + b"\x10"
                + ac_counts + ac_syms)
        return out

    def scan_header(ss, se, ah, al):
        return (b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00])
                + bytes([ss, se, (ah << 4) | al]))

    def pack(bits):
        bw = _BitWriter()
        for b in bits:
            bw.write(int(b), 1)
        bw.flush()
        return bw.out

    # baseline: one interleaved scan, full precision
    base_bits = ""
    dc_pred = 0
    for zz in blocks:
        diff = int(zz[0]) - dc_pred
        dc_pred = int(zz[0])
        if diff:
            t, off = _size_bits(diff)
            base_bits += _bits_of(t, 4) + off
        else:
            base_bits += _bits_of(0, 4)
        base_bits += _enc_block_ac(zz)
    base = bytes(headers(b"\xff\xc0") + scan_header(0, 63, 0, 0)
                 + pack(base_bits) + b"\xff\xd9")

    # progressive: DC first (Al=1) / DC refine / AC first (Al=1) / AC refine
    al = 1
    dc1 = ""
    dc_pred = 0
    for zz in blocks:
        hi = int(zz[0]) >> al  # DC uses arithmetic shift (T.81 G.1.2.1)
        diff = hi - dc_pred
        dc_pred = hi
        dc1 += _dc_sym(diff) if diff else _bits_of(0, 4)
    dc2 = "".join(str(int(zz[0]) & 1) for zz in blocks)
    ac1 = ""
    for zz in blocks:
        # AC first scan codes v/2 truncated toward zero (T.81 G.1.2.2)
        hi_zz = [0] + [int(v) // 2 if v > 0 else -((-int(v)) // 2)
                       for v in zz[1:]]
        ac1 += _enc_block_ac(hi_zz)
    ac2 = "".join(_enc_refine_ac(zz, 0) for zz in blocks)
    prog = bytearray(headers(b"\xff\xc2"))
    for (ss, se, ah, a), bits in [
        ((0, 0, 0, al), dc1), ((0, 0, al, 0), dc2),
        ((1, 63, 0, al), ac1), ((1, 63, al, 0), ac2),
    ]:
        prog += scan_header(ss, se, ah, a) + pack(bits)
    prog += b"\xff\xd9"
    return base, bytes(prog)


def test_progressive_vs_baseline_property():
    """Random coefficient patterns (20 seeds): the progressive successive-
    approximation stream and the baseline stream of the SAME coefficients
    must decode identically, and match an independent IDCT."""
    import random

    import numpy as np

    from brontes_spark.operators.multimodal import _ZIGZAG, _gray_stats, decode_jpeg

    u = np.arange(8)
    B = np.cos((2 * u[None, :] + 1) * u[:, None] * np.pi / 16) / 2
    B[0, :] /= np.sqrt(2)
    qv = np.full(64, 16.0)
    qv[0] = 8.0

    for seed in range(20):
        rng = random.Random(seed)
        w = h = 16  # 4 blocks
        blocks = []
        for _ in range(4):
            zz = [rng.randrange(-6, 7)]  # DC
            for _k in range(1, 64):
                zz.append(rng.choice([0] * 9 + [-3, -2, -1, 1, 2, 3]))
            blocks.append(zz)
        base, prog = _prop_jpeg_pair(w, h, blocks)
        got_b, got_p = decode_jpeg(base), decode_jpeg(prog)
        assert got_b == got_p, f"seed {seed}: progressive != baseline"

        # independent ground truth: dequantize + IDCT each block
        planes = []
        for zz in blocks:
            blk = np.zeros(64)
            blk[_ZIGZAG] = np.asarray(zz, dtype=float) * qv
            planes.append(B.T @ blk.reshape(8, 8) @ B + 128.0)
        top = np.concatenate([planes[0], planes[1]], axis=1)
        bot = np.concatenate([planes[2], planes[3]], axis=1)
        px = np.clip(np.concatenate([top, bot], axis=0), 0, 255)
        rgb = np.repeat(px[:, :, None], 3, axis=2).astype(np.uint8)
        assert got_b == _gray_stats(rgb), f"seed {seed}: decode != IDCT truth"


# ---- compressed audio: G.711 mu-law/A-law + IMA ADPCM ----


def _wav_raw(fmt_tag, n_ch, rate, bits, payload, block_align=None, extra=b""):
    """Minimal WAV writer for arbitrary format tags (test-side)."""
    import struct

    if block_align is None:
        block_align = n_ch * bits // 8
    fmt = struct.pack("<HHIIHH", fmt_tag, n_ch, rate, rate * block_align,
                      block_align, bits)
    if extra or fmt_tag != 1:
        fmt += struct.pack("<H", len(extra)) + extra
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _ulaw_compress(v):
    """Independent segmented mu-law compressor (classic reference form)."""
    sign = 0x80 if v < 0 else 0
    v = min((-v if v < 0 else v) + 0x84, 0x7FFF)
    seg = v.bit_length() - 8  # v >= 0x84 so bit_length >= 8
    return ~(sign | (seg << 4) | ((v >> (seg + 3)) & 0x0F)) & 0xFF


_ALAW_SEG_END = (0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF)


def _alaw_compress(v):
    """Independent segmented A-law compressor (13-bit domain)."""
    v >>= 3
    sign = 0x80 if v >= 0 else 0
    if v < 0:
        v = -v - 1
    for seg, end in enumerate(_ALAW_SEG_END):
        if v <= end:
            break
    else:
        seg, v = 7, 0xFFF
    mantissa = (v >> 1) & 0x0F if seg < 2 else (v >> seg) & 0x0F
    return (sign | (seg << 4) | mantissa) ^ 0x55


def test_g711_all_codes_idempotent():
    """For every one of the 256 code bytes in each law: decode through the
    WAV path, re-compress with the INDEPENDENT test-side compressor, and
    require the original byte back. Pins the full expansion table without
    hardcoding 512 values (mu-law's two zero codes 0x7F/0xFF excepted)."""
    from brontes_spark.operators.multimodal import decode_wav

    for tag, compress, law in ((7, _ulaw_compress, "ulaw"),
                               (6, _alaw_compress, "alaw")):
        wav = _wav_raw(tag, 1, 8000, 8, bytes(range(256)))
        x = decode_wav(wav)["samples"]
        assert len(x) == 256
        for b in range(256):
            linear = int(round(x[b] * 32768.0))
            back = compress(linear)
            if law == "ulaw" and linear == 0 and b in (0x7F, 0xFF):
                assert back in (0x7F, 0xFF)
            else:
                assert back == b, f"{law} code {b:#x} -> {linear} -> {back:#x}"


def test_g711_sine_snr():
    """A sine encoded with the independent compressors must decode with the
    ~38 dB SNR G.711 is specified to deliver (logarithmic companding)."""
    import numpy as np

    from brontes_spark.operators.multimodal import decode_wav

    t = np.arange(8000)
    sine = (np.sin(2 * np.pi * 440 * t / 8000) * 20000).astype(np.int64)
    for tag, compress in ((7, _ulaw_compress), (6, _alaw_compress)):
        codes = bytes(compress(int(v)) for v in sine)
        x = decode_wav(_wav_raw(tag, 1, 8000, 8, codes))["samples"] * 32768.0
        err = sine.astype(np.float64) - x
        snr = 10 * np.log10(np.sum(sine.astype(np.float64) ** 2) / np.sum(err**2))
        assert snr > 35.0, snr


def test_ima_adpcm_sine_roundtrip():
    """Sine through the fixture-side encoder (separate code path) and the
    operator decoder: ADPCM's 4-bit step quantizer tracks a smooth signal
    at > 20 dB SNR, mono and stereo."""
    import struct

    import numpy as np

    from brontes_spark.operators.multimodal import decode_wav
    from brontes_spark.sources.media_fixture import ima_adpcm_encode

    spb = 505
    for n_ch in (1, 2):
        n = spb * 4
        sig = (np.sin(2 * np.pi * 300 * np.arange(n * n_ch) / 8000) * 15000)
        sig = sig.astype(np.int64)
        enc = ima_adpcm_encode([int(v) for v in sig], n_ch, spb)
        block_align = 4 * n_ch + ((spb - 1 + 7) // 8) * 4 * n_ch
        wav = _wav_raw(0x11, n_ch, 8000, 4, enc, block_align=block_align,
                       extra=struct.pack("<H", spb))
        d = decode_wav(wav)
        assert d["n_channels"] == n_ch and len(d["samples"]) == n
        orig = sig.reshape(-1, n_ch).mean(axis=1)
        err = orig - d["samples"] * 32768.0
        snr = 10 * np.log10(np.sum(orig**2) / max(np.sum(err**2), 1e-12))
        assert snr > 20.0, (n_ch, snr)


def test_ima_adpcm_constant_bit_exact():
    """A constant signal must decode BIT-exactly: all-zero nibbles at step
    index 0 add step>>3 == 0, so the predictor never moves."""
    import struct

    import numpy as np

    from brontes_spark.operators.multimodal import decode_wav
    from brontes_spark.sources.media_fixture import ima_adpcm_encode

    spb, level = 505, -12345
    enc = ima_adpcm_encode([level] * (spb * 2), 1, spb)
    block_align = 4 + ((spb - 1 + 7) // 8) * 4
    wav = _wav_raw(0x11, 1, 8000, 4, enc, block_align=block_align,
                   extra=struct.pack("<H", spb))
    x = decode_wav(wav)["samples"]
    assert np.all(x == level / 32768.0)


def test_wav_rejects_unknown_formats():
    import pytest

    from brontes_spark.operators.multimodal import decode_wav

    with pytest.raises(ValueError):  # IEEE float WAV (fmt 3)
        decode_wav(_wav_raw(3, 1, 8000, 32, b"\x00" * 64))
    with pytest.raises(ValueError):  # ADPCM with a corrupt step index
        import struct

        bad = b"\x00\x00\x59\x00" + b"\x00" * 252  # index 89 > 88
        decode_wav(_wav_raw(0x11, 1, 8000, 4, bad, block_align=256,
                            extra=struct.pack("<H", 505)))


# ---- MJPEG-in-AVI video container ----


def _avi_bytes(w, h, jpeg_frames, with_junk=True):
    """Independent test-side AVI writer. Deliberately messier than the
    fixture's: inserts a JUNK chunk, an idx1 index, and an interleaved
    '01wb' audio chunk inside movi so the walker must count ONLY video
    chunks."""
    import struct

    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) % 2 else b"")

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    avih = struct.pack("<14I", 33333, 0, 0, 0x10, len(jpeg_frames), 0, 1, 0,
                       w, h, 0, 0, 0, 0)
    strh = struct.pack("<4s4sIHHIIIIIIIi4H", b"vids", b"MJPG", 0, 0, 0, 0,
                       1, 30, 0, len(jpeg_frames), 0, 0x7FFFFFFF, 0,
                       0, 0, w, h)
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b""
    for i, f in enumerate(jpeg_frames):
        movi_body += chunk(b"00dc", f)
        if i == 0:
            movi_body += chunk(b"01wb", b"\x00\x01" * 10)  # audio interleave
    body = b"AVI " + hdrl
    if with_junk:
        body += chunk(b"JUNK", b"\x00" * 17)
    body += lst(b"movi", movi_body)
    body += chunk(b"idx1", b"\x00" * 16 * len(jpeg_frames))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_avi_frame_count_and_sampled_decode():
    """The movi walk counts only '##dc' chunks (audio/JUNK/idx1 skipped);
    sampled decode touches exactly the requested independent JPEG frames
    and reproduces each frame's solid value."""
    from brontes_spark.operators.multimodal import (
        avi_frame_count,
        avi_parse_frames,
        video_frame_count,
    )

    vals = [40, 80, 120, 160, 200, 240, 30]
    frames = [_jpeg_bytes(16, 16, [v], [(1, 1)]) for v in vals]
    avi = _avi_bytes(16, 16, frames)
    assert avi_frame_count(avi) == 7
    assert video_frame_count(avi) == 7
    got = avi_parse_frames(avi, [0, 3, 6])
    assert sorted(got) == [0, 3, 6]
    for k, px in got.items():
        assert px.shape == (16, 16, 3)
        assert abs(float(px.mean()) - vals[k]) < 2.0


def test_avi_rejects_and_truncated():
    import pytest

    from brontes_spark.operators.multimodal import avi_frame_count

    with pytest.raises(ValueError):
        avi_frame_count(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        avi_frame_count(b"not a container")
    frames = [_jpeg_bytes(16, 16, [100], [(1, 1)]) for _ in range(3)]
    avi = _avi_bytes(16, 16, frames)
    # clipping the final idx1/tail must not break the movi count
    assert avi_frame_count(avi[:-20]) == 3


def test_extract_video_frame_features_mixed(spark):
    """Container dispatch through one fused mapInPandas pass: multi-frame
    GIF (composited decode up to the last sampled frame) and MJPEG AVI
    (ONLY sampled frames decoded) in the same column; corrupt bytes
    quarantine."""
    from brontes_spark.operators.multimodal import extract_video_frame_features

    gif = _gif_multi_bytes(
        8, 8, [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 10, 10)],
        [(0, 0, 8, 8, [k % 4] * 64, 0, None, False) for k in range(7)],
    )
    vals = [25, 75, 125, 175, 225]
    avi = _avi_bytes(16, 16, [_jpeg_bytes(16, 16, [v], [(1, 1)]) for v in vals])
    rows = [(1, bytearray(gif)), (2, bytearray(avi)), (3, bytearray(b"junk"))]
    df = spark.createDataFrame(rows, "item_id long, content binary")
    out = extract_video_frame_features(df, every_k=2).collect()
    by_item = {}
    for r in out:
        by_item.setdefault(r["item_id"], []).append(r.asDict())
    assert set(by_item) == {1, 2}
    g = sorted(by_item[1], key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in g] == [0, 2, 4, 6]
    assert all(r["n_frames"] == 7 and r["width"] == 8 for r in g)
    a = sorted(by_item[2], key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in a] == [0, 2, 4]
    assert all(r["n_frames"] == 5 and r["width"] == 16 for r in a)
    for r in a:
        assert abs(r["mean_intensity"] * 255 - vals[r["frame_idx"]]) < 2.0


def test_avi_raw_dib_frames_exact():
    """Uncompressed '00db' AVIs decode bit-exactly: solid BGR frames come
    back as the exact RGB solid (no codec loss), bottom-up rows and 4-byte
    stride padding handled like decode_bmp. Sampled-only decode still
    holds: only requested indices are returned."""
    import numpy as np

    from brontes_spark.operators.multimodal import (
        avi_frame_count,
        avi_parse_frames,
    )
    from brontes_spark.sources.media_fixture import avi_dib_solid

    rgbs = [(10, 200, 30), (255, 0, 0), (1, 2, 3), (77, 77, 77), (0, 0, 255)]
    avi = avi_dib_solid(30, 22, rgbs)  # w=30 -> stride 92, padded
    assert avi_frame_count(avi) == 5
    got = avi_parse_frames(avi, [1, 4])
    assert sorted(got) == [1, 4]
    for k, px in got.items():
        assert px.shape == (22, 30, 3)
        assert np.all(px == np.array(rgbs[k], dtype=np.uint8))


def test_extract_video_frame_features_dib(spark):
    """The fused Spark pass computes EXACT means for uncompressed frames."""
    from fractions import Fraction

    from brontes_spark.operators.multimodal import extract_video_frame_features
    from brontes_spark.sources.media_fixture import avi_dib_solid

    rgbs = [(30, 60, 90), (120, 120, 120), (200, 100, 0), (0, 200, 100)]
    df = spark.createDataFrame(
        [(7, bytearray(avi_dib_solid(16, 16, rgbs)))],
        "item_id long, content binary",
    )
    rows = {r["frame_idx"]: r for r in
            extract_video_frame_features(df, every_k=1).collect()}
    assert sorted(rows) == [0, 1, 2, 3]
    for k, r in rows.items():
        assert r["n_frames"] == 4 and (r["width"], r["height"]) == (16, 16)
        exact = Fraction(sum(rgbs[k]), 3 * 255)
        assert abs(r["mean_intensity"] - float(exact)) < 1e-12


# ---- FLAC (lossless compressed audio) ----


class _FlacW:
    """MSB-first bit writer for the test-side FLAC encoder."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def w(self, v, n):
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.buf.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def align(self):
        if self.n:
            self.w(0, 8 - self.n)

    def bytes(self):
        assert self.n == 0
        return bytes(self.buf)


def _crc8(data):
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def _crc16(data):
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


def _flac_utf8(w, v):
    if v < 0x80:
        w.w(v, 8)
        return
    for n in range(1, 7):
        if v >> (6 * n) < (1 << (6 - n)):
            break
    w.w((0xFF << (7 - n)) & 0xFF | (v >> (6 * n)), 8)
    for k in range(n - 1, -1, -1):
        w.w(0x80 | ((v >> (6 * k)) & 0x3F), 8)


_FLAC_FIXED_COEF = {0: (), 1: (1,), 2: (2, -1), 3: (3, -3, 1),
                    4: (4, -6, 4, -1)}


def _flac_rice(w, residual, param):
    for e in residual:
        v = (e << 1) if e >= 0 else ((-e) << 1) - 1  # zigzag
        w.w(0, v >> param)
        w.w(1, 1)
        if param:
            w.w(v & ((1 << param) - 1), param)


def _flac_subframe(w, x, bps, subframe, porder, escape_raw):
    if subframe == "constant" and len(set(x)) == 1:
        w.w(0, 1); w.w(0, 6); w.w(0, 1); w.w(x[0], bps)
        return
    if subframe == "verbatim":
        w.w(0, 1); w.w(1, 6); w.w(0, 1)
        for v in x:
            w.w(v, bps)
        return
    order = int(subframe[-1])
    w.w(0, 1); w.w(8 + order, 6); w.w(0, 1)
    for v in x[:order]:
        w.w(v, bps)
    res = []
    for i in range(order, len(x)):
        pred = sum(c * x[i - 1 - j]
                   for j, c in enumerate(_FLAC_FIXED_COEF[order]))
        res.append(x[i] - pred)
    w.w(0, 2)  # 4-bit rice params
    w.w(porder, 4)
    parts, idx = 1 << porder, 0
    for p in range(parts):
        count = (len(x) >> porder) - (order if p == 0 else 0)
        chunk = res[idx : idx + count]
        idx += count
        if escape_raw is not None and p == parts - 1:
            w.w(0xF, 4)
            w.w(escape_raw, 5)
            for e in chunk:
                w.w(e, escape_raw)
        else:
            m = sum(abs(e) for e in chunk) / max(len(chunk), 1)
            param = 0
            while (1 << param) < m + 1 and param < 14:
                param += 1
            w.w(param, 4)
            _flac_rice(w, chunk, param)


def _flac_stream(chans, rate=8000, bps=16, blocksize=256, stereo_mode=None,
                 subframe="fixed2", porder=0, escape_raw=None):
    """Independent test-side FLAC encoder: STREAMINFO + fixed-blocksize
    frames, FIXED/CONSTANT/VERBATIM subframes, partitioned Rice with
    optional escape, and the three stereo decorrelation modes. Spec CRCs
    are real (poly 0x07 / 0x8005)."""
    n_ch, total = len(chans), len(chans[0])
    hdr = _FlacW()
    hdr.w(blocksize, 16); hdr.w(blocksize, 16); hdr.w(0, 24); hdr.w(0, 24)
    hdr.w(rate, 20); hdr.w(n_ch - 1, 3); hdr.w(bps - 1, 5); hdr.w(total, 36)
    for _ in range(16):
        hdr.w(0, 8)  # md5 unset
    si = hdr.bytes()
    out = bytearray(b"fLaC") + bytes([0x80]) + len(si).to_bytes(3, "big") + si
    for fno, off in enumerate(range(0, total, blocksize)):
        bs = min(blocksize, total - off)
        w = _FlacW()
        w.w(0x3FFE, 14); w.w(0, 1); w.w(0, 1)
        w.w(7, 4)   # blocksize as 16-bit field
        w.w(0, 4)   # rate from streaminfo
        w.w(n_ch - 1 if stereo_mode is None else
            {"left_side": 8, "right_side": 9, "mid_side": 10}[stereo_mode], 4)
        w.w(0, 3); w.w(0, 1)  # bps from streaminfo
        _flac_utf8(w, fno)
        w.w(bs - 1, 16)
        w.align()
        w.w(_crc8(w.buf), 8)
        blocks = [c[off : off + bs] for c in chans]
        if stereo_mode == "left_side":
            subs = [(blocks[0], bps),
                    ([a - b for a, b in zip(*blocks)], bps + 1)]
        elif stereo_mode == "right_side":
            subs = [([a - b for a, b in zip(*blocks)], bps + 1),
                    (blocks[1], bps)]
        elif stereo_mode == "mid_side":
            subs = [([(a + b) >> 1 for a, b in zip(*blocks)], bps),
                    ([a - b for a, b in zip(*blocks)], bps + 1)]
        else:
            subs = [(b, bps) for b in blocks]
        for x, sbps in subs:
            _flac_subframe(w, x, sbps, subframe, porder, escape_raw)
        w.align()
        w.w(_crc16(w.buf), 16)
        out += w.bytes()
    return bytes(out)


def test_flac_roundtrip_exact_all_subframe_types():
    """FLAC is LOSSLESS: decode(encode(x)) must equal x EXACTLY for every
    subframe type, rice partition order, and the raw-escape path."""
    import numpy as np

    from brontes_spark.operators.multimodal import decode_flac

    rng = np.random.default_rng(3)
    t = np.arange(2048)
    sig = [int(v) for v in
           (12000 * np.sin(2 * np.pi * 200 * t / 8000)
            + rng.integers(-50, 51, len(t))).astype(np.int64)]
    for kw in (dict(subframe="fixed0"), dict(subframe="fixed1"),
               dict(subframe="fixed2"), dict(subframe="fixed3"),
               dict(subframe="fixed4", porder=2),
               dict(subframe="verbatim"),
               dict(subframe="fixed1", escape_raw=16)):
        d = decode_flac(_flac_stream([sig], **kw))
        assert d["sample_rate"] == 8000 and d["n_channels"] == 1
        back = np.round(d["samples"] * 32768.0).astype(np.int64)
        assert np.array_equal(back, np.array(sig)), kw
        # and losslessly-compressed really is smaller than verbatim
    assert len(_flac_stream([sig], subframe="fixed2")) < len(
        _flac_stream([sig], subframe="verbatim"))


def test_flac_stereo_decorrelation_modes():
    """left/side, right/side, and mid/side streams must all reconstruct
    the same channel-averaged signal as independent coding — exactly."""
    import numpy as np

    from brontes_spark.operators.multimodal import decode_flac

    t = np.arange(1024)
    left = [int(v) for v in (9000 * np.sin(2 * np.pi * 150 * t / 8000)).astype(np.int64)]
    right = [v // 2 + 100 for v in left]
    expect = (np.array(left, dtype=np.float64) + np.array(right)) / 2 / 32768.0
    for mode in (None, "left_side", "right_side", "mid_side"):
        d = decode_flac(_flac_stream([left, right], stereo_mode=mode))
        assert d["n_channels"] == 2
        assert np.array_equal(d["samples"], expect), mode


def test_flac_dispatch_and_rejects():
    import numpy as np
    import pytest

    from brontes_spark.operators.multimodal import decode_audio, decode_flac

    const = _flac_stream([[1234] * 512], subframe="constant", blocksize=128)
    d = decode_audio(const)  # sniffing dispatch: fLaC magic -> decode_flac
    assert set(np.round(d["samples"] * 32768).astype(int)) == {1234}
    wav = _wav_raw(1, 1, 8000, 16, b"\x00\x00" * 16)
    assert decode_audio(wav)["sample_rate"] == 8000  # RIFF -> decode_wav
    with pytest.raises(ValueError):
        decode_flac(b"fLaC")  # no STREAMINFO
    with pytest.raises(ValueError):
        decode_flac(b"OggS not flac")
    # corrupt frame sync after valid metadata
    good = bytearray(_flac_stream([[5] * 256]))
    good[42 + (len(good) - 42) // 2] ^= 0xFF  # flip a mid-stream byte
    with pytest.raises(ValueError):
        decode_flac(bytes(good[: len(good) - 3]))


# ---- perceptual hash + banded Hamming near-dup ----


def test_image_dhash_analytic_and_edges():
    """dHash of a solid image is 0 (no strictly-darker cell); the gradient
    hash equals the fixture's closed-form band-compare; small images
    raise."""
    import numpy as np
    import pytest

    from brontes_spark.operators.multimodal import (
        decode_png_pixels,
        image_dhash,
    )
    from brontes_spark.sources.media_fixture import (
        _dhash_gradient,
        png_gray_gradient,
    )

    solid = np.full((32, 40, 3), 177, dtype=np.uint8)
    assert image_dhash(solid) == 0
    for step in (3, 7, 11):
        png = png_gray_gradient(96, 96, step, [0, 1, 2, 3, 4])
        assert image_dhash(decode_png_pixels(png)) == _dhash_gradient(96, 96, step)
    with pytest.raises(ValueError):
        image_dhash(np.zeros((8, 8, 3), dtype=np.uint8))  # < 9 rows


def test_hamming_neardup_pairs_equals_bruteforce(spark):
    """Property: the banded-LSH pairs equal exhaustive all-pairs search for
    every max_hamming <= bands-1 (pigeonhole completeness), over random
    64-bit fingerprints engineered to contain near-dup clusters."""
    import itertools
    import random

    from brontes_spark.operators.dedup import hamming_neardup_pairs

    rng = random.Random(11)
    rows = []
    base = [rng.getrandbits(64) for _ in range(12)]
    rid = 0
    for b in base:
        for _ in range(rng.randrange(1, 4)):  # cluster: 0-3 flipped bits
            v = b
            for _ in range(rng.randrange(0, 4)):
                v ^= 1 << rng.randrange(64)
            rows.append((rid, v - (1 << 64) if v >= 1 << 63 else v))
            rid += 1
    df = spark.createDataFrame(rows, "id long, h long")
    for max_h, bands in ((3, 4), (1, 2), (7, 8)):
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in hamming_neardup_pairs(
                df, "id", "h", bits=64, bands=bands, max_hamming=max_h
            ).collect()
        }
        want = set()
        for (ia, ha), (ib, hb) in itertools.combinations(rows, 2):
            d = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
            if d <= max_h:
                want.add((min(ia, ib), max(ia, ib), d))
        assert got == want, (max_h, bands)


def test_hamming_neardup_pairs_rejects_bad_geometry(spark):
    import pytest

    from brontes_spark.operators.dedup import hamming_neardup_pairs

    df = spark.createDataFrame([(1, 5)], "id long, h long")
    with pytest.raises(ValueError):
        hamming_neardup_pairs(df, "id", "h", bits=64, bands=3)  # 64 % 3
    with pytest.raises(ValueError):
        hamming_neardup_pairs(df, "id", "h", bands=4, max_hamming=4)  # incomplete


# ---- resize ----


def test_resize_nearest_matches_bruteforce_and_edges():
    """resize_nearest equals the per-pixel floor index map (brute force),
    for down- and up-sampling; solid images are resize-invariant; bad
    targets raise."""
    import numpy as np
    import pytest

    from brontes_spark.operators.multimodal import resize_nearest

    rng = np.random.default_rng(7)
    for (h, w), (oh, ow) in (((17, 23), (5, 9)), ((8, 8), (16, 12)),
                             ((96, 96), (24, 16))):
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        got = resize_nearest(px, oh, ow)
        want = np.array(
            [[px[(i * h) // oh, (j * w) // ow] for j in range(ow)]
             for i in range(oh)],
            dtype=np.uint8,
        )
        assert got.shape == (oh, ow, 3)
        assert (got == want).all()
    solid = np.full((30, 20, 3), 91, dtype=np.uint8)
    assert (resize_nearest(solid, 7, 5) == 91).all()
    with pytest.raises(ValueError):
        resize_nearest(solid, 0, 5)


def test_resize_box_floor_mean_and_gradient():
    """resize_box equals brute-force floor(block-mean) per channel; the
    gradient's box mean has the closed form floor(step*(fy-1)/2 + y0*step)
    only pre-wraparound, so check against direct integer math; non-tiling
    factors raise."""
    import numpy as np
    import pytest

    from brontes_spark.operators.multimodal import resize_box

    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, size=(12, 8, 3), dtype=np.uint8)
    got = resize_box(px, 3, 2)
    for i in range(4):
        for j in range(4):
            blk = px[3 * i : 3 * i + 3, 2 * j : 2 * j + 2].astype(np.int64)
            for ch in range(3):
                assert got[i, j, ch] == blk[:, :, ch].sum() // 6
    with pytest.raises(ValueError):
        resize_box(px, 5, 2)  # 12 % 5 != 0


def test_extract_resized_features_thumb_roundtrip(spark):
    """The thumb column carries the exact resized pixels: decoding it back
    reproduces resize_nearest(decode(content)); mean matches the fixture's
    closed-form rmean9."""
    import numpy as np

    from brontes_spark.operators.multimodal import (
        decode_image_pixels,
        extract_resized_features,
        resize_nearest,
    )
    from brontes_spark.sources.media_fixture import (
        RESIZE_H,
        RESIZE_W,
        build_media,
        load_media,
    )

    media = load_media(spark)["images"].filter("item_id <= 45")
    rows = {
        r["item_id"]: r
        for r in extract_resized_features(
            media, out_h=RESIZE_H, out_w=RESIZE_W
        ).collect()
    }
    raw = {r["item_id"]: bytes(r["content"])
           for r in media.select("item_id", "content").collect()}
    _, igold, _, _ = build_media()
    gold = {g["item_id"]: g for g in igold}
    assert set(rows) == set(raw)
    for item_id, r in rows.items():
        px = decode_image_pixels(raw[item_id])
        want = resize_nearest(px, RESIZE_H, RESIZE_W)
        got = np.frombuffer(bytes(r["thumb"]), dtype=np.uint8).reshape(
            RESIZE_H, RESIZE_W, 3
        )
        assert (got == want).all()
        g = gold[item_id]
        if g["rmean9"] is not None:
            assert abs(r["mean_intensity"] - float(g["rmean9"])) < 1e-9


# ---- compressed-container metadata (header walk only) ----


def test_mp3_metadata_analytic_and_rejects():
    """Frame count / rate / exact duration from constructed streams (CBR,
    VBR, padding, ID3v2); desync, rate changes, truncation, and non-
    syncsafe ID3 sizes raise."""
    import pytest

    from brontes_spark.operators.multimodal import parse_mp3_metadata
    from brontes_spark.sources.media_fixture import mp3_stream

    m = parse_mp3_metadata(mp3_stream([(9, 0, 0)] * 25))
    assert (m["n_units"], m["sample_rate"]) == (25, 44100)
    assert (m["dur_num"], m["dur_den"]) == (25 * 1152, 44100)
    vbr = mp3_stream([(1 + (k % 14), 2, k % 2) for k in range(10)], id3_size=77)
    m = parse_mp3_metadata(vbr)
    assert (m["n_units"], m["sample_rate"]) == (10, 32000)

    with pytest.raises(ValueError):
        parse_mp3_metadata(mp3_stream([(9, 0, 0)])[:-1])  # truncated tail
    with pytest.raises(ValueError):
        parse_mp3_metadata(b"\xff\xfb\x00\x00")  # free-format bitrate
    with pytest.raises(ValueError):  # sample-rate change mid-stream
        parse_mp3_metadata(mp3_stream([(9, 0, 0)]) + mp3_stream([(9, 1, 0)]))
    bad_id3 = bytearray(mp3_stream([(9, 0, 0)], id3_size=5))
    bad_id3[6] |= 0x80  # non-syncsafe size byte
    with pytest.raises(ValueError):
        parse_mp3_metadata(bytes(bad_id3))


def test_mp4_metadata_box_walk_and_rejects():
    """Brand/tracks/codecs/exact duration across mvhd v0, v1 (64-bit) and
    largesize moov; missing mvhd and overrunning boxes raise."""
    import pytest

    from brontes_spark.operators.multimodal import (
        container_metadata,
        parse_mp4_metadata,
    )
    from brontes_spark.sources.media_fixture import mp4_file

    m = parse_mp4_metadata(mp4_file(
        b"mp42", 1000, 73211, [(b"vide", b"avc1"), (b"soun", b"mp4a")]))
    assert m["codec"] == "soun:mp4a+vide:avc1"
    assert (m["n_units"], m["dur_num"], m["dur_den"]) == (2, 73211, 1000)
    m = parse_mp4_metadata(mp4_file(
        b"isom", 600, 44449, [(b"soun", b"mp4a")], mvhd_v1=True))
    assert (m["dur_num"], m["dur_den"]) == (44449, 600)
    m = parse_mp4_metadata(mp4_file(
        b"isom", 30000, 7, [(b"vide", b"av01")], largesize_moov=True))
    assert m["codec"] == "vide:av01"

    data = mp4_file(b"isom", 1000, 5, [(b"vide", b"avc1")])
    with pytest.raises(ValueError):
        parse_mp4_metadata(data[:40])  # box overruns file
    with pytest.raises(ValueError):
        parse_mp4_metadata(data[:32])  # ftyp only: no mvhd
    # dispatch: ftyp at offset 4 -> mp4; 0xFFEx sync -> mp3; else reject
    assert container_metadata(data)["container"] == "mp4"
    with pytest.raises(ValueError):
        container_metadata(b"\x00\x01\x02\x03" * 8)


def test_audio_frames_zero_cross_aligned(spark):
    """When frame_len is a multiple of the square-wave period, every frame
    carries the identical analytic zero-cross rate (2*L/P - 1)/(L - 1) and
    RMS equals the amplitude; a partial tail (n % L != 0) is dropped."""
    import struct
    from fractions import Fraction

    from brontes_spark.operators.multimodal import extract_audio_frames
    from brontes_spark.sources.media_fixture import _square, wav_container

    n, period, amp, L = 4096 + 100, 64, 20001, 512  # +100: partial tail
    pcm = _square(n, period, amp, -amp)
    wav = wav_container(1, 1, 8000, 16, struct.pack(f"<{n}h", *pcm))
    df = spark.createDataFrame(
        [(1, bytearray(wav))], "item_id long, content binary"
    )
    rows = extract_audio_frames(df, frame_len=L).collect()
    assert len(rows) == n // L == 8
    want_zc = float(Fraction(2 * L // period - 1, L - 1))
    want_rms = amp / 32768
    for r in rows:
        assert r["n_frames"] == 8
        assert abs(r["rms"] - want_rms) < 1e-12
        assert abs(r["zero_cross"] - want_zc) < 1e-12


def test_mp3_mp4_metadata_fuzz_property():
    """Random valid container constructions parse to their construction
    parameters; random byte mutations either raise ValueError or still
    parse (never crash with anything else, never loop)."""
    import random

    from brontes_spark.operators.multimodal import (
        container_metadata,
        parse_mp3_metadata,
        parse_mp4_metadata,
    )
    from brontes_spark.sources.media_fixture import mp3_stream, mp4_file

    rng = random.Random(59)
    for _ in range(40):
        specs = [
            (rng.randrange(1, 15), 2, rng.randrange(0, 2))
            for _ in range(rng.randrange(1, 30))
        ]
        # pin rate index per stream (parser rejects mid-stream changes)
        ri = rng.randrange(0, 3)
        specs = [(b, ri, p) for b, _, p in specs]
        id3 = rng.choice([None, 0, rng.randrange(1, 400)])
        data = mp3_stream(specs, id3_size=id3)
        m = parse_mp3_metadata(data)
        assert m["n_units"] == len(specs)
        assert m["dur_num"] == len(specs) * 1152

        kinds = [(b"vide", b"avc1"), (b"soun", b"mp4a"), (b"vide", b"hvc1")]
        tracks = [rng.choice(kinds) for _ in range(rng.randrange(1, 4))]
        ts, dur = rng.randrange(1, 10**5), rng.randrange(1, 10**7)
        v = mp4_file(b"isom", ts, dur, tracks, mvhd_v1=rng.random() < 0.5)
        m = parse_mp4_metadata(v)
        assert (m["n_units"], m["dur_num"], m["dur_den"]) == (len(tracks), dur, ts)

        # mutation robustness: flip a byte / truncate — ValueError or a
        # clean parse, nothing else
        for payload in (data, v):
            mut = bytearray(payload)
            mut[rng.randrange(len(mut))] ^= 0xFF
            try:
                container_metadata(bytes(mut))
            except ValueError:
                pass
            try:
                container_metadata(bytes(payload[: rng.randrange(len(payload))]))
            except ValueError:
                pass


def test_avi_dib_frame_mimicking_jpeg_soi_decodes():
    """Round-6 review regression test: a raw-DIB frame whose first BGR
    pixel is (0xFF, 0xD8, ...) — RGB blue=255, green=216 — passes the JPEG
    SOI sniff; the decoder must fall back to the DIB path and return the
    correct pixels instead of quarantining the item."""
    from brontes_spark.operators.multimodal import avi_parse_frames
    from brontes_spark.sources.media_fixture import avi_dib_solid

    data = avi_dib_solid(8, 8, [(1, 216, 255)])  # stored BGR: FF D8 01
    out = avi_parse_frames(data, [0])
    assert list(out) == [0]
    px = out[0]
    assert px.shape == (8, 8, 3)
    assert (px[0, 0] == (1, 216, 255)).all()


def test_gif_parse_frames_empty_indices_short_circuits():
    from brontes_spark.operators.multimodal import gif_parse_frames
    from brontes_spark.sources.media_fixture import gif_solid_frames

    gif = gif_solid_frames(16, 12, [(10, 20, 30), (40, 50, 60)], [0, 1, 0])
    assert gif_parse_frames(gif, indices=[]) == {}
    out = gif_parse_frames(gif, indices=[2])
    assert list(out) == [2] and (out[2][0, 0] == (10, 20, 30)).all()


def test_mp12_decode_roundtrip_exact():
    """Every planted MPEG-1 Layer I/II fixture decodes to its exact
    rational gold: dominant subband, per-subband RMS, frame/granule
    counts — the independent-encoder round trip behind mm_mp2_features."""
    import numpy as np

    from brontes_spark.operators.multimodal import decode_mp12
    from brontes_spark.sources.media_fixture import build_mp12_media

    rows, gold = build_mp12_media()
    gmap = {g["item_id"]: g for g in gold}
    assert len(rows) == len(gold) == 10
    for r in rows:
        d = decode_mp12(bytes(r["content"]))
        g = gmap[r["item_id"]]
        sub = d["subbands"]
        assert (d["layer"], d["sample_rate"], d["n_channels"],
                d["n_frames"]) == (g["layer"], g["sample_rate"],
                                   g["n_channels"], g["n_frames"])
        assert sub.shape == (g["n_granules"], 32)
        energy = (sub * sub).sum(axis=0)
        dom = int(np.argmax(energy))
        assert dom == g["dom_subband"]
        rms = float(np.sqrt(np.mean(sub[:, dom] ** 2)))
        assert abs(rms - float(g["rms9"])) < 1e-9
        # orthonormal DCT-IV synthesis: PCM energy == subband energy
        pcm = d["samples"]
        assert len(pcm) == 32 * sub.shape[0]
        assert np.isclose(np.sqrt(np.mean(pcm ** 2)),
                          np.sqrt(np.mean(sub ** 2)), rtol=1e-12)


def test_mp12_grouped_unpack_order_and_scfsi_spreads():
    """Grouped codes unpack base-steps FIRST-SAMPLE-FIRST (v % steps is
    granule sample 0 — ISO 11172-3 §2.4.3.3.4), pinned with three DISTINCT
    codes in one group; scfsi spreads map transmitted scalefactors to
    granule thirds as (a,b,c)/(a,a,b)/(a,a,a)/(a,b,b)."""
    import numpy as np

    from brontes_spark.operators.multimodal import _mp12_dequant, decode_mp12
    from brontes_spark.sources.media_fixture import _MpegBits

    # hand-assembled single 96 kbps mono Layer II frame: sb7 steps=5,
    # scfsi=0 (three scalefactors 3/9/3), every granule carries the
    # grouped code for (c0, c1, c2) = (0, 2, 4)
    b = _MpegBits()
    b.w(0x7FF, 11); b.w(3, 2); b.w(2, 2); b.w(1, 1)
    b.w(6, 4); b.w(1, 2); b.w(0, 1); b.w(0, 1)
    b.w(3, 2); b.w(0, 2); b.w(0, 1); b.w(0, 1); b.w(0, 2)
    for sb in range(27):  # allocation: sb7 -> code 2 (steps=5 in MID)
        nbal = 4 if sb < 11 else 3 if sb < 23 else 2
        b.w(2 if sb == 7 else 0, nbal)
    b.w(0, 2)  # scfsi=0
    for sf in (3, 9, 3):
        b.w(sf, 6)
    group = 0 + 5 * 2 + 25 * 4  # (c0, c1, c2) = (0, 2, 4)
    for _gr in range(12):
        b.w(group, 7)
    data = b.frame((144 * 96000) // 48000)
    d = decode_mp12(data)
    sub = d["subbands"]
    assert sub.shape == (36, 32)
    v0, v2, v4 = (_mp12_dequant(c, 5) for c in (0, 2, 4))
    assert (v0, v2, v4) == (-0.8, 0.0, 0.8)
    for gr in range(12):
        scale = 1.0 if gr // 4 != 1 else 0.25  # sf 3 -> 1.0, sf 9 -> 0.25
        got = sub[3 * gr : 3 * gr + 3, 7]
        assert np.allclose(got, [v0 * scale, v2 * scale, v4 * scale])
    assert np.count_nonzero(sub[:, [s for s in range(32) if s != 7]]) == 0


def test_mp12_rejects_out_of_envelope():
    import pytest

    from brontes_spark.operators.multimodal import decode_audio, decode_mp12
    from brontes_spark.sources.media_fixture import (
        build_mp12_media,
        mp2_planted,
        mp3_stream,
    )

    with pytest.raises(ValueError, match="codec boundary"):
        decode_mp12(mp3_stream([(9, 0, 0)] * 3))
    # Layer II below the Table B.2a envelope (32 kbps mono)
    with pytest.raises(ValueError, match="B.2a envelope"):
        decode_mp12(mp2_planted(1, 1, [(0, 3, 2, (3, 3, 3), 2, 0)]))
    good = bytes(build_mp12_media()[0][0]["content"])
    with pytest.raises(ValueError, match="truncated"):
        decode_mp12(good[:-7])
    with pytest.raises(ValueError, match="frame sync"):
        decode_mp12(b"\x12\x34" + good)
    # joint stereo (mode 01) rejected: flip the mode bits of a good header
    h = bytearray(good)
    h[3] = (h[3] & 0x3F) | 0x40
    with pytest.raises(ValueError, match="joint-stereo"):
        decode_mp12(bytes(h))
    # the sniffing dispatch routes MPEG sync bytes to decode_mp12
    d = decode_audio(good)
    assert d["layer"] == 2 and d["sample_rate"] == 48000


def test_mp12_stereo_distinct_channels_average():
    """Stereo with DIFFERENT per-channel content: the decoder's
    channel-average must equal (v_left + v_right)/2 per granule sample —
    pins the ch-inner interleave of allocation/scalefactor/sample reads
    (a swapped order would mispair scalefactors and desync nothing, so
    only a value check catches it)."""
    import numpy as np

    from brontes_spark.operators.multimodal import _mp12_dequant, decode_mp12
    from brontes_spark.sources.media_fixture import _MpegBits

    # one 192 kbps stereo Layer II frame: sb0 planted on BOTH channels,
    # steps=3 grouped, but ch0 uses sf idx 3 (SF=1) and ch1 sf idx 9
    # (SF=1/4); ch0 alternates codes 2/0, ch1 plays constant code 2
    b = _MpegBits()
    b.w(0x7FF, 11); b.w(3, 2); b.w(2, 2); b.w(1, 1)
    b.w(10, 4); b.w(1, 2); b.w(0, 1); b.w(0, 1)
    b.w(0, 2); b.w(0, 2); b.w(0, 1); b.w(0, 1); b.w(0, 2)  # stereo
    for sb in range(27):  # allocation, both channels
        nbal = 4 if sb < 11 else 3 if sb < 23 else 2
        for _ch in range(2):
            b.w(1 if sb == 0 else 0, nbal)
    b.w(2, 2); b.w(2, 2)  # scfsi=2 per channel
    b.w(3, 6); b.w(9, 6)  # one scalefactor each: SF(3)=1, SF(9)=1/4
    for gr in range(12):
        c0 = 2 if gr % 2 == 0 else 0
        b.w(c0 + 3 * c0 + 9 * c0, 5)   # ch0 group
        b.w(2 + 3 * 2 + 9 * 2, 5)      # ch1 group (constant)
    data = b.frame((144 * 192000) // 48000)
    d = decode_mp12(data)
    assert (d["n_channels"], d["layer"]) == (2, 2)
    sub = d["subbands"]
    v = _mp12_dequant(2, 3)  # +2/3
    for gr in range(12):
        ch0 = v if gr % 2 == 0 else -v
        want = (ch0 * 1.0 + v * 0.25) / 2
        assert np.allclose(sub[3 * gr : 3 * gr + 3, 0], want), gr
    assert np.count_nonzero(sub[:, 1:]) == 0


def test_mp12_polyphase_structure_matches_spec_loops():
    """mp12_synthesize (the vectorized normative synthesis pipeline) against
    an independent straight-from-ISO-11172-3-§2.4.3.2 loop implementation:
    explicit 1024-deep V FIFO shifted 64 per granule, the U gather, the
    windowed sum. Random window + random subbands over several granule
    counts — any matrixing/FIFO/indexing divergence surfaces. With this
    pinned, only the 512 Table 3-B.3 constants separate the decode from
    the normative PCM (MP12_SYNTHESIS_WINDOW injects them)."""
    import numpy as np

    from brontes_spark.operators.multimodal import mp12_synthesize

    rng = np.random.default_rng(7)
    window = rng.normal(size=512)

    def spec_loops(sub):
        n_mat = np.array(
            [[np.cos((16 + i) * (2 * k + 1) * np.pi / 64.0) for k in range(32)]
             for i in range(64)]
        )
        v_fifo = np.zeros(1024)
        out = []
        for s in sub:
            v_fifo[64:] = v_fifo[:-64].copy()
            v_fifo[:64] = n_mat @ s
            u = np.zeros(512)
            for n in range(8):
                for i in range(32):
                    u[64 * n + i] = v_fifo[128 * n + i]
                    u[64 * n + 32 + i] = v_fifo[128 * n + 96 + i]
            w = u * window
            for j in range(32):
                out.append(sum(w[32 * n + j] for n in range(16)))
        return np.array(out)

    for g in (1, 2, 17, 40):
        sub = rng.normal(size=(g, 32))
        got = mp12_synthesize(sub, window)
        want = spec_loops(sub)
        assert got.shape == (g * 32,)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_mp12_pcm_uses_injected_window():
    """decode-path wiring: setting MP12_SYNTHESIS_WINDOW switches _mp12_pcm
    to the normative synthesis; clearing it restores the DCT-IV path."""
    import numpy as np

    from brontes_spark.operators import multimodal as mm

    sub = np.random.default_rng(3).normal(size=(4, 32))
    window = np.random.default_rng(4).normal(size=512)
    default = mm._mp12_pcm(sub)
    try:
        mm.MP12_SYNTHESIS_WINDOW = window
        injected = mm._mp12_pcm(sub)
    finally:
        mm.MP12_SYNTHESIS_WINDOW = None
    np.testing.assert_allclose(injected, mm.mp12_synthesize(sub, window))
    assert not np.allclose(injected, default)
    np.testing.assert_allclose(mm._mp12_pcm(sub), default)


def test_mp12_normative_path_end_to_end_with_injected_window():
    """VERDICT r8 directive 8: the normative polyphase path had never run
    from real BYTES with a window in place — the structure pin and the
    wiring test both start from synthetic subbands. This test injects a
    synthetic-but-VALID 512-coefficient window (a sinc x Hann lowpass
    prototype — the shape class Table 3-B.3 belongs to, so magnitudes and
    overlap behave like the real table) and drives the FULL pipeline:
    planted MP2 bitstream -> decode_mp12 (header walk, allocation, scfsi,
    requantization) -> _mp12_pcm -> mp12_synthesize, then re-derives the
    expected PCM from the decoder's exact subbands through the
    independent straight-from-spec loop implementation. Pipeline
    exactness is therefore pinned independent of the spec table: with a
    licensed Table 3-B.3 copy assigned to MP12_SYNTHESIS_WINDOW (see
    README), the identical code path IS the normative decoder."""
    import numpy as np

    from brontes_spark.operators import multimodal as mm
    from brontes_spark.sources.media_fixture import mp2_planted

    # synthetic-but-valid prototype: windowed sinc, unit-DC-normalized
    n = np.arange(512)
    t = (n - 255.5) / 32.0
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * (n + 0.5) / 512.0)
    window = np.sinc(t) * hann
    window /= window.sum() / 32.0

    content = mp2_planted(3, 6, [(0, 3, 2, (3, 3, 3), 2, 0),
                                 (5, 9, 2, (10, 10, 10), 7, 1)])
    try:
        mm.MP12_SYNTHESIS_WINDOW = window
        out = mm.decode_mp12(content)
    finally:
        mm.MP12_SYNTHESIS_WINDOW = None
    sub = out["subbands"]
    assert sub.shape[1] == 32 and sub.shape[0] >= 36  # 12 granules/frame

    def spec_loops(sub):
        n_mat = np.array(
            [[np.cos((16 + i) * (2 * k + 1) * np.pi / 64.0) for k in range(32)]
             for i in range(64)]
        )
        v_fifo = np.zeros(1024)
        pcm = []
        for s in sub:
            v_fifo[64:] = v_fifo[:-64].copy()
            v_fifo[:64] = n_mat @ s
            u = np.zeros(512)
            for b in range(8):
                for i in range(32):
                    u[64 * b + i] = v_fifo[128 * b + i]
                    u[64 * b + 32 + i] = v_fifo[128 * b + 96 + i]
            w = u * window
            for j in range(32):
                pcm.append(sum(w[32 * b + j] for b in range(16)))
        return np.array(pcm)

    want = spec_loops(sub)
    got = np.asarray(out["samples"], dtype=np.float64)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
    # and the injected path is genuinely different from the DCT-IV approx
    approx = mm.decode_mp12(content)
    assert not np.allclose(got, np.asarray(approx["samples"], dtype=np.float64))
