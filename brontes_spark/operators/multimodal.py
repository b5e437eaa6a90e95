"""Multimodal column processing for training-data pipelines.

Images/audio/video ride through Spark as opaque `binary` columns with typed
metadata structs; per-item compute (decode, resize, frame-sample, feature
extraction) runs as Arrow-batched pandas iterators via ``mapInPandas`` — the
pattern that scales: the JVM moves bytes, Python touches each batch once,
and partition sizing (bytes per partition, not rows) bounds worker memory.

Codec story: the dependency-free containers decode FOR REAL (`decode_ppm` /
`decode_bmp` / `decode_png` / `decode_jpeg` / `decode_gif` for images;
`decode_wav` for audio — integer PCM, G.711 mu-law/A-law, IMA ADPCM;
multi-frame GIF and MJPEG-in-AVI for video — pure bytes + numpy (+ stdlib
zlib for PNG), real pixels/samples, real features; `decode_image` sniffs
and dispatches; `decode_jpeg` handles both baseline-sequential and
progressive DCT). Psychoacoustic/interframe codecs (MP3/AAC/H.264/MP4)
need ffmpeg-class libraries NOT in this environment, so the kernel stays
pluggable: pass a production codec via `decode_fn`; undecodable payloads
raise into the quarantine path. `stub_decode` remains as the deterministic
fake for plumbing tests. Schemas, Arrow batch shapes, and partitioning are
identical across all of them.
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
    """Feature dict from a binary PPM payload (see decode_ppm_pixels)."""
    return _gray_stats(decode_ppm_pixels(data))


def decode_ppm_pixels(data: bytes):
    """Real decoder for binary PPM (P6): pure bytes + numpy, no codec libs.

    Full header grammar (whitespace/comment tokens), 8-bit maxval only.
    Returns the (H, W, 3) uint8 pixel array.
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
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def decode_bmp(data: bytes) -> dict:
    """Feature dict from an uncompressed 24-bit BMP (see decode_bmp_pixels)."""
    return _gray_stats(decode_bmp_pixels(data))


def decode_bmp_pixels(data: bytes):
    """Real decoder for uncompressed 24-bit BMP: pure bytes + numpy.
    Returns the (H, W, 3) uint8 pixel array."""
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
    return px


#: Adam7 pass grid: (x_start, y_start, x_step, y_step) per PNG spec §8.2
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_unfilter(block: bytes, h: int, stride: int, ch_b: int):
    """Reverse the five PNG scanline filters over one (sub-)image: `block`
    is h rows of (1 filter byte + stride sample bytes); returns the (h,
    stride) uint8 sample array. `ch_b` is the byte distance to the left
    neighbor (channels x bytes-per-sample, per-byte filtering per spec)."""
    import numpy as np

    if len(block) != (stride + 1) * h:
        raise ValueError("bad PNG pixel payload")
    arr = np.frombuffer(block, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = int(arr[y, 0])
        rec = arr[y, 1:].astype(np.int32)
        prior = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:
            pass
        elif f == 1:  # Sub: left neighbor, sequential within the row
            for x in range(ch_b, stride):
                rec[x] = (rec[x] + rec[x - ch_b]) & 0xFF
        elif f == 2:  # Up: fully vectorized
            rec = (rec + prior) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                a = rec[x - ch_b] if x >= ch_b else 0
                rec[x] = (rec[x] + ((a + prior[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = int(rec[x - ch_b]) if x >= ch_b else 0
                b = int(prior[x])
                c = int(prior[x - ch_b]) if x >= ch_b else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = rec.astype(np.uint8)
    return out


def decode_png(data: bytes) -> dict:
    """Feature dict from a PNG payload (see decode_png_pixels)."""
    return _gray_stats(decode_png_pixels(data))


def decode_png_pixels(data: bytes):
    """Real decoder for 8/16-bit gray/RGB/RGBA/palette PNG, sequential OR
    Adam7-interlaced: stdlib `zlib` inflate + the five scanline unfilters
    (None/Sub/Up/Average/Paeth), 7-pass deinterlace scatter, PLTE lookup,
    and 16-bit high-byte downscale — no codec libraries. (This pure-Python
    unfilter is for correctness-grade workloads, not JPEG-farm throughput —
    plug PIL via `decode_fn` for that.)
    """
    import struct
    import zlib

    import numpy as np

    if not data.startswith(b"\x89PNG\r\n\x1a\n"):
        raise ValueError("not a PNG")
    pos, ihdr, idat, plte = 8, None, bytearray(), None
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            if length % 3:
                raise ValueError("bad PLTE length")
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth not in (8, 16) or color not in (0, 2, 3, 6) or comp or filt:
        raise ValueError("only 8/16-bit gray/RGB/palette/RGBA PNG supported")
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        if depth == 16:
            raise ValueError("16-bit palette PNG is not a valid combination")
    if w == 0 or h == 0:
        raise ValueError("bad PNG pixel payload")
    ch = {0: 1, 2: 3, 3: 1, 6: 4}[color]
    bpp = depth // 8  # bytes per sample; the unfilter 'left' distance is ch*bpp
    ch_b = ch * bpp  # byte distance to the left neighbor (spec: per byte)
    raw = zlib.decompress(bytes(idat))
    # interlace=0 is a single full-size pass; Adam7 is seven sub-images,
    # each independently filtered, scattered onto the (y,x) grid
    passes = _ADAM7 if interlace else [(0, 0, 1, 1)]
    samples = np.zeros((h, w, ch_b), dtype=np.uint8)
    pos = 0
    for xs, ys, xstep, ystep in passes:
        pw = -(-(w - xs) // xstep) if w > xs else 0
        ph = -(-(h - ys) // ystep) if h > ys else 0
        if pw <= 0 or ph <= 0:
            continue  # empty pass: NO scanlines, not even filter bytes
        stride = pw * ch_b
        need = (stride + 1) * ph
        sub = _png_unfilter(raw[pos : pos + need], ph, stride, ch_b)
        pos += need
        samples[ys::ystep, xs::xstep, :] = sub.reshape(ph, pw, ch_b)
    if pos != len(raw):
        raise ValueError("bad PNG pixel payload")
    if depth == 16:  # big-endian 16-bit samples -> high byte (v >> 8)
        px = samples.reshape(h, w, ch, 2)[:, :, :, 0]
    else:
        px = samples.reshape(h, w, ch)
    if color == 3:  # palette indices -> RGB via PLTE
        if int(px.max()) >= len(plte):
            raise ValueError("palette index out of range")
        px = plte[px[:, :, 0]]
    elif ch == 1:
        px = np.repeat(px, 3, axis=2)
    elif ch == 4:
        px = px[:, :, :3]  # alpha dropped for intensity stats
    return px


def _gif_deinterlace(rows):
    """GIF 4-pass interlace: rows arrive in pass order (every 8th from 0,
    every 8th from 4, every 4th from 2, every 2nd from 1); returns the
    natural-order row permutation."""
    import numpy as np

    h = rows.shape[0]
    order = (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


def gif_parse_frames(data: bytes, max_frames: int | None = None,
                     indices=None):
    """Full GIF87a/89a parse: logical screen, global/local color tables,
    graphic-control extensions (disposal methods 0-3, transparency), 4-pass
    interlace, and per-frame LZW decode, COMPOSITED onto the logical-screen
    canvas in frame order. Returns a list of (sh, sw, 3) uint8 canvases —
    or, when `indices` is given, a dict {frame_idx: canvas} holding ONLY
    the requested frames.

    GIF frames are delta-coded (each draws a sub-rect over the prior
    canvas), so decoding frame k requires COMPOSITING frames 0..k — but
    not RETAINING them: `indices` keeps memory at O(sampled x H x W)
    instead of O(n_frames x H x W) (a 600-frame HD GIF sampled every 30
    would otherwise hold ~1.6 GB to return 20 frames), while `max_frames`
    only bounds the compositing work. Disposal: 0/1 leave the canvas, 2
    restores the frame rect to the background color, 3 restores the
    pre-frame canvas. Built from the published GIF89a specification.
    """
    import struct

    import numpy as np

    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, packed, bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 ** ((packed & 0x07) + 1)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    bg_rgb = gct[bg] if gct is not None and bg < len(gct) else np.zeros(3, np.uint8)
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
    want = None if indices is None else {int(i) for i in indices}
    if want is not None and not want:
        return {}  # nothing sampled: skip ALL decode work
    last_want = max(want) if want is not None else None
    sampled: dict[int, object] = {}
    frames: list = []
    n_done = 0
    disposal, transparent = 0, None  # pending graphic-control state
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension: label + sub-blocks
            label = data[pos + 1] if pos + 1 < len(data) else 0
            pos += 2
            if label == 0xF9 and pos < len(data) and data[pos] >= 4:
                flags = data[pos + 1]
                disposal = (flags >> 2) & 0x7
                transparent = data[pos + 4] if flags & 0x1 else None
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            left, top, w, h, ipacked = struct.unpack_from("<HHHHB", data, pos + 1)
            pos += 10
            ct = gct
            if ipacked & 0x80:  # local color table
                n = 2 ** ((ipacked & 0x07) + 1)
                ct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF frame without a color table")
            min_code = data[pos]
            pos += 1
            stream = bytearray()
            while pos < len(data) and data[pos] != 0:
                ln = data[pos]
                stream += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1  # block terminator
            idx = np.asarray(
                _lzw_decode(bytes(stream), min_code, w * h), dtype=np.int32
            ).reshape(h, w)
            if int(idx.max(initial=0)) >= len(ct):
                raise ValueError("GIF index out of range")
            if ipacked & 0x40:
                idx = _gif_deinterlace(idx)
            if left + w > sw or top + h > sh:
                raise ValueError("GIF frame rect outside logical screen")
            before = canvas.copy() if disposal == 3 else None
            region = canvas[top : top + h, left : left + w]
            px = ct[idx]
            if transparent is not None:  # transparent pixels keep the canvas
                mask = idx != transparent
                region[mask] = px[mask]
            else:
                region[:] = px
            if want is None:
                frames.append(canvas.copy())
            elif n_done in want:
                sampled[n_done] = canvas.copy()
            n_done += 1
            if want is not None and last_want is not None and n_done > last_want:
                return sampled
            if max_frames is not None and n_done >= max_frames:
                return sampled if want is not None else frames
            if disposal == 2:  # restore rect to background
                canvas[top : top + h, left : left + w] = bg_rgb
            elif disposal == 3 and before is not None:
                canvas = before
            disposal, transparent = 0, None
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"bad GIF block 0x{b:02x}")
    if want is not None:
        if n_done == 0:
            raise ValueError("no GIF image data")
        return sampled
    if not frames:
        raise ValueError("no GIF image data")
    return frames


def gif_frame_count(data: bytes) -> int:
    """Frame count via a header/block walk ONLY — color tables and LZW
    sub-blocks are skipped by length, no pixel decode. This is the cheap
    metadata pass the frame-sampling plan runs over the whole corpus."""
    import struct

    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    packed = data[10]
    pos = 13 + (3 * 2 ** ((packed & 0x07) + 1) if packed & 0x80 else 0)
    count = 0
    while pos < len(data):
        b = data[pos]
        if b == 0x21:
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:
            ipacked = struct.unpack_from("<HHHHB", data, pos + 1)[4]
            pos += 10
            if ipacked & 0x80:
                pos += 3 * 2 ** ((ipacked & 0x07) + 1)
            pos += 1  # LZW min code size
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            count += 1
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"bad GIF block 0x{b:02x}")
    return count


def decode_gif(data: bytes) -> dict:
    """First-frame stats of a (possibly multi-frame) GIF: the full parse in
    gif_parse_frames bounded to one composited frame."""
    return _gray_stats(gif_parse_frames(data, max_frames=1)[0])


def _lzw_decode(stream: bytes, min_code: int, n_pixels: int) -> list[int]:
    """GIF variable-width LZW (LSB-first bit packing): CLEAR resets the
    dictionary, codes grow to 12 bits, and code == next-unassigned is the
    KwKwK case (emit prev + prev[0])."""
    clear = 1 << min_code
    end = clear + 1
    out: list[int] = []
    table: list[list[int]] = []
    width = min_code + 1
    prev: list[int] | None = None

    def reset():
        nonlocal table, width, prev
        table = [[i] for i in range(clear)] + [[], []]
        width = min_code + 1
        prev = None

    reset()
    acc = nbits = 0
    i = 0
    while len(out) < n_pixels:
        while nbits < width:
            if i >= len(stream):
                raise ValueError("truncated GIF LZW stream")
            acc |= stream[i] << nbits
            nbits += 8
            i += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            reset()
            continue
        if code == end:
            break
        if code < len(table) and (code < clear or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError("bad GIF LZW code")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("GIF pixel data short")
    return out[:n_pixels]


#: zig-zag index order (JPEG spec Figure 5): position k in the entropy
#: stream lands at flat index _ZIGZAG[k] of the row-major 8x8 block
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


class _BitReader:
    """MSB-first bit reader over a de-stuffed entropy segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy data exhausted")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        """n bits MSB-first, pulled in byte-sized chunks (not per-bit)."""
        v = 0
        data, pos, bit = self.data, self.pos, self.bit
        while n > 0:
            if pos >= len(data):
                raise ValueError("JPEG entropy data exhausted")
            avail = 8 - bit
            take = avail if avail < n else n
            v = (v << take) | ((data[pos] >> (avail - take)) & ((1 << take) - 1))
            bit += take
            if bit == 8:
                bit = 0
                pos += 1
            n -= take
        self.pos, self.bit = pos, bit
        return v


class _HuffTable:
    """Canonical Huffman DECODE tables (T.81 F.2.2.3): per-code-length
    mincode/maxcode/valptr arrays built ONCE per DHT segment, so each
    symbol decode is one compare per code length instead of the former
    16-step (length, code) dict probe."""

    __slots__ = ("mincode", "maxcode", "valptr", "vals")

    def __init__(self, counts: list[int], syms: bytes):
        self.vals = syms
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17  # -1 = no codes of this length
        self.valptr = [0] * 17
        code = k = 0
        for length in range(1, 17):
            c = counts[length - 1]
            if c:
                self.valptr[length] = k
                self.mincode[length] = code
                code += c
                k += c
                self.maxcode[length] = code - 1
            code <<= 1


def _huff_decode(reader: _BitReader, table: _HuffTable) -> int:
    """Walk bits, returning as soon as the accumulated code lands inside
    the current length's [mincode, maxcode] band."""
    code = 0
    maxcode = table.maxcode
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        if code <= maxcode[length]:
            return table.vals[table.valptr[length] + code - table.mincode[length]]
    raise ValueError("invalid JPEG huffman code")


def _extend(v: int, t: int) -> int:
    """JPEG EXTEND (spec F.2.2.1): map t low bits to a signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _entropy_segments(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """De-stuffed entropy-coded segments starting at ``pos``, split on
    restart markers; returns (segments, position of the terminating marker's
    0xFF byte)."""
    segments: list[bytes] = []
    cur = bytearray()
    i = pos
    while i < len(data):
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1] if i + 1 < len(data) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn: new segment
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # EOI or next marker header
        cur.append(b)
        i += 1
    segments.append(bytes(cur))
    return segments, i


def decode_jpeg(data: bytes) -> dict:
    """Feature dict from a JPEG payload (see decode_jpeg_pixels)."""
    return _gray_stats(decode_jpeg_pixels(data))


def decode_jpeg_pixels(data: bytes):
    """Baseline-sequential (SOF0/1) AND progressive (SOF2) JPEG in pure
    numpy: marker parse, canonical Huffman decode, per-scan coefficient
    accumulation (progressive: DC first/refinement, AC spectral-selection
    first scans with EOB runs, AC successive-approximation refinement per
    T.81 G.1.2), dequantize through zig-zag order, 8x8 IDCT as two matrix
    products, chroma upsample, YCbCr→RGB. Handles byte stuffing, restart
    markers/DRI, 4:4:4 / 4:2:0 / 4:2:2 sampling, 1- or 3-component frames.
    Lossless/hierarchical/arithmetic variants and 12-bit precision raise
    into the quarantine path. Built from the public JPEG spec (ITU T.81)
    only; correctness-grade, not throughput-grade — plug a native codec via
    `decode_fn` for JPEG farms.
    """
    import struct

    import numpy as np

    if not data.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    frame = None  # (h, w, [(comp_id, hs, vs, tq)])
    progressive = False
    restart_interval = 0
    coefs: dict[int, np.ndarray] = {}  # cid -> (by, bx, 64) zigzag-ordered

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT: one or more tables
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                off += 1
                n = 64 * (2 if pq else 1)
                vals = (
                    np.frombuffer(body[off : off + n], dtype=">u2" if pq else np.uint8)
                    .astype(np.int32)
                )
                tbl = np.zeros(64, np.int32)
                tbl[_ZIGZAG] = vals
                qt[tq] = tbl.reshape(8, 8)
                off += n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            precision, h, w, ncomp = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if precision != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for i in range(ncomp):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, samp >> 4, samp & 0xF, tq))
            frame = (h, w, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline or progressive DCT JPEG supported")
        elif marker == 0xC4:  # DHT (tables may be redefined between scans)
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                counts = list(body[off + 1 : off + 17])
                syms = body[off + 17 : off + 17 + sum(counts)]
                huff[(tc, th)] = _HuffTable(counts, syms)
                off += 17 + sum(counts)
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cid, tabs = body[1 + 2 * i], body[2 + 2 * i]
                scan.append((cid, tabs >> 4, tabs & 0xF))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah_al = body[3 + 2 * ns]
            ah, al = ah_al >> 4, ah_al & 0xF
            segments, end = _entropy_segments(data, pos + 2 + seg_len)
            if not coefs:
                coefs = _alloc_coefs(frame)
            if progressive:
                _progressive_scan(
                    segments, frame, scan, huff, restart_interval, coefs,
                    ss, se, ah, al,
                )
                pos = end
                continue
            _sequential_scan(segments, frame, scan, huff, restart_interval, coefs)
            return _reconstruct(frame, coefs, qt)
        pos += 2 + seg_len
    if progressive and coefs:
        return _reconstruct(frame, coefs, qt)
    raise ValueError("no JPEG scan found")


def _frame_geometry(frame):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    return h, w, comps, hmax, vmax, mcux, mcuy


def _alloc_coefs(frame):
    """Per-component zig-zag-ordered coefficient arrays on the MCU-padded
    block grid (non-interleaved progressive scans cover a possibly smaller
    per-component grid; the padding blocks stay zero and are cropped away)."""
    import numpy as np

    _, _, comps, _, _, mcux, mcuy = _frame_geometry(frame)
    return {
        cid: np.zeros((mcuy * vs, mcux * hs, 64), np.int32)
        for cid, hs, vs, _ in comps
    }


def _component_blocks(w, h, hs, vs, hmax, vmax):
    """Block-grid width/height of one component in a NON-interleaved scan:
    ceil(ceil(dim*sampling/max_sampling) / 8) per T.81 A.2.2."""
    comp_w = -(-(w * hs) // hmax)
    comp_h = -(-(h * vs) // vmax)
    return -(-comp_w // 8), -(-comp_h // 8)


def _sequential_scan(segments, frame, scan, huff, restart_interval, coefs):
    """Baseline interleaved scan: full DC+AC per block, MCU order."""
    _, _, comps, _, _, mcux, mcuy = _frame_geometry(frame)
    dc_pred = {cid: 0 for cid, _, _, _ in comps}
    seg_idx = 0
    reader = _BitReader(segments[0])
    mcu_in_seg = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_in_seg == restart_interval:
                seg_idx += 1
                reader = _BitReader(segments[seg_idx])
                dc_pred = {cid: 0 for cid, _, _, _ in comps}
                mcu_in_seg = 0
            for cid, hs, vs, _tq in comps:
                td, ta = next((s[1], s[2]) for s in scan if s[0] == cid)
                for by in range(vs):
                    for bx in range(hs):
                        zz = coefs[cid][my * vs + by, mx * hs + bx]
                        t = _huff_decode(reader, huff[(0, td)])
                        diff = _extend(reader.read_bits(t), t)
                        dc_pred[cid] += diff
                        zz[0] = dc_pred[cid]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, huff[(1, ta)])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL: sixteen zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
            mcu_in_seg += 1


def _ac_refine_block(reader, table, zz, ss, se, al, eobrun):
    """AC successive-approximation refinement for one block (T.81 G.1.2.3):
    newly-significant coefficients arrive as ±1 at bit position `al`, and
    every already-nonzero coefficient the scan passes receives a correction
    bit. Returns the remaining EOB run."""
    p1 = 1 << al

    def correct(idx):
        if reader.read_bit() and (abs(int(zz[idx])) & p1) == 0:
            zz[idx] += p1 if zz[idx] > 0 else -p1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(reader, table)
            r, s = rs >> 4, rs & 0xF
            if s == 0 and r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.read_bits(r)
                break
            newval = 0
            if s:
                if s != 1:
                    raise ValueError("bad AC refinement magnitude")
                newval = p1 if reader.read_bit() else -p1
            # pass r zero-history coefficients (correcting any nonzero ones
            # encountered), stopping on the target slot
            while k <= se:
                if zz[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s:
                if k > se:
                    raise ValueError("AC refinement overflow")
                zz[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:  # EOB span still corrects nonzero-history coeffs
            if zz[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _progressive_scan(segments, frame, scan, huff, restart_interval, coefs,
                      ss, se, ah, al):
    """One progressive scan: DC first/refinement (interleaved or single-
    component) or AC first/refinement (always single-component per T.81)."""
    h, w, comps, hmax, vmax, mcux, mcuy = _frame_geometry(frame)
    seg_idx = 0
    reader = _BitReader(segments[0])
    units_in_seg = 0
    if ss == 0:  # DC scan (se must be 0)
        if se != 0:
            raise ValueError("progressive DC scan with se != 0")
        scan_comps = [c for c in comps if any(s[0] == c[0] for s in scan)]
        dc_pred = {c[0]: 0 for c in scan_comps}
        interleaved = len(scan_comps) > 1
        if interleaved:
            grid = [(my, mx) for my in range(mcuy) for mx in range(mcux)]
        else:
            cid0, hs, vs, _ = scan_comps[0]
            bw, bh = _component_blocks(w, h, hs, vs, hmax, vmax)
            grid = [(by, bx) for by in range(bh) for bx in range(bw)]
        for gy, gx in grid:
            if restart_interval and units_in_seg == restart_interval:
                seg_idx += 1
                reader = _BitReader(segments[seg_idx])
                dc_pred = {c[0]: 0 for c in scan_comps}
                units_in_seg = 0
            for cid, hs, vs, _tq in scan_comps:
                td = next(s[1] for s in scan if s[0] == cid)
                blocks = (
                    [(gy * vs + by, gx * hs + bx) for by in range(vs) for bx in range(hs)]
                    if interleaved
                    else [(gy, gx)]
                )
                for by, bx in blocks:
                    zz = coefs[cid][by, bx]
                    if ah == 0:  # DC first scan
                        t = _huff_decode(reader, huff[(0, td)])
                        dc_pred[cid] += _extend(reader.read_bits(t), t)
                        zz[0] = dc_pred[cid] << al
                    else:  # DC refinement: one bit sets bit `al`
                        if reader.read_bit():
                            zz[0] |= 1 << al
            units_in_seg += 1
        return
    # AC scan: exactly one component, non-interleaved
    if len(scan) != 1:
        raise ValueError("progressive AC scan must be single-component")
    cid, _td, ta = scan[0]
    hs, vs = next((c[1], c[2]) for c in comps if c[0] == cid)
    bw, bh = _component_blocks(w, h, hs, vs, hmax, vmax)
    eobrun = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and units_in_seg == restart_interval:
                seg_idx += 1
                reader = _BitReader(segments[seg_idx])
                eobrun = 0
                units_in_seg = 0
            zz = coefs[cid][by, bx]
            if ah == 0:  # AC first scan for this band
                if eobrun > 0:
                    eobrun -= 1
                else:
                    k = ss
                    while k <= se:
                        rs = _huff_decode(reader, huff[(1, ta)])
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += reader.read_bits(r)
                            break
                        k += r
                        if k > se:
                            raise ValueError("JPEG AC index overflow")
                        zz[k] = _extend(reader.read_bits(s), s) << al
                        k += 1
            else:  # AC refinement
                eobrun = _ac_refine_block(reader, huff[(1, ta)], zz, ss, se, al, eobrun)
            units_in_seg += 1


def _reconstruct(frame, coefs, qt):
    """Dequantize + IDCT every block, assemble planes, upsample subsampled
    chroma, convert to RGB; returns the (H, W, 3) uint8 pixel array."""
    import numpy as np

    h, w, comps, hmax, vmax, mcux, mcuy = _frame_geometry(frame)
    # orthonormal IDCT basis: px = B.T @ coef @ B with the JPEG C(u) scaling
    u = np.arange(8)
    B = np.cos((2 * u[None, :] + 1) * u[:, None] * np.pi / 16) / 2
    B[0, :] /= np.sqrt(2)

    full = []
    for cid, hs, vs, tq in comps:
        arr = coefs[cid]
        by, bx = arr.shape[0], arr.shape[1]
        qz = qt[tq].reshape(-1)[_ZIGZAG]  # quant values in zigzag order
        # batched dequantize + IDCT over ALL blocks at once: same
        # (B.T @ blk) @ B contraction order per block as the scalar loop,
        # so the result is bit-identical — just one numpy dispatch instead
        # of by*bx of them
        blk = np.zeros((by * bx, 64), np.float64)
        blk[:, _ZIGZAG] = arr.reshape(-1, 64) * qz[None, :]
        px = B.T @ blk.reshape(-1, 8, 8) @ B + 128.0
        plane = (
            px.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        )
        if hs != hmax or vs != vmax:
            plane = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        rgb = np.repeat(np.clip(full[0], 0, 255)[:, :, None], 3, axis=2)
    elif len(full) == 3:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.clip(np.stack([r, g, b], axis=2), 0, 255)
    else:
        raise ValueError("unsupported JPEG component count")
    return rgb.astype(np.uint8)


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
    if data.startswith(b"\xff\xd8"):
        return decode_jpeg(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(data)
    raise ValueError("unsupported container (plug a codec via decode_fn)")


def decode_image_pixels(data: bytes):
    """Container-sniffing pixel decode: the (H, W, 3) uint8 array behind
    decode_image's feature dict (GIF: first frame)."""
    if not data:
        raise ValueError("empty payload")
    if data.startswith(b"P6"):
        return decode_ppm_pixels(data)
    if data.startswith(b"BM"):
        return decode_bmp_pixels(data)
    if data.startswith(b"\x89PNG\r\n\x1a\n"):
        return decode_png_pixels(data)
    if data.startswith(b"\xff\xd8"):
        return decode_jpeg_pixels(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return gif_parse_frames(data, max_frames=1)[0]
    raise ValueError("unsupported container (plug a codec via decode_fn)")


def image_dhash(px) -> int:
    """64-bit difference hash (vertical-gradient dHash) from an (H, W, 3)
    uint8 array: 9x8 grid of cell means; bit r*8+c is set iff cell (r, c)
    is strictly darker than cell (r+1, c). Integer-EXACT: cells compare by
    cross-multiplied integer sums, never float means, so the hash is
    reproducible in closed form for analytically-constructed images (the
    mm_phash_neardup oracle) and across engines. Returned as a signed
    64-bit value (Spark/DuckDB BIGINT range)."""
    import numpy as np

    h, w = px.shape[0], px.shape[1]
    if h < 9 or w < 8:
        raise ValueError("image too small for a 9x8 dHash grid")
    s = px.astype(np.int64).sum(axis=2)  # per-pixel channel sum, 0..765
    rb = [r * h // 9 for r in range(10)]
    cb = [c * w // 8 for c in range(9)]
    cell = [
        [int(s[rb[r] : rb[r + 1], cb[c] : cb[c + 1]].sum()) for c in range(8)]
        for r in range(9)
    ]
    cnt = [
        [(rb[r + 1] - rb[r]) * (cb[c + 1] - cb[c]) for c in range(8)]
        for r in range(9)
    ]
    v = 0
    for r in range(8):
        for c in range(8):
            # mean(r) < mean(r+1)  <=>  sum(r)*cnt(r+1) < sum(r+1)*cnt(r)
            if cell[r][c] * cnt[r + 1][c] < cell[r + 1][c] * cnt[r][c]:
                v |= 1 << (r * 8 + c)
    return v - (1 << 64) if v >= (1 << 63) else v


def with_image_dhash(
    df: DataFrame,
    id_col: str = "item_id",
    bytes_col: str = "content",
    decode_fn: Callable[[bytes], object] = decode_image_pixels,
) -> DataFrame:
    """(item_id, dhash) per image via mapInPandas — the perceptual-hash
    feed for hamming_neardup_pairs (operators/dedup.py): decode + hash
    inside the partition that holds the bytes (zero shuffle), then the
    64-bit fingerprints — not the pixels — flow into the banded Hamming
    join. This is how image-level near-dedup stays tractable at 100 TB:
    the heavy column never leaves the scan."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for item_id, content in zip(pdf["item_id"], pdf["content"]):
                try:
                    px = decode_fn(bytes(content) if content is not None else b"")
                    v = image_dhash(px)
                    # row materialization inside the try: a null/NaN id must
                    # quarantine this ROW, not fail the task (ADVICE r6)
                    out.append({"item_id": int(item_id), "dhash": v})
                except Exception:
                    continue  # quarantine path in production
            yield pd.DataFrame(out, columns=["item_id", "dhash"])

    selected = df.select(
        F.col(id_col).alias("item_id"), F.col(bytes_col).alias("content")
    )
    return selected.mapInPandas(run, schema="item_id long, dhash long")


#: output schema of extract_audio_features
AUDIO_FEATURES_SCHEMA = (
    "item_id long, n_bytes int, sample_rate int, n_channels int, "
    "n_samples long, duration_sec double, rms double, zero_cross_rate double, "
    "dominant_freq_hz double"
)


#: G.711 expansion LUTs (built lazily once per worker): code byte -> 16-bit
#: linear, per the classic segmented-companding reference formulation.
_G711_LUTS: dict[str, object] = {}


def _g711_lut(law: str):
    import numpy as np

    lut = _G711_LUTS.get(law)
    if lut is None:
        lut = np.empty(256, dtype=np.int16)
        for b in range(256):
            if law == "ulaw":
                v = ~b & 0xFF
                t = (((v & 0x0F) << 3) + 0x84) << ((v & 0x70) >> 4)
                lut[b] = 0x84 - t if v & 0x80 else t - 0x84
            else:  # alaw
                v = b ^ 0x55
                t = (v & 0x0F) << 4
                seg = (v & 0x70) >> 4
                if seg == 0:
                    t += 8
                elif seg == 1:
                    t += 0x108
                else:
                    t = (t + 0x108) << (seg - 1)
                lut[b] = t if v & 0x80 else -t
        _G711_LUTS[law] = lut
    return lut


#: IMA ADPCM quantizer tables (IMA "Recommended Practices for Enhancing
#: Digital Audio Compatibility", the table every WAV fmt 0x11 stream uses)
_IMA_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41,
    45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190,
    209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724,
    796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272,
    2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
    7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500,
    20350, 22385, 24623, 27086, 29794, 32767,
)
_IMA_INDEX = (-1, -1, -1, -1, 2, 4, 6, 8)


def _ima_step(pred: int, index: int, nib: int) -> tuple[int, int]:
    """One IMA ADPCM predictor update: nibble -> (new predictor, new index)."""
    step = _IMA_STEPS[index]
    diff = step >> 3
    if nib & 1:
        diff += step >> 2
    if nib & 2:
        diff += step >> 1
    if nib & 4:
        diff += step
    pred = pred - diff if nib & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + _IMA_INDEX[nib & 7]))
    return pred, index


def _ima_decode(raw: bytes, n_ch: int, block_align: int, spb: int):
    """IMA ADPCM data chunk -> (n_samples, n_ch) int16 array. Block layout
    per the WAV spec: a 4-byte (predictor, step index, reserved) header per
    channel, then 4-byte-per-channel nibble groups (8 samples each, low
    nibble first), channels interleaved group-wise."""
    import struct

    import numpy as np

    outs = []
    for off in range(0, len(raw) - len(raw) % block_align, block_align):
        body = raw[off : off + block_align]
        out = np.zeros((spb, n_ch), dtype=np.int16)
        preds, idxs = [], []
        for c in range(n_ch):
            pred = struct.unpack_from("<h", body, 4 * c)[0]
            index = body[4 * c + 2]
            if index > 88:
                raise ValueError("bad ADPCM step index")
            preds.append(pred)
            idxs.append(index)
            out[0, c] = pred
        nibbles = body[4 * n_ch:]
        pos, s = 0, 1
        while s < spb and pos + 4 * n_ch <= len(nibbles):
            for c in range(n_ch):
                si = s
                for byte in nibbles[pos + 4 * c : pos + 4 * c + 4]:
                    for nib in (byte & 0x0F, byte >> 4):
                        if si >= spb:
                            break
                        preds[c], idxs[c] = _ima_step(preds[c], idxs[c], nib)
                        out[si, c] = preds[c]
                        si += 1
            pos += 4 * n_ch
            s += 8
        outs.append(out)
    if not outs:
        raise ValueError("empty ADPCM stream")
    return np.vstack(outs)


def decode_wav(data: bytes) -> dict:
    """Real decoder for RIFF/WAVE audio: integer PCM (8/16/32-bit, any
    channel count), G.711 mu-law (fmt 7) / A-law (fmt 6), and IMA ADPCM
    (fmt 0x11) — pure struct + numpy, no codec libraries. Psychoacoustic
    codecs (MP3/AAC) still need external libs and raise into the quarantine
    path — plug ffmpeg via `decode_fn` in production. Returns samples as
    float64 in [-1, 1], channel-averaged.
    """
    import struct

    import numpy as np

    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, n_ch, rate = struct.unpack_from("<HHI", body, 0)
            block_align = struct.unpack_from("<H", body, 12)[0]
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt not in (1, 6, 7, 0x11):
                raise ValueError(f"unsupported WAV format tag {audio_fmt}")
            extra = body[18:] if len(body) > 18 else b""
            fmt = (audio_fmt, n_ch, rate, bits, block_align, extra)
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks pad to even
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, rate, bits, block_align, extra = fmt
    if audio_fmt in (6, 7):  # G.711: one code byte per sample, LUT expand
        if bits != 8:
            raise ValueError(f"G.711 requires 8-bit codes, got {bits}")
        lut = _g711_lut("alaw" if audio_fmt == 6 else "ulaw")
        codes = np.frombuffer(raw[: len(raw) - len(raw) % n_ch], dtype=np.uint8)
        x = lut[codes].astype(np.float64) / 32768.0
    elif audio_fmt == 0x11:  # IMA ADPCM
        if bits != 4:
            raise ValueError(f"IMA ADPCM requires 4-bit samples, got {bits}")
        if len(extra) >= 2:
            spb = struct.unpack_from("<H", extra, 0)[0]
        else:  # derive from block geometry when cbSize is absent
            spb = (block_align - 4 * n_ch) * 2 // n_ch + 1
        if spb < 1 or block_align < 4 * n_ch + 4:
            raise ValueError("bad ADPCM block geometry")
        # a lying wSamplesPerBlock beyond the block's nibble capacity would
        # zero-fill phantom samples (silent wrong RMS/duration) — raise into
        # the quarantine path instead
        if spb > (block_align - 4 * n_ch) * 2 // n_ch + 1:
            raise ValueError("ADPCM wSamplesPerBlock exceeds block capacity")
        x = _ima_decode(raw, n_ch, block_align, spb).astype(np.float64) / 32768.0
        x = x.reshape(-1)
    else:  # integer PCM
        dtype = {8: np.uint8, 16: np.int16, 32: np.int32}.get(bits)
        if dtype is None:
            raise ValueError(f"unsupported PCM depth {bits}")
        samples = np.frombuffer(
            raw[: len(raw) - len(raw) % (n_ch * bits // 8)], dtype=dtype
        )
        if bits == 8:  # 8-bit WAV is unsigned
            x = (samples.astype(np.float64) - 128.0) / 128.0
        else:
            x = samples.astype(np.float64) / float(2 ** (bits - 1))
    x = x.reshape(-1, n_ch).mean(axis=1)  # channel average
    return {"sample_rate": rate, "n_channels": n_ch, "samples": x}


class _FlacBits:
    """MSB-first bit reader for FLAC streams (no byte stuffing — that is a
    JPEG-ism; FLAC frames are raw bits with byte-aligned boundaries)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated FLAC stream")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def read_utf8(self) -> int:
        """FLAC's UTF-8-style coded frame/sample number (up to 7 bytes)."""
        b0 = self.read(8)
        if b0 < 0x80:
            return b0
        n = 0
        mask = 0x40
        while b0 & mask:
            n += 1
            mask >>= 1
        if n < 1 or n > 6:
            raise ValueError("bad UTF-8 coded number")
        v = b0 & (mask - 1)
        for _ in range(n):
            c = self.read(8)
            if c & 0xC0 != 0x80:
                raise ValueError("bad UTF-8 continuation")
            v = (v << 6) | (c & 0x3F)
        return v

    def align(self) -> None:
        self.nbits -= self.nbits % 8
        self.acc &= (1 << self.nbits) - 1


#: FLAC block-size codes (frame header bits 4-7); 6/7 read 8/16 bits inline
_FLAC_BLOCKSIZE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                   8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                   13: 8192, 14: 16384, 15: 32768}
_FLAC_SAMPLE_SIZE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
#: fixed-predictor coefficients by order (x[i] = e + sum c_j * x[i-1-j])
_FLAC_FIXED = {0: (), 1: (1,), 2: (2, -1), 3: (3, -3, 1), 4: (4, -6, 4, -1)}


def _flac_residual(bits: _FlacBits, blocksize: int, order: int) -> list[int]:
    """Rice-coded residual: 2-bit method (4- or 5-bit params), 4-bit
    partition order, zigzag-decoded quotient/remainder codes with the
    all-ones escape to raw n-bit samples."""
    method = bits.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    porder = bits.read(4)
    partitions = 1 << porder
    if blocksize % partitions:
        raise ValueError("block size not divisible by rice partitions")
    res: list[int] = []
    for p in range(partitions):
        count = (blocksize >> porder) - (order if p == 0 else 0)
        if count < 0:
            raise ValueError("bad rice partition geometry")
        param = bits.read(pbits)
        if param == escape:
            raw = bits.read(5)
            for _ in range(count):
                res.append(bits.read_signed(raw) if raw else 0)
        else:
            for _ in range(count):
                q = bits.read_unary()
                v = (q << param) | bits.read(param)
                res.append((v >> 1) ^ -(v & 1))  # zigzag
    return res


def _flac_subframe(bits: _FlacBits, blocksize: int, bps: int) -> list[int]:
    if bits.read(1):
        raise ValueError("bad subframe padding bit")
    ftype = bits.read(6)
    wasted = 0
    if bits.read(1):  # wasted-bits-per-sample flag: unary k-1
        wasted = 1 + bits.read_unary()
        bps -= wasted
    if ftype == 0:  # CONSTANT
        x = [bits.read_signed(bps)] * blocksize
    elif ftype == 1:  # VERBATIM
        x = [bits.read_signed(bps) for _ in range(blocksize)]
    elif 8 <= ftype <= 12:  # FIXED, order 0-4
        order = ftype - 8
        x = [bits.read_signed(bps) for _ in range(order)]
        res = _flac_residual(bits, blocksize, order)
        coefs = _FLAC_FIXED[order]
        for e in res:
            pred = sum(c * x[-1 - j] for j, c in enumerate(coefs))
            x.append(e + pred)
    elif ftype >= 32:  # LPC, order 1-32
        order = ftype - 31
        x = [bits.read_signed(bps) for _ in range(order)]
        precision = bits.read(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC precision")
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [bits.read_signed(precision) for _ in range(order)]
        res = _flac_residual(bits, blocksize, order)
        for e in res:
            pred = sum(c * x[-1 - j] for j, c in enumerate(coefs)) >> shift
            x.append(e + pred)
    else:
        raise ValueError(f"reserved subframe type {ftype}")
    if wasted:
        x = [v << wasted for v in x]
    return x


def decode_flac(data: bytes) -> dict:
    """Real decoder for native FLAC (the lossless compressed-audio format):
    STREAMINFO metadata walk, frame headers with UTF-8 coded numbers, all
    four subframe types (CONSTANT / VERBATIM / FIXED order 0-4 / LPC order
    1-32), partitioned Rice residuals with escape codes, wasted bits, and
    the left/right/mid-side stereo decorrelation modes — pure bytes, no
    codec libraries. CRC-8/16 and MD5 trailers are parsed past, not
    verified (corrupt streams already fail structurally). Returns the same
    dict shape as decode_wav: float64 samples in [-1, 1], channel-averaged.
    """
    import numpy as np

    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    streaminfo = None
    while pos + 4 <= len(data):  # metadata blocks
        hdr = data[pos]
        size = int.from_bytes(data[pos + 1 : pos + 4], "big")
        if hdr & 0x7F == 0:  # STREAMINFO
            b = data[pos + 4 : pos + 4 + size]
            if len(b) < 18:
                raise ValueError("truncated STREAMINFO")
            rate = (b[10] << 12) | (b[11] << 4) | (b[12] >> 4)
            n_ch = ((b[12] >> 1) & 0x07) + 1
            bps = (((b[12] & 1) << 4) | (b[13] >> 4)) + 1
            total = ((b[13] & 0x0F) << 32) | int.from_bytes(b[14:18], "big")
            streaminfo = (rate, n_ch, bps, total)
        pos += 4 + size
        if hdr & 0x80:  # last-metadata-block flag
            break
    if streaminfo is None:
        raise ValueError("missing STREAMINFO")
    rate, n_ch, bps, total = streaminfo
    if rate == 0:
        raise ValueError("bad FLAC sample rate")
    bits = _FlacBits(data, pos)
    chans: list[list[int]] = [[] for _ in range(n_ch)]
    decoded = 0
    while (total == 0 or decoded < total) and bits.pos < len(data):
        if bits.read(14) != 0x3FFE:
            raise ValueError("lost FLAC frame sync")
        bits.read(1)  # reserved
        bits.read(1)  # blocking strategy
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        ss_code = bits.read(3)
        bits.read(1)  # reserved
        bits.read_utf8()  # frame/sample number
        if bs_code == 0:
            raise ValueError("reserved block size code")
        elif bs_code == 6:
            blocksize = bits.read(8) + 1
        elif bs_code == 7:
            blocksize = bits.read(16) + 1
        else:
            blocksize = _FLAC_BLOCKSIZE[bs_code]
        if sr_code == 12:
            bits.read(8)
        elif sr_code in (13, 14):
            bits.read(16)
        if ss_code == 0:
            frame_bps = bps  # "get from STREAMINFO"
        elif ss_code in _FLAC_SAMPLE_SIZE:
            frame_bps = _FLAC_SAMPLE_SIZE[ss_code]
        else:  # code 3 is reserved — decoding at a guessed width would
            # misalign every subsequent bit read into silent garbage
            raise ValueError(f"reserved FLAC sample-size code {ss_code}")
        bits.read(8)  # header CRC-8
        if ch_code < 8:
            if ch_code + 1 != n_ch:
                raise ValueError("frame/streaminfo channel mismatch")
            sub = [_flac_subframe(bits, blocksize, frame_bps)
                   for _ in range(n_ch)]
        elif ch_code in (8, 9, 10):
            if n_ch != 2:
                raise ValueError("stereo decorrelation needs 2 channels")
            # the SIDE channel carries one extra bit of depth
            extra = (0, 1) if ch_code in (8, 10) else (1, 0)
            a = _flac_subframe(bits, blocksize, frame_bps + extra[0])
            b = _flac_subframe(bits, blocksize, frame_bps + extra[1])
            if ch_code == 8:  # left/side: right = left - side
                sub = [a, [left - side for left, side in zip(a, b)]]
            elif ch_code == 9:  # right/side: left = right + side
                sub = [[r + s for s, r in zip(a, b)], b]
            else:  # mid/side
                left, right = [], []
                for m, s in zip(a, b):
                    m = (m << 1) | (s & 1)
                    left.append((m + s) >> 1)
                    right.append((m - s) >> 1)
                sub = [left, right]
        else:
            raise ValueError("reserved channel assignment")
        bits.align()
        bits.read(16)  # frame CRC-16
        take = blocksize
        if total and decoded + take > total:  # last frame may overrun pad
            take = total - decoded
        for c in range(n_ch):
            chans[c].extend(sub[c][:take])
        decoded += take
    if decoded == 0:
        raise ValueError("empty FLAC stream")
    x = np.array(chans, dtype=np.float64).T / float(1 << (bps - 1))
    return {
        "sample_rate": rate,
        "n_channels": n_ch,
        "samples": x.mean(axis=1),
    }


# ---------------------------------------------------------------------------
# MPEG-1 audio Layer I/II payload decode (ISO/IEC 11172-3 §2.4.3.1-3.3)
# ---------------------------------------------------------------------------

#: Layer I / Layer II bitrate tables (kbps) indexed by the 4-bit header field
_MP1_KBPS = [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448]
_MP2_KBPS = [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384]

#: Table B.1 scalefactors: SF[i] = 2 * 2^(-i/3) (index 63 is forbidden).
#: Computed, not tabulated — every third index is an exact dyadic double.
_MP12_SF = [2.0 * 2.0 ** (-i / 3.0) for i in range(63)]

#: ISO 11172-3 Table B.2a quantizer-step columns by subband class (step
#: counts; 3/5/9-level entries are "grouped": three samples share one code)
_B2A_LOW = (3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191,
            16383, 32767, 65535)
_B2A_MID = (3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
            8191, 65535)
_B2A_HIGH = (3, 5, 7, 9, 15, 31, 65535)
_B2A_TOP = (3, 5, 65535)


def _mp2_alloc_table(sblimit: int) -> list[tuple[int, tuple[int, ...]]]:
    """Per-subband (nbal, steps-column) rows of Table B.2a/B.2b — both
    tables share the four column classes; they differ only in sblimit
    (27 vs 30, subbands past 22 all use the 2-bit top class)."""
    rows: list[tuple[int, tuple[int, ...]]] = []
    for sb in range(sblimit):
        if sb < 3:
            rows.append((4, _B2A_LOW))
        elif sb < 11:
            rows.append((4, _B2A_MID))
        elif sb < 23:
            rows.append((3, _B2A_HIGH))
        else:
            rows.append((2, _B2A_TOP))
    return rows


def _mp12_dequant(code: int, steps: int) -> float:
    """Normative requantization, one closed form for every MPEG-1 audio
    quantizer: nb = bits of the (per-sample) code, s''' = the code with
    its MSB inverted read as a two's-complement fraction = code/2^(nb-1)-1,
    and s'' = C * (s''' + D) with C = 2^nb/steps and D = 1/2 for the
    grouped 3/5/9-level quantizers, 2^(1-nb) for the 2^nb-1-level ones
    (Layer I's §2.4.3.1 formula is exactly the ungrouped case). Every
    constant is a small rational — no tabulated floats."""
    nb = steps.bit_length()
    s3 = code / float(1 << (nb - 1)) - 1.0
    d = 0.5 if steps in (3, 5, 9) else 2.0 ** (1 - nb)
    return float(1 << nb) / steps * (s3 + d)


#: the 512-coefficient ISO/IEC 11172-3 Table 3-B.3 synthesis window.
#: INJECTABLE DATA, None by default: the table has no closed form and this
#: codebase refuses to reproduce data tables from memory unverified. Set
#: it (e.g. from a spec copy or dist10's dewindow array) and decode_mp12
#: switches from the DCT-IV energy-preserving approximation to the fully
#: NORMATIVE polyphase synthesis — the pipeline itself (matrixing, V FIFO,
#: U extraction, windowed accumulation) is implemented and
#: structure-verified below; only these constants are external.
MP12_SYNTHESIS_WINDOW = None

#: 64x32 matrixing basis N[i][k] = cos((16+i)(2k+1)pi/64), ISO 11172-3
#: §2.4.3.2 (lazily built, numpy)
_MP12_MATRIX = None


def mp12_synthesize(sub, window) -> "object":
    """NORMATIVE MPEG-1 audio synthesis (ISO 11172-3 §2.4.3.2 figure A.2)
    from (n_granules, 32) subband samples, vectorized: per granule,
    V = N @ S (the 64-point matrixing); V-vectors stack into the 1024-deep
    FIFO; U[64n + i] = V_fifo[128n + i], U[64n + 32 + i] =
    V_fifo[128n + 96 + i] for n in 0..7; W = U * D; and output sample j is
    sum_n W[32n + j]. `window` is the 512-coefficient D table
    (MP12_SYNTHESIS_WINDOW). The structure is pinned against an
    independent straight-from-the-spec loop implementation in
    tests/test_multimodal.py, so dropping the ISO constants in yields
    the normative decoder with no further verification needed here."""
    import numpy as np

    global _MP12_MATRIX
    if _MP12_MATRIX is None:
        i = np.arange(64)[:, None]
        k = np.arange(32)[None, :]
        _MP12_MATRIX = np.cos((16 + i) * (2 * k + 1) * np.pi / 64.0)
    d = np.asarray(window, dtype=np.float64)
    if d.shape != (512,):
        raise ValueError(f"synthesis window must have 512 coefficients, got {d.shape}")
    sub = np.asarray(sub, dtype=np.float64)
    g = sub.shape[0]
    v = sub @ _MP12_MATRIX.T  # (g, 64)
    # FIFO state for granule t is [V_t, V_{t-1}, ..., V_{t-15}]: build all
    # 16 shifted views with leading-zero history, then gather U
    hist = np.zeros((16, g, 64))
    for n in range(min(16, g)):  # n >= g would slice negatively: no history
        hist[n, n:, :] = v[: g - n, :]
    u = np.empty((g, 512))
    for n in range(8):
        u[:, 64 * n : 64 * n + 32] = hist[2 * n, :, 0:32]
        u[:, 64 * n + 32 : 64 * n + 64] = hist[2 * n + 1, :, 32:64]
    w = u * d[None, :]
    return w.reshape(g, 16, 32).sum(axis=1).reshape(-1)


#: orthonormal 32-point DCT-IV synthesis basis (lazily built, numpy)
_MP12_IDCT = None


def _mp12_pcm(sub) -> "object":
    """PCM from subband samples. When MP12_SYNTHESIS_WINDOW is set this is
    the fully NORMATIVE ISO polyphase synthesis (mp12_synthesize — the
    matrixing/FIFO/windowing pipeline is implemented and structure-pinned;
    only the 512 Table 3-B.3 constants are injectable data, which this
    codebase refuses to reproduce from memory unverified). Otherwise an
    orthonormal 32-point DCT-IV per granule: orthonormal means per-band
    ENERGY is preserved exactly (Parseval), so RMS-type features match the
    normative decode, while waveform phase (zero-cross, exact peak bins)
    differs by the missing prototype filter and is therefore never
    gate-pinned for MPEG rows. Subband samples themselves (decode_mp12's
    `subbands`) are the exact payload decode either way."""
    import numpy as np

    if MP12_SYNTHESIS_WINDOW is not None:
        return mp12_synthesize(sub, MP12_SYNTHESIS_WINDOW)

    global _MP12_IDCT
    if _MP12_IDCT is None:
        n = np.arange(32)[:, None]
        k = np.arange(32)[None, :]
        _MP12_IDCT = np.cos((2 * n + 1) * (2 * k + 1) * np.pi / 128.0) * np.sqrt(
            2.0 / 32.0
        )
    return (sub @ _MP12_IDCT.T).reshape(-1)


def decode_mp12(data: bytes) -> dict:
    """MPEG-1 audio Layer I/II payload decoder — pure bytes, no codec
    libraries: frame-header walk, bit allocation (Layer I's 4-bit nb
    ladder; Layer II Table B.2a columns), scfsi scalefactor sharing,
    Table B.1 scalefactors, grouped (3/5/9-level base-steps packing) and
    ungrouped sample codes, and the normative requantization formula.
    Subband output is exact; PCM uses the documented orthonormal DCT-IV
    synthesis (_mp12_pcm) in place of the tabulated prototype window.

    Supported envelope (raises ValueError outside it): MPEG-1 only;
    Layer II allocation uses the Table B.2a geometry, pinned to 48 kHz at
    >= 96 kbps/channel where that mapping is unambiguous (the B.2b/c/d
    row selections for 44.1/32 kHz and low bitrates are data tables this
    module does not reproduce unverified); mono/stereo/dual modes
    (joint-stereo intensity coding raises). Layer III payloads remain the
    documented codec boundary (parse_mp3_metadata walks their headers).

    Returns {"sample_rate", "n_channels", "samples", "layer", "n_frames",
    "subbands": float64 (n_granules, 32) channel-averaged}.
    """
    import numpy as np

    pos = 0
    layer = rate = n_ch = None
    grans: list = []
    n_frames = 0
    while pos + 4 <= len(data):
        h = int.from_bytes(data[pos : pos + 4], "big")
        if (h >> 21) & 0x7FF != 0x7FF:
            raise ValueError(f"lost MPEG frame sync at byte {pos}")
        if (h >> 19) & 0x3 != 0x3:
            raise ValueError("only MPEG-1 is supported")
        lay = {3: 1, 2: 2}.get((h >> 17) & 0x3)
        if lay is None:
            raise ValueError("Layer III payload decode is the codec boundary")
        crc = not ((h >> 16) & 1)
        bi, ri, pad = (h >> 12) & 0xF, (h >> 10) & 0x3, (h >> 9) & 0x1
        mode = (h >> 6) & 0x3
        if bi in (0, 15) or ri == 3:
            raise ValueError("free-format/reserved bitrate or sample rate")
        if mode == 1:
            raise ValueError("joint-stereo intensity coding is unsupported")
        r = _MP3_RATES[ri]
        ch = 1 if mode == 3 else 2
        kbps = (_MP1_KBPS if lay == 1 else _MP2_KBPS)[bi]
        if layer is None:
            layer, rate, n_ch = lay, r, ch
        elif (lay, r, ch) != (layer, rate, n_ch):
            raise ValueError("layer/rate/channel change mid-stream")
        if lay == 1:
            frame_len = ((12 * kbps * 1000) // r + pad) * 4
        else:
            frame_len = (144 * kbps * 1000) // r + pad
        if pos + frame_len > len(data):
            raise ValueError("truncated MPEG audio frame")
        bits = _FlacBits(data, pos + 4 + (2 if crc else 0))
        if lay == 1:
            alloc = [[bits.read(4) for _ in range(32)] for _ in range(ch)]
            if any(a == 15 for row in alloc for a in row):
                raise ValueError("forbidden Layer I allocation 15")
            sf = [[_MP12_SF[bits.read(6)] if alloc[c][sb] else 0.0
                   for sb in range(32)] for c in range(ch)]
            frame = np.zeros((12, 32), dtype=np.float64)
            for t in range(12):
                for sb in range(32):
                    for c in range(ch):
                        a = alloc[c][sb]
                        if a:
                            code = bits.read(a + 1)
                            frame[t, sb] += (
                                _mp12_dequant(code, (1 << (a + 1)) - 1)
                                * sf[c][sb] / ch
                            )
            grans.append(frame)
        else:
            if r != 48000 or kbps // ch < 96:
                raise ValueError(
                    "Layer II supports the Table B.2a envelope only "
                    "(48 kHz, >= 96 kbps/channel)")
            table = _mp2_alloc_table(27)
            sblimit = len(table)
            steps_of = [[0] * sblimit for _ in range(ch)]
            for sb in range(sblimit):
                nbal, col = table[sb]
                for c in range(ch):
                    a = bits.read(nbal)
                    steps_of[c][sb] = col[a - 1] if a else 0
            scfsi = [[bits.read(2) if steps_of[c][sb] else 0
                      for c in range(ch)] for sb in range(sblimit)]
            # scfsi -> which transmitted scalefactor covers each third
            spread = {0: (0, 1, 2), 1: (0, 0, 1), 2: (0, 0, 0), 3: (0, 1, 1)}
            sf2 = [[(0.0, 0.0, 0.0)] * sblimit for _ in range(ch)]
            for sb in range(sblimit):
                for c in range(ch):
                    if steps_of[c][sb]:
                        pat = spread[scfsi[sb][c]]
                        got = [_MP12_SF[bits.read(6)]
                               for _ in range(max(pat) + 1)]
                        sf2[c][sb] = tuple(got[p] for p in pat)
            frame = np.zeros((36, 32), dtype=np.float64)
            for gr in range(12):
                third = gr // 4
                for sb in range(sblimit):
                    for c in range(ch):
                        steps = steps_of[c][sb]
                        if not steps:
                            continue
                        scale = sf2[c][sb][third]
                        if steps in (3, 5, 9):  # grouped: base-steps pack
                            v = bits.read({3: 5, 5: 7, 9: 10}[steps])
                            codes = (v % steps, (v // steps) % steps,
                                     v // (steps * steps))
                        else:
                            nb = steps.bit_length()
                            codes = tuple(bits.read(nb) for _ in range(3))
                        for j, code in enumerate(codes):
                            frame[3 * gr + j, sb] += (
                                _mp12_dequant(code, steps) * scale / ch
                            )
            grans.append(frame)
        n_frames += 1
        pos += frame_len
    if pos != len(data) or n_frames == 0:
        raise ValueError("trailing bytes after last MPEG audio frame")
    sub = np.concatenate(grans, axis=0)
    return {
        "sample_rate": rate,
        "n_channels": n_ch,
        "samples": _mp12_pcm(sub),
        "layer": layer,
        "n_frames": n_frames,
        "subbands": sub,
    }


def _is_mpeg_audio(data: bytes) -> bool:
    return (len(data) >= 2 and data[0] == 0xFF and (data[1] >> 5) == 0x7
            and (data[1] >> 1) & 0x3 in (2, 3))


def decode_audio(data: bytes) -> dict:
    """Sniffing audio dispatch: RIFF/WAVE (PCM, G.711, IMA ADPCM), native
    FLAC, or MPEG-1 Layer I/II — the audio twin of decode_image."""
    if data[:4] == b"fLaC":
        return decode_flac(data)
    if _is_mpeg_audio(data):
        return decode_mp12(data)
    return decode_wav(data)


# ---------------------------------------------------------------------------
# compressed-container metadata (header walk only — NO payload decode)
# ---------------------------------------------------------------------------

#: MPEG-1 Layer III bitrate table (kbps) indexed by the 4-bit header field
_MP3_BITRATES = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
#: MPEG-1 sample-rate table indexed by the 2-bit header field
_MP3_RATES = [44100, 48000, 32000]
#: samples per MPEG-1 Layer III frame
_MP3_SPF = 1152


def parse_mp3_metadata(data: bytes) -> dict:
    """Typed metadata from an MP3 stream by WALKING FRAME HEADERS only —
    the payloads (Huffman-coded subband samples) are never touched; full
    decode remains the documented out-of-scope codec boundary. Supports an
    optional leading ID3v2 tag (syncsafe size skip), then MPEG-1 Layer III
    frames: length = floor(144000*kbps/rate) + padding. Duration is exact
    rational n_frames*1152/rate, returned as (num, den) so gates can pin
    it in closed form. Bails (ValueError) on desync — corrupt streams go
    to quarantine, not to silently-wrong stats."""
    pos = 0
    if data[:3] == b"ID3":
        if len(data) < 10:
            raise ValueError("truncated ID3v2 header")
        sz = 0
        for b in data[6:10]:
            if b & 0x80:
                raise ValueError("ID3v2 size is not syncsafe")
            sz = (sz << 7) | b
        pos = 10 + sz
    n_frames = 0
    rate = None
    while pos + 4 <= len(data):
        h = int.from_bytes(data[pos : pos + 4], "big")
        if (h >> 21) & 0x7FF != 0x7FF:
            raise ValueError(f"lost frame sync at byte {pos}")
        if (h >> 19) & 0x3 != 0x3 or (h >> 17) & 0x3 != 0x1:
            raise ValueError("only MPEG-1 Layer III is recognized")
        bi = (h >> 12) & 0xF
        ri = (h >> 10) & 0x3
        pad = (h >> 9) & 0x1
        if bi in (0, 15) or ri == 3:
            raise ValueError("free-format/reserved bitrate or rate")
        if rate is None:
            rate = _MP3_RATES[ri]
        elif rate != _MP3_RATES[ri]:
            raise ValueError("sample-rate change mid-stream")
        frame_len = (144000 * _MP3_BITRATES[bi]) // rate + pad
        n_frames += 1
        pos += frame_len
    if pos != len(data) or n_frames == 0:
        raise ValueError("trailing bytes after last MP3 frame")
    return {
        "container": "mp3",
        "codec": "mp3",
        "n_units": n_frames,
        "sample_rate": rate,
        "dur_num": n_frames * _MP3_SPF,
        "dur_den": rate,
    }


def _mp4_children(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for ISO-BMFF boxes in
    [start, end); size==1 means 64-bit largesize."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(data[pos : pos + 4], "big")
        four = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box")
            size = int.from_bytes(data[pos + 8 : pos + 16], "big")
            body = pos + 16
        elif size == 0:  # box extends to EOF
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"box {four!r} overruns container")
        yield four.decode("latin1"), body, pos + size
        pos += size
    if pos != end:
        raise ValueError("trailing bytes inside container box")


def parse_mp4_metadata(data: bytes) -> dict:
    """Typed metadata from an ISO-BMFF (MP4) file via the box-tree walk:
    ftyp major brand, mvhd timescale/duration (exact rational), and per
    trak the hdlr handler kind + stsd sample-entry fourcc. Pure structure
    parse — no sample data is decoded (H.264/AAC payloads are the
    documented codec boundary, same contract as parse_mp3_metadata)."""
    brand = None
    timescale = duration = None
    tracks: list[str] = []
    for four, body, bend in _mp4_children(data, 0, len(data)):
        if four == "ftyp":
            brand = data[body : body + 4].decode("latin1")
        elif four == "moov":
            for m4, mb, me in _mp4_children(data, body, bend):
                if m4 == "mvhd":
                    ver = data[mb]
                    if ver == 1:
                        timescale = int.from_bytes(data[mb + 20 : mb + 24], "big")
                        duration = int.from_bytes(data[mb + 24 : mb + 32], "big")
                    else:
                        timescale = int.from_bytes(data[mb + 12 : mb + 16], "big")
                        duration = int.from_bytes(data[mb + 16 : mb + 20], "big")
                elif m4 == "trak":
                    kind = codec = None
                    for t4, tb, te in _mp4_children(data, mb, me):
                        if t4 != "mdia":
                            continue
                        for d4, db, de in _mp4_children(data, tb, te):
                            if d4 == "hdlr":
                                kind = data[db + 8 : db + 12].decode("latin1")
                            elif d4 == "minf":
                                for n4, nb, ne in _mp4_children(data, db, de):
                                    if n4 != "stbl":
                                        continue
                                    for s4, sb, se in _mp4_children(data, nb, ne):
                                        if s4 == "stsd":
                                            # version+flags, entry_count,
                                            # then first entry: size+fourcc
                                            codec = data[sb + 12 : sb + 16].decode("latin1")
                    if kind is None or codec is None:
                        raise ValueError(
                            "trak missing hdlr/stsd — quarantine, not "
                            "silently-typed metadata"
                        )
                    tracks.append(f"{kind}:{codec}")
    if brand is None or timescale in (None, 0):
        raise ValueError("not a playable ISO-BMFF file (ftyp/mvhd missing)")
    return {
        "container": "mp4",
        "codec": "+".join(sorted(tracks)),
        "n_units": len(tracks),
        "sample_rate": None,
        "dur_num": duration,
        "dur_den": timescale,
    }


def container_metadata(data: bytes) -> dict:
    """Sniffing metadata dispatch for compressed containers the engine
    does NOT decode: MP4 (ISO-BMFF) and MP3 (ID3v2 or bare frame sync).
    The cheap triage pass a 100 TB crawl runs before deciding what to
    decode at all."""
    if not data:
        raise ValueError("empty payload")
    if len(data) >= 8 and data[4:8] == b"ftyp":
        return parse_mp4_metadata(data)
    if data[:3] == b"ID3" or (
        len(data) >= 2 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0
    ):
        return parse_mp3_metadata(data)
    raise ValueError("unrecognized compressed container")


#: output schema of extract_container_metadata
CONTAINER_METADATA_SCHEMA = (
    "item_id long, container string, codec string, n_units int, "
    "sample_rate int, duration double"
)


def extract_container_metadata(
    df: DataFrame,
    id_col: str = "item_id",
    bytes_col: str = "content",
    parse_fn: Callable[[bytes], dict] = container_metadata,
) -> DataFrame:
    """(item_id, container, codec, n_units, sample_rate, duration) per
    item via mapInPandas — header walks only, so per-item cost is bytes
    scanned through frame/box headers, not decode work. Same quarantine-
    on-raise contract as the decode kernels."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for item_id, content in zip(pdf["item_id"], pdf["content"]):
                try:
                    m = parse_fn(bytes(content) if content is not None else b"")
                    # row materialization inside the try: a null id or a
                    # zero dur_den quarantines the ROW, not the task
                    out.append(
                        {
                            "item_id": int(item_id),
                            "container": m["container"],
                            "codec": m["codec"],
                            "n_units": m["n_units"],
                            "sample_rate": m["sample_rate"],
                            "duration": m["dur_num"] / m["dur_den"],
                        }
                    )
                except Exception:
                    continue  # quarantine path in production
            yield pd.DataFrame(
                out,
                columns=[
                    "item_id", "container", "codec", "n_units",
                    "sample_rate", "duration",
                ],
            )

    selected = df.select(
        F.col(id_col).alias("item_id"), F.col(bytes_col).alias("content")
    )
    return selected.mapInPandas(run, schema=CONTAINER_METADATA_SCHEMA)


def audio_features(decoded: dict) -> dict:
    """Duration / RMS / zero-crossing rate / dominant frequency (numpy
    rFFT peak, DC excluded) from a decode_wav result — the cheap audio
    quality/content signals a curation pipeline filters on."""
    import numpy as np

    x = decoded["samples"]
    rate = decoded["sample_rate"]
    n = len(x)
    if n == 0:
        raise ValueError("empty audio stream")
    zc = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))))) if n > 1 else 0.0
    spec = np.abs(np.fft.rfft(x))
    dom = float(np.argmax(spec[1:]) + 1) * rate / n if n > 1 else 0.0
    return {
        "sample_rate": rate,
        "n_channels": decoded["n_channels"],
        "n_samples": n,
        "duration_sec": n / rate,
        "rms": float(np.sqrt(np.mean(x * x))),
        "zero_cross_rate": zc,
        "dominant_freq_hz": dom,
    }


#: output schema of extract_audio_frames
AUDIO_FRAMES_SCHEMA = (
    "item_id long, frame_idx int, n_frames int, rms double, "
    "zero_cross double"
)


def extract_audio_frames(
    df: DataFrame,
    frame_len: int = 1024,
    id_col: str = "item_id",
    bytes_col: str = "content",
    decode_fn: Callable[[bytes], dict] = decode_audio,
) -> DataFrame:
    """Windowed per-frame audio features — the audio analog of video frame
    sampling: decode once, split the mono sample stream into
    floor(n/frame_len) full frames (spectrogram-style framing; the partial
    tail is dropped by definition), and emit per-frame RMS + zero-cross
    rate. One mapInPandas pass beside the bytes, same quarantine contract
    and scale shape as the other decode kernels: frames-per-item rows
    leave the scan, never samples.

    Exactness note (how the gate oracle works): the fixtures' square waves
    have constant |x| = amp/2^15, an exact dyadic double whose square and
    sqrt round-trip exactly — per-frame RMS equals the amplitude
    analytically for EVERY frame boundary, aligned or not."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for item_id, content in zip(pdf["item_id"], pdf["content"]):
                try:
                    x = decode_fn(bytes(content) if content is not None else b"")[
                        "samples"
                    ]
                    # whole-item row build inside the try (ADVICE r6): a
                    # null id or bad frame quarantines the ITEM atomically
                    # (no partial frame rows), never the task
                    nf = len(x) // frame_len
                    rows = []
                    for k in range(nf):
                        seg = x[k * frame_len : (k + 1) * frame_len]
                        zc = float(
                            np.mean(np.abs(np.diff(np.signbit(seg).astype(np.int8))))
                        )
                        rows.append(
                            {
                                "item_id": int(item_id),
                                "frame_idx": k,
                                "n_frames": nf,
                                "rms": float(np.sqrt(np.mean(seg * seg))),
                                "zero_cross": zc,
                            }
                        )
                except Exception:
                    continue  # quarantine path in production
                out.extend(rows)
            yield pd.DataFrame(
                out,
                columns=["item_id", "frame_idx", "n_frames", "rms", "zero_cross"],
            )

    selected = df.select(
        F.col(id_col).alias("item_id"), F.col(bytes_col).alias("content")
    )
    return selected.mapInPandas(run, schema=AUDIO_FRAMES_SCHEMA)


def extract_audio_features(
    df: DataFrame,
    id_col: str = "item_id",
    bytes_col: str = "content",
    decode_fn: Callable[[bytes], dict] = decode_audio,
    bytes_per_partition: int = 256 << 20,
) -> DataFrame:
    """Decode + featurize binary audio via mapInPandas — the audio twin of
    extract_image_features: same Arrow batching, same quarantine-on-raise
    contract, bytes-based partitioning upstream. The default decoder
    sniffs RIFF/WAVE (PCM, G.711, IMA ADPCM) vs native FLAC."""
    selected = df.select(
        F.col(id_col).alias("item_id"), F.col(bytes_col).alias("content")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "item_id", "n_bytes", "sample_rate", "n_channels", "n_samples",
            "duration_sec", "rms", "zero_cross_rate", "dominant_freq_hz",
        ]
        for pdf in batches:
            out = []
            for item_id, content in zip(pdf["item_id"], pdf["content"]):
                try:
                    feats = audio_features(
                        decode_fn(bytes(content) if content is not None else b"")
                    )
                    # inside the try: null id / null content (len() would
                    # TypeError) quarantines the row, not the task (ADVICE r6)
                    out.append(
                        {"item_id": int(item_id), "n_bytes": len(content), **feats}
                    )
                except Exception:
                    continue  # quarantine path in production
            yield pd.DataFrame(out, columns=cols)

    return selected.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


#: output schema of extract_mp12_subband_features
MP12_FEATURES_SCHEMA = (
    "item_id long, layer int, sample_rate int, n_channels int, "
    "n_frames int, n_granules int, dom_subband int, dom_rms double"
)


def extract_mp12_subband_features(
    df: DataFrame,
    id_col: str = "item_id",
    bytes_col: str = "content",
) -> DataFrame:
    """Subband-domain features from MPEG-1 Layer I/II payloads — computed
    on decode_mp12's EXACT output (the requantized subband samples), so
    the gate oracle needs no synthesis-window modeling: dom_subband is the
    argmax-energy subband (ties to the smaller index) and dom_rms its RMS
    across all granules. Same mapInPandas shape + quarantine-on-raise
    contract as the other decode kernels."""
    selected = df.select(
        F.col(id_col).alias("item_id"), F.col(bytes_col).alias("content")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        cols = ["item_id", "layer", "sample_rate", "n_channels",
                "n_frames", "n_granules", "dom_subband", "dom_rms"]
        for pdf in batches:
            out = []
            for item_id, content in zip(pdf["item_id"], pdf["content"]):
                try:
                    d = decode_mp12(bytes(content) if content is not None else b"")
                    sub = d["subbands"]
                    energy = (sub * sub).sum(axis=0)
                    dom = int(np.argmax(energy))  # argmax ties -> first
                    out.append({
                        "item_id": int(item_id),
                        "layer": d["layer"],
                        "sample_rate": d["sample_rate"],
                        "n_channels": d["n_channels"],
                        "n_frames": d["n_frames"],
                        "n_granules": sub.shape[0],
                        "dom_subband": dom,
                        "dom_rms": float(np.sqrt(np.mean(sub[:, dom] ** 2))),
                    })
                except Exception:
                    continue  # quarantine path in production
            yield pd.DataFrame(out, columns=cols)

    return selected.mapInPandas(run, schema=MP12_FEATURES_SCHEMA)


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
                    # inside the try: null id / null content quarantines the
                    # row, not the task (ADVICE r6)
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
                except Exception:
                    continue  # quarantine path in production
            yield pd.DataFrame(
                out,
                columns=[
                    "item_id", "n_bytes", "format", "width", "height",
                    "mean_intensity", "feature_vec",
                ],
            )

    return selected.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def resize_nearest(px, out_h: int, out_w: int):
    """Nearest-neighbor resize: output pixel (i, j) takes input pixel
    (floor(i*H/out_h), floor(j*W/out_w)). Integer-EXACT — no interpolation,
    no rounding convention to pin — so resized statistics of analytic
    fixtures stay closed-form (the mm_resize_features oracle). Works for
    both down- and up-sampling."""
    import numpy as np

    h, w = px.shape[0], px.shape[1]
    if out_h <= 0 or out_w <= 0:
        raise ValueError("resize target must be positive")
    yi = (np.arange(out_h, dtype=np.int64) * h) // out_h
    xi = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return px[yi][:, xi]


def resize_box(px, fy: int, fx: int):
    """Area (box-filter) downsample by INTEGER factors: each output pixel is
    floor(mean) of its fy x fx input block, per channel. The floor is the
    pinned rounding convention (documented rather than implementation-
    defined), keeping the result reproducible in exact integer arithmetic.
    H must divide by fy and W by fx — the caller pads or crops first."""
    import numpy as np

    h, w = px.shape[0], px.shape[1]
    if fy <= 0 or fx <= 0:
        raise ValueError("box factors must be positive")
    if h % fy or w % fx:
        raise ValueError("box downsample requires exact integer tiling")
    s = (
        px.astype(np.int64)
        .reshape(h // fy, fy, w // fx, fx, px.shape[2])
        .sum(axis=(1, 3))
    )
    return (s // (fy * fx)).astype(np.uint8)


#: output schema of extract_resized_features: `thumb` is the resized image
#: itself as raw interleaved RGB bytes (out_h*out_w*3) — the op is a real
#: data transform (thumbnailing), not only a featurizer
RESIZED_FEATURES_SCHEMA = (
    "item_id long, format string, width int, height int, "
    "out_w int, out_h int, mean_intensity double, thumb binary"
)


def extract_resized_features(
    df: DataFrame,
    out_h: int,
    out_w: int,
    id_col: str = "item_id",
    bytes_col: str = "content",
    format_col: str = "format",
    decode_fn: Callable[[bytes], object] = decode_image_pixels,
) -> DataFrame:
    """Decode -> nearest-resize -> (thumbnail bytes + intensity) in ONE
    Arrow-batched mapInPandas pass: the resize runs inside the partition
    that already holds the source bytes, so at 100 TB the full-resolution
    pixels never shuffle — only out_h*out_w*3-byte thumbnails (plus
    scalars) leave the scan. This is the standard crawl-processing shape:
    a decode+resize landing pass feeding fixed-size tensors downstream.

    Corrupt/undecodable items are dropped (quarantine sink in production).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for item_id, content, fmt in zip(
                pdf["item_id"], pdf["content"], pdf["format"]
            ):
                try:
                    px = decode_fn(bytes(content) if content is not None else b"")
                    small = resize_nearest(px, out_h, out_w)
                    # inside the try: null id quarantines the row, not the
                    # task (ADVICE r6)
                    gray = small.astype(np.float64).mean(axis=2) / 255.0
                    out.append(
                        {
                            "item_id": int(item_id),
                            "format": fmt,
                            "width": int(px.shape[1]),
                            "height": int(px.shape[0]),
                            "out_w": out_w,
                            "out_h": out_h,
                            "mean_intensity": float(gray.mean()),
                            "thumb": np.ascontiguousarray(small).tobytes(),
                        }
                    )
                except Exception:
                    continue  # quarantine path in production
            yield pd.DataFrame(
                out,
                columns=[
                    "item_id", "format", "width", "height", "out_w", "out_h",
                    "mean_intensity", "thumb",
                ],
            )

    selected = df.select(
        F.col(id_col).alias("item_id"),
        F.col(bytes_col).alias("content"),
        F.col(format_col).alias("format"),
    )
    return selected.mapInPandas(run, schema=RESIZED_FEATURES_SCHEMA)


#: output schema of extract_gif_frame_features
GIF_FRAME_FEATURES_SCHEMA = (
    "item_id long, frame_idx int, n_frames int, width int, height int, "
    "mean_intensity double"
)


def with_frame_counts(
    df: DataFrame, id_col: str = "item_id", bytes_col: str = "content"
) -> DataFrame:
    """Cheap multimodal metadata pass: (item_id, n_frames) via the
    header/block walk ONLY (gif_frame_count — no LZW, no pixels). Feeds
    frame_sample_plan when the sampling plan must exist as its own
    DataFrame (e.g. frames fetched from a remote store by index)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for item_id, content in zip(pdf["item_id"], pdf["content"]):
                try:
                    n = gif_frame_count(bytes(content) if content is not None else b"")
                    # inside the try: null id quarantines the row (ADVICE r6)
                    out.append({"item_id": int(item_id), "n_frames": n})
                except Exception:
                    continue  # quarantine path in production
            yield pd.DataFrame(out, columns=["item_id", "n_frames"])

    selected = df.select(
        F.col(id_col).alias("item_id"), F.col(bytes_col).alias("content")
    )
    return selected.mapInPandas(run, schema="item_id long, n_frames int")


def extract_gif_frame_features(
    df: DataFrame,
    id_col: str = "item_id",
    bytes_col: str = "content",
    every_k: int = 30,
) -> DataFrame:
    """Real frame sampling over multi-frame GIF binary columns: one fused
    Arrow-batched mapInPandas computes the frame count (header walk), the
    sampled indices — the SAME range(0, n_frames-1, every_k) arithmetic as
    frame_sample_plan — and decodes composited frames only up to the last
    sampled index (GIF frames are delta-coded, so earlier frames must
    composite; later ones are never touched).

    Scale shape: for inline binary content this fused pass beats the
    plan-then-join formulation because the content column NEVER shuffles —
    the sampling plan, the bound on decode work, and the feature rows all
    happen inside the partition that already holds the bytes. Use
    with_frame_counts + frame_sample_plan instead when frames live in a
    remote store addressed by (item_id, frame_idx)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "item_id", "frame_idx", "n_frames", "width", "height",
            "mean_intensity",
        ]
        for pdf in batches:
            out = []
            for item_id, content in zip(pdf["item_id"], pdf["content"]):
                raw = bytes(content) if content is not None else b""
                try:
                    n = gif_frame_count(raw)
                    if n <= 0:
                        continue
                    idxs = list(range(0, n, every_k))
                    frames = gif_parse_frames(raw, indices=idxs)
                    # whole-item row build inside the try: a null id or a
                    # bad frame quarantines the ITEM atomically (ADVICE r6)
                    rows = []
                    for k in idxs:
                        st = _gray_stats(frames[k])
                        rows.append(
                            {
                                "item_id": int(item_id), "frame_idx": k,
                                "n_frames": n, "width": st["width"],
                                "height": st["height"],
                                "mean_intensity": st["mean_intensity"],
                            }
                        )
                except Exception:
                    continue  # quarantine path in production
                out.extend(rows)
            yield pd.DataFrame(out, columns=cols)

    selected = df.select(
        F.col(id_col).alias("item_id"), F.col(bytes_col).alias("content")
    )
    return selected.mapInPandas(run, schema=GIF_FRAME_FEATURES_SCHEMA)


def _avi_movi_chunks(data: bytes):
    """Yield (fourcc, payload) for every chunk inside every 'movi' LIST of a
    RIFF/AVI container. Raises on a malformed RIFF header; tolerates
    truncated tails (a chunk whose declared size runs past the buffer is
    clipped) the way real-world crawled AVIs demand."""
    import struct

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    stack = [
        (12, min(12 + struct.unpack_from("<I", data, 4)[0], len(data)), False)
    ]
    while stack:
        pos, end, in_movi = stack.pop()
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            body_start = pos + 8
            body_end = min(body_start + size, end)
            if cid == b"LIST" and body_start + 4 <= end:
                ltype = data[body_start : body_start + 4]
                stack.append((body_end + (size & 1), end, in_movi))
                pos, end = body_start + 4, body_end
                in_movi = in_movi or ltype == b"movi"
                continue
            if in_movi:
                yield cid, data[body_start:body_end]
            pos = body_end + (size & 1)


def avi_frame_count(data: bytes) -> int:
    """Video frame count via the movi chunk walk ONLY (no decode): counts
    '##dc'/'##db' video-data chunks. The chunk walk is preferred over the
    avih header's dwTotalFrames, which real-world muxers routinely leave
    stale."""
    n = 0
    for cid, _ in _avi_movi_chunks(data):
        if cid[2:4] in (b"dc", b"db"):
            n += 1
    return n


def _avi_video_format(data: bytes) -> tuple[int, int, int] | None:
    """(width, height, bit_count) from the first video stream's strf
    BITMAPINFOHEADER in the hdrl LIST; None when absent. Needed only for
    raw-DIB frames — MJPEG frames carry their own geometry."""
    import struct

    stack = [(12, min(12 + struct.unpack_from("<I", data, 4)[0], len(data)))]
    vids = False
    while stack:
        pos, end = stack.pop()
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            body_start = pos + 8
            body_end = min(body_start + size, end)
            if cid == b"LIST" and body_start + 4 <= end:
                stack.append((body_end + (size & 1), end))
                pos, end = body_start + 4, body_end
                continue
            if cid == b"strh" and size >= 4:
                vids = data[body_start : body_start + 4] == b"vids"
            elif cid == b"strf" and vids and size >= 40:
                _, w, h, _, bpp = struct.unpack_from(
                    "<IiiHH", data, body_start
                )
                return w, h, bpp
            pos = body_end + (size & 1)
    return None


def _dib_frame(body: bytes, w: int, h: int, bpp: int):
    """One uncompressed '##db' DIB frame -> (H, W, 3) uint8 RGB: 24-bit
    BGR rows padded to 4 bytes, bottom-up unless height is negative (the
    same layout decode_bmp handles for .bmp files)."""
    import numpy as np

    if bpp != 24:
        raise ValueError(f"only 24-bit DIB frames supported, got {bpp}")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    if len(body) < stride * h:
        raise ValueError("truncated DIB frame")
    rows = np.frombuffer(body[: stride * h], dtype=np.uint8).reshape(h, stride)
    px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return px if top_down else px[::-1]


def avi_parse_frames(data: bytes, indices) -> dict:
    """Decode ONLY the requested frame indices of an AVI:
    {frame_idx: (H, W, 3) uint8 array}. Each sampled chunk is sniffed —
    JPEG SOI -> MJPEG decode, else raw DIB via the strf geometry (sniffing
    beats trusting the dc/db suffix, which sloppy muxers swap). AVI frames
    are independent — no compositing chain like GIF's — so sampling skips
    the decode work for unsampled frames entirely, not just the tail."""
    want = set(int(i) for i in indices)
    out: dict[int, object] = {}
    if not want:
        return out
    fmt = None
    last = max(want)
    k = 0
    for cid, body in _avi_movi_chunks(data):
        if cid[2:4] not in (b"dc", b"db"):
            continue
        if k in want:
            px = None
            if body[:2] == b"\xff\xd8":  # JPEG SOI
                try:
                    px = decode_jpeg_pixels(bytes(body))
                except Exception:  # noqa: BLE001
                    # a raw DIB whose first BGR pixel happens to be
                    # (0xFF, 0xD8, ...) passes the SOI sniff and garbage
                    # "markers" can raise struct.error/KeyError/IndexError
                    # from deeper in the JPEG walk — fall back to the
                    # strf-geometry DIB path instead of quarantining a
                    # perfectly decodable frame
                    px = None
            if px is None:
                if fmt is None:
                    fmt = _avi_video_format(data)
                    if fmt is None:
                        raise ValueError("raw DIB frame without strf header")
                px = _dib_frame(bytes(body), *fmt)
            out[k] = px
        k += 1
        if k > last:
            break  # all sampled frames decoded; skip the tail chunks too
    return out


def video_frame_count(data: bytes) -> int:
    """Container-sniffing frame count: GIF (header/block walk) or AVI
    (movi chunk walk). Zero pixel decode either way."""
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return gif_frame_count(data)
    return avi_frame_count(data)


def extract_video_frame_features(
    df: DataFrame,
    id_col: str = "item_id",
    bytes_col: str = "content",
    every_k: int = 30,
) -> DataFrame:
    """Real frame sampling over multi-frame video binary columns — the
    container-dispatching superset of extract_gif_frame_features: one fused
    Arrow-batched mapInPandas computes the frame count (header walk), the
    sampled indices — the SAME range(0, n_frames-1, every_k) arithmetic as
    frame_sample_plan — and decodes only what the container's coding
    requires: GIF frames are delta-coded, so compositing runs up to the
    last sampled index; MJPEG AVI frames are independent, so ONLY the
    sampled frames are decoded (the per-frame JPEG work is
    len(sampled)/n_frames of a full decode, the scale win of sampling).

    Same zero-shuffle scale shape as the GIF-only pass: count, sampling
    plan, bounded decode, and feature rows all happen inside the partition
    that already holds the bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "item_id", "frame_idx", "n_frames", "width", "height",
            "mean_intensity",
        ]
        for pdf in batches:
            out = []
            for item_id, content in zip(pdf["item_id"], pdf["content"]):
                raw = bytes(content) if content is not None else b""
                try:
                    if raw[:6] in (b"GIF87a", b"GIF89a"):
                        n = gif_frame_count(raw)
                        if n <= 0:
                            continue
                        idxs = list(range(0, n, every_k))
                        sampled = gif_parse_frames(raw, indices=idxs)
                    else:
                        n = avi_frame_count(raw)
                        if n <= 0:
                            continue
                        idxs = list(range(0, n, every_k))
                        sampled = avi_parse_frames(raw, idxs)
                    # whole-item row build inside the try: a null id or a
                    # bad frame quarantines the ITEM atomically (ADVICE r6)
                    rows = []
                    for k in idxs:
                        st = _gray_stats(sampled[k])
                        rows.append(
                            {
                                "item_id": int(item_id), "frame_idx": k,
                                "n_frames": n, "width": st["width"],
                                "height": st["height"],
                                "mean_intensity": st["mean_intensity"],
                            }
                        )
                except Exception:
                    continue  # quarantine path in production
                out.extend(rows)
            yield pd.DataFrame(out, columns=cols)

    selected = df.select(
        F.col(id_col).alias("item_id"), F.col(bytes_col).alias("content")
    )
    return selected.mapInPandas(run, schema=GIF_FRAME_FEATURES_SCHEMA)


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
