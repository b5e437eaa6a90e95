"""Driver-gated multimodal queries: REAL container decode (BMP/PPM/PNG/
JPEG/GIF) through the Arrow-batched mapInPandas kernels, hash-checked
against closed-form VALUES oracles.

The fixture (sources/media_fixture.py) plants images whose decoded
statistics are analytic — solid colors, integer gray gradients, DC-only
JPEGs — so the oracle knows width/height/mean without running any decoder.
Means compare at ROUND(x, 9): the engines' pairwise float summation drifts
~1 ulp, and every planted value is asserted 8+ orders of magnitude away
from its 9-dp rounding boundary. JPEG mean intensity is the documented
exception (IDCT truncation's last ulp is pinned by the pytest tolerance
goldens instead), so those rows golden width/height only.

mm_gif_frame_sample drives the REAL multi-frame decoder through the fused
frame-sampling bridge (extract_gif_frame_features): 12-frame GIFs sampled
every_k=5 -> composited frames 0/5/10, decode bounded to frame 10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.media_fixture import (
    ADPCM_AUDIO_IDS,
    DIB_AVI_IDS,
    build_av_media,
    build_media,
    load_media,
)
from .registry import register

_EVERY_K = 5
_AVI_EVERY_K = 3

_, _IGOLD, _, _GGOLD = build_media()
_, _VGOLD, _, _AGOLD = build_av_media()


def _img_values() -> str:
    rows = ",\n      ".join(
        "({}, '{}', {}, {}, {})".format(
            g["item_id"], g["format"], g["width"], g["height"],
            f"CAST({g['mean9']} AS DOUBLE)" if g["mean9"] is not None
            else "CAST(NULL AS DOUBLE)",
        )
        for g in _IGOLD
    )
    return f"""
    SELECT CAST(item_id AS BIGINT) AS item_id, format,
           CAST(width AS INTEGER) AS width, CAST(height AS INTEGER) AS height,
           mean9
    FROM (VALUES
      {rows}
    ) AS t(item_id, format, width, height, mean9)
    """


def _gif_values() -> str:
    rows = ",\n      ".join(
        "({}, {}, {}, {}, {}, CAST({} AS DOUBLE))".format(
            g["item_id"], g["frame_idx"], g["n_frames"], g["width"],
            g["height"], g["mean9"],
        )
        for g in _GGOLD
        if g["frame_idx"] % _EVERY_K == 0
    )
    return f"""
    SELECT CAST(item_id AS BIGINT) AS item_id,
           CAST(frame_idx AS INTEGER) AS frame_idx,
           CAST(n_frames AS INTEGER) AS n_frames,
           CAST(width AS INTEGER) AS width, CAST(height AS INTEGER) AS height,
           mean9
    FROM (VALUES
      {rows}
    ) AS t(item_id, frame_idx, n_frames, width, height, mean9)
    """


@register(
    "mm_image_features",
    oracle=_img_values(),
    survey_ref="multimodal decode/featurize (operators/multimodal.py: "
    "decode_image dispatch over real BMP/PPM/PNG[gradient+filters]/JPEG "
    "[DC-only]/GIF codecs via extract_image_features mapInPandas); "
    "closed-form analytic VALUES oracle from the planted containers",
)
def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fixture-driven: sf_dir unused — inputs are the planted container bytes
    from ..operators.multimodal import decode_image, extract_image_features

    media = load_media(spark)["images"]
    feats = extract_image_features(media, decode_fn=decode_image)
    return feats.select(
        "item_id", "format", "width", "height",
        F.when(F.col("format") == "jpeg", F.lit(None).cast("double"))
        .otherwise(F.round("mean_intensity", 9))
        .alias("mean9"),
    )


@register(
    "mm_gif_frame_sample",
    oracle=_gif_values(),
    survey_ref="REAL multi-frame sampling (operators/multimodal.py: "
    "gif_parse_frames compositing + extract_gif_frame_features fused "
    "zero-shuffle bridge; index math = frame_sample_plan's "
    "range(0, n_frames-1, k)); analytic per-frame VALUES oracle",
)
def mm_gif_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import extract_gif_frame_features

    gifs = load_media(spark)["gifs"]
    feats = extract_gif_frame_features(gifs, every_k=_EVERY_K)
    return feats.select(
        "item_id", "frame_idx", "n_frames", "width", "height",
        F.round("mean_intensity", 9).alias("mean9"),
    )


def _video_values() -> str:
    rows = ",\n      ".join(
        "({}, {}, {}, {}, {}, {})".format(
            g["item_id"], g["frame_idx"], g["n_frames"], g["width"],
            g["height"],
            f"CAST({g['mean9']} AS DOUBLE)" if g["mean9"] is not None
            else "CAST(NULL AS DOUBLE)",
        )
        for g in _VGOLD
        if g["frame_idx"] % _AVI_EVERY_K == 0
    )
    return f"""
    SELECT CAST(item_id AS BIGINT) AS item_id,
           CAST(frame_idx AS INTEGER) AS frame_idx,
           CAST(n_frames AS INTEGER) AS n_frames,
           CAST(width AS INTEGER) AS width, CAST(height AS INTEGER) AS height,
           mean9
    FROM (VALUES
      {rows}
    ) AS t(item_id, frame_idx, n_frames, width, height, mean9)
    """


@register(
    "mm_video_frame_sample",
    oracle=_video_values(),
    survey_ref="REAL video-container frame sampling (operators/"
    "multimodal.py: MJPEG + raw-DIB AVI movi chunk walk + decode of ONLY "
    "the sampled independent frames via extract_video_frame_features; "
    "index math = frame_sample_plan's range(0, n_frames-1, k)); analytic "
    "VALUES oracle — geometry for all rows, exact rational means for the "
    "uncompressed DIB items (MJPEG means are the documented JPEG IDCT "
    "exception, pinned by pytest tolerance goldens instead)",
)
def mm_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import extract_video_frame_features

    avis = load_media(spark)["avis"]
    feats = extract_video_frame_features(avis, every_k=_AVI_EVERY_K)
    return feats.select(
        "item_id", "frame_idx", "n_frames", "width", "height",
        F.when(F.col("item_id").isin(*DIB_AVI_IDS),
               F.round("mean_intensity", 9))
        .cast("double")
        .alias("mean9"),
    )


def _audio_values() -> str:
    rows = ",\n      ".join(
        "({}, {}, {}, {}, {}, CAST({} AS DOUBLE), CAST({} AS DOUBLE), "
        "CAST({} AS DOUBLE), {})".format(
            g["item_id"], g["n_bytes"], g["sample_rate"], g["n_channels"],
            g["n_samples"], g["dur9"], g["rms9"], g["zc9"],
            f"CAST({g['dom9']} AS DOUBLE)" if g["dom9"] is not None
            else "CAST(NULL AS DOUBLE)",
        )
        for g in _AGOLD
    )
    return f"""
    SELECT CAST(item_id AS BIGINT) AS item_id,
           CAST(n_bytes AS INTEGER) AS n_bytes,
           CAST(sample_rate AS INTEGER) AS sample_rate,
           CAST(n_channels AS INTEGER) AS n_channels,
           CAST(n_samples AS BIGINT) AS n_samples,
           dur9, rms9, zc9, dom9
    FROM (VALUES
      {rows}
    ) AS t(item_id, n_bytes, sample_rate, n_channels, n_samples,
           dur9, rms9, zc9, dom9)
    """


@register(
    "mm_audio_features",
    oracle=_audio_values(),
    survey_ref="REAL audio decode/featurize (operators/multimodal.py: "
    "decode_wav — integer PCM 8/16/32-bit + G.711 mu-law/A-law LUT "
    "expansion + IMA ADPCM block predictor — through "
    "extract_audio_features mapInPandas, decode_audio sniffing dispatch "
    "incl. the native-FLAC decoder); closed-form VALUES oracle: "
    "square waves at codec-exact amplitudes — FLAC rows are exact by "
    "losslessness — (duration n/rate, RMS = "
    "amplitude, zero-cross (2n/P-1)/(n-1), dominant freq rate/P); ADPCM "
    "rows are constant signals (bit-exact predictor track) whose "
    "dominant_freq is FFT-noise-determined and therefore NULLed",
)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import decode_audio, extract_audio_features

    audio = load_media(spark)["audio"]
    feats = extract_audio_features(audio, decode_fn=decode_audio)
    return feats.select(
        "item_id", "n_bytes", "sample_rate", "n_channels", "n_samples",
        F.round("duration_sec", 9).alias("dur9"),
        F.round("rms", 9).alias("rms9"),
        F.round("zero_cross_rate", 9).alias("zc9"),
        F.when(F.col("item_id").isin(*ADPCM_AUDIO_IDS), F.lit(None))
        .otherwise(F.round("dominant_freq_hz", 9))
        .cast("double")
        .alias("dom9"),
    )


_FRAME_LEN = 1024


def _aframe_values() -> str:
    rows = []
    for g in _AGOLD:
        nf = g["n_samples"] // _FRAME_LEN
        for k in range(nf):
            rows.append(
                f"({g['item_id']}, {k}, {nf}, CAST({g['rms9']} AS DOUBLE))"
            )
    joined = ",\n      ".join(rows)
    return f"""
    SELECT CAST(item_id AS BIGINT) AS item_id,
           CAST(frame_idx AS INTEGER) AS frame_idx,
           CAST(n_frames AS INTEGER) AS n_frames, rms9
    FROM (VALUES
      {joined}
    ) AS t(item_id, frame_idx, n_frames, rms9)
    """


@register(
    "mm_audio_frames",
    oracle=_aframe_values(),
    survey_ref="windowed per-frame audio features (operators/multimodal."
    "extract_audio_frames: spectrogram-style framing, floor(n/frame_len) "
    "full frames per item, per-frame RMS/zero-cross in one mapInPandas "
    "pass). Oracle: every fixture is a constant-|x| square wave whose "
    "dyadic amplitude round-trips square/sqrt exactly, so per-frame RMS "
    "equals the planted amplitude for EVERY frame boundary — the frame "
    "grid needs no alignment with the wave period",
)
def mm_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import extract_audio_frames

    audio = load_media(spark)["audio"]
    frames = extract_audio_frames(audio, frame_len=_FRAME_LEN)
    return frames.select(
        "item_id", "frame_idx", "n_frames",
        F.round("rms", 9).alias("rms9"),
    )


def _container_values() -> str:
    from ..sources.media_fixture import build_container_media

    _, cgold = build_container_media()
    rows = ",\n      ".join(
        "({}, '{}', '{}', {}, {}, CAST({} AS DOUBLE))".format(
            g["item_id"], g["container"], g["codec"], g["n_units"],
            g["sample_rate"] if g["sample_rate"] is not None
            else "CAST(NULL AS INTEGER)",
            g["dur9"],
        )
        for g in cgold
    )
    return f"""
    SELECT CAST(item_id AS BIGINT) AS item_id, container, codec,
           CAST(n_units AS INTEGER) AS n_units,
           CAST(sample_rate AS INTEGER) AS sample_rate, dur9
    FROM (VALUES
      {rows}
    ) AS t(item_id, container, codec, n_units, sample_rate, dur9)
    """


@register(
    "mm_container_metadata",
    oracle=_container_values(),
    survey_ref="compressed-container typed metadata (operators/multimodal."
    "parse_mp3_metadata: MPEG-1 Layer III frame-header walk incl. ID3v2 "
    "skip, VBR, padding; parse_mp4_metadata: ISO-BMFF box tree — ftyp/"
    "mvhd v0+v1/largesize/hdlr/stsd) via extract_container_metadata "
    "mapInPandas. Header walks only — H.264/AAC/MP3 payload decode is the "
    "documented codec boundary. Oracle: closed-form VALUES (duration = "
    "n_frames*1152/rate resp. duration/timescale by construction)",
)
def mm_container_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import extract_container_metadata

    media = load_media(spark)["containers"]
    meta = extract_container_metadata(media)
    return meta.select(
        "item_id", "container", "codec", "n_units", "sample_rate",
        F.round("duration", 9).alias("dur9"),
    )


def _mp12_values() -> str:
    from ..sources.media_fixture import build_mp12_media

    _, mgold = build_mp12_media()
    rows = ",\n      ".join(
        "({}, {}, {}, {}, {}, {}, {}, CAST({} AS DOUBLE))".format(
            g["item_id"], g["layer"], g["sample_rate"], g["n_channels"],
            g["n_frames"], g["n_granules"], g["dom_subband"], g["rms9"],
        )
        for g in mgold
    )
    return f"""
    SELECT CAST(item_id AS BIGINT) AS item_id, CAST(layer AS INTEGER) AS layer,
           CAST(sample_rate AS INTEGER) AS sample_rate,
           CAST(n_channels AS INTEGER) AS n_channels,
           CAST(n_frames AS INTEGER) AS n_frames,
           CAST(n_granules AS INTEGER) AS n_granules,
           CAST(dom_subband AS INTEGER) AS dom_subband, rms9
    FROM (VALUES
      {rows}
    ) AS t(item_id, layer, sample_rate, n_channels, n_frames, n_granules,
           dom_subband, rms9)
    """


@register(
    "mm_mp2_features",
    oracle=_mp12_values(),
    survey_ref="MPEG-1 Layer I/II audio payload decode (operators/"
    "multimodal.decode_mp12: frame-header walk, Layer I 4-bit allocation "
    "ladder + Table B.2a Layer II allocation classes, scfsi scalefactor "
    "spreads, grouped 3/5/9-level base-steps packing, normative "
    "closed-form requantization C*(s'''+D)*SF) via "
    "extract_mp12_subband_features mapInPandas. Oracle: planted +-v codes "
    "per quantizer family — dominant-subband RMS is the exact rational "
    "_mp12_exact value; the independent fixture encoder (mp1_planted/"
    "mp2_planted) shares no code with the decoder. PCM synthesis is the "
    "documented orthonormal-DCT-IV approximation (prototype window table "
    "deliberately not reproduced); subband output is exact",
)
def mm_mp2_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import extract_mp12_subband_features

    mpeg = load_media(spark)["mpeg_audio"]
    feats = extract_mp12_subband_features(mpeg)
    return feats.select(
        "item_id", "layer", "sample_rate", "n_channels", "n_frames",
        "n_granules", "dom_subband",
        F.round("dom_rms", 9).alias("rms9"),
    )


def _resize_values() -> str:
    from ..sources.media_fixture import RESIZE_H, RESIZE_W

    rows = ",\n      ".join(
        "({}, '{}', {}, {}, {})".format(
            g["item_id"], g["format"], g["width"], g["height"],
            f"CAST({g['rmean9']} AS DOUBLE)" if g["rmean9"] is not None
            else "CAST(NULL AS DOUBLE)",
        )
        for g in _IGOLD
    )
    return f"""
    SELECT CAST(item_id AS BIGINT) AS item_id, format,
           CAST(width AS INTEGER) AS width, CAST(height AS INTEGER) AS height,
           CAST({RESIZE_W} AS INTEGER) AS out_w,
           CAST({RESIZE_H} AS INTEGER) AS out_h,
           rmean9
    FROM (VALUES
      {rows}
    ) AS t(item_id, format, width, height, rmean9)
    """


@register(
    "mm_resize_features",
    oracle=_resize_values(),
    survey_ref="multimodal resize (operators/multimodal.resize_nearest: "
    "integer-exact floor index map, + resize_box area downsample) fused "
    "with decode in one mapInPandas pass (extract_resized_features): "
    "full-res pixels never leave the scan partition, only thumbnails + "
    "scalars. Oracle: closed-form resized means (solids are resize-"
    "invariant; gradients sample rows floor(i*H/out_h)); JPEG rows NULL "
    "mean (IDCT exception), dims still checked",
)
def mm_resize_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import extract_resized_features
    from ..sources.media_fixture import RESIZE_H, RESIZE_W

    media = load_media(spark)["images"]
    feats = extract_resized_features(media, out_h=RESIZE_H, out_w=RESIZE_W)
    return feats.select(
        "item_id", "format", "width", "height", "out_w", "out_h",
        F.when(F.col("format") == "jpeg", F.lit(None).cast("double"))
        .otherwise(F.round("mean_intensity", 9))
        .alias("rmean9"),
    )


def _phash_values() -> str:
    rows = ",\n      ".join(
        "({}, CAST({} AS BIGINT))".format(g["item_id"], g["dhash"])
        for g in _IGOLD
        if g["dhash"] is not None
    )
    return f"""
    WITH v(item_id, dhash) AS (VALUES
      {rows}
    )
    SELECT a.item_id AS id_a, b.item_id AS id_b,
           CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
    FROM v a JOIN v b ON a.item_id < b.item_id
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
    """


@register(
    "mm_phash_neardup",
    oracle=_phash_values(),
    survey_ref="image near-duplicate detection via perceptual hash "
    "(operators/multimodal.image_dhash: integer-exact 9x8 vertical dHash "
    "computed zero-shuffle next to the bytes via with_image_dhash, then "
    "operators/dedup.hamming_neardup_pairs: banded Hamming LSH, complete "
    "for distance <= bands-1 by pigeonhole). Oracle: closed-form dHash "
    "VALUES (solids hash to 0, gradients to the analytic band-compare) + "
    "a brute-force all-pairs bit_count join — proving the banded LSH path "
    "returns EXACTLY the exhaustive answer; JPEG items excluded (IDCT "
    "exception)",
)
def mm_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import hamming_neardup_pairs
    from ..operators.multimodal import with_image_dhash

    imgs = load_media(spark)["images"].filter(F.col("format") != "jpeg")
    hashes = with_image_dhash(imgs)
    return hamming_neardup_pairs(
        hashes, "item_id", "dhash", bits=64, bands=4, max_hamming=3
    )
