"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``BINARY`` columns with typed metadata, processed
by Arrow-batched ``mapInPandas`` kernels. The default decode step is a REAL
pure-Python header parser (``formats/imagemeta.py``: PNG/JPEG/GIF/BMP/WEBP
dimensions from the public container specs) plus generic byte features.
PIXEL-level decode is real for PNG (``formats/pngcodec.py``: stdlib zlib +
numpy unfilter), BMP (``formats/bmpcodec.py``), animated GIF
(``formats/gifcodec.py``: LZW + disposal composition) and baseline JPEG
(``formats/jpegcodec.py``: numpy huffman+IDCT) — ``apply_resize`` runs
decode->resize->re-encode end to end and ``pngcodec.pixel_decoder`` plugs
all four into ``set_decoder``. AUDIO decode is real for PCM WAV
(``formats/wavcodec.py`` — ``apply_audio_chunk`` executes the chunk plan
against real samples). Progressive JPEG and compressed audio/video codecs
still require a library not present here and stay pluggable via
``set_decoder`` (``decode_strict`` is the honest raising stub for it).

Design for 100 TB: media bytes never pass through a shuffle — featurization
is a narrow map over the scan, and only the (small) feature struct flows
downstream. ``repartition_for_media`` bounds batch memory by rows-per-batch
instead of bytes-per-partition.
"""

from __future__ import annotations

import struct
from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("n_bytes", T.LongType()),
        T.StructField("head_hex", T.StringType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("decoder", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

# pluggable decoder override: fn(payload: bytes) -> dict matching
# MEDIA_FEATURE_SCHEMA (e.g. a PIL/ffmpeg-backed pixel decoder)
_DECODER: Optional[Callable[[bytes], dict]] = None


def set_decoder(fn: Optional[Callable[[bytes], dict]]) -> None:
    global _DECODER
    _DECODER = fn


def header_decode(payload: bytes) -> dict:
    """Default decoder: generic byte features plus REAL container-header
    parsing (formats/imagemeta.py) — format/width/height populated for
    PNG/JPEG/GIF/BMP/WEBP payloads, NULL otherwise."""
    import math
    from collections import Counter

    from ..formats.imagemeta import parse_dimensions

    n = len(payload)
    counts = Counter(payload[:4096])
    total = sum(counts.values()) or 1
    ent = -sum((c / total) * math.log2(c / total) for c in counts.values())
    dims = parse_dimensions(payload)
    return {
        "n_bytes": n,
        "head_hex": payload[:8].hex(),
        "byte_entropy": round(ent, 4),
        "decoder": "headers",
        "format": dims[0] if dims else None,
        "width": dims[1] if dims else None,
        "height": dims[2] if dims else None,
    }


# kept under its historical name for tests/pipelines that pinned it
_fake_decode = header_decode


def decode_strict(payload: bytes) -> dict:
    """The honest stub for codecs we do NOT implement (progressive JPEG,
    compressed audio/video): raises instead of guessing."""
    raise NotImplementedError(
        "this codec requires a decoder library not present in this "
        "environment; register one with set_decoder() — header metadata "
        "extraction (header_decode) and the pure-Python PNG/BMP/GIF/"
        "baseline-JPEG/PCM-WAV codecs (formats/*codec.py) work without it"
    )


def extract_media_features(
    df: DataFrame,
    binary_col: str = "html",
    id_col: str = "url",
    batch_rows: int = 256,
) -> DataFrame:
    """mapInPandas featurizer over a binary column.

    Emits (id, features struct). Arrow batch size bounded via
    spark.sql.execution.arrow.maxRecordsPerBatch semantics by chunking
    inside the kernel — media rows are large, so the per-batch row cap (not
    Spark's default 10k) is the memory contract."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("features", MEDIA_FEATURE_SCHEMA),
        ]
    )

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decoder = _DECODER or header_decode
        for pdf in it:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                feats = [decoder(bytes(b)) for b in chunk[binary_col]]
                yield pd.DataFrame(
                    {
                        "media_id": chunk[id_col].astype(str).tolist(),
                        "features": feats,
                    }
                )

    return df.select(id_col, binary_col).mapInPandas(kernel, out_schema)


def repartition_for_media(df: DataFrame, rows_per_partition: int, total_rows: int) -> DataFrame:
    """Size partitions by row count (media rows are fat; default byte-based
    splits under-partition them)."""
    n = max(1, total_rows // max(1, rows_per_partition))
    return df.repartition(n)


def frame_sample_plan(df: DataFrame, every_n: int = 10, id_col: str = "url") -> DataFrame:
    """Video frame-sampling *plan* shape: one row per sampled frame index.
    The actual frame decode is the stubbed step; index fan-out is native."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.explode(F.sequence(F.lit(0), F.lit(every_n - 1))).alias("frame_idx"),
    )


def resize_plan(
    df: DataFrame,
    target_w: int,
    target_h: int,
    width_col: str = "width",
    height_col: str = "height",
    keep_aspect: bool = True,
) -> DataFrame:
    """Image-resize *plan* (pure Catalyst): from claimed source dimensions
    (metadata columns), derive scale factors and output dims per row. The
    pixel transform itself is the stubbed decode step (set_decoder); at
    scale this projection decides work placement (e.g. skip no-op resizes)
    before any bytes are touched."""
    sw = F.col(width_col).cast("double")
    sh = F.col(height_col).cast("double")
    if keep_aspect:
        scale = F.least(F.lit(float(target_w)) / sw, F.lit(float(target_h)) / sh)
        out_w = F.floor(sw * scale).cast("int")
        out_h = F.floor(sh * scale).cast("int")
    else:
        scale = F.lit(None).cast("double")
        out_w = F.lit(target_w)
        out_h = F.lit(target_h)
    return (
        df.withColumn("scale", F.round(scale, 6))
        .withColumn("out_w", out_w)
        .withColumn("out_h", out_h)
        .withColumn("is_noop", (F.col("out_w") == sw) & (F.col("out_h") == sh))
    )


def apply_resize(
    df: DataFrame,
    target_w: int,
    target_h: int,
    binary_col: str = "payload",
    id_col: str = "url",
    keep_aspect: bool = True,
    batch_rows: int = 256,
) -> DataFrame:
    """Execute an image resize end to end against REAL pixels — the
    execution stage behind :func:`resize_plan` (which stays the pure-
    Catalyst scheduling step: dims from metadata decide placement and
    no-op skipping before any bytes are touched).

    PNG payloads decode via the pure-Python codec
    (``formats/pngcodec.py``: stdlib zlib + numpy unfilter), BMP via
    ``formats/bmpcodec.py``; both resize with nearest-neighbour indexing
    and re-encode as PNG. Undecodable rows pass through with NULL output
    dims. Arrow-batched mapInPandas, rows chunked to ``batch_rows``
    (media rows are fat); bytes never shuffle."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("out_png", T.BinaryType()),
            T.StructField("src_w", T.IntegerType()),
            T.StructField("src_h", T.IntegerType()),
            T.StructField("out_w", T.IntegerType()),
            T.StructField("out_h", T.IntegerType()),
        ]
    )

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..formats.bmpcodec import DECODE_ERRORS as BMP_ERRORS, decode_bmp
        from ..formats.jpegcodec import (
            DECODE_ERRORS as JPEG_ERRORS,
            decode_jpeg,
        )
        from ..formats.pngcodec import (
            DECODE_ERRORS,
            decode_png,
            encode_png,
            resize_nearest,
        )

        def decode_any(payload: bytes):
            if payload[:2] == b"BM":
                try:
                    return decode_bmp(payload)
                except BMP_ERRORS:
                    return None
            if payload[:2] == b"\xff\xd8":
                try:
                    return decode_jpeg(payload)
                except JPEG_ERRORS:
                    return None
            try:
                return decode_png(payload)
            except DECODE_ERRORS:
                return None

        for pdf in it:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                rows = []
                for mid, payload in zip(chunk[id_col], chunk[binary_col]):
                    decoded = decode_any(bytes(payload))
                    if decoded is None:
                        rows.append((str(mid), None, None, None, None, None))
                        continue
                    w, h, _c, px = decoded
                    if keep_aspect:
                        scale = min(target_w / w, target_h / h)
                        ow, oh = int(w * scale), int(h * scale)
                    else:
                        ow, oh = target_w, target_h
                    ow, oh = max(ow, 1), max(oh, 1)
                    if (ow, oh) == (w, h) and bytes(payload)[:8] == b"\x89PNG\r\n\x1a\n":
                        # no-op skip, as resize_plan flags — PNG only; a
                        # same-size BMP/JPEG still re-encodes so out_png
                        # always holds PNG bytes
                        out = bytes(payload)
                    else:
                        out = encode_png(resize_nearest(px, ow, oh))
                    rows.append((str(mid), out, w, h, ow, oh))
                yield pd.DataFrame(
                    rows,
                    columns=["media_id", "out_png", "src_w", "src_h",
                             "out_w", "out_h"],
                )

    return df.select(id_col, binary_col).mapInPandas(kernel, out_schema)


def apply_frame_sample(
    df: DataFrame,
    every_n: int = 10,
    binary_col: str = "payload",
    id_col: str = "url",
    batch_rows: int = 64,
    reencode_png: bool = True,
) -> DataFrame:
    """Execute video-style frame sampling against REAL frames — the
    execution stage behind :func:`frame_sample_plan`. Animated GIF is the
    multi-frame format decodable with stdlib only
    (``formats/gifcodec.py``: LZW + disposal composition), so it stands in
    for the video container; every ``every_n``-th COMPOSED frame (always
    including frame 0) is emitted, optionally re-encoded as PNG so the
    sampled frames feed straight into the image path (``apply_resize``).

    Undecodable rows emit one row with NULL frame fields rather than
    vanishing, keeping per-media accounting exact. Arrow-batched
    mapInPandas chunked to ``batch_rows``; media bytes never shuffle —
    the fan-out to frames happens inside the partition that already holds
    the blob."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("delay_cs", T.IntegerType()),
            T.StructField("frame_png", T.BinaryType()),
        ]
    )
    cols = ["media_id", "n_frames", "frame_idx", "width", "height",
            "delay_cs", "frame_png"]

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..formats.gifcodec import decode_gif
        from ..formats.pngcodec import encode_png

        for pdf in it:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                rows = []
                for mid, payload in zip(chunk[id_col], chunk[binary_col]):
                    try:
                        frames = decode_gif(bytes(payload))
                    except (ValueError, IndexError, struct.error):
                        rows.append((str(mid), None, None, None, None,
                                     None, None))
                        continue
                    for i in range(0, len(frames), every_n):
                        fr = frames[i]
                        h, w = fr.px.shape[:2]
                        png = encode_png(fr.px) if reencode_png else None
                        rows.append((str(mid), len(frames), i, w, h,
                                     fr.delay_cs, png))
                yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, binary_col).mapInPandas(kernel, out_schema)


def apply_audio_chunk(
    df: DataFrame,
    chunk_ms: int = 30_000,
    binary_col: str = "payload",
    id_col: str = "url",
    batch_rows: int = 64,
    reencode_wav: bool = False,
) -> DataFrame:
    """Execute audio chunking against REAL samples — the execution stage
    behind :func:`audio_chunk_plan` (which stays the pure-Catalyst
    scheduling step over claimed duration metadata). PCM WAV decodes via
    the pure-Python codec (``formats/wavcodec.py``); each payload fans out
    into ``chunk_ms`` windows with real per-chunk signal features (RMS,
    peak, zero-crossing rate), optionally re-encoded as 16-bit PCM WAV.

    Undecodable rows emit one row with NULL chunk fields rather than
    vanishing, keeping per-media accounting exact. Arrow-batched
    mapInPandas chunked to ``batch_rows``; audio bytes never shuffle — the
    fan-out happens inside the partition that already holds the blob."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("duration_ms", T.IntegerType()),
            T.StructField("chunk_idx", T.IntegerType()),
            T.StructField("offset_ms", T.IntegerType()),
            T.StructField("length_ms", T.IntegerType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("peak", T.DoubleType()),
            T.StructField("zero_cross_rate", T.DoubleType()),
            T.StructField("chunk_wav", T.BinaryType()),
        ]
    )
    cols = [f.name for f in out_schema.fields]

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..formats.wavcodec import DECODE_ERRORS, decode_wav, encode_wav

        for pdf in it:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                rows = []
                for mid, payload in zip(chunk[id_col], chunk[binary_col]):
                    try:
                        rate, ch, samples = decode_wav(bytes(payload))
                    except DECODE_ERRORS:
                        rows.append((str(mid),) + (None,) * 10)
                        continue
                    n = len(samples)
                    dur_ms = int(round(n * 1000.0 / rate))
                    frames_per = max(1, rate * chunk_ms // 1000)
                    mono = samples.mean(axis=1)
                    for ci, s0 in enumerate(range(0, max(n, 1), frames_per)):
                        seg = mono[s0 : s0 + frames_per]
                        m = len(seg)
                        if m == 0:
                            seg = np.zeros(1)
                        zc = (
                            int(np.count_nonzero(
                                np.signbit(seg[1:]) != np.signbit(seg[:-1])))
                            if m > 1 else 0
                        )
                        wav = (
                            encode_wav(samples[s0 : s0 + frames_per], rate)
                            if reencode_wav and m
                            else None
                        )
                        rows.append(
                            (
                                str(mid), int(rate), int(ch), dur_ms, ci,
                                int(round(s0 * 1000.0 / rate)),
                                int(round(m * 1000.0 / rate)),
                                float(np.sqrt(np.mean(seg**2))),
                                float(np.abs(seg).max()),
                                float(zc / (m - 1)) if m > 1 else 0.0,
                                wav,
                            )
                        )
                yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, binary_col).mapInPandas(kernel, out_schema)


def audio_chunk_plan(
    df: DataFrame,
    chunk_ms: int = 30_000,
    duration_col: str = "duration_ms",
    id_col: str = "url",
) -> DataFrame:
    """Audio chunking *plan*: one row per chunk with (offset_ms, length_ms)
    derived from claimed duration metadata — the fan-out that bounds decoder
    memory per task. :func:`apply_audio_chunk` is the execution stage
    (real PCM WAV decode); compressed codecs stay pluggable."""
    n_chunks = F.ceil(F.col(duration_col) / F.lit(chunk_ms)).cast("int")
    return (
        df.select(
            F.col(id_col).alias("media_id"),
            F.col(duration_col).alias("__dur"),
            F.explode(F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))).alias("chunk_idx"),
        )
        .withColumn("offset_ms", F.col("chunk_idx") * F.lit(chunk_ms))
        .withColumn(
            "length_ms",
            F.least(F.lit(chunk_ms), F.col("__dur") - F.col("offset_ms")).cast("int"),
        )
        .drop("__dur")
    )
