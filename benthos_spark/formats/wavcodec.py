"""Pure-Python RIFF/WAVE codec — struct + numpy, no audio library.

Makes AUDIO decode real for the multimodal family, the same way
pngcodec/bmpcodec/gifcodec/jpegcodec did for images: PCM WAV is the one
audio container decodable from the public specification (RIFF chunks +
the WAVEFORMAT header, Microsoft/IBM 1991) with nothing but stdlib.
``ops.multimodal.apply_audio_chunk`` uses it to execute the chunk plan
(``audio_chunk_plan``) against real samples.

Supported sample formats (raised as ValueError otherwise):
- PCM (wFormatTag 1): unsigned 8-bit, signed 16/24/32-bit little-endian
- IEEE float (wFormatTag 3): float32, float64
- WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrapping either of the above

Compressed codecs (MP3/AAC/Opus...) need a real decoder library and stay
behind ``ops.multimodal.set_decoder`` — same honest boundary as
progressive JPEG.

``decode_wav`` returns float64 samples normalized to [-1, 1] so feature
math (RMS, peak, zero crossings) is format-independent; ``encode_wav``
writes 16-bit PCM (fixtures and chunk re-emission).
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np

# everything a malformed-but-RIFF-valid payload can raise out of decode_wav
DECODE_ERRORS = (ValueError, struct.error, IndexError)


def _chunks(b: bytes):
    """Yield (fourcc, payload) for each top-level RIFF sub-chunk."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i = 12
    n = len(b)
    while i + 8 <= n:
        fourcc = b[i : i + 4]
        (size,) = struct.unpack("<I", b[i + 4 : i + 8])
        payload = b[i + 8 : i + 8 + size]
        if len(payload) < size:
            raise ValueError(f"truncated {fourcc!r} chunk")
        yield fourcc, payload
        i += 8 + size + (size & 1)  # chunks are word-aligned


def decode_wav(b: bytes) -> Tuple[int, int, np.ndarray]:
    """bytes -> (sample_rate, channels, samples float64 (n_frames, channels)
    in [-1, 1])."""
    fmt = None
    data = None
    for fourcc, payload in _chunks(b):
        if fourcc == b"fmt " and fmt is None:
            if len(payload) < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", payload[:16])
            if fmt[0] == 0xFFFE and len(payload) >= 26:
                # EXTENSIBLE: the real format tag is the GUID's first word
                (sub,) = struct.unpack("<H", payload[24:26])
                fmt = (sub,) + fmt[1:]
        elif fourcc == b"data" and data is None:
            data = payload
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    tag, channels, rate, _byte_rate, _align, bits = fmt
    if channels < 1 or rate < 1:
        raise ValueError("invalid channel count or sample rate")
    if tag == 1:  # integer PCM
        if bits == 8:
            raw = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
            samples = (raw - 128.0) / 128.0
        elif bits == 16:
            samples = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            usable = len(data) - len(data) % 3
            tri = np.frombuffer(data[:usable], dtype=np.uint8).reshape(-1, 3)
            vals = (
                tri[:, 0].astype(np.int64)
                | (tri[:, 1].astype(np.int64) << 8)
                | (tri[:, 2].astype(np.int64) << 16)
            )
            vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
            samples = vals.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            samples = np.frombuffer(data, dtype="<i4").astype(np.float64) / float(1 << 31)
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif tag == 3:  # IEEE float
        if bits == 32:
            samples = np.frombuffer(data, dtype="<f4").astype(np.float64)
        elif bits == 64:
            samples = np.frombuffer(data, dtype="<f8").astype(np.float64)
        else:
            raise ValueError(f"unsupported float bit depth {bits}")
    else:
        raise ValueError(f"compressed WAV format tag {tag} needs a codec library")
    usable = len(samples) - len(samples) % channels
    return rate, channels, samples[:usable].reshape(-1, channels)


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n_frames,) or (n_frames, channels) float in [-1, 1] -> 16-bit PCM."""
    samples = np.asarray(samples, dtype=np.float64)
    if samples.ndim == 1:
        samples = samples[:, None]
    channels = samples.shape[1]
    pcm = np.clip(np.round(samples * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def audio_features(payload: bytes) -> dict:
    """Real audio metadata + signal features for a WAV payload:
    duration/rate/channels plus RMS, peak and zero-crossing rate over the
    channel-mean signal. Raises DECODE_ERRORS on non-WAV input."""
    rate, channels, samples = decode_wav(payload)
    mono = samples.mean(axis=1) if channels > 1 else samples[:, 0]
    n = len(mono)
    zc = int(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0
    return {
        "sample_rate": int(rate),
        "channels": int(channels),
        "n_frames": int(n),
        "duration_ms": int(round(n * 1000.0 / rate)),
        "rms": float(np.sqrt(np.mean(mono**2))) if n else 0.0,
        "peak": float(np.abs(mono).max()) if n else 0.0,
        "zero_cross_rate": float(zc / (n - 1)) if n > 1 else 0.0,
    }
