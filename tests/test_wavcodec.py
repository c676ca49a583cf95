"""PCM WAV codec: roundtrips across sample formats, EXTENSIBLE headers,
feature math, malformed inputs, and the multimodal execution stage
(apply_audio_chunk vs the pure-Catalyst audio_chunk_plan)."""

import struct

import numpy as np
import pytest
from pyspark.sql import Row

from benthos_spark.formats.wavcodec import (
    DECODE_ERRORS,
    audio_features,
    decode_wav,
    encode_wav,
)


def _sine(seconds=0.5, rate=8000, hz=440.0, channels=1):
    t = np.arange(int(seconds * rate)) / rate
    s = 0.5 * np.sin(2 * np.pi * hz * t)
    return np.tile(s[:, None], (1, channels))


def _wav_raw(tag, bits, channels, rate, data):
    fmt = struct.pack(
        "<HHIIHH", tag, channels, rate,
        rate * channels * bits // 8, channels * bits // 8, bits,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


class TestRoundtrip:
    def test_16bit_mono(self):
        src = _sine()
        rate, ch, got = decode_wav(encode_wav(src, 8000))
        assert (rate, ch) == (8000, 1) and got.shape == src.shape
        assert np.abs(got - src).max() < 1e-3  # 16-bit quantization

    def test_16bit_stereo(self):
        src = _sine(channels=2)
        src[:, 1] *= 0.5
        rate, ch, got = decode_wav(encode_wav(src, 44100))
        assert (rate, ch) == (44100, 2)
        assert np.abs(got - src).max() < 1e-3

    def test_8bit_unsigned(self):
        src = _sine(seconds=0.1)
        raw = np.clip(np.round(src[:, 0] * 127 + 128), 0, 255).astype(np.uint8)
        rate, ch, got = decode_wav(_wav_raw(1, 8, 1, 8000, raw.tobytes()))
        assert (rate, ch) == (8000, 1)
        assert np.abs(got[:, 0] - src[:, 0]).max() < 0.02

    def test_24bit(self):
        src = _sine(seconds=0.1)
        vals = np.round(src[:, 0] * (1 << 23)).astype(np.int64)
        tri = np.zeros((len(vals), 3), dtype=np.uint8)
        u = np.where(vals < 0, vals + (1 << 24), vals)
        tri[:, 0] = u & 0xFF
        tri[:, 1] = (u >> 8) & 0xFF
        tri[:, 2] = (u >> 16) & 0xFF
        rate, ch, got = decode_wav(_wav_raw(1, 24, 1, 8000, tri.tobytes()))
        assert np.abs(got[:, 0] - src[:, 0]).max() < 1e-6

    def test_float32_and_float64(self):
        src = _sine(seconds=0.1)
        for bits, dt in [(32, "<f4"), (64, "<f8")]:
            data = src[:, 0].astype(dt).tobytes()
            rate, ch, got = decode_wav(_wav_raw(3, bits, 1, 8000, data))
            assert np.abs(got[:, 0] - src[:, 0]).max() < 1e-6

    def test_extensible_header(self):
        src = _sine(seconds=0.1)
        pcm = np.clip(np.round(src[:, 0] * 32767), -32768, 32767).astype("<i2")
        # WAVE_FORMAT_EXTENSIBLE: cbSize=22, valid bits, mask, GUID(sub=1)
        fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
        fmt += struct.pack("<HHI", 22, 16, 0) + struct.pack("<H", 1) + b"\x00" * 14
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(pcm.tobytes())) + pcm.tobytes()
        rate, ch, got = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
        assert (rate, ch) == (8000, 1)
        assert np.abs(got[:, 0] - src[:, 0]).max() < 1e-3

    def test_odd_sized_chunk_alignment(self):
        # a 3-byte junk chunk before fmt must be skipped with word padding
        src = encode_wav(_sine(seconds=0.05), 8000)
        junk = b"junk" + struct.pack("<I", 3) + b"abc\x00"  # padded to 4
        patched = src[:12] + junk + src[12:]
        patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
        rate, ch, got = decode_wav(patched)
        assert rate == 8000 and len(got) == len(_sine(seconds=0.05))


class TestFeaturesAndRobustness:
    def test_audio_features(self):
        f = audio_features(encode_wav(_sine(seconds=1.0, hz=100.0), 8000))
        assert f["sample_rate"] == 8000 and f["channels"] == 1
        assert f["duration_ms"] == 1000
        # 0.5-amp sine: RMS = 0.5/sqrt(2), 100 Hz -> ~200 crossings/sec
        assert abs(f["rms"] - 0.5 / np.sqrt(2)) < 1e-3
        assert abs(f["peak"] - 0.5) < 1e-3
        assert abs(f["zero_cross_rate"] * 7999 - 200) <= 2

    def test_malformed_raise_decode_errors(self):
        good = encode_wav(_sine(seconds=0.05), 8000)
        cases = [
            b"not riff at all",
            b"RIFF\x10\x00\x00\x00WAVX" + b"\x00" * 8,  # wrong form type
            good[:20],  # truncated fmt
            _wav_raw(85, 16, 1, 8000, b"\x00" * 64),  # MP3-in-WAV tag
            _wav_raw(1, 12, 1, 8000, b"\x00" * 64),  # weird bit depth
        ]
        for bad in cases:
            with pytest.raises(DECODE_ERRORS):
                decode_wav(bad)


class TestSparkWiring:
    def test_apply_audio_chunk_matches_plan(self, spark):
        from benthos_spark.ops.multimodal import apply_audio_chunk, audio_chunk_plan

        # 2.5 s at 8 kHz, 1 s chunks -> 3 chunks, last one 500 ms
        src = _sine(seconds=2.5, rate=8000, hz=440.0)
        rows = [
            Row(url="a1", payload=bytearray(encode_wav(src, 8000)),
                duration_ms=2500),
            Row(url="bad", payload=bytearray(b"RIFFgarbage!"), duration_ms=0),
        ]
        df = spark.createDataFrame(rows)
        got = {
            (r["media_id"], r["chunk_idx"]): r
            for r in apply_audio_chunk(
                df, chunk_ms=1000, binary_col="payload"
            ).collect()
        }
        chunks = [got[("a1", i)] for i in range(3)]
        assert [c["offset_ms"] for c in chunks] == [0, 1000, 2000]
        assert [c["length_ms"] for c in chunks] == [1000, 1000, 500]
        for c in chunks:
            assert abs(c["rms"] - 0.5 / np.sqrt(2)) < 1e-2
            assert abs(c["peak"] - 0.5) < 1e-2
        # undecodable payload -> one NULL accounting row
        assert got[("bad", None)]["sample_rate"] is None

        # the execution stage agrees with the metadata-only plan fan-out
        plan = audio_chunk_plan(
            df.filter("url = 'a1'"), chunk_ms=1000
        ).collect()
        assert sorted((r["offset_ms"], r["length_ms"]) for r in plan) == [
            (0, 1000), (1000, 1000), (2000, 500)
        ]

    def test_chunk_reencode_roundtrip(self, spark):
        from benthos_spark.ops.multimodal import apply_audio_chunk

        src = _sine(seconds=0.4, rate=8000)
        df = spark.createDataFrame(
            [Row(url="u", payload=bytearray(encode_wav(src, 8000)))]
        )
        out = apply_audio_chunk(
            df, chunk_ms=200, binary_col="payload", reencode_wav=True
        ).collect()
        assert len(out) == 2
        for r in sorted(out, key=lambda r: r["chunk_idx"]):
            rate, ch, seg = decode_wav(bytes(r["chunk_wav"]))
            assert rate == 8000 and len(seg) == 1600  # 200 ms @ 8 kHz
