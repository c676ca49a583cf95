"""Pure-Python PNG pixel codec (formats/pngcodec.py) — r4 verdict ask #4.

Roundtrips cover every color type we claim, every filter type via
synthetic filtered streams, palette expansion, the honest rejections,
and the Spark end-to-end: binary PNG column -> apply_resize kernel ->
real resized pixels, with ops/multimodal.resize_plan's scheduling math
agreeing with the executed output dims.
"""

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from benthos_spark.formats.pngcodec import (
    decode_png,
    encode_png,
    pixel_decoder,
    resize_nearest,
)


def _rng(seed=7):
    return np.random.default_rng(seed)


class TestRoundtrip:
    @pytest.mark.parametrize("channels", [1, 2, 3, 4])
    def test_encode_decode_roundtrip(self, channels):
        px = _rng(channels).integers(0, 256, (13, 9, channels), dtype=np.uint8)
        w, h, c, got = decode_png(encode_png(px))
        assert (w, h, c) == (9, 13, channels)
        np.testing.assert_array_equal(got, px)

    def test_gray_2d_input(self):
        px = _rng(1).integers(0, 256, (5, 7), dtype=np.uint8)
        w, h, c, got = decode_png(encode_png(px))
        assert (w, h, c) == (7, 5, 1)
        np.testing.assert_array_equal(got[:, :, 0], px)


def _png_with_filters(px: np.ndarray, filters) -> bytes:
    """Build a PNG whose scanlines use the given per-row filter types —
    exercises the decoder's reconstruction paths directly."""
    h, w, c = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    bpp = c
    out = bytearray()
    prev = np.zeros(w * bpp, dtype=np.int32)
    for y in range(h):
        row = px[y].reshape(-1).astype(np.int32)
        f = filters[y % len(filters)]
        if f == 0:
            filt = row.copy()
        elif f == 1:
            left = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
            filt = (row - left) & 0xFF
        elif f == 2:
            filt = (row - prev) & 0xFF
        elif f == 3:
            left = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
            filt = (row - ((left + prev) >> 1)) & 0xFF
        elif f == 4:
            filt = np.empty(w * bpp, dtype=np.int32)
            for x in range(w * bpp):
                a = row[x - bpp] if x >= bpp else 0
                b = prev[x]
                cc = prev[x - bpp] if x >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                filt[x] = (row[x] - pred) & 0xFF
        out += b"%c" % f + bytes(filt.astype(np.uint8))
        prev = row
    idat = zlib.compress(bytes(out))

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    )


class TestFilters:
    @pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
    def test_all_filter_types_reconstruct(self, filters):
        px = _rng(42).integers(0, 256, (10, 6, 3), dtype=np.uint8)
        b = _png_with_filters(px, filters)
        w, h, c, got = decode_png(b)
        assert (w, h, c) == (6, 10, 3)
        np.testing.assert_array_equal(got, px)

    def test_palette_expansion(self):
        # 4-color palette image, color type 3
        pal = np.array(
            [[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]], dtype=np.uint8
        )
        idx = _rng(3).integers(0, 4, (6, 5, 1), dtype=np.uint8)
        ihdr = struct.pack(">IIBBBBB", 5, 6, 8, 3, 0, 0, 0)
        rows = b"".join(b"\x00" + idx[y].tobytes() for y in range(6))
        idat = zlib.compress(rows)

        def chunk(t, d):
            return (
                struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
            )

        b = (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"PLTE", pal.tobytes())
            + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
        )
        w, h, c, got = decode_png(b)
        assert (w, h, c) == (5, 6, 3)
        np.testing.assert_array_equal(got, pal[idx[:, :, 0]])


class TestRejections:
    def test_not_png(self):
        with pytest.raises(ValueError, match="signature"):
            decode_png(b"\xff\xd8\xff\xe0 jpeg bytes")

    def test_bit_depth_16(self):
        ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)

        def chunk(t, d):
            return (
                struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
            )

        b = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")
        with pytest.raises(ValueError, match="bit depth"):
            decode_png(b)


class TestResize:
    def test_downscale_shape_and_values(self):
        px = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
        out = resize_nearest(px, 4, 4)
        assert out.shape == (4, 4, 3)
        np.testing.assert_array_equal(out, px[::2, ::2])

    def test_upscale(self):
        px = _rng(1).integers(0, 256, (2, 2, 3), dtype=np.uint8)
        out = resize_nearest(px, 4, 4)
        assert out.shape == (4, 4, 3)
        np.testing.assert_array_equal(out[0, 0], px[0, 0])
        np.testing.assert_array_equal(out[3, 3], px[1, 1])


class TestPixelDecoderPlug:
    def test_pixel_decoder_on_png(self):
        px = _rng(5).integers(0, 256, (12, 20, 3), dtype=np.uint8)
        feats = pixel_decoder(encode_png(px))
        assert feats["decoder"] == "pixels"
        assert (feats["format"], feats["width"], feats["height"]) == ("png", 20, 12)

    def test_pixel_decoder_falls_back_on_non_png(self):
        feats = pixel_decoder(b"GIF89a" + bytes([10, 0, 7, 0]) + b"\0" * 10)
        assert feats["decoder"] == "headers"
        assert (feats["format"], feats["width"], feats["height"]) == ("gif", 10, 7)


class TestSparkEndToEnd:
    def test_apply_resize_matches_plan(self, spark):
        """Binary PNG column -> apply_resize kernel; executed output dims
        must equal resize_plan's Catalyst-derived scheduling dims, and the
        output payloads must decode to those dims."""
        from benthos_spark.ops.multimodal import apply_resize, resize_plan

        rng = _rng(11)
        rows = []
        for i, (h, w) in enumerate([(40, 60), (16, 16), (100, 30), (8, 128)]):
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            rows.append(Row(url=f"img{i}", payload=bytearray(encode_png(px)),
                            width=w, height=h))
        df = spark.createDataFrame(rows)
        got = {
            r.media_id: r
            for r in apply_resize(df, 32, 32, binary_col="payload").collect()
        }
        plan = {
            r.url: r
            for r in resize_plan(df, 32, 32).select(
                "url", "out_w", "out_h", "is_noop"
            ).collect()
        }
        assert set(got) == set(plan)
        for name, p in plan.items():
            g = got[name]
            assert (g.out_w, g.out_h) == (p.out_w, p.out_h), name
            w2, h2, _c, _px = decode_png(bytes(g.out_png))
            assert (w2, h2) == (p.out_w, p.out_h), name
        # the 16x16 image scales to 32x32 (upscale allowed, scale=2)
        assert (got["img1"].out_w, got["img1"].out_h) == (32, 32)

    def test_apply_resize_passes_through_non_png(self, spark):
        from benthos_spark.ops.multimodal import apply_resize

        df = spark.createDataFrame(
            [Row(url="x", payload=bytearray(b"not an image at all"))]
        )
        r = apply_resize(df, 32, 32, binary_col="payload").collect()[0]
        assert r.out_png is None and r.src_w is None
