"""BMP pixel codec: roundtrip, orientation, palette, malformed inputs,
and the multimodal wiring (pixel_decoder + apply_resize)."""

import struct

import numpy as np
import pytest
from pyspark.sql import Row

from benthos_spark.formats.bmpcodec import (
    DECODE_ERRORS,
    decode_bmp,
    encode_bmp,
)


def _px(h, w, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


class TestRoundtrip:
    def test_24bpp_roundtrip_exact(self):
        for h, w in [(1, 1), (3, 5), (4, 4), (7, 2)]:  # odd widths hit padding
            px = _px(h, w)
            ow, oh, c, got = decode_bmp(encode_bmp(px))
            assert (ow, oh, c) == (w, h, 3)
            assert np.array_equal(got, px)

    def test_top_down_negative_height(self):
        px = _px(2, 3)
        b = bytearray(encode_bmp(px))
        # flip stored rows to top-down and negate biHeight
        stride = ((3 * 3) + 3) & ~3
        body = bytes(b[54:])
        rows = [body[i * stride : (i + 1) * stride] for i in range(2)]
        b[54:] = rows[1] + rows[0]
        struct.pack_into("<i", b, 22, -2)
        ow, oh, _c, got = decode_bmp(bytes(b))
        assert (ow, oh) == (3, 2)
        assert np.array_equal(got, px)

    def test_8bpp_palette(self):
        # hand-build a 2x2 paletted image: indexes 0..3 -> 4 RGB colors
        colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
        pal = b"".join(bytes((bl, g, r, 0)) for r, g, bl in colors)
        stride = (2 + 3) & ~3
        body = bytes([0, 1, 0, 0]) + bytes([2, 3, 0, 0])
        data_off = 14 + 40 + len(pal)
        hdr = struct.pack("<2sIHHI", b"BM", data_off + len(body), 0, 0, data_off)
        info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, len(body), 0, 0, 4, 0)
        w, h, _c, px = decode_bmp(hdr + info + pal + body)
        assert (w, h) == (2, 2)
        # bottom-up: stored row 0 is the BOTTOM image row
        assert tuple(px[1][0]) == colors[0] and tuple(px[1][1]) == colors[1]
        assert tuple(px[0][0]) == colors[2] and tuple(px[0][1]) == colors[3]
        assert stride == 4  # row padding exercised

    def test_malformed_raise_decode_errors(self):
        good = encode_bmp(_px(2, 2))
        cases = [
            b"PX not a bmp",
            b"BM" + b"\x00" * 20,  # truncated header
            good[:60],  # truncated body
            good[:30] + struct.pack("<I", 1) + good[34:],  # BI_RLE8
        ]
        for bad in cases:
            with pytest.raises(DECODE_ERRORS):
                decode_bmp(bad)

    def test_pixel_decoder_reports_pixels(self):
        from benthos_spark.formats.pngcodec import pixel_decoder

        feats = pixel_decoder(encode_bmp(_px(3, 7)))
        assert feats["decoder"] == "pixels"
        assert (feats["format"], feats["width"], feats["height"]) == ("bmp", 7, 3)
        # corrupt BMP falls back to header parse, no crash
        feats2 = pixel_decoder(encode_bmp(_px(2, 2))[:60])
        assert feats2.get("decoder") != "pixels"


@pytest.mark.spark
class TestResizeBmp:
    def test_apply_resize_decodes_bmp_and_emits_png(self, spark):
        from benthos_spark.formats.pngcodec import decode_png
        from benthos_spark.ops.multimodal import apply_resize

        big = encode_bmp(_px(8, 6))
        same = encode_bmp(_px(4, 4, seed=9))
        df = spark.createDataFrame(
            [Row(url="big", payload=bytearray(big)),
             Row(url="same", payload=bytearray(same)),
             Row(url="junk", payload=bytearray(b"BM but broken"))]
        )
        out = {r["media_id"]: r for r in apply_resize(df, 4, 4).collect()}
        assert (out["big"]["src_w"], out["big"]["src_h"]) == (6, 8)
        assert (out["big"]["out_w"], out["big"]["out_h"]) == (3, 4)
        w, h, _c, _px2 = decode_png(bytes(out["big"]["out_png"]))
        assert (w, h) == (3, 4)
        # same-size BMP must still come back as PNG bytes (column honesty)
        w2, h2, _c2, _ = decode_png(bytes(out["same"]["out_png"]))
        assert (w2, h2) == (4, 4)
        assert out["junk"]["out_w"] is None
