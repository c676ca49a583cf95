"""Baseline JPEG codec: lossy roundtrip quality bounds, grayscale,
4:2:0 subsampling, restart markers, malformed inputs, header-parser
agreement, and the multimodal wiring (pixel_decoder + apply_resize)."""

import numpy as np
import pytest
from pyspark.sql import Row

from benthos_spark.formats.jpegcodec import (
    DECODE_ERRORS,
    decode_jpeg,
    encode_jpeg,
)


def _gradient(h, w):
    xx, yy = np.meshgrid(np.linspace(0, 255, w), np.linspace(0, 255, h))
    return np.stack([xx, yy, (xx + yy) / 2], axis=-1).astype(np.uint8)


class TestRoundtrip:
    def test_rgb_444_high_quality(self):
        img = _gradient(40, 56)
        w, h, c, px = decode_jpeg(encode_jpeg(img, quality=95))
        assert (w, h, c) == (56, 40, 3) and px.shape == (40, 56, 3)
        # smooth content at q95 roundtrips near-losslessly
        assert np.abs(px.astype(float) - img).mean() < 2.0

    def test_non_multiple_of_8_dims(self):
        # 13x9 forces edge-padding in every direction
        img = _gradient(13, 9)
        w, h, c, px = decode_jpeg(encode_jpeg(img, quality=95))
        assert (w, h) == (9, 13) and px.shape == (13, 9, 3)
        # a 255-range ramp over 9 px is the worst case for 8x8 DCT
        # quantization; the bound tracks measured codec behavior (~5.5)
        assert np.abs(px.astype(float) - img).mean() < 8.0

    def test_grayscale_single_component(self):
        g = _gradient(24, 40)[..., 0]
        w, h, c, px = decode_jpeg(encode_jpeg(g, quality=92))
        assert (w, h, c) == (40, 24, 1)
        assert np.abs(px[..., 0].astype(float) - g).mean() < 3.0

    def test_420_subsampled(self):
        img = _gradient(48, 80)
        b = encode_jpeg(img, quality=92, subsample=True)
        w, h, c, px = decode_jpeg(b)
        assert (w, h, c) == (80, 48, 3)
        # chroma is half-res: looser bound, but luma structure must hold
        assert np.abs(px.astype(float) - img).mean() < 6.0

    def test_420_odd_dims(self):
        img = _gradient(17, 21)  # not multiples of 16
        w, h, c, px = decode_jpeg(encode_jpeg(img, quality=92, subsample=True))
        assert (w, h) == (21, 17) and px.shape == (17, 21, 3)

    def test_restart_markers(self):
        img = _gradient(48, 80)
        b = encode_jpeg(img, quality=92, restart_interval=3)
        assert b"\xff\xdd" in b  # DRI emitted
        assert any(bytes([0xFF, 0xD0 + k]) in b for k in range(8))
        w, h, c, px = decode_jpeg(b)
        assert (w, h, c) == (80, 48, 3)
        assert np.abs(px.astype(float) - img).mean() < 3.0

    def test_restart_markers_with_subsampling(self):
        img = _gradient(33, 47)
        b = encode_jpeg(img, quality=90, subsample=True, restart_interval=2)
        w, h, c, px = decode_jpeg(b)
        assert (w, h) == (47, 33)

    def test_quality_monotone(self):
        # lower quality must not beat higher quality on the same content
        img = _gradient(32, 32)
        errs = []
        for q in (95, 75, 40):
            _w, _h, _c, px = decode_jpeg(encode_jpeg(img, quality=q))
            errs.append(np.abs(px.astype(float) - img).mean())
        assert errs[0] <= errs[1] <= errs[2] + 1e-9

    def test_solid_color_exact_dc(self):
        # a constant block is DC-only; decode must return a constant image
        img = np.full((16, 16, 3), 128, dtype=np.uint8)
        _w, _h, _c, px = decode_jpeg(encode_jpeg(img, quality=90))
        assert np.abs(px.astype(float) - 128).max() <= 2


class TestRobustness:
    def test_malformed_raise_decode_errors(self):
        good = encode_jpeg(_gradient(16, 16), quality=80)
        cases = [
            b"\x89PNG not a jpeg",
            b"\xff\xd8\xff\xc2\x00\x10" + b"\x00" * 14,  # progressive SOF2
            good[: len(good) // 3],  # truncated entropy stream
            good[:2],  # SOI only
        ]
        for bad in cases:
            with pytest.raises(DECODE_ERRORS):
                decode_jpeg(bad)

    def test_header_parser_agreement(self):
        # formats/imagemeta.py (independent header walk) must agree with
        # the full decode on dimensions, for every encoder mode
        from benthos_spark.formats.imagemeta import parse_dimensions

        img = _gradient(25, 34)
        for kw in ({}, {"subsample": True}, {"restart_interval": 2}):
            b = encode_jpeg(img, quality=85, **kw)
            assert parse_dimensions(b) == ("jpeg", 34, 25)

    def test_16bit_dqt_decodes(self):
        # re-emit a good JPEG's DQT as a 16-bit (Pq=1) table
        import struct

        from benthos_spark.formats.jpegcodec import ZIGZAG, _quality_tables

        img = _gradient(16, 16)[..., 0]
        b = bytearray(encode_jpeg(img, quality=90))
        i = b.find(b"\xff\xdb")
        (seglen,) = struct.unpack(">H", b[i + 2 : i + 4])
        ql, _ = _quality_tables(90)
        wide = bytes([0x10]) + b"".join(
            struct.pack(">H", int(ql[z])) for z in ZIGZAG
        )
        b[i + 2 : i + 2 + seglen] = struct.pack(">H", 2 + len(wide)) + wide
        w, h, c, px = decode_jpeg(bytes(b))
        assert (w, h, c) == (16, 16, 1)
        # same table values, wider encoding: output must be byte-identical
        _w, _h, _c, px8 = decode_jpeg(encode_jpeg(img, quality=90))
        assert np.array_equal(px, px8)


class TestMultimodalWiring:
    def test_pixel_decoder_reports_pixels(self):
        from benthos_spark.formats.pngcodec import pixel_decoder

        feats = pixel_decoder(encode_jpeg(_gradient(9, 14), quality=85))
        assert feats["decoder"] == "pixels"
        assert (feats["format"], feats["width"], feats["height"]) == ("jpeg", 14, 9)
        # corrupt JPEG falls back to header parse, no crash
        feats2 = pixel_decoder(encode_jpeg(_gradient(8, 8))[: 40])
        assert feats2.get("decoder") != "pixels"

    def test_apply_resize_jpeg_end_to_end(self, spark):
        from benthos_spark.formats.pngcodec import decode_png
        from benthos_spark.ops.multimodal import apply_resize

        img = _gradient(32, 64)
        rows = [
            Row(url="jpg1", payload=bytearray(encode_jpeg(img, quality=92))),
            Row(url="bad", payload=bytearray(b"\xff\xd8garbage")),
        ]
        out = {
            r["media_id"]: r
            for r in apply_resize(
                spark.createDataFrame(rows), 16, 16, binary_col="payload"
            ).collect()
        }
        r1 = out["jpg1"]
        assert (r1["src_w"], r1["src_h"]) == (64, 32)
        assert (r1["out_w"], r1["out_h"]) == (16, 8)  # aspect kept
        w, h, _c, px = decode_png(bytes(r1["out_png"]))
        assert (w, h) == (16, 8)
        # resized pixels still resemble the source gradient
        small = img[::4, ::4]  # nearest-neighbour reference
        assert np.abs(px.astype(float) - small).mean() < 8.0
        assert out["bad"]["out_png"] is None  # NULL passthrough


def test_high_frequency_stripes_roundtrip():
    """r6 ADVICE fix: dequantization must un-zigzag BEFORE multiplying by
    the natural-order quant table. Smooth gradients can't catch the
    ordering bug (their energy sits where zigzag ~= identity), so pin a
    2px vertical-stripe image: maxerr was ~39 with the zigzag/natural
    mispairing, <= 8 when paired correctly."""
    import numpy as np

    from benthos_spark.formats.jpegcodec import decode_jpeg, encode_jpeg

    h = w = 32
    px = np.zeros((h, w, 3), dtype=np.uint8)
    px[:, (np.arange(w) // 2) % 2 == 0] = 230
    px[:, (np.arange(w) // 2) % 2 == 1] = 30
    data = encode_jpeg(px, quality=90)
    dw, dh, dc, out = decode_jpeg(data)
    assert (dw, dh, dc) == (w, h, 3)
    maxerr = int(np.abs(out.astype(int) - px.astype(int)).max())
    assert maxerr <= 8, f"high-frequency roundtrip maxerr {maxerr}"


def test_seeded_noise_roundtrip_bounded():
    import numpy as np

    from benthos_spark.formats.jpegcodec import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(24, 24, 3), dtype=np.uint8).astype(np.uint8)
    data = encode_jpeg(px, quality=95)
    _, _, _, out = decode_jpeg(data)
    meanerr = float(np.abs(out.astype(int) - px.astype(int)).mean())
    assert meanerr < 12.0, f"noise roundtrip mean err {meanerr}"


def test_fill_bytes_before_marker_accepted():
    """T.81 B.1.1.2: optional 0xFF fill bytes before a marker must not
    fail the decode (r6 ADVICE fix)."""
    import numpy as np

    from benthos_spark.formats.jpegcodec import decode_jpeg, encode_jpeg

    px = np.full((16, 16, 1), 128, dtype=np.uint8)
    data = encode_jpeg(px, quality=90)
    # inject a fill byte before the first post-SOI marker
    assert data[2] == 0xFF
    padded = data[:2] + b"\xff" + data[2:]
    w, h, c, out = decode_jpeg(padded)
    assert (w, h, c) == (16, 16, 1)


class TestFillBytes:
    def test_fill_byte_before_restart_marker(self):
        """T.81 B.1.1.2: 0xFF fill bytes may pad before ANY marker,
        including RSTn inside the entropy stream (r6 review fix: the
        segment splitter treated FF FF as scan end and lost the tail)."""
        img = _gradient(32, 32)
        good = encode_jpeg(img, quality=88, restart_interval=2)
        ref_w, ref_h, ref_c, ref_px = decode_jpeg(good)
        # inject one fill 0xFF before every RST marker in the scan
        import re

        sos = good.find(b"\xff\xda")
        head, scan = good[:sos], good[sos:]
        padded = head + re.sub(
            b"\xff([\xd0-\xd7])", b"\xff\xff\\1", scan
        )
        assert padded != good
        w, h, c, px = decode_jpeg(padded)
        assert (w, h, c) == (ref_w, ref_h, ref_c)
        assert (px == ref_px).all()
