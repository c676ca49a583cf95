"""Header-parsing decoder (formats/imagemeta.py) — hand-assembled format
vectors per the public specs, plus the Spark-side featurizer contract."""

import struct

from benthos_spark.formats.imagemeta import parse_dimensions


def make_png(w, h):
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", w, h)
        + b"\x08\x06\x00\x00\x00"
    )


def make_jpeg(w, h):
    # SOI, APP0 (JFIF), DQT (skipped), SOF0
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\xff\xdb" + struct.pack(">H", 4) + b"\x00\x00"
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + dqt + sof0


def make_gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"


def make_bmp(w, h):
    return b"BM" + b"\x00" * 16 + struct.pack("<ii", w, -h) + b"\x00" * 8


def make_webp_vp8(w, h):
    body = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", w, h)
    return b"RIFF" + struct.pack("<I", 12 + len(body)) + b"WEBP" + b"VP8 " + struct.pack("<I", len(body)) + body


def make_webp_vp8l(w, h):
    bits = (w - 1) | ((h - 1) << 14)
    body = b"\x2f" + struct.pack("<I", bits) + b"\x00"
    return b"RIFF" + struct.pack("<I", 12 + len(body)) + b"WEBP" + b"VP8L" + struct.pack("<I", len(body)) + body


class TestParsers:
    def test_png(self):
        assert parse_dimensions(make_png(640, 480)) == ("png", 640, 480)

    def test_jpeg(self):
        assert parse_dimensions(make_jpeg(1024, 768)) == ("jpeg", 1024, 768)

    def test_jpeg_progressive_sof2(self):
        b = make_jpeg(33, 44).replace(b"\xff\xc0", b"\xff\xc2")
        assert parse_dimensions(b) == ("jpeg", 33, 44)

    def test_gif(self):
        assert parse_dimensions(make_gif(12, 34)) == ("gif", 12, 34)

    def test_bmp_negative_height(self):
        assert parse_dimensions(make_bmp(800, 600)) == ("bmp", 800, 600)

    def test_webp_vp8(self):
        assert parse_dimensions(make_webp_vp8(320, 240)) == ("webp", 320, 240)

    def test_webp_vp8l(self):
        assert parse_dimensions(make_webp_vp8l(100, 200)) == ("webp", 100, 200)

    def test_garbage_and_truncation(self):
        assert parse_dimensions(b"") is None
        assert parse_dimensions(b"hello world, definitely not an image") is None
        for maker in (make_png, make_jpeg, make_gif, make_bmp, make_webp_vp8):
            full = maker(64, 64)
            for cut in (1, 5, 9):
                assert parse_dimensions(full[:cut]) is None, (maker.__name__, cut)

    def test_jpeg_dht_before_sof_skipped(self):
        dht = b"\xff\xc4" + struct.pack(">H", 5) + b"\x00\x00\x00"
        b = make_jpeg(55, 66)
        b = b[:2] + dht + b[2:]
        assert parse_dimensions(b) == ("jpeg", 55, 66)


class TestSparkFeaturizer:
    def test_end_to_end_dims(self, spark):
        from benthos_spark.ops.multimodal import extract_media_features

        rows = [
            ("png", make_png(640, 480)),
            ("jpeg", make_jpeg(1024, 768)),
            ("gif", make_gif(12, 34)),
            ("text", b"just some text payload"),
        ]
        df = spark.createDataFrame(rows, "media_id string, payload binary")
        out = {
            r["media_id"]: r
            for r in extract_media_features(df, binary_col="payload", id_col="media_id")
            .select("media_id", "features.*")
            .collect()
        }
        assert (out["png"]["format"], out["png"]["width"], out["png"]["height"]) == ("png", 640, 480)
        assert (out["jpeg"]["width"], out["jpeg"]["height"]) == (1024, 768)
        assert (out["gif"]["width"], out["gif"]["height"]) == (12, 34)
        assert out["text"]["format"] is None and out["text"]["width"] is None
        assert out["text"]["n_bytes"] == len(b"just some text payload")
        assert all(r["decoder"] == "headers" for r in out.values())


try:
    from hypothesis import given, settings, strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False

if HAVE_HYP:

    class TestRoundtripProperties:
        @given(
            w=st.integers(min_value=1, max_value=65535),
            h=st.integers(min_value=1, max_value=65535),
        )
        @settings(max_examples=120, deadline=None)
        def test_fixed_width_formats_roundtrip(self, w, h):
            for maker, fmt in [
                (make_png, "png"),
                (make_jpeg, "jpeg"),
                (make_gif, "gif"),
                (make_bmp, "bmp"),
            ]:
                assert parse_dimensions(maker(w, h)) == (fmt, w, h), (fmt, w, h)

        @given(
            w=st.integers(min_value=1, max_value=16383),
            h=st.integers(min_value=1, max_value=16383),
        )
        @settings(max_examples=120, deadline=None)
        def test_webp_14bit_roundtrip(self, w, h):
            assert parse_dimensions(make_webp_vp8(w, h)) == ("webp", w, h)
            assert parse_dimensions(make_webp_vp8l(w, h)) == ("webp", w, h)

        @given(data=st.binary(min_size=0, max_size=64))
        @settings(max_examples=200, deadline=None)
        def test_arbitrary_bytes_never_crash(self, data):
            parse_dimensions(data)  # None or a parse — never an exception
