"""Pure-Python animated-GIF codec (formats/gifcodec.py) and the Spark
end-to-end: binary GIF column -> apply_frame_sample kernel -> composed
frames re-encoded as PNG (feeding the apply_resize image path)."""

import base64
import struct

import numpy as np
import pytest

from benthos_spark.formats.gifcodec import decode_gif, encode_gif
from benthos_spark.formats.pngcodec import decode_png

GRAY = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)


def _anim(n=6, h=23, w=37, seed=7):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w), dtype=np.uint8) for _ in range(n)]


class TestRoundtrip:
    def test_multiframe_roundtrip(self):
        frames = _anim()
        dec = decode_gif(encode_gif(frames, delay_cs=5))
        assert len(dec) == 6
        for src, d in zip(frames, dec):
            assert d.delay_cs == 5
            assert np.array_equal(d.px, GRAY[src])

    def test_interlaced_roundtrip(self):
        frames = _anim(2)
        dec = decode_gif(encode_gif(frames, interlace=True))
        assert np.array_equal(dec[1].px, GRAY[frames[1]])

    def test_12bit_codes_and_dict_reset(self):
        # 200x300 random forces the LZW table past 4096 entries
        big = _anim(1, 200, 300, seed=11)[0]
        assert np.array_equal(decode_gif(encode_gif([big]))[0].px, GRAY[big])

    def test_small_palette_runs(self):
        pal = np.array(
            [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8
        )
        fr = np.tile(np.arange(4, dtype=np.uint8).repeat(5), (8, 1))
        assert np.array_equal(
            decode_gif(encode_gif([fr], palette=pal))[0].px, pal[fr]
        )


class TestSpecVectors:
    def test_canonical_1x1_tracking_pixel(self):
        # ubiquitous public 1x1 transparent GIF: one frame, transparent
        # pixel leaves the (black) background showing
        b = base64.b64decode(
            "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
        )
        fr = decode_gif(b)
        assert len(fr) == 1 and fr[0].px.shape == (1, 1, 3)
        assert fr[0].px.tolist() == [[[0, 0, 0]]]

    def test_not_a_gif(self):
        with pytest.raises(ValueError):
            decode_gif(b"\x89PNG\r\n\x1a\nnope")


class TestComposition:
    def test_disposal_leave_accumulates(self):
        """A sub-rectangle frame with disposal 1 paints over the previous
        composed canvas, not a blank one."""
        pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
        base = np.zeros((4, 4), np.uint8)
        base[0, 0] = 1
        gif = bytearray(encode_gif([base], palette=pal))
        # append a 1x1 sub-rect frame at (3,3) painting white, by hand
        tail = gif[-1:]
        del gif[-1:]
        gif += b"\x21\xf9" + struct.pack("<BBHBB", 4, 0x04, 2, 0, 0)  # disposal 1
        gif += b"\x2c" + struct.pack("<HHHHB", 3, 3, 1, 1, 0)
        gif += bytes([2])  # min code size
        from benthos_spark.formats.gifcodec import _lzw_encode

        comp = _lzw_encode(2, bytes([1]))
        gif += bytes([len(comp)]) + comp + b"\x00" + tail
        fr = decode_gif(bytes(gif))
        assert len(fr) == 2
        assert fr[1].px[0, 0].tolist() == [255, 255, 255]  # kept from frame 0
        assert fr[1].px[3, 3].tolist() == [255, 255, 255]  # painted by frame 1

    def test_disposal_background_clears_rect(self):
        pal = np.array([[9, 9, 9], [255, 0, 0]], np.uint8)
        f0 = np.ones((2, 2), np.uint8)
        gif = bytearray(b"GIF89a")
        gif += struct.pack("<HHBBB", 2, 2, 0x80, 0, 0)  # gct, bg idx 0
        ct = np.zeros((2, 3), np.uint8)
        ct[:2] = pal
        gif += ct.tobytes()
        from benthos_spark.formats.gifcodec import _lzw_encode

        for disposal, px in ((2, f0), (0, np.zeros((1, 1), np.uint8))):
            gif += b"\x21\xf9" + struct.pack(
                "<BBHBB", 4, disposal << 2, 1, 0, 0
            )
            h, w = px.shape
            gif += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
            gif += bytes([2])
            comp = _lzw_encode(2, px.tobytes())
            gif += bytes([len(comp)]) + comp + b"\x00"
        gif += b"\x3b"
        fr = decode_gif(bytes(gif))
        # frame 0 all red; before frame 1 the rect resets to background
        assert fr[0].px[1, 1].tolist() == [255, 0, 0]
        assert fr[1].px[1, 1].tolist() == [9, 9, 9]


@pytest.mark.spark
class TestSparkEndToEnd:
    def test_apply_frame_sample(self, spark):
        from benthos_spark.ops.multimodal import apply_frame_sample

        frames = _anim(10, 8, 9)
        payload = encode_gif(frames, delay_cs=3)
        df = spark.createDataFrame(
            [("v1", bytearray(payload)), ("bad", bytearray(b"not a gif"))],
            "url string, payload binary",
        )
        rows = apply_frame_sample(df, every_n=4).collect()
        good = sorted(
            (r for r in rows if r["media_id"] == "v1"),
            key=lambda r: r["frame_idx"],
        )
        assert [r["frame_idx"] for r in good] == [0, 4, 8]
        assert all(r["n_frames"] == 10 and r["delay_cs"] == 3 for r in good)
        assert all(r["width"] == 9 and r["height"] == 8 for r in good)
        # sampled frame 4 decodes (PNG) back to the composed GIF frame
        w, h, _c, px = decode_png(bytes(good[1]["frame_png"]))
        assert (w, h) == (9, 8)
        assert np.array_equal(px, GRAY[frames[4]])
        bad = [r for r in rows if r["media_id"] == "bad"]
        assert len(bad) == 1 and bad[0]["n_frames"] is None

    def test_no_shuffle_in_plan(self, spark):
        from benthos_spark.ops.multimodal import apply_frame_sample

        df = spark.createDataFrame(
            [("v", bytearray(b"x"))], "url string, payload binary"
        )
        plan = apply_frame_sample(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_frames_feed_resize_path(self, spark):
        """Video -> frames -> image-resize composition: the sampled PNG
        frames run straight through apply_resize."""
        from benthos_spark.ops.multimodal import apply_frame_sample, apply_resize

        payload = encode_gif(_anim(4, 16, 20))
        df = spark.createDataFrame(
            [("v1", bytearray(payload))], "url string, payload binary"
        )
        from pyspark.sql import functions as F

        sampled = apply_frame_sample(df, every_n=2).withColumn(
            "fid", F.concat_ws(":", "media_id", "frame_idx")
        )
        out = apply_resize(
            sampled, 10, 10, binary_col="frame_png", id_col="fid"
        ).collect()
        assert {r["media_id"] for r in out} == {"v1:0", "v1:2"}
        assert all((r["out_w"], r["out_h"]) == (10, 8) for r in out)


class TestPixelDecoderDispatch:
    def test_pixel_decoder_reports_gif_frames(self):
        from benthos_spark.formats.pngcodec import pixel_decoder

        feats = pixel_decoder(encode_gif(_anim(3, 5, 6)))
        assert feats["decoder"] == "pixels" and feats["format"] == "gif"
        assert (feats["width"], feats["height"]) == (6, 5)
        assert feats["n_frames"] == 3
