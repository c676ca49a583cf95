"""Pure-Python BMP pixel codec (stdlib struct + numpy — no new deps).

Decodes the Windows bitmap format per the public file-format spec:
BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER (>= 40 bytes), BI_RGB
(uncompressed) at 8 bpp (paletted), 24 bpp and 32 bpp. Rows are 4-byte
aligned; positive biHeight means bottom-up storage, negative top-down.
Pixels come back RGB uint8 — the same array convention as
``formats/pngcodec.decode_png`` — so BMP payloads feed the existing
resize / re-encode path unchanged.

Like the PNG codec, this backs the honest pixel path of
``ops/multimodal`` (the reference engine treats media as opaque bytes —
lib/processor has no image stage — so the pixel layer is graft-native;
``formats/imagemeta.py`` remains the header-only default decoder).
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np

# everything a malformed-but-"BM"-prefixed payload can raise out of
# decode_bmp; callers implementing NULL-passthrough catch THIS
DECODE_ERRORS = (ValueError, struct.error, IndexError)

_BI_RGB = 0


def decode_bmp(b: bytes) -> Tuple[int, int, int, np.ndarray]:
    """Decode BI_RGB BMP bytes -> ``(width, height, channels, pixels)``
    with pixels a ``(h, w, 3)`` uint8 RGB array (top row first)."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP (missing BM signature)")
    if len(b) < 54:
        raise ValueError("truncated BMP header")
    (data_off,) = struct.unpack_from("<I", b, 10)
    (hdr_size,) = struct.unpack_from("<I", b, 14)
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER (OS/2) not supported")
    w, h = struct.unpack_from("<ii", b, 18)
    _planes, bpp = struct.unpack_from("<HH", b, 26)
    (comp,) = struct.unpack_from("<I", b, 30)
    if comp != _BI_RGB:
        raise ValueError(f"BMP compression {comp} not supported (BI_RGB only)")
    if bpp not in (8, 24, 32):
        raise ValueError(f"BMP bit depth {bpp} not supported")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0 or w > 1 << 20 or h > 1 << 20:
        raise ValueError(f"bad BMP dimensions {w}x{h}")

    if bpp == 8:
        (used,) = struct.unpack_from("<I", b, 46)
        used = used or 256
        pal_off = 14 + hdr_size
        # palette entries are BGRX quads
        pal = (
            np.frombuffer(b, np.uint8, used * 4, pal_off)
            .reshape(used, 4)[:, [2, 1, 0]]
            .copy()
        )

    stride = ((w * bpp // 8) + 3) & ~3
    raw = np.frombuffer(b, np.uint8, stride * h, data_off).reshape(h, stride)
    if bpp == 24:
        px = raw[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    elif bpp == 32:
        px = raw[:, : w * 4].reshape(h, w, 4)[:, :, [2, 1, 0]]  # BGRX -> RGB
    else:
        idx = raw[:, :w]
        if int(idx.max()) >= len(pal):
            raise IndexError("BMP palette index out of range")
        px = pal[idx]
    if not top_down:
        px = px[::-1]
    return w, h, 3, np.ascontiguousarray(px)


def encode_bmp(px: np.ndarray) -> bytes:
    """Encode a ``(h, w, 3)`` uint8 RGB array as a bottom-up 24 bpp
    BI_RGB BMP — the test/roundtrip twin of :func:`decode_bmp`."""
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_bmp needs a (h, w, 3) RGB array")
    h, w = px.shape[:2]
    stride = ((w * 3) + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # RGB -> BGR, bottom-up
    body = rows.tobytes()
    data_off = 14 + 40
    file_hdr = struct.pack("<2sIHHI", b"BM", data_off + len(body), 0, 0, data_off)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, _BI_RGB, len(body), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + body
