"""Pure-Python image header parsing — a REAL decode step for the
multimodal pipeline (no imaging library needed: container formats carry
dimensions in their public headers).

Formats, all from the public specifications:
- PNG  (RFC 2083 / W3C): IHDR chunk, big-endian width/height
- JPEG (ITU T.81): SOFn frame segments, big-endian height/width
- GIF  (GIF87a/89a spec): logical screen descriptor, little-endian
- BMP  (Windows BITMAPINFOHEADER): little-endian signed dims
- WEBP (RIFF container): VP8 frame tag / VP8L signature / VP8X canvas

Pixel-level decode (resize, color transforms) still requires an imaging
library and remains pluggable via ``ops.multimodal.set_decoder``; header
parsing covers the metadata extraction a curation pipeline actually
needs (dimension filters, aspect-ratio buckets, format stats).
"""

from __future__ import annotations

import struct
from typing import Optional, Tuple

# (format, width, height)
Dims = Tuple[str, int, int]


def _png(b: bytes) -> Optional[Dims]:
    if len(b) < 24 or b[:8] != b"\x89PNG\r\n\x1a\n" or b[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", b[16:24])
    return ("png", w, h)


_JPEG_NON_SOF = {0xC4, 0xC8, 0xCC}  # DHT, JPG, DAC carry no frame header


def _jpeg(b: bytes) -> Optional[Dims]:
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    i, n = 2, len(b)
    while i + 4 <= n:
        # skip fill bytes between segments
        if b[i] != 0xFF:
            return None
        while i < n and b[i] == 0xFF:
            i += 1
        if i >= n:
            return None
        marker = b[i]
        i += 1
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers, no length field
        if i + 2 > n:
            return None
        (seglen,) = struct.unpack(">H", b[i : i + 2])
        if 0xC0 <= marker <= 0xCF and marker not in _JPEG_NON_SOF:
            if i + 7 > n:
                return None
            h, w = struct.unpack(">HH", b[i + 3 : i + 7])
            return ("jpeg", w, h)
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS before any SOF
            return None
        i += seglen
    return None


def _gif(b: bytes) -> Optional[Dims]:
    if len(b) < 10 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", b[6:10])
    return ("gif", w, h)


def _bmp(b: bytes) -> Optional[Dims]:
    if len(b) < 26 or b[:2] != b"BM":
        return None
    w, h = struct.unpack("<ii", b[18:26])
    return ("bmp", abs(w), abs(h))


def _webp(b: bytes) -> Optional[Dims]:
    if len(b) < 16 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        return None
    chunk = b[12:16]
    if chunk == b"VP8 " and len(b) >= 30:
        # lossy: 3-byte frame tag, 3-byte start code, 14-bit LE dims
        p = 20
        if b[p + 3 : p + 6] != b"\x9d\x01\x2a":
            return None
        (w,) = struct.unpack("<H", b[p + 6 : p + 8])
        (h,) = struct.unpack("<H", b[p + 8 : p + 10])
        return ("webp", w & 0x3FFF, h & 0x3FFF)
    if chunk == b"VP8L" and len(b) >= 25:
        if b[20] != 0x2F:
            return None
        (bits,) = struct.unpack("<I", b[21:25])
        return ("webp", (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1)
    if chunk == b"VP8X" and len(b) >= 30:
        w = int.from_bytes(b[24:27], "little") + 1
        h = int.from_bytes(b[27:30], "little") + 1
        return ("webp", w, h)
    return None


_PARSERS = (_png, _jpeg, _gif, _bmp, _webp)


def parse_dimensions(payload: bytes) -> Optional[Dims]:
    """(format, width, height) from container headers, None if the payload
    is not a recognized image format."""
    for p in _PARSERS:
        try:
            dims = p(payload)
        except (struct.error, IndexError):
            dims = None
        if dims is not None:
            return dims
    return None
