"""Pure-Python baseline JPEG codec — numpy DCT, no imaging library.

Closes the last pixel-decode gap in the multimodal family (PNG/BMP/GIF
pixels were already real; JPEG — the dominant web image format — was
header-only). Implements the public specification (ITU T.81 / ISO 10918-1
baseline sequential DCT, JFIF colorspace per ITU-R BT.601):

decode: DQT (8/16-bit), DHT, SOF0, SOS, restart markers, byte unstuffing,
  per-MCU huffman decode, dequant + inverse zigzag, orthonormal 8x8
  IDCT (numpy matmul), nearest-neighbour chroma upsampling for
  sampling factors up to 2x2 (4:4:4, 4:2:2, 4:2:0), grayscale (1
  component) and YCbCr (3 components), JFIF YCbCr->RGB.
encode: baseline sequential, Annex K quantization tables scaled by the
  IJG quality formula, Annex K huffman tables, optional 4:2:0 chroma
  subsampling, grayscale or RGB input.

Scope (honest limits, raised as ValueError): no progressive (SOF2), no
arithmetic coding, no 12-bit precision, no Adobe APP14 CMYK. The huffman
decode is LUT-driven (r6: one 16-bit peek per symbol over a pre-unstuffed
stream, batched accumulator fills, one einsum IDCT per component — 5x the
old bit-by-bit walk), sized for thumbnail-scale curation batches; a native
library registered via ``ops.multimodal.set_decoder`` remains the
production path for bulk pixel work.

Reference parity note: the reference repo has no image pipeline; this
module exists for the training-data multimodal ops (SURVEY §2.10), same
role as formats/pngcodec.py.
"""

from __future__ import annotations

import struct
from functools import lru_cache
from typing import Dict, List, Tuple

import numpy as np

# Everything a malformed-but-signature-valid JPEG can raise out of
# decode_jpeg. Callers implementing NULL-passthrough catch THIS.
DECODE_ERRORS = (ValueError, struct.error, IndexError, KeyError)

# ---------------------------------------------------------------------------
# Shared constant tables (ITU T.81 Annex K — public specification)
# ---------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
# UNZIGZAG[i] = natural-order position of the i-th zigzag coefficient
UNZIGZAG = np.argsort(ZIGZAG)

_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K huffman tables: (bits[1..16] counts, symbol values)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# Orthonormal 8x8 DCT-II basis: forward = C @ X @ C.T, inverse = C.T @ X @ C
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = np.cos((2 * _x + 1) * _u * np.pi / 16) * (
            np.sqrt(1 / 8) if _u == 0 else np.sqrt(2 / 8)
        )


def _huff_codes(bits: List[int], values: List[int]) -> Dict[int, Tuple[int, int]]:
    """symbol -> (code, length), canonical assignment per T.81 C.2."""
    out: Dict[int, Tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _quality_tables(quality: int) -> Tuple[np.ndarray, np.ndarray]:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    def s(base: np.ndarray) -> np.ndarray:
        return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)
    return s(_Q_LUMA), s(_Q_CHROMA)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad(self) -> None:
        if self.nbits:
            p = 8 - self.nbits
            self.write((1 << p) - 1, p)  # pad with 1s per spec

    def raw_marker(self, m: int) -> None:
        self.pad()
        self.buf += bytes([0xFF, m])  # markers are never stuffed

    def flush(self) -> bytes:
        self.pad()
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _mag_bits(v: int, s: int) -> int:
    return v if v >= 0 else v + (1 << s) - 1


def _encode_block(
    w: _BitWriter,
    coeffs: np.ndarray,  # 64 ints in zigzag order
    dc_pred: int,
    dc_tab: Dict[int, Tuple[int, int]],
    ac_tab: Dict[int, Tuple[int, int]],
) -> int:
    diff = int(coeffs[0]) - dc_pred
    s = _category(diff)
    code, ln = dc_tab[s]
    w.write(code, ln)
    if s:
        w.write(_mag_bits(diff, s), s)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if coeffs[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(coeffs[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_tab[(run << 4) | s]
        w.write(code, ln)
        w.write(_mag_bits(v, s), s)
        run = 0
    if last_nz != 63:
        code, ln = ac_tab[0x00]  # EOB
        w.write(code, ln)
    return int(coeffs[0])


def _plane_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """plane (H,W uint8, H,W multiples of 8) -> (n_blocks_y, n_blocks_x, 64)
    quantized coefficients in zigzag order."""
    h, w = plane.shape
    x = plane.astype(np.float64) - 128.0
    x = x.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    coeffs = _C @ x @ _C.T  # batched over the two leading block axes
    qz = np.round(coeffs / q.reshape(8, 8)).astype(np.int64)
    return qz.reshape(h // 8, w // 8, 64)[:, :, ZIGZAG]


def _pad8(plane: np.ndarray, mult: int = 8) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _rgb_to_ycbcr(px: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    clip = lambda a: np.clip(np.round(a), 0, 255).astype(np.uint8)  # noqa: E731
    return clip(y), clip(cb), clip(cr)


def _dqt_segment(tid: int, q: np.ndarray) -> bytes:
    return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + bytes(
        int(q[z]) for z in ZIGZAG
    )


def _dht_segment(tc: int, th: int, table: Tuple[List[int], List[int]]) -> bytes:
    bits, values = table
    payload = bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload


def encode_jpeg(
    px: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode (H,W) grayscale or (H,W,3) RGB uint8 to baseline JFIF bytes.

    ``subsample=True`` emits 4:2:0 chroma (2x2 luma sampling factors);
    default 4:4:4 keeps the roundtrip error minimal for fixtures.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    N MCUs (T.81 E.1.4) — the resynchronization structure a parallel or
    fault-tolerant decoder keys on."""
    px = np.asarray(px)
    if px.ndim == 2:
        px = px[..., None]
    if px.ndim != 3 or px.shape[2] not in (1, 3):
        raise ValueError("expected (H,W) gray or (H,W,3) RGB uint8")
    h, w = px.shape[:2]
    if h < 1 or w < 1:
        raise ValueError("empty image")
    gray = px.shape[2] == 1
    ql, qc = _quality_tables(quality)

    if gray:
        planes = [_pad8(px[..., 0])]
        qtabs = [ql]
        samp = [(1, 1)]
    else:
        y, cb, cr = _rgb_to_ycbcr(px)
        if subsample:
            # pad luma to 16 so half-res chroma lands on a multiple of 8
            y = _pad8(y, 16)
            cb = _avg2x2(_pad8(cb, 16))
            cr = _avg2x2(_pad8(cr, 16))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            y, cb, cr = _pad8(y), _pad8(cb), _pad8(cr)
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qtabs = [ql, qc, qc]

    blocks = [_plane_blocks(p, q) for p, q in zip(planes, qtabs)]

    dc_tabs = [_huff_codes(*_DC_LUMA)] + ([] if gray else [_huff_codes(*_DC_CHROMA)] * 2)
    ac_tabs = [_huff_codes(*_AC_LUMA)] + ([] if gray else [_huff_codes(*_AC_CHROMA)] * 2)

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    writer = _BitWriter()
    preds = [0] * len(planes)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.raw_marker(0xD0 + ((mcu_count // restart_interval - 1) % 8))
                preds = [0] * len(planes)
            mcu_count += 1
            for ci, (sh, sv) in enumerate(samp):
                for by in range(sv):
                    for bx in range(sh):
                        row = my * sv + by
                        col = mx * sh + bx
                        blk = blocks[ci][row, col]
                        preds[ci] = _encode_block(
                            writer, blk, preds[ci], dc_tabs[ci], ac_tabs[ci]
                        )
    data = writer.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    out += _dqt_segment(0, ql)
    if not gray:
        out += _dqt_segment(1, qc)
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht_segment(0, 0, _DC_LUMA) + _dht_segment(1, 0, _AC_LUMA)
    if not gray:
        out += _dht_segment(0, 1, _DC_CHROMA) + _dht_segment(1, 1, _AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += data
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _avg2x2(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    a = plane.astype(np.uint16).reshape(h // 2, 2, w // 2, 2)
    return ((a.sum(axis=(1, 3)) + 2) // 4).astype(np.uint8)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _split_entropy_segments(data: bytes, pos: int) -> List[bytes]:
    """Pre-scan the scan's entropy data ONCE (r6 vectorization): unstuff
    0xFF00 and split at RSTn markers. Returns the list of restart-interval
    segments in order; the scan ends at the first 0xFF followed by any
    other marker (EOI, next SOS, ...). Moving marker/stuffing handling out
    of the per-bit hot path is what lets the reader below fill its
    accumulator 4 bytes at a time."""
    segs: List[bytes] = []
    cur = bytearray()
    d = data
    n = len(d)
    i = pos
    while i < n:
        j = d.find(b"\xff", i)
        if j < 0:
            cur += d[i:]
            break
        cur += d[i:j]
        nxt = d[j + 1] if j + 1 < n else None
        if nxt == 0x00:
            cur += b"\xff"
            i = j + 2
        elif nxt is not None and 0xD0 <= nxt <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i = j + 2
        elif nxt == 0xFF:
            # T.81 B.1.1.2 fill byte: 0xFF runs may pad before a marker
            # (the old sync_restart skipped them when hunting the RST);
            # drop ONE fill 0xFF and re-examine — data 0xFFs are always
            # stuffed as FF00, so FF FF is never entropy data
            i = j + 1
        else:
            break  # real marker: end of scan data
    segs.append(bytes(cur))
    return segs


@lru_cache(maxsize=64)
def _huff_lut(bits: Tuple[int, ...], values: Tuple[int, ...]):
    """16-bit peek LUT for one huffman table (r6 vectorization): entry i
    holds (length << 8) | symbol for the unique code that prefixes the
    16-bit window i, or 0 for invalid prefixes (no JPEG code has length 0,
    so 0 is a safe sentinel). Built with numpy slice fills, cached per
    (bits, values) across images — corpora share tables."""
    lut = np.zeros(1 << 16, dtype=np.int32)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            start = code << (16 - length)
            lut[start : start + (1 << (16 - length))] = (length << 8) | values[k]
            code += 1
            k += 1
        code <<= 1
    return lut.tolist()


class _SegReader:
    """Bit reader over ONE unstuffed restart segment: batched 32-bit
    fills, exact truncation accounting (consuming past the segment's real
    bit length raises — zero-padding only exists so peek16 can run ahead)."""

    __slots__ = ("data", "dlen", "pos", "acc", "nb", "consumed", "total")

    def __init__(self, seg: bytes) -> None:
        self.data = seg + b"\x00\x00\x00\x00"
        self.dlen = len(seg) + 4
        self.pos = 0
        self.acc = 0
        self.nb = 0
        self.consumed = 0
        self.total = 8 * len(seg)

    def _fill(self) -> None:
        p = self.pos
        self.acc = ((self.acc & ((1 << self.nb) - 1)) << 32) | int.from_bytes(
            self.data[p : p + 4], "big"
        )
        self.nb += 32
        self.pos = p + 4

    def peek16(self) -> int:
        if self.nb < 16:
            self._fill()
        return (self.acc >> (self.nb - 16)) & 0xFFFF

    def consume(self, n: int) -> None:
        self.nb -= n
        self.consumed += n
        if self.consumed > self.total:
            raise ValueError("truncated entropy stream")

    def read_bits(self, n: int) -> int:
        if self.nb < n:
            self._fill()
        v = (self.acc >> (self.nb - n)) & ((1 << n) - 1)
        self.consume(n)
        return v


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(b: bytes) -> Tuple[int, int, int, np.ndarray]:
    """Decode baseline JPEG bytes -> (width, height, channels, px uint8
    (H,W,C)). Grayscale yields C=1, YCbCr yields C=3 (RGB)."""
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    qt: Dict[int, np.ndarray] = {}
    huff: Dict[Tuple[int, int], Tuple[tuple, tuple]] = {}
    frame = None  # (h, w, comps) where comps = [(cid, sh, sv, tq)]
    restart_interval = 0
    i = 2
    n = len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:
            raise ValueError("bad marker alignment")
        # T.81 B.1.1.2: optional 0xFF fill bytes may precede any marker —
        # real-world encoders emit them, so skip runs of 0xFF before
        # reading the marker byte (r6, ADVICE fix)
        while i + 1 < n and b[i + 1] == 0xFF:
            i += 1
        marker = b[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", b[i : i + 2])
        seg = b[i + 2 : i + seglen]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                if pq == 0:
                    vals = np.frombuffer(seg[j : j + 64], dtype=np.uint8).astype(np.int64)
                    j += 64
                else:
                    vals = np.frombuffer(seg[j : j + 128], dtype=">u2").astype(np.int64)
                    j += 128
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = vals
                qt[tq] = nat
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = tuple(seg[j + 1 : j + 17])
                cnt = sum(bits)
                values = tuple(seg[j + 17 : j + 17 + cnt])
                # store the raw (bits, values): _decode_scan builds the
                # cached 16-bit LUT from them (r6 vectorization)
                huff[(tc, th)] = (bits, values)
                j += 17 + cnt
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline(-ish)
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (progressive/lossless) not supported")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = {}
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                scan[cid] = (tabs >> 4, tabs & 0x0F)
            return _decode_scan(b, i + seglen, frame, scan, qt, huff, restart_interval)
        i += seglen
    raise ValueError("no scan data found")


def _decode_scan(
    b: bytes,
    pos: int,
    frame: Tuple[int, int, list],
    scan: Dict[int, Tuple[int, int]],
    qt: Dict[int, np.ndarray],
    huff: Dict[Tuple[int, int], Tuple[tuple, tuple]],
    restart_interval: int,
) -> Tuple[int, int, int, np.ndarray]:
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2 or hmax < 1 or vmax < 1:
        raise ValueError("sampling factors beyond 2x2 not supported")
    mcus_x = (fw + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (fh + 8 * vmax - 1) // (8 * vmax)

    # r6 vectorized decode (guide §4.2 applied to the codec itself; the
    # r5 verdict's per-symbol finding): the old path walked the huffman
    # tree BIT BY BIT through a per-bit Python method + dict probe per
    # candidate length, unstuffing inline. Now the entropy stream is
    # pre-split/unstuffed once, every symbol is one 16-bit peek + one
    # cached-LUT lookup, the accumulator refills 4 bytes at a time, and
    # the per-block 2x matmul IDCT runs as ONE einsum per component over
    # all blocks at the end. Byte-identical pixels (same coefficients,
    # same arithmetic — roundtrip + high-frequency tests unchanged);
    # measured 0.14 -> 0.70 Mpx/s (5x) on the fixture corpus (scripts/jpeg_decode_bench.py).
    luts = {}
    for key, (bits, values) in huff.items():
        luts[key] = _huff_lut(bits, values)
    tabs = []
    for cid, sh, sv, tq in comps:
        dc = luts.get((0, scan[cid][0]))
        ac = luts.get((1, scan[cid][1]))
        if dc is None or ac is None:
            raise ValueError("missing huffman table")
        if qt.get(tq) is None:
            raise ValueError("missing quant table")
        tabs.append((dc, ac))

    segs = _split_entropy_segments(b, pos)
    seg_i = 0
    r = _SegReader(segs[0])
    preds = [0] * len(comps)
    # per component: flat coefficient rows + block origin lists
    coeff_rows: List[list] = [[] for _ in comps]
    origins: List[list] = [[] for _ in comps]
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                seg_i += 1
                if seg_i >= len(segs):
                    raise ValueError("missing restart marker")
                r = _SegReader(segs[seg_i])
                preds = [0] * len(comps)
            for ci, (cid, sh, sv, tq) in enumerate(comps):
                dc_lut, ac_lut = tabs[ci]
                for by in range(sv):
                    for bx in range(sh):
                        zz = [0] * 64
                        e = dc_lut[r.peek16()]
                        if e == 0:
                            raise ValueError("invalid huffman code")
                        r.consume(e >> 8)
                        s = e & 0xFF
                        diff = _extend(r.read_bits(s), s) if s else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            e = ac_lut[r.peek16()]
                            if e == 0:
                                raise ValueError("invalid huffman code")
                            r.consume(e >> 8)
                            rs = e & 0xFF
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("AC index out of range")
                            zz[k] = _extend(r.read_bits(size), size)
                            k += 1
                        coeff_rows[ci].append(zz)
                        origins[ci].append(
                            ((my * sv + by) * 8, (mx * sh + bx) * 8)
                        )
            mcu_count += 1

    planes = []
    for ci, (cid, sh, sv, tq) in enumerate(comps):
        plane = np.zeros((mcus_y * sv * 8, mcus_x * sh * 8), dtype=np.float64)
        # un-zigzag FIRST, then dequantize: q is stored in natural order
        # (DQT parse does nat[ZIGZAG] = vals), so zigzag coefficients must
        # be reordered before the multiply (r6 ADVICE fix; high-frequency
        # roundtrip test pins it) — now batched over every block at once
        zzs = np.asarray(coeff_rows[ci], dtype=np.int64)
        coeffs = (zzs[:, UNZIGZAG] * qt[comps[ci][3]]).reshape(-1, 8, 8)
        blks = np.einsum("ij,njk,kl->nil", _C.T, coeffs.astype(np.float64), _C) + 128.0
        for (y0, x0), blk in zip(origins[ci], blks):
            plane[y0 : y0 + 8, x0 : x0 + 8] = blk
        planes.append(plane)

    # upsample to full resolution and crop
    full = []
    for (cid, sh, sv, tq), plane in zip(comps, planes):
        if sh < hmax:
            plane = np.repeat(plane, hmax // sh, axis=1)
        if sv < vmax:
            plane = np.repeat(plane, vmax // sv, axis=0)
        full.append(plane[:fh, :fw])

    if len(comps) == 1:
        px = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)[..., None]
        return fw, fh, 1, px
    if len(comps) != 3:
        raise ValueError("only 1- or 3-component scans supported")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r_ = y + 1.402 * cr
    g_ = y - 0.344136 * cb - 0.714136 * cr
    b_ = y + 1.772 * cb
    px = np.stack([r_, g_, b_], axis=-1)
    px = np.clip(np.round(px), 0, 255).astype(np.uint8)
    return fw, fh, 3, px


# pixel_decoder dispatch for set_decoder lives in pngcodec.pixel_decoder
# (one adapter covers PNG/BMP/GIF/JPEG); resize reuses pngcodec.resize_nearest.
