"""Pure-Python animated-GIF codec (no external deps).

Decoder implements GIF87a/89a per the public specification (CompuServe
GIF89a spec, 1990): logical screen descriptor, global/local color tables,
graphic-control extensions (frame delay, transparency, disposal), image
descriptors with interlace, and the variable-width LSB-first LZW data
stream. Frames are COMPOSED onto the logical canvas honoring disposal
methods 0/1 (leave), 2 (restore background) and 3 (restore previous), so
``decode_gif`` returns what a viewer would show per frame — the right
input for frame sampling — not raw sub-rectangles.

Encoder emits GIF89a with a real LZW compressor (dictionary reset at 4096
codes) and is primarily the test-fixture generator for the decoder and the
``frame_sample`` kernel: this container has no image libraries, so
roundtrip + spec-vector tests are the correctness basis.

The sibling of ``formats/pngcodec.py`` in the multimodal story: GIF is the
one multi-frame format decodable with stdlib only, which makes the
video-style frame-sample path (ops/multimodal.apply_frame_sample) run
end to end against real pixels instead of a stub.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np

__all__ = ["decode_gif", "encode_gif", "GifFrame"]


class GifFrame:
    """One composed frame: ``px`` is (h, w, 3) uint8 RGB on the logical
    canvas; ``delay_cs`` the GCE delay in centiseconds (0 if absent)."""

    __slots__ = ("px", "delay_cs")

    def __init__(self, px: np.ndarray, delay_cs: int) -> None:
        self.px = px
        self.delay_cs = delay_cs


# ---------------------------------------------------------------- decode


def _lzw_decode(min_code_size: int, data: bytes, n_expected: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    # dictionary: code -> bytes; rebuilt on clear
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    prev: Optional[bytes] = None

    acc = 0
    nbits = 0
    pos = 0
    ln = len(data)
    while pos < ln or nbits >= width:
        while nbits < width and pos < ln:
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        if nbits < width:
            break
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"gif: LZW code {code} out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= n_expected:
            break
    return bytes(out[:n_expected])


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    order = [r for start, step in _INTERLACE_PASSES for r in range(start, h, step)]
    out = np.empty_like(idx)
    out[order] = idx
    return out


def decode_gif(b: bytes) -> List[GifFrame]:
    """Decode all frames of a GIF into composed RGB canvases."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    W, H, flags, bg_idx, _ar = struct.unpack("<HHBBB", b[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(b[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n

    # background color: spec says bg index into the GCT; outside any frame
    # rect the canvas starts as background
    if gct is not None and bg_idx < len(gct):
        bg_rgb = gct[bg_idx]
    else:
        bg_rgb = np.zeros(3, np.uint8)
    canvas = np.broadcast_to(bg_rgb, (H, W, 3)).copy()

    frames: List[GifFrame] = []
    delay_cs = 0
    transparent: Optional[int] = None
    disposal = 0

    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = b[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                sz = b[pos]
                gflags, delay_cs, tr = struct.unpack(
                    "<BHB", b[pos + 1 : pos + 1 + 4]
                )
                disposal = (gflags >> 2) & 0x07
                transparent = tr if gflags & 0x01 else None
                pos += 1 + sz
                if b[pos] != 0:
                    raise ValueError("gif: bad GCE terminator")
                pos += 1
            else:  # skip sub-blocks of any other extension
                while b[pos] != 0:
                    pos += 1 + b[pos]
                pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unknown block 0x{block:02x}")

        x, y, w, h, iflags = struct.unpack("<HHHHB", b[pos : pos + 9])
        pos += 9
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(b[pos : pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("gif: image without color table")
        min_code_size = b[pos]
        pos += 1
        data = bytearray()
        while b[pos] != 0:
            sz = b[pos]
            data += b[pos + 1 : pos + 1 + sz]
            pos += 1 + sz
        pos += 1

        idx = np.frombuffer(
            _lzw_decode(min_code_size, bytes(data), w * h), np.uint8
        ).reshape(h, w)
        if iflags & 0x40:
            idx = _deinterlace(idx)

        before = canvas.copy() if disposal == 3 else None
        region = canvas[y : y + h, x : x + w]
        rgb = ct[np.minimum(idx, len(ct) - 1)]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(GifFrame(canvas.copy(), delay_cs))

        if disposal == 2:
            canvas[y : y + h, x : x + w] = bg_rgb
        elif disposal == 3 and before is not None:
            canvas = before
        delay_cs = 0
        transparent = None
        disposal = 0
    return frames


# ---------------------------------------------------------------- encode


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix = b""
    for byte in indices:
        trial = prefix + bytes([byte])
        if trial in table:
            prefix = trial
            continue
        emit(table[prefix], width)
        table[trial] = next_code
        next_code += 1
        # the decoder's table append lags one emission behind (its first
        # read after a clear adds nothing), so the width bump fires when
        # next_code EXCEEDS the current range — not when it reaches it
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        prefix = bytes([byte])
    if prefix:
        emit(table[prefix], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _interlace(idx: np.ndarray) -> np.ndarray:
    order = [
        r for start, step in _INTERLACE_PASSES for r in range(start, idx.shape[0], step)
    ]
    return idx[order]


def encode_gif(
    frames: List[np.ndarray],
    palette: Optional[np.ndarray] = None,
    delay_cs: int = 4,
    interlace: bool = False,
) -> bytes:
    """Encode index-mapped frames as an animated GIF89a.

    ``frames`` are (h, w) uint8 PALETTE-INDEX arrays (all same shape);
    ``palette`` is (n<=256, 3) uint8 RGB (default 256-level grayscale).
    """
    if palette is None:
        g = np.arange(256, dtype=np.uint8)
        palette = np.stack([g, g, g], axis=1)
    n = len(palette)
    ct_bits = max(1, (n - 1).bit_length())
    ct_size = 1 << ct_bits
    h, w = frames[0].shape

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (ct_bits - 1), 0, 0)
    ct = np.zeros((ct_size, 3), np.uint8)
    ct[:n] = palette
    out += ct.tobytes()
    # netscape loop extension (loop forever) — real-world fidelity
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"

    mcs = max(2, ct_bits)
    for fr in frames:
        if fr.shape != (h, w):
            raise ValueError("gif: all frames must share the canvas shape")
        out += b"\x21\xf9" + struct.pack("<BBHBB", 4, 0x00, delay_cs, 0, 0)
        out += b"\x2c" + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
        )
        idx = _interlace(fr) if interlace else fr
        out.append(mcs)
        comp = _lzw_encode(mcs, idx.tobytes())
        for i in range(0, len(comp), 255):
            chunk = comp[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)
