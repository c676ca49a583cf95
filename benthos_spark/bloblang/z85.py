"""Z85 codec (public ZeroMQ RFC 32/Z85 spec) — used by the encode/decode
processors and Bloblang methods for parity with the reference's codec set
(/root/reference/lib/processor/encode.go:98-104 scheme list)."""

from __future__ import annotations

_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_DECODE = {c: i for i, c in enumerate(_ALPHABET)}


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("z85 input length must be a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            chunk.append(_ALPHABET[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("z85 input length must be a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i : i + 5]:
            if c not in _DECODE:
                raise ValueError(f"invalid z85 character {c!r}")
            v = v * 85 + _DECODE[c]
        out += v.to_bytes(4, "big")
    return bytes(out)
