"""Pure-stdlib/numpy PNG codec (decode + minimal encode).

PNG is lossless and its compression is stdlib ``zlib``, so unlike JPEG
nothing here is approximate:

- ``decode_png``: 8- and 16-bit-depth, non-interlaced PNG — color
  types 0 (gray), 2 (RGB), 3 (palette, 8-bit only per spec), 4
  (gray+alpha), 6 (RGBA); all five scanline filters
  (None/Sub/Up/Average/Paeth — byte-wise at every depth, left offset
  = nch*sample_bytes); multiple IDAT chunks.  Returns (h, w, 3) uint8
  RGB (alpha dropped, gray replicated, 16-bit reduced via MSB).
  NOT supported (raises ValueError): depths < 8, Adam7 interlace.
- ``encode_rgb_png``: RGB, filter 0, zlib level 0 (STORED deflate
  blocks) — decode(encode(px)) == px bit-for-bit, and the payload size
  is a CLOSED FORM of (w, h): stored blocks add exactly 5 bytes per
  64 KiB chunk + 2 (zlib header) + 4 (adler32), so the driver-gate SQL
  oracle can compute ``n_bytes`` without compressing anything
  (``png_payload_size``).

reference parity: extends the multimodal charter (SURVEY.md §2.10)
alongside functions/jpeg.py; the reference repo has no media decode.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["decode_png", "encode_rgb_png", "png_payload_size"]

_SIG = b"\x89PNG\r\n\x1a\n"
# samples per pixel by color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, h: int, w: int, nch: int, sb: int = 1) -> np.ndarray:
    """Reverse per-scanline filtering -> (h, w*nch*sb) uint8.

    ``sb`` is bytes per sample (1 for 8-bit, 2 for 16-bit).  PNG
    filtering is BYTE-wise at every depth; only the left-neighbor
    offset changes: ``bpp = nch * sb`` bytes back (spec 4.5.2)."""
    stride = w * nch * sb
    bpp = nch * sb
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).copy()
        pos += stride
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ft == 0:
            out[y] = line
        elif ft == 1:  # Sub
            for x in range(stride):
                left = out[y, x - bpp] if x >= bpp else 0
                out[y, x] = (int(line[x]) + int(left)) & 0xFF
        elif ft == 2:  # Up
            out[y] = line + prev  # uint8 wraps mod 256
        elif ft == 3:  # Average
            for x in range(stride):
                left = int(out[y, x - bpp]) if x >= bpp else 0
                out[y, x] = (int(line[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = int(out[y, x - bpp]) if x >= bpp else 0
                c = int(prev[x - bpp]) if x >= bpp else 0
                out[y, x] = (int(line[x]) + _paeth(a, int(prev[x]), c)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode to (h, w, 3) uint8 RGB. See module docstring for scope."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    w = h = None
    color = depth = interlace = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(data):
        ln, typ = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # len + type + crc
        if typ == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth not in (8, 16):
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if depth == 16 and color == 3:
                # the spec only defines palette images at depths <= 8
                raise ValueError("16-bit palette PNG is not valid")
            if interlace:
                raise ValueError("Adam7 interlace not supported")
            if color not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {color}")
        elif typ == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    nch = _CHANNELS[color]
    sb = depth // 8
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (1 + w * nch * sb):
        raise ValueError("PNG pixel data size mismatch")
    px = _unfilter(raw, h, w, nch, sb)
    if sb == 2:
        # 16-bit samples are big-endian; reduce to 8-bit by the MSB
        # (= v >> 8 — the standard fast scale-down; max error vs the
        # rounded 255/65535 rescale is 1 LSB)
        px = px.reshape(h, w, nch, 2)[:, :, :, 0]
    else:
        px = px.reshape(h, w, nch)
    if color == 2:
        return px
    if color == 6:
        return px[:, :, :3]
    if color == 0:
        return np.repeat(px, 3, axis=2)
    if color == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    if palette is None:
        raise ValueError("palette image without PLTE")
    return palette[px[:, :, 0]]


def _chunk(typ: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + typ
        + body
        + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
    )


def png_payload_size(w: int, h: int) -> int:
    """Exact byte size of encode_rgb_png output — closed form: stored
    deflate blocks add 5 bytes per 65535-byte chunk, zlib wraps with a
    2-byte header and 4-byte adler32."""
    raw = h * (1 + w * 3)
    idat = raw + 5 * ((raw + 65534) // 65535) + 2 + 4
    return 8 + 25 + (12 + idat) + 12  # sig + IHDR + IDAT + IEND


def encode_rgb_png(px: np.ndarray) -> bytes:
    """Lossless RGB PNG: filter 0 scanlines, zlib level 0 (stored) —
    byte size is png_payload_size(w, h) exactly."""
    px = np.asarray(px, dtype=np.uint8)
    h, w, nch = px.shape
    if nch != 3:
        raise ValueError("encode_rgb_png expects (h, w, 3)")
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    idat = zlib.compress(raw, level=0)
    out = (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )
    assert len(out) == png_payload_size(w, h), (len(out), png_payload_size(w, h))
    return out
