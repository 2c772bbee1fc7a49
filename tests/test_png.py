"""PNG codec: lossless round-trip, closed-form payload size, every
scanline filter (independent reference encoder applies them), color
types, and unsupported-format guards."""

import struct
import zlib

import numpy as np
import pytest

from didtool_spark.functions.png import (
    decode_png,
    encode_rgb_png,
    png_payload_size,
)


def _chunk(typ: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + typ
        + body
        + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
    )


def _ref_encode(px: np.ndarray, color: int, filters: list[int]) -> bytes:
    """Independent reference encoder: arbitrary color type and a
    CHOSEN filter per scanline, applied per the spec (the decoder must
    reverse them all)."""
    h, w = px.shape[:2]
    nch = px.shape[2] if px.ndim == 3 else 1
    flat = px.reshape(h, w * nch).astype(np.int64)
    lines = []
    for y in range(h):
        ft = filters[y % len(filters)]
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros_like(cur)
        enc = np.zeros_like(cur)
        for x in range(w * nch):
            a = cur[x - nch] if x >= nch else 0
            b = prev[x]
            c = prev[x - nch] if x >= nch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[x] = (cur[x] - pred) % 256
        lines.append(bytes([ft]) + enc.astype(np.uint8).tobytes())
    raw = b"".join(lines)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def test_rgb_roundtrip_lossless_and_size():
    rng = np.random.RandomState(4)
    for w, h in [(1, 1), (5, 3), (22, 7), (40, 40)]:
        px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        data = encode_rgb_png(px)
        assert len(data) == png_payload_size(w, h)
        np.testing.assert_array_equal(decode_png(data), px)


def test_all_filters_roundtrip():
    rng = np.random.RandomState(9)
    px = rng.randint(0, 256, (10, 13, 3)).astype(np.uint8)
    for ft in range(5):
        np.testing.assert_array_equal(
            decode_png(_ref_encode(px, 2, [ft])), px
        )
    # mixed filters across scanlines
    np.testing.assert_array_equal(
        decode_png(_ref_encode(px, 2, [0, 1, 2, 3, 4])), px
    )


def test_gray_rgba_palette():
    rng = np.random.RandomState(2)
    g = rng.randint(0, 256, (6, 8, 1)).astype(np.uint8)
    out = decode_png(_ref_encode(g, 0, [2]))
    np.testing.assert_array_equal(out, np.repeat(g, 3, axis=2))

    rgba = rng.randint(0, 256, (6, 8, 4)).astype(np.uint8)
    out = decode_png(_ref_encode(rgba, 6, [4]))
    np.testing.assert_array_equal(out, rgba[:, :, :3])

    # palette: indices 0..15 with a random 16-entry palette
    pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.randint(0, 16, (5, 7, 1)).astype(np.uint8)
    data = _ref_encode(idx, 3, [1])
    # splice a PLTE chunk before IDAT
    i = data.find(b"IDAT") - 4
    data = data[:i] + _chunk(b"PLTE", pal.tobytes()) + data[i:]
    np.testing.assert_array_equal(decode_png(data), pal[idx[:, :, 0]])


def test_multiple_idat_chunks():
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, (4, 6, 3)).astype(np.uint8)
    full = encode_rgb_png(px)
    # split the single IDAT into two chunks
    i = full.find(b"IDAT") - 4
    ln = struct.unpack_from(">I", full, i)[0]
    body = full[i + 8 : i + 8 + ln]
    rest = full[i + 12 + ln :]
    data = full[:i] + _chunk(b"IDAT", body[:7]) + _chunk(b"IDAT", body[7:]) + rest
    np.testing.assert_array_equal(decode_png(data), px)


def test_unsupported_raises():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    data = bytearray(encode_rgb_png(px))
    i = data.find(b"IHDR") + 4
    data[i + 8] = 4  # bit depth 4 (sub-byte depths unsupported)
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bytes(data))
    data[i + 8] = 8
    data[i + 12] = 1  # Adam7
    with pytest.raises(ValueError, match="interlace"):
        decode_png(bytes(data))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\xff\xd8 not png")


def _ref_encode16(px16: np.ndarray, color: int, filters: list[int]) -> bytes:
    """Independent 16-bit reference encoder: big-endian samples,
    filters applied BYTE-wise with the spec's bpp = nch*2 left offset
    (PNG 4.5.2) — the decoder must reverse them all."""
    h, w = px16.shape[:2]
    nch = px16.shape[2] if px16.ndim == 3 else 1
    bpp = nch * 2
    rows = px16.reshape(h, w * nch).astype(">u2").view(np.uint8)
    rows = rows.reshape(h, w * nch * 2).astype(np.int64)
    lines = []
    for y in range(h):
        ft = filters[y % len(filters)]
        cur = rows[y]
        prev = rows[y - 1] if y else np.zeros_like(cur)
        enc = np.zeros_like(cur)
        for x in range(w * nch * 2):
            a = cur[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[x] = (cur[x] - pred) % 256
        lines.append(bytes([ft]) + enc.astype(np.uint8).tobytes())
    raw = b"".join(lines)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, color, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def test_16bit_rgb_all_filters():
    rng = np.random.RandomState(11)
    px16 = rng.randint(0, 65536, (7, 5, 3)).astype(np.uint16)
    data = _ref_encode16(px16, color=2, filters=[0, 1, 2, 3, 4])
    got = decode_png(data)
    np.testing.assert_array_equal(got, (px16 >> 8).astype(np.uint8))


def test_16bit_gray_and_rgba():
    rng = np.random.RandomState(12)
    g16 = rng.randint(0, 65536, (4, 6, 1)).astype(np.uint16)
    got = decode_png(_ref_encode16(g16, color=0, filters=[4, 1]))
    np.testing.assert_array_equal(
        got, np.repeat((g16 >> 8).astype(np.uint8), 3, axis=2)
    )
    rgba16 = rng.randint(0, 65536, (3, 4, 4)).astype(np.uint16)
    got = decode_png(_ref_encode16(rgba16, color=6, filters=[2, 4]))
    np.testing.assert_array_equal(
        got, (rgba16[:, :, :3] >> 8).astype(np.uint8)
    )


def test_16bit_palette_rejected():
    g16 = np.zeros((2, 2, 1), dtype=np.uint16)
    data = _ref_encode16(g16, color=3, filters=[0])
    with pytest.raises(ValueError, match="palette"):
        decode_png(data)
