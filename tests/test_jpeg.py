"""Baseline JPEG codec: mosaic exactness, an INDEPENDENT full encoder
(any content, all AC runs) driving the decoder's Huffman/ZRL/IDCT
paths, sampling-factor upsampling, and unsupported-format guards."""

import struct

import numpy as np
import pytest

from didtool_spark.functions.jpeg import (
    GRAY_MOSAIC_OVERHEAD,
    decode_baseline_jpeg,
    encode_gray_blocks_jpeg,
)

# ------------------------------------------------------------------
# independent reference encoder: full baseline, custom canonical
# Huffman tables (DC: 12 syms @4 bits; AC: all 162 syms @8 bits),
# quantization all ones. Written against the spec, not against the
# decoder's internals (its own DCT matrix, its own bit writer).

_DCT = np.zeros((8, 8))
for u in range(8):
    c = np.sqrt(0.5) if u == 0 else 1.0
    for x in range(8):
        _DCT[u, x] = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16)

_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


class _W:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0)
                self.acc = self.n = 0

    def flush(self):
        while self.n:
            self.put(1, 1)


def _seg(m, payload):
    return bytes([0xFF, m]) + struct.pack(">H", len(payload) + 2) + payload


def _encode_block(w, plane_block, pred, ac_code):
    f = _DCT @ (plane_block.astype(np.float64) - 128.0) @ _DCT.T
    q = np.round(f).astype(int)
    zz = [int(q.flat[_ZZ[i]]) for i in range(64)]
    diff = zz[0] - pred
    ssss = abs(diff).bit_length()
    w.put(ssss, 4)
    if ssss:
        w.put(diff if diff >= 0 else diff + (1 << ssss) - 1, ssss)
    k, run = 1, 0
    while k < 64:
        if zz[k] == 0:
            run += 1
            k += 1
            continue
        while run > 15:
            w.put(ac_code[0xF0], 8)
            run -= 16
        s = abs(zz[k]).bit_length()
        w.put(ac_code[(run << 4) | s], 8)
        v = zz[k]
        w.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
        k += 1
    if run:
        w.put(ac_code[0x00], 8)
    return zz[0]


def _encode_full(planes, samps):
    """planes: list of full-res uint8 2-D arrays (1 or 3); samps:
    [(h, v), ...]. Components are stored as-is (the decoder treats 3
    components as YCbCr; tests compare against the same conversion)."""
    hmax = max(h for h, _ in samps)
    vmax = max(v for _, v in samps)
    H, W_ = planes[0].shape
    dc_code = {s: s for s in range(12)}
    ac_code = {s: i for i, s in enumerate(_AC_SYMS)}
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes([1] * 64))
    comp_spec = b"".join(
        bytes([i + 1, (h << 4) | v, 0]) for i, (h, v) in enumerate(samps)
    )
    out += _seg(0xC0, struct.pack(">BHHB", 8, H, W_, len(planes)) + comp_spec)
    dc_bits = [0, 0, 0, 12] + [0] * 12
    out += _seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(range(12)))
    ac_bits = [0] * 16
    ac_bits[7] = len(_AC_SYMS)
    out += _seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(_AC_SYMS))
    out += _seg(
        0xDA,
        bytes([len(planes)])
        + b"".join(bytes([i + 1, 0x00]) for i in range(len(planes)))
        + bytes([0, 63, 0]),
    )
    # subsample each plane by averaging (only exact-ratio tests used)
    sub = []
    for pl, (h, v) in zip(planes, samps):
        ry, rx = vmax // v, hmax // h
        ph, pw = pl.shape
        sub.append(pl[::ry, ::rx])  # decimation (tests use constant areas)
    mcux = (W_ + 8 * hmax - 1) // (8 * hmax)
    mcuy = (H + 8 * vmax - 1) // (8 * vmax)
    w = _W()
    preds = [0] * len(planes)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (pl, (sh, sv)) in enumerate(zip(sub, samps)):
                for by in range(sv):
                    for bx in range(sh):
                        y0, x0 = (my * sv + by) * 8, (mx * sh + bx) * 8
                        blk = np.zeros((8, 8), dtype=np.uint8)
                        src = pl[y0 : y0 + 8, x0 : x0 + 8]
                        blk[: src.shape[0], : src.shape[1]] = src
                        # edge replicate padding
                        if src.shape[0] < 8:
                            blk[src.shape[0] :, :] = blk[src.shape[0] - 1, :]
                        if src.shape[1] < 8:
                            blk[:, src.shape[1] :] = blk[:, src.shape[1] - 1][:, None]
                        preds[ci] = _encode_block(w, blk, preds[ci], ac_code)
    w.flush()
    return bytes(out) + bytes(w.out) + b"\xff\xd9", dc_code


def test_mosaic_roundtrip_exact():
    rng = np.random.RandomState(3)
    for _ in range(6):
        hb, wb = rng.randint(1, 5), rng.randint(1, 6)
        blocks = rng.randint(0, 256, (hb, wb)).astype(np.uint8)
        pad = GRAY_MOSAIC_OVERHEAD + 4 * hb * wb + 8
        data = encode_gray_blocks_jpeg(blocks, pad_to=pad)
        assert len(data) == pad
        img = decode_baseline_jpeg(data)
        want = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
        assert img.shape == (hb * 8, wb * 8, 3)
        np.testing.assert_array_equal(img[:, :, 0], want)
        np.testing.assert_array_equal(img[:, :, 1], img[:, :, 0])


def test_full_gray_roundtrip_close():
    """Independent encoder, arbitrary content, quant=1: decode must
    reproduce the plane within DCT float rounding (the AC Huffman,
    ZRL and IDCT paths all fire)."""
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (24, 40)).astype(np.uint8)
    data, _ = _encode_full([img], [(1, 1)])
    out = decode_baseline_jpeg(data)
    assert out.shape == (24, 40, 3)
    assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 2


def test_full_gray_smooth_and_sparse():
    """Smooth gradient (long zero runs -> EOB) and a single-hot-pixel
    image (ZRL chains)."""
    grad = np.tile(np.arange(32, dtype=np.uint8) * 8, (16, 1))
    data, _ = _encode_full([grad], [(1, 1)])
    out = decode_baseline_jpeg(data)
    assert np.abs(out[:, :, 0].astype(int) - grad.astype(int)).max() <= 2

    hot = np.full((8, 8), 7, dtype=np.uint8)
    hot[7, 7] = 255
    data, _ = _encode_full([hot], [(1, 1)])
    out = decode_baseline_jpeg(data)
    assert np.abs(out[:, :, 0].astype(int) - hot.astype(int)).max() <= 2


def test_color_444_roundtrip():
    """3-component 4:4:4: planes survive within tolerance; RGB output
    matches the JFIF YCbCr conversion of the stored planes."""
    rng = np.random.RandomState(5)
    y = rng.randint(30, 220, (16, 16)).astype(np.uint8)
    cb = rng.randint(30, 220, (16, 16)).astype(np.uint8)
    cr = rng.randint(30, 220, (16, 16)).astype(np.uint8)
    data, _ = _encode_full([y, cb, cr], [(1, 1), (1, 1), (1, 1)])
    out = decode_baseline_jpeg(data).astype(np.float64)
    yf, cbf, crf = y.astype(np.float64), cb.astype(np.float64), cr.astype(np.float64)
    want = np.stack(
        [
            yf + 1.402 * (crf - 128),
            yf - 0.344136 * (cbf - 128) - 0.714136 * (crf - 128),
            yf + 1.772 * (cbf - 128),
        ],
        axis=-1,
    )
    want = np.clip(np.round(want), 0, 255)
    assert np.abs(out - want).max() <= 4  # DCT rounding through conversion


def test_color_420_constant_exact():
    """4:2:0 chroma subsampling: a constant-color image decodes exactly
    (decimation and replication are lossless on constants)."""
    y = np.full((16, 16), 120, dtype=np.uint8)
    cb = np.full((16, 16), 80, dtype=np.uint8)
    cr = np.full((16, 16), 190, dtype=np.uint8)
    data, _ = _encode_full([y, cb, cr], [(2, 2), (1, 1), (1, 1)])
    out = decode_baseline_jpeg(data)
    r = np.clip(round(120 + 1.402 * (190 - 128)), 0, 255)
    b = np.clip(round(120 + 1.772 * (80 - 128)), 0, 255)
    assert (out[:, :, 0] == r).all()
    assert (out[:, :, 2] == b).all()


def test_unsupported_progressive_raises():
    blocks = np.array([[100]], dtype=np.uint8)
    data = bytearray(encode_gray_blocks_jpeg(blocks))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="not baseline"):
        decode_baseline_jpeg(bytes(data))


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError, match="SOI"):
        decode_baseline_jpeg(b"P6 1 1 255 abc")
