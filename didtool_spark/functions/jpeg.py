"""Pure-stdlib/numpy baseline JPEG (JFIF) codec — the last multimodal
decode stub made real for the dominant image format.

Scope (documented, honest):

- ``decode_baseline_jpeg``: BASELINE (SOF0) sequential JPEG — any
  number of DQT/DHT segments, 8-bit sample precision, grayscale or
  3-component YCbCr with arbitrary sampling factors (4:4:4, 4:2:0,
  4:2:2 — chroma upsampled by pixel replication), restart markers.
  NOT supported (raises ValueError): progressive (SOF2), arithmetic
  coding, 12-bit precision, hierarchical.
- ``encode_gray_blocks_jpeg``: a deliberately tiny encoder that emits
  a grayscale baseline JPEG built from CONSTANT 8x8 blocks with an
  all-ones quantization table. A constant block has a DC-only spectrum
  (AC = 0 exactly), quantization is lossless at q=1, and the DC-only
  IDCT is value/8 with float error ~1e-13 — so decode(encode(blocks))
  reproduces every pixel EXACTLY after rounding. That makes JPEG
  payloads whose decoded content is a closed-form integer formula,
  which the driver-gate SQL oracle can replay without parsing a byte
  (plans/pipeline_queries.SQL_MEDIA_FEATURES). The payload is padded
  to a closed-form byte size after EOI (decoders stop at EOI), so
  ``n_bytes`` is oracle-computable too.

The general AC/Huffman/IDCT paths of the decoder are exercised by an
independent full encoder in tests/test_jpeg.py (random images, quant=1,
round-trip within DCT float tolerance).

reference parity: the reference repo has no media decode either; this
extends the multimodal charter (SURVEY.md §2.10) past WAV/PPM/BMP.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_baseline_jpeg", "encode_gray_blocks_jpeg", "GRAY_MOSAIC_OVERHEAD"]

# zig-zag scan order: index i of the scan -> position in the 8x8 block
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# IDCT basis: M[u, x] = c(u)/2 * cos((2x+1) u pi / 16); spatial = M.T @ F @ M
_M = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _M[_u, _x] = _c / 2.0 * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


class _HuffTable:
    """Canonical JPEG Huffman table (F.2.2.3 decode procedure)."""

    def __init__(self, bits: list[int], vals: bytes):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            n = bits[ln - 1]
            self.valptr[ln] = k
            self.mincode[ln] = code
            self.maxcode[ln] = code + n - 1 if n else -1
            code = (code + n) << 1
            k += n


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment with 0xFF00
    byte-stuffing removal; stops at any real marker and exposes it."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(d):
                self.buf = (self.buf << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.buf = ((self.buf << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self) -> None:
        """Consume the pending RSTn marker and realign to byte start."""
        self.buf = 0
        self.nbits = 0
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2  # past FF Dn
            self.marker = None

    def huff(self, t: _HuffTable) -> int:
        code = self.bit()
        for ln in range(1, 17):
            if t.maxcode[ln] >= code:
                return t.vals[t.valptr[ln] + code - t.mincode[ln]]
            code = (code << 1) | self.bit()
        raise ValueError("invalid Huffman code")


def _extend(v: int, ssss: int) -> int:
    """F.2.2.1 sign extension of an ssss-bit magnitude."""
    if ssss == 0:
        return 0
    return v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1


def _decode_block(br: _BitReader, dc_t, ac_t, qt: np.ndarray, pred: int):
    """One 8x8 block: Huffman -> dequant (zig-zag order) -> IDCT ->
    level shift. Returns (uint8-clamped block, new DC predictor)."""
    zz = np.zeros(64, dtype=np.float64)
    ssss = br.huff(dc_t)
    pred += _extend(br.bits(ssss), ssss)
    zz[0] = pred * qt[0]
    k = 1
    while k < 64:
        rs = br.huff(ac_t)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(br.bits(s), s) * qt[k]
        k += 1
    coeffs = np.zeros(64, dtype=np.float64)
    coeffs[ZIGZAG] = zz
    spatial = _M.T @ coeffs.reshape(8, 8) @ _M + 128.0
    return np.clip(np.round(spatial), 0, 255).astype(np.uint8), pred


def decode_baseline_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JFIF payload to an (h, w, 3) uint8 RGB array
    (grayscale replicated across channels). See module docstring for
    the supported subset."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    hts: dict[tuple[int, int], _HuffTable] = {}
    comps: list[dict] = []
    h = w = 0
    restart = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        m = data[pos + 1]
        if m == 0xD9:  # EOI
            raise ValueError("EOI before SOS")
        seg_len = struct.unpack_from(">H", data, pos + 2)[0]
        seg = data[pos + 4 : pos + 2 + seg_len]
        if m == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq:
                    qts[tq] = np.frombuffer(
                        seg[p : p + 128], dtype=">u2"
                    ).astype(np.float64)
                    p += 128
                else:
                    qts[tq] = np.frombuffer(
                        seg[p : p + 64], dtype=np.uint8
                    ).astype(np.float64)
                    p += 64
        elif m == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                hts[(tc, th)] = _HuffTable(bits, seg[p + 17 : p + 17 + nv])
                p += 17 + nv
        elif m == 0xC0:  # SOF0 baseline
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h, w = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF marker 0xFF{m:02X} (not baseline)")
        elif m == 0xDD:  # DRI
            restart = struct.unpack_from(">H", seg, 0)[0]
        elif m == 0xDA:  # SOS
            ns = seg[0]
            order = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                c = next(c for c in comps if c["id"] == cs)
                c["dc"] = hts[(0, tt >> 4)]
                c["ac"] = hts[(1, tt & 0x0F)]
                order.append(c)
            pos = pos + 2 + seg_len
            return _decode_scan(data, pos, order, qts, h, w, restart)
        # APPn / COM / others: skip
        pos = pos + 2 + seg_len
    raise ValueError("no SOS segment found")


def _decode_scan(data, pos, comps, qts, h, w, restart) -> np.ndarray:
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.uint8)
        )
    br = _BitReader(data, pos)
    preds = [0] * len(comps)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                br.align_restart()
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                qt = qts[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk, preds[ci] = _decode_block(
                            br, c["dc"], c["ac"], qt, preds[ci]
                        )
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk
            n_mcu += 1
    # upsample each component to full resolution by replication
    full = []
    for c, pl in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        up = pl.repeat(ry, axis=0).repeat(rx, axis=1)
        full.append(up[:h, :w].astype(np.float64))
    if len(full) == 1:
        g = full[0].astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    if len(full) != 3:
        raise ValueError(f"unsupported component count {len(full)}")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


# ----------------------------------------------------------- encoder

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

# custom canonical tables (emitted in DHT, so any conforming decoder
# reads them): DC symbols 0..11 all at code length 4; AC needs only
# EOB (0x00) here, one 1-bit code
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = bytes(range(12))
_AC_BITS = [1] + [0] * 15
_AC_VALS = bytes([0x00])

# fixed encoder overhead in bytes before the entropy-coded data:
# SOI(2) + APP0(18) + DQT(69) + SOF0(13) + DHT dc(33) + DHT ac(22) +
# SOS(10); trailer adds EOI(2)
GRAY_MOSAIC_OVERHEAD = 167


def encode_gray_blocks_jpeg(
    blocks: np.ndarray, pad_to: int | None = None
) -> bytes:
    """Grayscale baseline JPEG of shape (8*Hb, 8*Wb) built from the
    (Hb, Wb) uint8 ``blocks`` array, each entry one CONSTANT 8x8 block.
    Quantization table all ones -> DC-only spectrum survives exactly;
    decode reproduces every pixel bit-for-bit (see module docstring).
    ``pad_to`` appends zero bytes AFTER EOI up to the requested total
    size, making n_bytes a closed-form function for the SQL oracle."""
    blocks = np.asarray(blocks, dtype=np.int64)
    hb, wb = blocks.shape
    head = bytearray()
    head += b"\xff\xd8"  # SOI
    head += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    head += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # q table 0, all 1
    head += _seg(
        0xC0,
        struct.pack(">BHHB", 8, hb * 8, wb * 8, 1) + bytes([1, 0x11, 0]),
    )
    head += _seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + _DC_VALS)
    head += _seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + _AC_VALS)
    head += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    assert len(head) == GRAY_MOSAIC_OVERHEAD, len(head)

    # canonical codes: DC symbol s -> code s at 4 bits; AC EOB -> 0 @ 1
    bw = _BitWriter()
    pred = 0
    for v in blocks.ravel():
        # FDCT DC of a constant block at level-shift -128: 8*(v-128);
        # quantized at q=1 it IS the coefficient
        dc = 8 * (int(v) - 128)
        diff = dc - pred
        pred = dc
        mag = abs(diff)
        ssss = mag.bit_length()
        bw.put(ssss, 4)
        if ssss:
            bw.put(diff if diff >= 0 else diff + (1 << ssss) - 1, ssss)
        bw.put(0, 1)  # EOB
    bw.flush()
    out = bytes(head) + bytes(bw.out) + b"\xff\xd9"
    if pad_to is not None:
        if len(out) > pad_to:
            raise ValueError(f"encoded {len(out)} bytes > pad_to {pad_to}")
        out += b"\x00" * (pad_to - len(out))
    return out
