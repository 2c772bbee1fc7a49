"""From-scratch video container codecs, pure stdlib + numpy.

Two real, honestly-parseable formats make the multimodal ``video``
kind real (the reference's media columns are opaque payloads +
metadata; didtool itself has no video path — this is engine-side
plumbing for the training-data pipeline tier):

- **Y4M (YUV4MPEG2)**: a plain-text header line followed by
  ``FRAME\\n`` + raw planar frames. No compression at all, so the
  decode is an exact byte parse. Supported colorspaces: ``Cmono``
  (luma plane only), ``C420``/``C420jpeg``/``C420mpeg2`` (luma +
  two quarter-size chroma planes; we return luma) and ``C444``.
- **MJPEG in AVI**: a minimal RIFF-AVI container whose ``00dc``
  chunks are baseline JPEG frames, decoded per-frame with the
  from-scratch ``functions/jpeg.py`` codec (Huffman + IDCT). The
  writer emits a fixed-layout header (RIFF -> LIST hdrl(avih,
  LIST strl(strh, strf)) -> LIST movi), so the container overhead
  is the closed-form ``AVI_FIXED_OVERHEAD`` and total payload size
  is ``AVI_FIXED_OVERHEAD + sum(8 + even(len(frame)))`` — which
  lets the driver-gate oracle recompute ``n_bytes`` in SQL.

Both decoders raise ``ValueError`` on anything outside the declared
subset; callers (operators/multimodal.py) fall back to the
documented stub in that case, never to silently-wrong output.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------------ Y4M

Y4M_MAGIC = b"YUV4MPEG2"


def encode_y4m(
    frames: np.ndarray, fps: tuple[int, int] = (25, 1), colorspace: str = "Cmono"
) -> bytes:
    """Encode luma frames ``(nf, h, w) uint8`` as YUV4MPEG2.

    ``Cmono`` writes the luma plane verbatim; ``C420`` fills both
    chroma planes with the neutral value 128 (gray). Header layout is
    fixed-order (W H F I A C) so payload length is closed-form:
    ``len(header) + nf * (6 + frame_bytes)``.
    """
    if frames.ndim != 3 or frames.dtype != np.uint8:
        raise ValueError("frames must be (nf, h, w) uint8")
    nf, h, w = frames.shape
    header = (
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 {colorspace}\n".encode()
    )
    if colorspace == "Cmono":
        chroma = b""
    elif colorspace in ("C420", "C420jpeg", "C420mpeg2"):
        chroma = bytes([128]) * ((h // 2) * (w // 2) * 2)
    elif colorspace == "C444":
        chroma = bytes([128]) * (h * w * 2)
    else:
        raise ValueError(f"unsupported colorspace {colorspace}")
    parts = [header]
    for f in range(nf):
        parts.append(b"FRAME\n")
        parts.append(frames[f].tobytes())
        parts.append(chroma)
    return b"".join(parts)


def decode_y4m(payload: bytes) -> np.ndarray:
    """Parse a YUV4MPEG2 stream -> luma frames ``(nf, h, w) uint8``.

    Chroma planes (C420*/C444) are consumed and discarded — the
    feature path pools grayscale. Frame-level parameter overrides on
    the FRAME line are rejected (out of subset).
    """
    if not payload.startswith(Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = payload.index(b"\n")
    w = h = None
    cs = "C420jpeg"  # spec default when no C tag present
    for tok in payload[len(Y4M_MAGIC):nl].split():
        t = tok.decode("ascii", "replace")
        if t[0] == "W":
            w = int(t[1:])
        elif t[0] == "H":
            h = int(t[1:])
        elif t[0] == "C":
            cs = t
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    if cs == "Cmono":
        extra = 0
    elif cs in ("C420", "C420jpeg", "C420mpeg2"):
        extra = (h // 2) * (w // 2) * 2
    elif cs == "C444":
        extra = h * w * 2
    else:
        raise ValueError(f"unsupported colorspace {cs}")
    frame_bytes = h * w + extra
    pos = nl + 1
    frames = []
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if payload[pos:pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at {pos}")
        if fnl != pos + 5:
            raise ValueError("per-frame parameter overrides unsupported")
        pos = fnl + 1
        if pos + frame_bytes > len(payload):
            raise ValueError("truncated Y4M frame")
        frames.append(
            np.frombuffer(payload, dtype=np.uint8, count=h * w, offset=pos)
            .reshape(h, w)
        )
        pos += frame_bytes
    if not frames:
        raise ValueError("Y4M stream with zero frames")
    return np.stack(frames)


# ------------------------------------------------------------ MJPEG/AVI

# RIFF(12) + LIST hdrl(12 + avih(8+56) + LIST strl(12 + strh(8+56)
# + strf(8+40))) + LIST movi header(12)
AVI_FIXED_OVERHEAD = 12 + (12 + 64 + (12 + 64 + 48)) + 12  # = 224


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def encode_mjpeg_avi(
    jpeg_frames: list[bytes], width: int, height: int, fps: int = 25
) -> bytes:
    """Wrap pre-encoded baseline-JPEG frames in a minimal RIFF-AVI.

    Layout is fixed (no idx1 index chunk — players that need seeking
    rebuild it; our decoder walks the movi list), so
    ``len(out) == AVI_FIXED_OVERHEAD + sum(8 + even(len(f)))``.
    """
    nf = len(jpeg_frames)
    max_len = max((len(f) for f in jpeg_frames), default=0)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,        # us per frame
        max_len * fps,           # max bytes/sec (advisory)
        0,                       # padding granularity
        0x10,                    # AVIF_HASINDEX off; 0x10 = was-capture-file
        nf, 0, 1, max_len,
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, fps, 0, nf, max_len, 0, 0)
        + struct.pack("<4h", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    strl = b"LIST" + struct.pack(
        "<I", 4 + len(_chunk(b"strh", strh)) + len(_chunk(b"strf", strf))
    ) + b"strl" + _chunk(b"strh", strh) + _chunk(b"strf", strf)
    hdrl_body = _chunk(b"avih", avih) + strl
    hdrl = b"LIST" + struct.pack("<I", 4 + len(hdrl_body)) + b"hdrl" + hdrl_body
    movi_body = b"".join(_chunk(b"00dc", f) for f in jpeg_frames)
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_body)) + b"movi" + movi_body
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_mjpeg_avi(payload: bytes) -> list[np.ndarray]:
    """Walk a RIFF-AVI container and decode every ``00dc``/``00db``
    video chunk with the from-scratch baseline-JPEG decoder ->
    list of ``(h, w, 3) uint8`` RGB frames."""
    from .jpeg import decode_baseline_jpeg

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF-AVI payload")

    frames: list[np.ndarray] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            fourcc = payload[pos:pos + 4]
            size = struct.unpack_from("<I", payload, pos + 4)[0]
            data_start = pos + 8
            if fourcc == b"LIST":
                walk(data_start + 4, data_start + size)
            elif fourcc in (b"00dc", b"00db") and size:
                frames.append(
                    decode_baseline_jpeg(payload[data_start:data_start + size])
                )
            pos = data_start + size + (size % 2)

    walk(12, len(payload))
    if not frames:
        raise ValueError("AVI without decodable video chunks")
    return frames
