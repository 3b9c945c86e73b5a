"""Minimal baseline-JFIF *encoder* — a TEST FIXTURE, not part of the
engine.  The package ships a decoder
(``operators/multimodal._decode_jpeg``); the sandbox has no PIL/ffmpeg
to produce JPEG bytes for it, so round-trip tests build them here.

The emitted stream is fully spec-legal but deliberately simple:

- one quantization table, every entry = ``quant`` (default 1 —
  near-lossless, so round-trip error is DCT+color rounding only, which
  lets tests assert tight pixel tolerances instead of vibes);
- one DC huffman table (categories 0-11, 4 bits each) and one AC table
  (all 162 legal run/size symbols, 9 bits each) shared by all
  components — canonical, Kraft-feasible, no all-ones code;
- baseline SOF0, single interleaved scan, optional 4:2:0 chroma
  subsampling (box mean) and optional restart markers.
"""

from __future__ import annotations

import struct

import numpy as np

from bitcoin_datapipeline_spark.operators.multimodal import (
    _ZIGZAG,
    _jpeg_idct_matrix,
)

_DC_VALS = list(range(12))
_AC_VALS = sorted(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_DC_BITS = bytes([0, 0, 0, 12] + [0] * 12)
_AC_BITS = bytes([0] * 8 + [162] + [0] * 7)
# canonical code assignment: codes count up in vals order within a length
_DC_CODE = {v: (4, i) for i, v in enumerate(_DC_VALS)}
_AC_CODE = {v: (9, i) for i, v in enumerate(_AC_VALS)}


class _BitWriter:
    """MSB-first bit packer with JPEG 0xFF00 byte stuffing; flush pads
    the tail with 1-bits per spec F.1.2.3."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, length, code):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.write(1, 1)

    def marker(self, m):
        self.flush()
        self.out += bytes([0xFF, m])


def _cat(v: int) -> int:
    a = abs(v)
    s = 0
    while a:
        s += 1
        a >>= 1
    return s


def _mag(v: int, s: int) -> int:
    return v if v >= 0 else v + (1 << s) - 1


def _encode_block(w: _BitWriter, zz, pred: int) -> int:
    diff = int(zz[0]) - pred
    s = _cat(diff)
    w.write(*_DC_CODE[s])
    if s:
        w.write(s, _mag(diff, s))
    nz = [k for k in range(1, 64) if zz[k]]
    last = nz[-1] if nz else 0
    run = 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            w.write(*_AC_CODE[0xF0])
            run -= 16
        s = _cat(v)
        w.write(*_AC_CODE[(run << 4) | s])
        w.write(s, _mag(v, s))
        run = 0
    if last < 63:
        w.write(*_AC_CODE[0x00])
    return int(zz[0])


def _pad_edge(plane, th, tw):
    return np.pad(
        plane,
        ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
        mode="edge",
    )


def _plane_zigzag_blocks(plane, quant, cmat):
    """plane (H,W multiples of 8) → (bh, bw, 64) quantized zigzag ints."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    x = (
        plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).astype(np.float64)
        - 128.0
    )
    coef = np.einsum("ij,abjk,kl->abil", cmat, x, cmat.T)
    q = np.round(coef / quant).astype(np.int64).reshape(bh, bw, 64)
    return q[:, :, list(_ZIGZAG)]


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def jpeg_bytes(
    pixels,
    width: int,
    height: int,
    gray: bool = False,
    subsample: bool = False,
    restart_interval: int = 0,
    quant: int = 1,
) -> bytes:
    """Encode interleaved RGB (or gray) uint8 pixels to baseline JFIF."""
    px = np.asarray(pixels, dtype=np.float64)
    if gray:
        planes = [(px.reshape(height, width), 1, 1)]
    else:
        rgb = px.reshape(height, width, 3)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128 + 0.5 * r - 0.418688 * g - 0.081312 * b
        y, cb, cr = (np.clip(np.round(p), 0, 255) for p in (y, cb, cr))
        if subsample:
            if width % 2 or height % 2:
                raise ValueError("4:2:0 fixture needs even dimensions")
            cb = np.round(
                cb.reshape(height // 2, 2, width // 2, 2).mean(axis=(1, 3))
            )
            cr = np.round(
                cr.reshape(height // 2, 2, width // 2, 2).mean(axis=(1, 3))
            )
            planes = [(y, 2, 2), (cb, 1, 1), (cr, 1, 1)]
        else:
            planes = [(y, 1, 1), (cb, 1, 1), (cr, 1, 1)]

    hmax = max(h for _, h, _ in planes)
    vmax = max(v for _, _, v in planes)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    cmat = _jpeg_idct_matrix()
    blocks = [
        _plane_zigzag_blocks(
            _pad_edge(p, mcus_y * v * 8, mcus_x * h * 8), quant, cmat
        )
        for p, h, v in planes
    ]

    w = _BitWriter()
    preds = [0] * len(planes)
    rst = 0
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            w.marker(0xD0 + (rst & 7))
            rst += 1
            preds = [0] * len(planes)
        my, mx = divmod(m, mcus_x)
        for ci, (_, h, v) in enumerate(planes):
            for by in range(v):
                for bx in range(h):
                    preds[ci] = _encode_block(
                        w, blocks[ci][my * v + by, mx * h + bx], preds[ci]
                    )
    w.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes([quant] * 64))
    out += _seg(0xC4, bytes([0x00]) + _DC_BITS + bytes(_DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + _AC_BITS + bytes(_AC_VALS))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([len(planes)])
    for ci, (_, h, v) in enumerate(planes):
        sof += bytes([ci + 1, (h << 4) | v, 0])
    out += _seg(0xC0, sof)
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
