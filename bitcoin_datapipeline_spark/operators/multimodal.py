"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB multimodal pipeline treats image/audio/video as `binary` columns
with a metadata struct, partitions by (modality, shard), and runs decode /
feature-extract as Arrow-batched Pandas functions over ``mapInPandas``.
This module implements that plumbing for real — schema, batch iteration,
deterministic partitioning — with the media decode split by what this
container can actually run: wav (audio) decodes for REAL via the stdlib
``wave`` module, and ppm/pgm, png, and baseline jpeg (image) via stdlib
parsers (binary netpbm; zlib inflate + PNG scanline filters; huffman +
numpy IDCT) — ``fake=False`` parses the container and computes
statistics over the decoded PCM samples / raster pixels, end-to-end
through the Arrow batches, so BOTH modalities prove the plumbing
carries real decoder output; formats genuinely needing PIL/ffmpeg
(gif, video) raise ``NotImplementedError`` from `decode_stub` unless
the deterministic fake decoder is selected, which computes byte-level
statistics standing in for pixel/sample features.

The driver's `documents` table provides the payload bytes (text encoded to
binary) — the plumbing is identical for real media bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FORMATS = ("png", "jpeg", "wav")

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_min", T.IntegerType()),
        T.StructField("byte_max", T.IntegerType()),
    ]
)


def media_table(documents: DataFrame) -> DataFrame:
    """documents → multimodal layout: binary payload + metadata struct.
    Format assignment is deterministic (doc_id % 3)."""
    fmt = F.element_at(
        F.array(*[F.lit(f) for f in FORMATS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    payload = F.col("text").cast("binary")
    return documents.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            fmt.alias("format"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.col("source").alias("origin"),
        ).alias("media_meta"),
    )


def media_meta(documents: DataFrame) -> DataFrame:
    """Flat metadata projection (oracle-checkable — no Python involved)."""
    m = media_table(documents)
    return m.select(
        "doc_id",
        F.col("media_meta.format").alias("format"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.origin").alias("origin"),
    )


MEDIA_META_ORACLE = """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END AS format,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       source AS origin
FROM documents"""


def _decode_wav(payload: bytes):
    """REAL codec path for the one format the sandbox can decode with the
    stdlib: parse the RIFF/WAVE container with ``wave`` and return the
    decoded PCM sample bytes as a uint8 array — container headers
    stripped, exactly what a soundfile-style decoder hands downstream.
    Raises ``wave.Error`` on a malformed container (a real decode
    failure, deliberately not swallowed)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
        frames = w.readframes(w.getnframes())
    return np.frombuffer(frames, dtype=np.uint8)


def _decode_ppm(payload: bytes):
    """REAL codec path for a stdlib-decodable IMAGE format: binary netpbm
    (P5 grayscale / P6 RGB).  Parses the header per the netpbm spec —
    whitespace-separated tokens, ``#`` comments legal between any of
    them — and returns the raster pixel bytes as a uint8 array, header
    stripped: exactly what a PIL-style decoder hands downstream.  Raises
    ``ValueError`` on a malformed container (bad magic, non-numeric or
    missing dimensions, >8-bit maxval, truncated raster) — a real decode
    failure, deliberately not swallowed, mirroring _decode_wav."""
    import numpy as np

    data = bytes(payload)

    def _tokens():
        # header tokenizer: netpbm whitespace rules with # comments;
        # yields (token, end_offset) so the raster start is known
        i = 0
        while i < len(data):
            c = data[i:i + 1]
            if c.isspace():
                i += 1
            elif c == b"#":
                while i < len(data) and data[i:i + 1] not in (b"\n", b"\r"):
                    i += 1
            else:
                j = i
                while j < len(data) and not data[j:j + 1].isspace():
                    j += 1
                yield data[i:j], j
                i = j

    toks = _tokens()
    try:
        magic, _ = next(toks)
        if magic not in (b"P5", b"P6"):
            raise ValueError(f"not a binary netpbm payload: magic {magic!r}")
        (w_tok, _), (h_tok, _), (max_tok, end) = (
            next(toks), next(toks), next(toks)
        )
        width, height, maxval = int(w_tok), int(h_tok), int(max_tok)
    except StopIteration:
        raise ValueError("truncated netpbm header") from None
    if width <= 0 or height <= 0:
        raise ValueError(f"bad netpbm dimensions {width}x{height}")
    if not 0 < maxval < 256:
        raise ValueError(f"unsupported netpbm maxval {maxval} (8-bit only)")
    channels = 3 if magic == b"P6" else 1
    n = width * height * channels
    # the spec mandates a single whitespace byte between maxval and the
    # raster, but real writers emit CRLF or a trailing comment line; the
    # separator is consumed tolerantly WITHOUT ever eating raster bytes:
    # whitespace/comments are skipped only while the remaining payload is
    # still LONGER than the raster, so a raster whose first byte happens
    # to be whitespace-valued is untouched once the length lines up, and
    # non-separator surplus bytes are rejected instead of shifting the
    # raster start silently off-by-one.
    if end >= len(data) or not data[end:end + 1].isspace():
        raise ValueError("netpbm maxval not followed by whitespace")
    start = end + 1
    while len(data) - start > n:
        c = data[start:start + 1]
        if c.isspace():
            start += 1
        elif c == b"#":
            while start < len(data) and data[start:start + 1] not in (
                b"\n", b"\r"
            ):
                start += 1
        else:
            raise ValueError(
                f"netpbm payload has {len(data) - start - n} trailing "
                "bytes after the raster"
            )
    raster = data[start:start + n]
    if len(raster) != n:
        raise ValueError(
            f"truncated netpbm raster: want {n} bytes, have {len(raster)}"
        )
    return np.frombuffer(raster, dtype=np.uint8)


def _png_unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytes:
    """Invert the PNG per-scanline filters (spec §9: None/Sub/Up/Average/
    Paeth).  Each scanline is one filter-type byte + width*bpp filtered
    bytes; Sub/Average/Paeth have an in-row sequential dependency, so this
    is a bytearray loop — fine, because decode work is per-item inside an
    Arrow batch, parallelism comes from the partitioning above it."""
    stride = width * bpp
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"truncated png image data: want {(stride + 1) * height} "
            f"filtered bytes, have {len(raw)}"
        )
    out = bytearray(stride * height)
    prev_off = -stride
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1: (y + 1) * (stride + 1)]
        off = y * stride
        if f == 0:  # None
            out[off:off + stride] = line
        elif f == 1:  # Sub
            for x in range(stride):
                a = out[off + x - bpp] if x >= bpp else 0
                out[off + x] = (line[x] + a) & 0xFF
        elif f == 2:  # Up
            for x in range(stride):
                b = out[prev_off + x] if y > 0 else 0
                out[off + x] = (line[x] + b) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                a = out[off + x - bpp] if x >= bpp else 0
                b = out[prev_off + x] if y > 0 else 0
                out[off + x] = (line[x] + (a + b) // 2) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = out[off + x - bpp] if x >= bpp else 0
                b = out[prev_off + x] if y > 0 else 0
                c = out[prev_off + x - bpp] if (y > 0 and x >= bpp) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                out[off + x] = (line[x] + pr) & 0xFF
        else:
            raise ValueError(f"unknown png filter type {f} on row {y}")
        prev_off = off
    return bytes(out)


_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples/pixel


def _decode_png(payload: bytes):
    """REAL codec path for PNG — stdlib only (``zlib`` + ``struct``), no
    PIL: parse the chunk stream, inflate the concatenated IDAT data, and
    invert the scanline filters (including Paeth) per the PNG spec.
    Supports the dominant on-disk shape — bit depth 8, non-interlaced,
    color types greyscale/RGB/grey+alpha/RGBA — and returns the
    reconstructed pixel bytes as a uint8 array, exactly what
    ``PIL.Image.tobytes()`` hands downstream.  Palette (type 3), 16-bit,
    and Adam7-interlaced images raise ``ValueError`` (a real decode
    limitation surfaced, not swallowed); per-chunk CRCs are verified so
    corruption fails loudly, mirroring _decode_wav/_decode_ppm."""
    import struct
    import zlib

    import numpy as np

    data = bytes(payload)
    sig = b"\x89PNG\r\n\x1a\n"
    if data[:8] != sig:
        raise ValueError("not a png payload: bad signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    seen_iend = False
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated png chunk header")
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise ValueError(f"truncated png chunk {ctype!r}")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length:pos + 12 + length]
        )
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"png chunk {ctype!r} crc mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            seen_iend = True
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("png missing IHDR chunk")
    if not seen_iend:
        raise ValueError("png missing IEND chunk")
    width, height, depth, ctype_, comp, filt, interlace = ihdr
    if width <= 0 or height <= 0:
        raise ValueError(f"bad png dimensions {width}x{height}")
    if depth != 8:
        raise ValueError(f"unsupported png bit depth {depth} (8-bit only)")
    if ctype_ not in _PNG_CHANNELS:
        raise ValueError(
            f"unsupported png color type {ctype_} "
            f"(supported: {sorted(_PNG_CHANNELS)}; palette needs PLTE "
            "expansion)"
        )
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard png compression/filter method")
    if interlace != 0:
        raise ValueError("Adam7-interlaced png unsupported")
    if not idat:
        raise ValueError("png missing IDAT data")
    raw = zlib.decompress(bytes(idat))
    pixels = _png_unfilter(raw, width, height, _PNG_CHANNELS[ctype_])
    return np.frombuffer(pixels, dtype=np.uint8)


# ---------------------------------------------------------------- jpeg
# Baseline JFIF decoder — stdlib ``struct`` + numpy only, no PIL/ffmpeg.
# Covers the dominant on-disk shape: baseline sequential DCT (SOF0, plus
# SOF1 extended-sequential which shares the huffman entropy coding),
# 8-bit precision, interleaved single scan, grayscale or 3-component
# YCbCr with any legal sampling factors (4:4:4 / 4:2:2 / 4:2:0 ...),
# restart markers honored.  Progressive (SOF2), arithmetic coding,
# 12-bit, and non-interleaved multi-scan files raise ``ValueError`` — a
# real decode limitation surfaced, not swallowed, mirroring _decode_png.

_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
)


def _jpeg_huff_lut(bits, vals):
    """Canonical JPEG huffman table (spec Annex C): codes of length L are
    assigned in `vals` order, counting up, left-shifted when advancing to
    length L+1.  Returns {(length, code): value} — the decoder extends
    its code one bit at a time and probes this map."""
    lut = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if k >= len(vals):
                raise ValueError("jpeg DHT counts exceed value list")
            lut[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    if k != len(vals):
        raise ValueError("jpeg DHT value list exceeds counts")
    return lut


class _JpegBitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    byte-unstuffing; restart markers are consumed only at the explicit
    `restart()` boundary the MCU loop drives."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.n = 0

    def read_bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated jpeg entropy-coded segment")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated jpeg byte stuffing")
                m = self.data[self.pos]
                if m == 0x00:
                    self.pos += 1  # stuffed literal 0xFF
                else:
                    raise ValueError(
                        f"unexpected marker 0xFF{m:02X} inside jpeg "
                        "entropy-coded segment"
                    )
            self.buf = b
            self.n = 8
        self.n -= 1
        return (self.buf >> self.n) & 1

    def restart(self, idx: int) -> None:
        """Byte-align and consume the expected RSTn marker (n cycles
        mod 8); the caller resets the DC predictors."""
        self.n = 0
        if (
            self.pos + 2 > len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + (idx & 7)
        ):
            raise ValueError(
                f"jpeg restart marker RST{idx & 7} missing at "
                f"offset {self.pos}"
            )
        self.pos += 2


def _jpeg_huff_decode(reader: _JpegBitReader, lut) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        v = lut.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid huffman code in jpeg entropy stream")


def _jpeg_receive_extend(reader: _JpegBitReader, s: int) -> int:
    """RECEIVE + EXTEND (spec F.2.2.1): read an s-bit magnitude and map
    the low half of each category to the negative range."""
    if s == 0:
        return 0
    v = 0
    for _ in range(s):
        v = (v << 1) | reader.read_bit()
    if v < (1 << (s - 1)):
        v -= (1 << s) - 1
    return v


def _jpeg_idct_matrix():
    """8-point DCT-II basis C with C[k,n] = a(k)·cos((2n+1)kπ/16); the
    2-D inverse of coefficient block X is Cᵀ·X·C."""
    import numpy as np

    n = np.arange(8)
    k = n.reshape(8, 1)
    c = np.cos((2 * n + 1) * k * np.pi / 16)
    c[0] *= np.sqrt(0.5)
    return c * 0.5


def _jpeg_scan(data, pos, frame, scan_comps, qt, huff, restart_interval):
    """Decode the single interleaved baseline scan: per-MCU huffman →
    per-component coefficient grids (kept in zigzag order), then
    vectorized dezigzag / dequant / IDCT / plane assembly in numpy —
    only the serial entropy decode walks Python bytecode, and decode
    work is per-item inside an Arrow batch, so parallelism comes from
    the partitioning above it (same stance as _png_unfilter)."""
    import numpy as np

    width, height, comps = frame
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scan_comps:
        c = by_id.get(cs)
        if c is None:
            raise ValueError(f"jpeg scan references unknown component {cs}")
        dc = huff.get((0, td))
        ac = huff.get((1, ta))
        if dc is None or ac is None:
            raise ValueError(
                f"jpeg scan needs huffman tables DC{td}/AC{ta} "
                "that were never defined"
            )
        if c["tq"] not in qt:
            raise ValueError(f"jpeg component quant table {c['tq']} missing")
        order.append((c, dc, ac))
    if len(order) != len(comps):
        raise ValueError(
            "non-interleaved multi-scan jpeg unsupported (baseline "
            "single interleaved scan only)"
        )
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    coefs = {
        c["id"]: np.zeros(
            (mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32
        )
        for c in comps
    }
    reader = _JpegBitReader(data, pos)
    preds = {c["id"]: 0 for c in comps}
    rst = 0
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            reader.restart(rst)
            rst += 1
            preds = {c["id"]: 0 for c in comps}
        my, mx = divmod(m, mcus_x)
        for c, dc_lut, ac_lut in order:
            grid = coefs[c["id"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    blk = grid[my * c["v"] + by, mx * c["h"] + bx]
                    s = _jpeg_huff_decode(reader, dc_lut)
                    if s > 11:
                        raise ValueError(f"jpeg DC category {s} out of range")
                    preds[c["id"]] += _jpeg_receive_extend(reader, s)
                    blk[0] = preds[c["id"]]
                    k = 1
                    while k < 64:
                        rs = _jpeg_huff_decode(reader, ac_lut)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:  # ZRL: sixteen zeros
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError(
                                "jpeg AC run overflows the 8x8 block"
                            )
                        blk[k] = _jpeg_receive_extend(reader, s)
                        k += 1
    # entropy segment ends here: byte-align, then expect EOI (optional
    # 0xFF fill bytes are legal before any marker)
    end = reader.pos
    while end < len(data) and data[end] == 0xFF and \
            data[end + 1:end + 2] == b"\xff":
        end += 1
    if data[end:end + 2] != b"\xff\xd9":
        raise ValueError("jpeg missing EOI after scan data")

    cmat = _jpeg_idct_matrix()
    dezig = np.empty(64, dtype=np.int64)
    dezig[list(_ZIGZAG)] = np.arange(64)
    planes = []
    for c in comps:
        zz = coefs[c["id"]]
        nat = zz[:, :, dezig] * qt[c["tq"]][np.newaxis, np.newaxis, :]
        blocks = nat.reshape(zz.shape[0], zz.shape[1], 8, 8)
        pix = np.einsum("ij,abjk,kl->abil", cmat.T, blocks, cmat)
        plane = (
            pix.transpose(0, 2, 1, 3)
            .reshape(zz.shape[0] * 8, zz.shape[1] * 8)
        )
        plane = np.clip(np.round(plane) + 128, 0, 255)
        plane = np.repeat(plane, vmax // c["v"], axis=0)
        plane = np.repeat(plane, hmax // c["h"], axis=1)
        planes.append(plane[:height, :width])
    if len(planes) == 1:
        return planes[0].astype(np.uint8).reshape(-1)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8).reshape(-1)


def _decode_jpeg(payload: bytes):
    """REAL codec path for baseline JPEG — stdlib ``struct`` + numpy, no
    PIL/ffmpeg: parse the marker stream (DQT / DHT / SOF0-1 / DRI / SOS),
    huffman-decode the interleaved entropy-coded scan, dequantize,
    inverse-DCT each 8x8 block, upsample subsampled chroma by
    replication, and convert JFIF YCbCr→RGB.  Returns the reconstructed
    interleaved pixel bytes as a uint8 array (RGB for 3-component, gray
    for 1-component) — exactly what ``PIL.Image.tobytes()`` hands
    downstream.  Progressive / arithmetic / 12-bit / hierarchical files
    raise ``ValueError``, as do truncated or corrupt streams."""
    import struct

    data = bytes(payload)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a jpeg payload: bad SOI marker")
    pos = 2
    qt = {}
    huff = {}
    frame = None
    restart_interval = 0
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected jpeg marker at offset {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xFF:  # fill byte: resync on the next 0xFF
            pos -= 1
            continue
        if marker in (0x01, 0xD8):  # TEM / stray SOI: no segment body
            continue
        if 0xD0 <= marker <= 0xD7:
            raise ValueError("jpeg restart marker outside a scan")
        if marker == 0xD9:
            break
        if pos + 2 > len(data):
            raise ValueError("truncated jpeg segment header")
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        if seglen < 2 or pos + seglen > len(data):
            raise ValueError("truncated jpeg segment body")
        seg = data[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT: one or more tables per segment
            import numpy as np

            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq != 0:
                    raise ValueError("16-bit jpeg quant tables unsupported")
                if i + 64 > len(seg):
                    raise ValueError("truncated jpeg DQT table")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[list(_ZIGZAG)] = np.frombuffer(
                    seg[i:i + 64], dtype=np.uint8
                )
                qt[tq] = tbl
                i += 64
        elif marker == 0xC4:  # DHT: one or more tables per segment
            i = 0
            while i < len(seg):
                if i + 17 > len(seg):
                    raise ValueError("truncated jpeg DHT header")
                tc, th = seg[i] >> 4, seg[i] & 0xF
                if tc > 1:
                    raise ValueError(f"jpeg huffman table class {tc} invalid")
                bits = seg[i + 1:i + 17]
                i += 17
                nv = sum(bits)
                if i + nv > len(seg):
                    raise ValueError("truncated jpeg DHT values")
                huff[(tc, th)] = _jpeg_huff_lut(bits, seg[i:i + nv])
                i += nv
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext-sequential
            if len(seg) < 6 or len(seg) < 6 + 3 * seg[5]:
                raise ValueError("truncated jpeg SOF segment")
            prec = seg[0]
            (h,) = struct.unpack(">H", seg[1:3])
            (w,) = struct.unpack(">H", seg[3:5])
            if prec != 8:
                raise ValueError(
                    f"unsupported jpeg precision {prec} (8-bit only)"
                )
            if w <= 0 or h <= 0:
                raise ValueError(f"bad jpeg dimensions {w}x{h}")
            comps = []
            for ci in range(seg[5]):
                hv = seg[7 + 3 * ci]
                comps.append(
                    {
                        "id": seg[6 + 3 * ci],
                        "h": hv >> 4,
                        "v": hv & 0xF,
                        "tq": seg[8 + 3 * ci],
                    }
                )
            if len(comps) not in (1, 3):
                raise ValueError(
                    f"unsupported jpeg component count {len(comps)} "
                    "(grayscale or YCbCr only)"
                )
            for c in comps:
                if not (1 <= c["h"] <= 4 and 1 <= c["v"] <= 4):
                    raise ValueError("jpeg sampling factors out of range")
            frame = (w, h, comps)
        elif marker == 0xC2:
            raise ValueError(
                "progressive jpeg unsupported (baseline sequential only)"
            )
        elif marker in (
            0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF
        ):
            raise ValueError(
                f"unsupported jpeg frame type 0xFF{marker:02X} "
                "(baseline huffman sequential only)"
            )
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("truncated jpeg DRI segment")
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — decode and return
            if frame is None:
                raise ValueError("jpeg SOS before SOF")
            ns = seg[0] if seg else 0
            if len(seg) < 1 + 2 * ns:
                raise ValueError("truncated jpeg SOS header")
            scan_comps = [
                (seg[1 + 2 * c], seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 0xF)
                for c in range(ns)
            ]
            return _jpeg_scan(
                data, pos, frame, scan_comps, qt, huff, restart_interval
            )
        # APPn / COM / other tolerated segments: skipped
    raise ValueError("jpeg missing SOS scan")


# formats with a working real decoder in this container — wav (audio,
# stdlib wave), ppm/pgm (image, stdlib netpbm parser), png (stdlib
# zlib inflate + spec filters) and baseline jpeg (stdlib huffman +
# numpy IDCT) all prove the Arrow path carries real decoder output;
# formats that genuinely need PIL/ffmpeg (e.g. gif, mp4) stay behind
# the NotImplementedError guard
_REAL_DECODERS = {
    "wav": _decode_wav,
    "ppm": _decode_ppm,
    "pgm": _decode_ppm,
    "png": _decode_png,
    "jpeg": _decode_jpeg,
}


def decode_stub(payload: bytes, fmt: str, fake: bool = True) -> dict:
    """Per-item media decode.  ``fake=False`` runs a REAL decoder where
    the sandbox has one (``_REAL_DECODERS``: wav via the stdlib ``wave``
    module, netpbm/png/baseline-jpeg via stdlib parsers) and computes
    the statistics over the DECODED sample bytes; formats genuinely
    needing PIL/ffmpeg (gif, video) raise ``NotImplementedError``.
    The `fake` path computes deterministic byte statistics over the raw
    payload with the exact shape a pixel/sample decoder would emit."""
    if not fake:
        dec = _REAL_DECODERS.get(fmt)
        if dec is None:
            raise NotImplementedError(
                f"real media decode for format {fmt!r} requires PIL/ffmpeg "
                "(not installed); formats with a stdlib decoder: "
                f"{sorted(_REAL_DECODERS)} — or run with fake=True for the "
                "deterministic byte-stat decoder"
            )
        b = dec(payload)
        if len(b) == 0:
            return {"byte_mean": None, "byte_min": None, "byte_max": None}
        return {
            "byte_mean": float(b.mean()),
            "byte_min": int(b.min()),
            "byte_max": int(b.max()),
        }
    if not payload:
        return {"byte_mean": None, "byte_min": None, "byte_max": None}
    b = bytes(payload)
    return {
        "byte_mean": sum(b) / len(b),
        "byte_min": min(b),
        "byte_max": max(b),
    }


def decode_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched decode pass over ``mapInPandas`` — the real plumbing a
    cluster decode job uses: the iterator yields per-batch frames, bytes
    never round-trip through Python row objects one at a time, and the
    output schema is declared up front so Catalyst can prune columns."""

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            # byte statistics are numpy reductions over each payload's
            # uint8 view — the per-BYTE dimension (the heavy one) never
            # touches Python.  The per-row loop only walks the ragged
            # payload boundaries.  np.mean on uint8 promotes to float64
            # with an exact integer sum, so values match sum(b)/len(b).
            # fake=False swaps the raw view for the REAL decoder's output
            # (decoded PCM for wav; reconstructed pixels for netpbm/png/
            # jpeg; NotImplementedError only for formats with no stdlib
            # decoder — the codec-sharded layout means a corpus without
            # them never routes a row through the guard).
            means = np.full(len(pdf), np.nan)
            mins = np.zeros(len(pdf), dtype="float64")
            maxs = np.zeros(len(pdf), dtype="float64")
            empty = np.zeros(len(pdf), dtype=bool)
            for i, (p, fmt) in enumerate(zip(pdf["payload"], pdf["fmt"])):
                if p is None or len(p) == 0:
                    empty[i] = True
                    continue
                if fake:
                    a = np.frombuffer(p, dtype=np.uint8)
                else:
                    dec = _REAL_DECODERS.get(fmt)
                    if dec is None:
                        decode_stub(p, fmt, fake=False)  # raises
                    a = dec(p)
                    if len(a) == 0:
                        empty[i] = True
                        continue
                means[i] = a.mean()
                mins[i] = a.min()
                maxs[i] = a.max()
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "format": pdf["fmt"],
                    "n_bytes": pdf["n_bytes"].astype("int64"),
                    "byte_mean": pd.array(
                        np.where(empty, np.nan, means), dtype="Float64"
                    ),
                    "byte_min": pd.array(
                        np.where(empty, np.nan, mins), dtype="Int32"
                    ),
                    "byte_max": pd.array(
                        np.where(empty, np.nan, maxs), dtype="Int32"
                    ),
                }
            )
            yield out

    flat = media.select(
        "doc_id",
        "payload",
        F.col("media_meta.format").alias("fmt"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
    )
    return _codec_sharded(flat).mapInPandas(batches, schema=DECODED_SCHEMA)


def _codec_sharded(flat: DataFrame) -> DataFrame:
    """Partition by (format, shard): each task stays codec-homogeneous
    WITHOUT collapsing parallelism to the 3 distinct formats — hashing on
    fmt alone caps the whole decode at <=3 tasks on any cluster.  The
    shard count follows the session's shuffle parallelism (AQE may still
    coalesce when the data is small — that's the right behavior)."""
    try:
        n_parts = int(
            flat.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    except ValueError:  # e.g. "auto" on AQE-managed platforms
        n_parts = 32
    shards = max(n_parts // len(FORMATS), 1)
    return flat.repartition(
        n_parts, F.col("fmt"), (F.col("doc_id") % F.lit(shards)).alias("shard")
    )


# The fake decoder's byte statistics ARE oracle-expressible for this corpus:
# the payload is UTF-8 of pure-ASCII text, so byte k == ascii(char k), and
# mean/min/max over integer codes are exact in both engines (integer sum →
# one exact double division; no rounding needed).
DECODE_FEATURES_ORACLE = """
WITH codes AS (
  SELECT doc_id,
         [ascii(substr(text, i, 1)) for i in generate_series(1, length(text))]
             AS cs
  FROM documents
)
SELECT d.doc_id,
       CASE d.doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END
           AS format,
       CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
       CAST(list_sum(c.cs) AS DOUBLE) / len(c.cs)   AS byte_mean,
       CAST(list_min(c.cs) AS INTEGER)              AS byte_min,
       CAST(list_max(c.cs) AS INTEGER)              AS byte_max
FROM documents d JOIN codes c ON d.doc_id = c.doc_id"""


N_FRAMES = 4

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_offset", T.LongType()),
        T.StructField("frame_len", T.LongType()),
        T.StructField("frame_mean", T.DoubleType()),
        T.StructField("frame_min", T.IntegerType()),
        T.StructField("frame_max", T.IntegerType()),
    ]
)


def sample_frames(media: DataFrame, n_frames: int = N_FRAMES) -> DataFrame:
    """Frame sampling over binary media (the video path of the multimodal
    brief): emit ``n_frames`` evenly spaced frames per item with per-frame
    statistics.  A real implementation seeks keyframes with a codec (same
    NotImplementedError guard as decode_stub); the deterministic fake slices
    the byte stream at stride offsets — which exercises everything the real
    job needs from Spark: Arrow batch transfer, per-item fan-out to a
    variable number of output rows, declared schema, and codec-homogeneous
    partitioning upstream.

    Frame k covers bytes [k·stride, k·stride + flen) with
    stride = n_bytes div n_frames and flen = max(stride div 2, 1); the
    per-frame reductions are numpy over the uint8 view."""

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = {k: [] for k in (
                "doc_id", "format", "frame_idx", "frame_offset",
                "frame_len", "frame_mean", "frame_min", "frame_max",
            )}
            for doc_id, fmt, p in zip(pdf["doc_id"], pdf["fmt"], pdf["payload"]):
                if p is None or len(p) == 0:
                    continue
                b = np.frombuffer(p, dtype=np.uint8)
                nb = len(b)
                stride = nb // n_frames
                flen = max(stride // 2, 1)
                for k in range(n_frames):
                    off = k * stride
                    if off + flen > nb:
                        continue
                    fr = b[off : off + flen]
                    out["doc_id"].append(int(doc_id))
                    out["format"].append(fmt)
                    out["frame_idx"].append(k)
                    out["frame_offset"].append(off)
                    out["frame_len"].append(flen)
                    out["frame_mean"].append(float(fr.mean()))
                    out["frame_min"].append(int(fr.min()))
                    out["frame_max"].append(int(fr.max()))
            yield pd.DataFrame(out)

    flat = media.select(
        "doc_id", "payload", F.col("media_meta.format").alias("fmt")
    )
    return flat.mapInPandas(batches, schema=FRAMES_SCHEMA)


SAMPLE_FRAMES_ORACLE = f"""
WITH codes AS (
  SELECT doc_id, text,
         [ascii(substr(text, i, 1)) for i in generate_series(1, length(text))]
             AS cs
  FROM documents
),
f AS (
  SELECT doc_id, text, cs, len(cs) AS nb,
         len(cs) // {N_FRAMES} AS stride,
         greatest((len(cs) // {N_FRAMES}) // 2, 1) AS flen
  FROM codes WHERE len(cs) > 0
),
frames AS (
  SELECT doc_id, text, k.k AS frame_idx, k.k * stride AS frame_offset, flen,
         cs[k.k * stride + 1 : k.k * stride + flen] AS fr
  FROM f, (SELECT unnest(generate_series(0, {N_FRAMES - 1})) AS k) k
  WHERE k.k * stride + flen <= nb
)
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END
           AS format,
       CAST(frame_idx AS INTEGER) AS frame_idx,
       CAST(frame_offset AS BIGINT) AS frame_offset,
       CAST(flen AS BIGINT) AS frame_len,
       CAST(list_sum(fr) AS DOUBLE) / len(fr) AS frame_mean,
       CAST(list_min(fr) AS INTEGER) AS frame_min,
       CAST(list_max(fr) AS INTEGER) AS frame_max
FROM frames"""


RESIZE_BINS = 16

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("bin_idx", T.IntegerType()),
        T.StructField("bin_start", T.LongType()),
        T.StructField("bin_len", T.LongType()),
        T.StructField("bin_mean", T.DoubleType()),
    ]
)


def resize_signal(media: DataFrame, n_bins: int = RESIZE_BINS) -> DataFrame:
    """Resize / downsample over binary media (the image-resize slot of the
    multimodal brief): area-average the byte signal into ``n_bins``
    near-equal blocks — exactly the arithmetic of a box-filter image
    downsample, applied to the 1-D byte proxy (a real implementation swaps
    the block-mean kernel for a pixel-space resampler behind the same
    NotImplementedError guard as decode_stub).  Emitted LONG-form (one row
    per bin) so every value is a scalar the oracle compares exactly: block
    boundaries are ``floor(i·n/bins)`` and each block mean is one exact
    integer sum over the uint8 view divided once — no rounding needed in
    either engine.  Items shorter than ``n_bins`` bytes are dropped (no
    full-width block exists).

    Spark shape: same codec-homogeneous (format, shard) repartition as
    decode_features, then one Arrow batch pass; the per-byte dimension is
    numpy ``add.reduceat`` over the block boundaries — Python only walks
    ragged row boundaries."""

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = {k: [] for k in (
                "doc_id", "format", "bin_idx", "bin_start", "bin_len",
                "bin_mean",
            )}
            for doc_id, fmt, p in zip(pdf["doc_id"], pdf["fmt"], pdf["payload"]):
                if p is None or len(p) < n_bins:
                    continue
                a = np.frombuffer(p, dtype=np.uint8).astype(np.int64)
                n = len(a)
                bounds = (np.arange(n_bins + 1, dtype=np.int64) * n) // n_bins
                sums = np.add.reduceat(a, bounds[:-1])
                lens = np.diff(bounds)
                means = sums / lens
                out["doc_id"].extend([int(doc_id)] * n_bins)
                out["format"].extend([fmt] * n_bins)
                out["bin_idx"].extend(range(n_bins))
                out["bin_start"].extend(bounds[:-1].tolist())
                out["bin_len"].extend(lens.tolist())
                out["bin_mean"].extend(means.tolist())
            yield pd.DataFrame(out)

    flat = media.select(
        "doc_id", "payload", F.col("media_meta.format").alias("fmt")
    )
    return _codec_sharded(flat).mapInPandas(batches, schema=RESIZE_SCHEMA)


RESIZE_ORACLE = f"""
WITH codes AS (
  SELECT doc_id,
         [ascii(substr(text, i, 1)) for i in generate_series(1, length(text))]
             AS cs
  FROM documents
),
bins AS (
  SELECT doc_id, cs, len(cs) AS n, t.i AS bin_idx,
         (t.i * len(cs)) // {RESIZE_BINS} AS lo,
         ((t.i + 1) * len(cs)) // {RESIZE_BINS} AS hi
  FROM codes, (SELECT unnest(generate_series(0, {RESIZE_BINS - 1})) AS i) t
  WHERE len(cs) >= {RESIZE_BINS}
)
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END
           AS format,
       CAST(bin_idx AS INTEGER) AS bin_idx,
       CAST(lo AS BIGINT) AS bin_start,
       CAST(hi - lo AS BIGINT) AS bin_len,
       CAST(list_sum(cs[lo + 1 : hi]) AS DOUBLE) / (hi - lo) AS bin_mean
FROM bins"""
