"""REAL media codecs, pure Python + numpy (no external image/audio
libraries): uncompressed BMP (8/24/32-bit), RIFF/WAVE PCM16, and
COMPRESSED PNG (stdlib zlib DEFLATE + the five scanline filters).

This closes the `real_codec=True` seam in ``binary_ops.decode_images``
(previously a documented ``NotImplementedError``): the decoders parse
actual container formats byte-for-byte — magic numbers, header fields,
row padding, bottom-up/top-down row order, chunk walking, chunk CRCs,
DEFLATE streams, per-scanline filter reconstruction — so a user
handing the engine genuine .bmp / .png / .wav payloads gets a genuine
decode.

Scale posture is unchanged: these run inside the same Arrow-batched
``mapInPandas`` stages as the stub path, one Python hop, payload column
pruned whenever a query is metadata-only.

Reference parity note: the reference engine has no media path at all
(SURVEY.md §2.11 marks this a training-data surplus capability), so
there is no reference file to cite; formats follow the public BMP
(BITMAPFILEHEADER/BITMAPINFOHEADER) and RIFF/WAVE specifications.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


# ---------------------------------------------------------------- BMP

def encode_bmp(raster: np.ndarray) -> bytes:
    """Write a 2-D uint8 grayscale raster as a REAL 24-bit uncompressed
    BMP (r=g=b), bottom-up rows, rows padded to 4-byte boundaries —
    the exact layout every BMP reader expects."""
    if raster.ndim != 2:
        raise ValueError("encode_bmp expects a 2-D grayscale raster")
    h, w = raster.shape
    stride = (w * 3 + 3) & ~3
    pixel_bytes = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        row = bytearray()
        for c in range(w):
            v = int(raster[r, c])
            row += bytes((v, v, v))  # B, G, R
        row += b"\x00" * (stride - len(row))
        pixel_bytes += row
    offset = 14 + 40
    size = offset + len(pixel_bytes)
    file_header = struct.pack("<2sIHHI", b"BM", size, 0, 0, offset)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_bytes), 2835, 2835, 0, 0
    )
    return file_header + info_header + bytes(pixel_bytes)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Parse a REAL uncompressed BMP payload into a 2-D uint8 grayscale
    raster. Handles 24/32-bit BGR(A) and 8-bit paletted pixels, 4-byte
    row padding, and both bottom-up (height > 0) and top-down
    (height < 0) row order. Grayscale is integer luma
    (299·R + 587·G + 114·B) // 1000, exact for achromatic pixels.
    Raises ValueError on bad magic / unsupported compression — a
    malformed blob must fail loudly, not decode to garbage."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    (offset,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression}")
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    top_down = height < 0
    height = abs(height)

    palette = None
    if bpp == 8:
        (n_colors,) = struct.unpack_from("<I", payload, 46)
        n_colors = n_colors or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            payload, dtype=np.uint8, count=n_colors * 4, offset=pal_off
        ).reshape(n_colors, 4)
        b, g, r = pal[:, 0].astype(np.int64), pal[:, 1].astype(np.int64), pal[:, 2].astype(np.int64)
        palette = ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)

    bytes_pp = bpp // 8
    stride = (width * bytes_pp + 3) & ~3
    if len(payload) < offset + stride * height:
        raise ValueError("truncated BMP pixel data")
    out = np.empty((height, width), dtype=np.uint8)
    for i in range(height):
        row_start = offset + i * stride
        row = np.frombuffer(payload, dtype=np.uint8, count=width * bytes_pp, offset=row_start)
        if bpp == 8:
            gray = palette[row]
        else:
            px = row.reshape(width, bytes_pp).astype(np.int64)
            b, g, r = px[:, 0], px[:, 1], px[:, 2]
            gray = ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)
        out[i if top_down else height - 1 - i] = gray
    return out


# ---------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4): nearest of left/up/up-left to
    the linear estimate a + b - c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(raster: np.ndarray, color_type: int = 0) -> bytes:
    """Write a 2-D uint8 grayscale raster as a REAL compressed PNG:
    signature, IHDR, zlib-DEFLATE IDAT (split into TWO chunks so
    readers must reassemble the stream), IEND, all with correct CRCs.
    ``color_type`` 0 emits 8-bit grayscale; 2 emits 8-bit truecolor
    with r=g=b. Scanline filters CYCLE through all five types
    (row i uses filter i % 5), so a decoder must implement None, Sub,
    Up, Average, and Paeth to reconstruct the image."""
    if raster.ndim != 2:
        raise ValueError("encode_png expects a 2-D grayscale raster")
    if color_type not in (0, 2):
        raise ValueError(f"unsupported PNG color type {color_type}")
    h, w = raster.shape
    bpp = 1 if color_type == 0 else 3
    raw = bytearray()
    prev = [0] * (w * bpp)
    for r in range(h):
        if color_type == 0:
            line = [int(v) for v in raster[r]]
        else:
            line = [int(v) for v in raster[r] for _ in range(3)]
        ft = r % 5
        filt = []
        for i, x in enumerate(line):
            a = line[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                pred = _paeth(a, b, c)
            filt.append((x - pred) & 0xFF)
        raw += bytes([ft]) + bytes(filt)
        prev = line
    comp = zlib.compress(bytes(raw), 6)
    mid = max(1, len(comp) // 2)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", comp[:mid])
        + _png_chunk(b"IDAT", comp[mid:])
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """Parse a REAL PNG payload into a 2-D uint8 grayscale raster:
    verifies the signature and every chunk CRC, walks the chunk list
    (skipping ancillary chunks like tEXt/pHYs), reassembles the
    DEFLATE stream across multiple IDAT chunks, inflates it with
    stdlib zlib, and reconstructs each scanline through the five PNG
    filters (None/Sub/Up/Average/Paeth). Supports 8-bit color types
    0 (gray), 2 (RGB), and 6 (RGBA, alpha ignored), interlace 0; RGB
    collapses to integer luma (299·R + 587·G + 114·B) // 1000, exact
    for achromatic pixels. Raises ValueError on bad magic, CRC
    mismatch, truncation, or unsupported parameters — malformed blobs
    fail loudly. Per-byte filter reconstruction is pure Python: fine
    for the thumbnail-scale rasters this engine featurizes in Arrow
    batches; a C-backed decoder would slot into the same seam for
    megapixel media."""
    if len(payload) < len(_PNG_SIG) + 12 or payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos = len(_PNG_SIG)
    ihdr = None
    idat = bytearray()
    seen_end = False
    while pos + 12 <= len(payload):
        (clen,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        if pos + 12 + clen > len(payload):  # data or its CRC cut short
            raise ValueError("truncated PNG chunk")
        data = payload[pos + 8 : pos + 8 + clen]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + clen)
        if crc != (zlib.crc32(ctype + data) & 0xFFFFFFFF):
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            seen_end = True
            break
        # ancillary chunks (tEXt, pHYs, ...) are skipped
        pos += 12 + clen
    if ihdr is None or not idat or not seen_end:
        raise ValueError("PNG missing IHDR, IDAT, or IEND")
    w, h, depth, color_type, compression, filter_method, interlace = ihdr
    if depth != 8 or compression != 0 or filter_method != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG parameters (depth={depth}, interlace={interlace})"
        )
    if color_type not in (0, 2, 6):
        raise ValueError(f"unsupported PNG color type {color_type}")
    bpp = {0: 1, 2: 3, 6: 4}[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = w * bpp
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG pixel data has wrong length")
    out = np.empty((h, w), dtype=np.uint8)
    prev = [0] * stride
    for r in range(h):
        ft = raw[r * (1 + stride)]
        line_bytes = raw[r * (1 + stride) + 1 : (r + 1) * (1 + stride)]
        cur = [0] * stride
        for i, x in enumerate(line_bytes):
            a = cur[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                v = x
            elif ft == 1:
                v = x + a
            elif ft == 2:
                v = x + b
            elif ft == 3:
                v = x + (a + b) // 2
            elif ft == 4:
                v = x + _paeth(a, b, c)
            else:
                raise ValueError(f"unknown PNG filter type {ft}")
            cur[i] = v & 0xFF
        px = np.asarray(cur, dtype=np.int64).reshape(w, bpp)
        if color_type == 0:
            out[r] = px[:, 0].astype(np.uint8)
        else:
            out[r] = (
                (299 * px[:, 0] + 587 * px[:, 1] + 114 * px[:, 2]) // 1000
            ).astype(np.uint8)
        prev = cur
    return out


# ---------------------------------------------------------------- WAV

def encode_wav(samples: np.ndarray, sample_rate: int = 8000, channels: int = 1) -> bytes:
    """Write int16 PCM samples as a REAL RIFF/WAVE file (fmt + data
    chunks). For stereo, ``samples`` is already interleaved."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Parse a REAL RIFF/WAVE payload: walk the chunk list (skipping
    unknown chunks like LIST/INFO, honoring odd-size pad bytes), read
    the fmt chunk (PCM16 only), return (samples, sample_rate,
    channels). Stereo stays interleaved — callers downmix explicitly.
    Raises ValueError on bad magic / missing chunks / non-PCM16."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt_info = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", payload, pos + 4)
        body_start = pos + 8
        if cid == b"fmt ":
            if csize < 16:
                raise ValueError("short fmt chunk")
            fmt_info = struct.unpack_from("<HHIIHH", payload, body_start)
        elif cid == b"data":
            data = payload[body_start : body_start + csize]
        pos = body_start + csize + (csize & 1)  # chunks are word-aligned
    if fmt_info is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt_info
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV encoding (format={audio_format}, bits={bits})")
    samples = np.frombuffer(data, dtype="<i2")
    return samples, sample_rate, channels
