"""REAL media codecs, pure Python + numpy (no external image/audio
libraries): uncompressed BMP (8/24/32-bit) and RIFF/WAVE PCM16.

This closes the `real_codec=True` seam in ``binary_ops.decode_images``
(previously a documented ``NotImplementedError``): the decoders parse
actual container formats byte-for-byte — magic numbers, header fields,
row padding, bottom-up/top-down row order, chunk walking — so a user
handing the engine genuine .bmp / .wav payloads gets a genuine decode.

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
