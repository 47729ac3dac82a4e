"""REAL media codecs, pure Python + numpy (no external image/audio
libraries): uncompressed BMP (8/24/32-bit), RIFF/WAVE PCM16,
COMPRESSED PNG (stdlib zlib DEFLATE + the five scanline filters), and
GIF87a/89a with a genuine variable-width LZW (Clear/EOI, 4096-entry
table resets, 4-pass interlacing, extension-block skipping), and
baseline TIFF 6.0 (IFD tag-directory walk, either byte order,
multi-strip, WhiteIsZero/RGB photometrics).

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


# --------------------------------------------------------------- JPEG
#
# Baseline sequential DCT JPEG (ITU-T T.81), pure Python + numpy:
# grayscale and 3-component YCbCr color at any sampling factors in
# {1, 2} (4:4:4, 4:2:2, 4:4:0 and the ubiquitous 4:2:0), restart
# intervals (DRI/RSTn), 0xFF fill bytes, multi-table DQT/DHT segments.
# FDCT/quantize/zigzag/Huffman on the encode side; marker walk, DHT
# canonical-code reconstruction, entropy decode with 0xFF00
# byte-stuffing removal, dequantize/un-zigzag/IDCT, T.871 color
# transform on the decode side. Huffman tables are the public Annex K
# typical tables. Progressive (SOF2, Annex G) decodes too: spectral
# selection, successive approximation (DC and AC refinement with
# correction bits), EOB runs — with a progressive encoder whose
# completed scan script reproduces the sequential coefficients
# exactly, so the whole path is hermetically roundtrip-tested.
# Sampling factors beyond 2 and lossless/arithmetic modes raise —
# fail loud, the same posture as the other codecs' unsupported
# branches.

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.3.3: "typical" luminance Huffman tables
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# Progressive AC scans additionally need the EOBn symbols (r << 4 for
# r = 1..14, run lengths 2..32767) that the sequential Annex K table
# does not define — real progressive encoders ship custom DHTs. This
# one assigns every needed symbol an 8-bit canonical code (176 ≤ 256
# leaves: a legal, if uncompressed-ish, Huffman table any conformant
# decoder accepts).
_AC_PROG_VALS = _AC_VALS + [r << 4 for r in range(1, 15)]
_AC_PROG_BITS = [0] * 7 + [len(_AC_PROG_VALS)] + [0] * 8

# Annex K.1 luminance quantization table (row-major), the encoder default
_STD_LUMA_QUANT = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int64)

# Annex K.2 chrominance quantization table (row-major)
_STD_CHROMA_QUANT = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int64)


def _dct_matrix() -> np.ndarray:
    m = np.zeros((8, 8))
    for u in range(8):
        cu = (1 / np.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16)
    return m


_DCT_M = _dct_matrix()


def _huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical JPEG code assignment (T.81 C.2): codes of increasing
    length, sequential within a length. Returns symbol -> (code, len)."""
    enc: dict[int, tuple[int, int]] = {}
    code, idx = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            enc[vals[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return enc


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per T.81 F.1.2.3
        return bytes(self.buf)

    def emit_restart(self, n: int) -> None:
        """1-pad to the byte boundary and append RSTn verbatim (marker
        bytes are never stuffed)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.buf += bytes((0xFF, 0xD0 + (n & 7)))


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_coeff_bits(v: int, size: int) -> int:
    """T.81 F.1.2.1: positive values verbatim; negative values as
    v + 2^size - 1 (one's-complement style)."""
    return v if v >= 0 else v + (1 << size) - 1


def _pad_to_blocks(plane: np.ndarray) -> np.ndarray:
    """Replicate-pad a 2-D plane to 8-multiples (decoder crops)."""
    h, w = plane.shape
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.empty((bh * 8, bw * 8), dtype=np.float64)
    padded[:h, :w] = plane
    padded[h:, :w] = plane[h - 1 : h, :]
    padded[:, w:] = padded[:, w - 1 : w]
    return padded


def _encode_block(
    bw_: "_BitWriter",
    blk: np.ndarray,
    q: np.ndarray,
    dc_enc: dict,
    ac_enc: dict,
    pred: int,
) -> int:
    """FDCT + quantize + entropy-code one 8×8 spatial block; returns
    the new DC predictor for the block's component."""
    coef = _DCT_M @ (blk - 128.0) @ _DCT_M.T
    qz = np.round(coef / q).astype(np.int64)
    zz = qz.ravel()[_ZIGZAG]
    diff = int(zz[0]) - pred
    pred = int(zz[0])
    s = _category(diff)
    code, length = dc_enc[s]
    bw_.write(code, length)
    if s:
        bw_.write(_encode_coeff_bits(diff, s), s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_enc[0xF0]  # ZRL
            bw_.write(zc, zl)
            run -= 16
        s = _category(v)
        code, length = ac_enc[(run << 4) | s]
        bw_.write(code, length)
        bw_.write(_encode_coeff_bits(v, s), s)
        run = 0
    if run:
        ec, el = ac_enc[0x00]  # EOB
        bw_.write(ec, el)
    return pred


def _rgb_to_ycbcr(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """JFIF full-range RGB → YCbCr planes as float64 (T.871)."""
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return y, cb, cr


def _ycbcr_420_planes(
    raster: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """4:2:0 encoder geometry shared by the sequential and progressive
    encoders (one copy, so the two streams stay coefficient-identical):
    replicate-pad the RGB raster to the 16×16 MCU grid, convert to
    YCbCr, and 2×2 box-mean the chroma planes (the padded grid halves
    to exact 8-multiples). Returns (y_full, cb_sub, cr_sub)."""
    h, w = raster.shape[:2]
    mcu_h, mcu_w = -(-h // 16), -(-w // 16)
    planes_full = []
    for p in _rgb_to_ycbcr(raster):
        full = np.empty((mcu_h * 16, mcu_w * 16), dtype=np.float64)
        full[:h, :w] = p
        full[h:, :w] = p[h - 1 : h, :]
        full[:, w:] = full[:, w - 1 : w]
        planes_full.append(full)
    cb, cr = (
        p.reshape(mcu_h * 8, 2, mcu_w * 8, 2).mean(axis=(1, 3))
        for p in planes_full[1:]
    )
    return planes_full[0], cb, cr


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """JFIF YCbCr planes → (h, w, 3) uint8 RGB (T.871 inverse)."""
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def encode_jpeg(
    raster: np.ndarray,
    quant: np.ndarray | None = None,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Write a REAL baseline JPEG. 2-D uint8 input → single-component
    grayscale (byte-identical to the pre-color encoder); (h, w, 3)
    uint8 input → interleaved 3-component YCbCr color — 4:4:4 by
    default, or 4:2:0 with ``subsample=True`` (2×2 box-mean chroma
    downsampling, 16×16 MCUs of 4 Y + 1 Cb + 1 Cr blocks, the layout
    virtually every real-world JPEG uses). Annex-K luminance quant for
    Y and chrominance quant for Cb/Cr (``quant`` overrides the LUMA
    table only; pass all-ones for the highest-fidelity luma stream),
    all components sharing the Annex-K luminance Huffman tables (a
    legal table assignment any conformant decoder accepts). Pipeline
    per component: level shift, 8×8 FDCT, quantization, zigzag,
    Huffman entropy coding with byte stuffing. Edge blocks
    replicate-pad (decoder crops). ``restart_interval`` > 0 writes a
    DRI segment and emits cycling RSTn markers every that many MCUs
    (DC predictors reset, entropy stream byte-aligned) — the
    resync-point discipline real encoders use."""
    if raster.ndim not in (2, 3) or (raster.ndim == 3 and raster.shape[2] != 3):
        raise ValueError("encode_jpeg expects 2-D grayscale or (h, w, 3) RGB")
    if raster.shape[0] > 65535 or raster.shape[1] > 65535:
        raise ValueError("JPEG dimensions exceed 65535")
    q = _STD_LUMA_QUANT if quant is None else np.asarray(quant, dtype=np.int64)
    if q.shape != (8, 8) or (q < 1).any() or (q > 255).any():
        raise ValueError("quant must be 8x8 with entries in 1..255")
    h, w = raster.shape[:2]
    dc_enc = _huffman_codes(_DC_BITS, _DC_VALS)
    ac_enc = _huffman_codes(_AC_BITS, _AC_VALS)
    bw_ = _BitWriter()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = b"\xff\xd8"  # SOI
    if raster.ndim == 2:
        bh, bw = -(-h // 8), -(-w // 8)
        padded = _pad_to_blocks(raster)
        pred = 0
        mcu_idx, total_mcus, rst = 0, bh * bw, 0
        for by in range(bh):
            for bx in range(bw):
                pred = _encode_block(
                    bw_,
                    padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8],
                    q, dc_enc, ac_enc, pred,
                )
                mcu_idx += 1
                if (
                    restart_interval
                    and mcu_idx % restart_interval == 0
                    and mcu_idx < total_mcus
                ):
                    bw_.emit_restart(rst)
                    rst = (rst + 1) % 8
                    pred = 0
        zz_quant = q.ravel()[_ZIGZAG].astype(np.uint8).tobytes()
        out += seg(0xDB, b"\x00" + zz_quant)  # DQT: Pq=0 Tq=0
        if restart_interval:
            out += seg(0xDD, struct.pack(">H", restart_interval))  # DRI
        out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
        out += seg(0xC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))  # DHT DC 0
        out += seg(0xC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS))  # DHT AC 0
        out += seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")  # SOS
    else:
        qc = _STD_CHROMA_QUANT
        if subsample:
            mcu_h, mcu_w = -(-h // 16), -(-w // 16)
            yp, cb_s, cr_s = _ycbcr_420_planes(raster)
            sub = [cb_s, cr_s]
            preds = [0, 0, 0]
            mcu_idx, total_mcus, rst = 0, mcu_h * mcu_w, 0
            for my in range(mcu_h):
                for mx in range(mcu_w):
                    # 4 Y blocks in 2×2 raster order, then Cb, then Cr
                    for bv in range(2):
                        for bhx in range(2):
                            r0 = (my * 2 + bv) * 8
                            c0 = (mx * 2 + bhx) * 8
                            preds[0] = _encode_block(
                                bw_, yp[r0 : r0 + 8, c0 : c0 + 8],
                                q, dc_enc, ac_enc, preds[0],
                            )
                    for ci, p in enumerate(sub, start=1):
                        preds[ci] = _encode_block(
                            bw_,
                            p[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8],
                            qc, dc_enc, ac_enc, preds[ci],
                        )
                    mcu_idx += 1
                    if (
                        restart_interval
                        and mcu_idx % restart_interval == 0
                        and mcu_idx < total_mcus
                    ):
                        bw_.emit_restart(rst)
                        rst = (rst + 1) % 8
                        preds = [0, 0, 0]
            sof_comps = b"\x01\x22\x00" + b"\x02\x11\x01" + b"\x03\x11\x01"
        else:
            bh, bw = -(-h // 8), -(-w // 8)
            planes = [_pad_to_blocks(p) for p in _rgb_to_ycbcr(raster)]
            qtabs = [q, qc, qc]
            preds = [0, 0, 0]
            # interleaved MCU scan: one 8×8 block per component per MCU
            # (4:4:4 — every component has sampling factor 1×1)
            mcu_idx, total_mcus, rst = 0, bh * bw, 0
            for by in range(bh):
                for bx in range(bw):
                    for ci in range(3):
                        preds[ci] = _encode_block(
                            bw_,
                            planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8],
                            qtabs[ci], dc_enc, ac_enc, preds[ci],
                        )
                    mcu_idx += 1
                    if (
                        restart_interval
                        and mcu_idx % restart_interval == 0
                        and mcu_idx < total_mcus
                    ):
                        bw_.emit_restart(rst)
                        rst = (rst + 1) % 8
                        preds = [0, 0, 0]
            sof_comps = b"\x01\x11\x00" + b"\x02\x11\x01" + b"\x03\x11\x01"
        out += seg(0xDB, b"\x00" + q.ravel()[_ZIGZAG].astype(np.uint8).tobytes())
        out += seg(0xDB, b"\x01" + qc.ravel()[_ZIGZAG].astype(np.uint8).tobytes())
        if restart_interval:
            out += seg(0xDD, struct.pack(">H", restart_interval))  # DRI
        out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 3) + sof_comps)
        out += seg(0xC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))  # DHT DC 0
        out += seg(0xC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS))  # DHT AC 0
        # SOS: all three components select Huffman pair 0
        out += seg(0xDA, b"\x03\x01\x00\x02\x00\x03\x00\x00\x3f\x00")
    out += bw_.flush()
    out += b"\xff\xd9"  # EOI
    # SOF carries the TRUE logical dims (as every real encoder writes);
    # the decoder derives padded block counts with a ceil and crops
    return out


def _quantize_grid(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Forward pipeline for one component: spatial plane (8-multiples)
    → level shift, FDCT, quantize → (nby, nbx, 64) zigzag-order
    coefficient grid. Deliberately the EXACT per-block arithmetic of
    ``_encode_block`` (same matmul association, same np.round) — a
    vectorized einsum changes float summation order and rounds
    quantization-boundary ties (x.5) the other way, silently breaking
    the decode(progressive) == decode(sequential) invariant."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    out = np.empty((bh, bw, 64), dtype=np.int64)
    for by in range(bh):
        for bx in range(bw):
            blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = _DCT_M @ blk @ _DCT_M.T
            qz = np.round(coef / q).astype(np.int64)
            out[by, bx] = qz.ravel()[_ZIGZAG]
    return out


def _enc_ac_first_scan(
    bw_: "_BitWriter",
    grid: np.ndarray,
    cbh: int,
    cbw: int,
    ss: int,
    se: int,
    al: int,
    ac_enc: dict,
) -> None:
    """Progressive AC first scan (T.81 G.1.2.2): run/size coding of the
    point-transformed band with EOB-run codes aggregating blocks whose
    band is (or ends) all-zero."""
    eobrun = 0

    def flush_eob() -> None:
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            c, ln = ac_enc[r << 4]
            bw_.write(c, ln)
            if r:
                bw_.write(eobrun - (1 << r), r)
            eobrun = 0

    for by in range(cbh):
        for bx in range(cbw):
            blk = grid[by, bx]
            band = [_pt_ac(int(blk[k]), al) for k in range(ss, se + 1)]
            last = -1
            for idx, v in enumerate(band):
                if v:
                    last = idx
            if last < 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            run = 0
            for idx in range(last + 1):
                v = band[idx]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = ac_enc[0xF0]
                    bw_.write(c, ln)
                    run -= 16
                s = _category(v)
                c, ln = ac_enc[(run << 4) | s]
                bw_.write(c, ln)
                bw_.write(_encode_coeff_bits(v, s), s)
                run = 0
            if last < se - ss:
                eobrun = 1
    flush_eob()


def _enc_ac_refine_scan(
    bw_: "_BitWriter",
    grid: np.ndarray,
    cbh: int,
    cbw: int,
    ss: int,
    se: int,
    al: int,
    ac_enc: dict,
) -> None:
    """Progressive AC refinement scan (T.81 G.1.2.3): newly nonzero
    coefficients code as (zero-history-run, 1) + sign; every
    nonzero-history coefficient passed contributes one correction bit,
    buffered and flushed after the next symbol (or with the EOB run it
    folds into) — the ordering the decoder's advance loop consumes."""
    eobrun = 0
    pending: list[int] = []  # correction bits riding with the EOB run

    def emit_eobrun() -> None:
        nonlocal eobrun, pending
        if eobrun:
            r = eobrun.bit_length() - 1
            c, ln = ac_enc[r << 4]
            bw_.write(c, ln)
            if r:
                bw_.write(eobrun - (1 << r), r)
            for b in pending:
                bw_.write(b, 1)
            pending = []
            eobrun = 0

    for by in range(cbh):
        for bx in range(cbw):
            blk = grid[by, bx]
            vals = [_pt_ac(int(blk[k]), al) for k in range(ss, se + 1)]
            absv = [abs(v) for v in vals]
            eob = -1
            for idx, a in enumerate(absv):
                if a == 1:
                    eob = idx
            r = 0
            br: list[int] = []  # bits buffered since the last symbol
            for idx, a in enumerate(absv):
                if a == 0:
                    r += 1
                    continue
                while r > 15 and idx <= eob:
                    emit_eobrun()
                    c, ln = ac_enc[0xF0]
                    bw_.write(c, ln)
                    r -= 16
                    for b in br:
                        bw_.write(b, 1)
                    br = []
                if a > 1:
                    br.append(a & 1)
                    continue
                emit_eobrun()
                c, ln = ac_enc[(r << 4) | 1]
                bw_.write(c, ln)
                r = 0
                bw_.write(1 if vals[idx] > 0 else 0, 1)
                for b in br:
                    bw_.write(b, 1)
                br = []
            if r > 0 or br:
                eobrun += 1
                pending.extend(br)
                if eobrun == 0x7FFF or len(pending) > 900:
                    emit_eobrun()
    emit_eobrun()


def encode_jpeg_progressive(
    raster: np.ndarray,
    quant: np.ndarray | None = None,
    subsample: bool = False,
) -> bytes:
    """Write a REAL progressive JPEG (SOF2, T.81 Annex G) with a
    standard-shaped scan script exercising every progressive mechanism:
    DC first at Al=1 (interleaved when color) → DC refinement → per
    component, AC first scans over the split spectral bands 1-5 and
    6-63 at Al=1 → the matching AC refinement scans at Ah=1. The
    successive approximation is complete, so the decoded coefficients
    equal the sequential encoder's exactly (same quantization) —
    decode(progressive) == decode(sequential) byte-for-byte, which the
    tests pin. Accepts the same inputs as :func:`encode_jpeg`
    (grayscale / RGB, optional 4:2:0 ``subsample``)."""
    if raster.ndim not in (2, 3) or (raster.ndim == 3 and raster.shape[2] != 3):
        raise ValueError("encode_jpeg expects 2-D grayscale or (h, w, 3) RGB")
    if raster.shape[0] > 65535 or raster.shape[1] > 65535:
        raise ValueError("JPEG dimensions exceed 65535")
    q = _STD_LUMA_QUANT if quant is None else np.asarray(quant, dtype=np.int64)
    if q.shape != (8, 8) or (q < 1).any() or (q > 255).any():
        raise ValueError("quant must be 8x8 with entries in 1..255")
    qc = _STD_CHROMA_QUANT
    h, w = raster.shape[:2]

    if raster.ndim == 2:
        comps = [(1, 1, 1, 0)]
        grids = [_quantize_grid(_pad_to_blocks(raster), q)]
        qsegs = [(0, q)]
        sof_comps = b"\x01\x11\x00"
        hmax = vmax = 1
    elif not subsample:
        y, cb, cr = _rgb_to_ycbcr(raster)
        comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        grids = [
            _quantize_grid(_pad_to_blocks(p), qq)
            for p, qq in ((y, q), (cb, qc), (cr, qc))
        ]
        qsegs = [(0, q), (1, qc)]
        sof_comps = b"\x01\x11\x00" + b"\x02\x11\x01" + b"\x03\x11\x01"
        hmax = vmax = 1
    else:
        yp, cb_s, cr_s = _ycbcr_420_planes(raster)
        comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        grids = [
            _quantize_grid(yp, q),
            _quantize_grid(cb_s, qc),
            _quantize_grid(cr_s, qc),
        ]
        qsegs = [(0, q), (1, qc)]
        sof_comps = b"\x01\x22\x00" + b"\x02\x11\x01" + b"\x03\x11\x01"
        hmax = vmax = 2

    mcu_y, mcu_x = -(-h // (8 * vmax)), -(-w // (8 * hmax))
    ac_grids = []
    for _cid, chs, cvs, _tq in comps:
        comp_h = -(-(h * cvs) // vmax)
        comp_w = -(-(w * chs) // hmax)
        ac_grids.append((-(-comp_h // 8), -(-comp_w // 8)))
    dc_enc = _huffman_codes(_DC_BITS, _DC_VALS)
    ac_enc = _huffman_codes(_AC_PROG_BITS, _AC_PROG_VALS)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    def sos(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        b = bytes([len(comp_ids)])
        for cid in comp_ids:
            b += bytes([cid, 0x00])
        return seg(0xDA, b + bytes([ss, se, (ah << 4) | al]))

    out = b"\xff\xd8"
    for tq, table in qsegs:
        out += seg(0xDB, bytes([tq]) + table.ravel()[_ZIGZAG].astype(np.uint8).tobytes())
    out += seg(0xC2, struct.pack(">BHHB", 8, h, w, len(comps)) + sof_comps)
    out += seg(0xC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += seg(0xC4, b"\x10" + bytes(_AC_PROG_BITS) + bytes(_AC_PROG_VALS))

    def dc_walk(al: int, refine: bool) -> bytes:
        bw_ = _BitWriter()
        preds = [0] * len(comps)
        for my in range(mcu_y):
            for mx in range(mcu_x):
                for ci, (_cid, chs, cvs, _tq) in enumerate(comps):
                    for bv in range(cvs):
                        for bhx in range(chs):
                            dc = int(grids[ci][my * cvs + bv, mx * chs + bhx, 0])
                            if refine:
                                bw_.write((dc >> al) & 1, 1)
                                continue
                            v = dc >> al  # arithmetic shift (T.81 G.1.2.1)
                            diff = v - preds[ci]
                            preds[ci] = v
                            s = _category(diff)
                            c, ln = dc_enc[s]
                            bw_.write(c, ln)
                            if s:
                                bw_.write(_encode_coeff_bits(diff, s), s)
        return bw_.flush()

    all_ids = [c[0] for c in comps]
    out += sos(all_ids, 0, 0, 0, 1) + dc_walk(1, refine=False)
    out += sos(all_ids, 0, 0, 1, 0) + dc_walk(0, refine=True)
    for ci, (cid, _chs, _cvs, _tq) in enumerate(comps):
        cbh, cbw = ac_grids[ci]
        for ss_, se_ in ((1, 5), (6, 63)):
            bw_ = _BitWriter()
            _enc_ac_first_scan(bw_, grids[ci], cbh, cbw, ss_, se_, 1, ac_enc)
            out += sos([cid], ss_, se_, 0, 1) + bw_.flush()
        for ss_, se_ in ((1, 5), (6, 63)):
            bw_ = _BitWriter()
            _enc_ac_refine_scan(bw_, grids[ci], cbh, cbw, ss_, se_, 0, ac_enc)
            out += sos([cid], ss_, se_, 1, 0) + bw_.flush()
    return out + b"\xff\xd9"


class _HuffDecoder:
    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.maxcode = [-1] * 17
        self.mincode = [0] * 17
        self.valptr = [0] * 17
        self.vals = vals
        code, idx = 0, 0
        for length in range(1, 17):
            n = bits[length - 1]
            if n:
                self.valptr[length] = idx
                self.mincode[length] = code
                code += n
                idx += n
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, reader: "_BitReader") -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.read_bit()
            if self.maxcode[length] >= code >= self.mincode[length]:
                return self.vals[self.valptr[length] + code - self.mincode[length]]
        raise ValueError("invalid JPEG Huffman code")


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 stuffing removal."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated JPEG entropy stream")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed
                elif nxt == 0xD9:  # EOI reached while bits demanded
                    raise ValueError("truncated JPEG entropy stream")
                else:
                    raise ValueError("unexpected marker inside JPEG scan")
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive_extend(self, size: int) -> int:
        if size == 0:
            return 0
        v = 0
        for _ in range(size):
            v = (v << 1) | self.read_bit()
        if v < (1 << (size - 1)):  # negative branch (T.81 F.2.2.1)
            v += -(1 << size) + 1
        return v

    def read_bits(self, n: int) -> int:
        """``n`` raw magnitude bits (no sign extension) — the EOB-run
        length extension of progressive scans (T.81 G.1.2.2)."""
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> int:
        """Discard pad bits to the byte boundary, skip 0xFF fill bytes,
        and consume one RSTn marker; returns n (0-7)."""
        self.nbits = 0
        while (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and self.data[self.pos + 1] == 0xFF
        ):
            self.pos += 1
        if (
            self.pos + 2 > len(self.data)
            or self.data[self.pos] != 0xFF
            or not (0xD0 <= self.data[self.pos + 1] <= 0xD7)
        ):
            raise ValueError("expected JPEG restart marker")
        n = self.data[self.pos + 1] - 0xD0
        self.pos += 2
        return n


def _decode_block(
    reader: "_BitReader",
    dc_dec: _HuffDecoder,
    ac_dec: _HuffDecoder,
    quant_zz: np.ndarray,
    pred: int,
) -> tuple[np.ndarray, int]:
    """Entropy-decode one block → (8×8 float spatial block, new DC
    predictor): Huffman decode, dequantize, un-zigzag, IDCT."""
    zz = np.zeros(64, dtype=np.int64)
    s = dc_dec.decode(reader)
    pred += reader.receive_extend(s)
    zz[0] = pred
    k = 1
    while k < 64:
        rs = ac_dec.decode(reader)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past block end")
        zz[k] = reader.receive_extend(size)
        k += 1
    coef = np.zeros(64, dtype=np.float64)
    coef[_ZIGZAG] = zz * quant_zz
    return _DCT_M.T @ coef.reshape(8, 8) @ _DCT_M + 128.0, pred


def _reconstruct_plane(coef_zz: np.ndarray, q_zz: np.ndarray) -> np.ndarray:
    """Inverse pipeline for one component: (nby, nbx, 64) zigzag-order
    quantized coefficients → dequantize, un-zigzag, IDCT, level shift
    → spatial (nby*8, nbx*8) float plane. Same per-block arithmetic as
    the sequential ``_decode_block`` (see ``_quantize_grid`` for why a
    vectorized einsum would diverge on rounding ties)."""
    nby, nbx, _ = coef_zz.shape
    out = np.empty((nby * 8, nbx * 8), dtype=np.float64)
    for by in range(nby):
        for bx in range(nbx):
            coef = np.zeros(64, dtype=np.float64)
            coef[_ZIGZAG] = coef_zz[by, bx] * q_zz
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                _DCT_M.T @ coef.reshape(8, 8) @ _DCT_M + 128.0
            )
    return out


def _pt_ac(v: int, al: int) -> int:
    """AC successive-approximation point transform: divide by 2^Al
    truncating toward zero (T.81 G.1.2.1 — DC uses an arithmetic
    shift instead)."""
    return (v >> al) if v >= 0 else -((-v) >> al)


def _decode_progressive_scan(
    payload: bytes,
    entropy_pos: int,
    comps: list,
    scan_comps: list,
    coefs: list,
    dc_preds: list,
    params: tuple,
    grids: list,
    mcu_dims: tuple,
    restart_interval: int,
) -> int:
    """Decode ONE progressive scan (T.81 Annex G) into the per-component
    ``coefs`` buffers; returns the payload offset of the next marker.

    ``scan_comps``: [(comp_idx, dc_dec|None, ac_dec|None)] in scan
    order. ``params`` = (Ss, Se, Ah, Al). Interleaved (ns > 1) scans
    walk the MCU grid with h×v data units per component; ns == 1 scans
    walk the single component's own ceil block grid. Four scan kinds:
    DC first (diff coding, coef = pred << Al), DC refinement (one raw
    bit ORs in 1 << Al), AC first (run/size with EOB-run codes), AC
    refinement (the correction-bit algorithm: zero-history runs code
    new ±1<<Al coefficients while every nonzero-history coefficient
    passed consumes one correction bit). Restart markers reset DC
    predictors AND the EOB run."""
    ss, se, ah, al = params
    reader = _BitReader(payload, entropy_pos)
    eobrun = 0
    interleaved = len(scan_comps) > 1
    mcu_y, mcu_x = mcu_dims

    def decode_dc_unit(ci: int, dc_dec, by: int, bx: int) -> None:
        nonlocal eobrun
        blk = coefs[ci][by, bx]
        if ah == 0:
            s = dc_dec.decode(reader)
            dc_preds[ci] += reader.receive_extend(s)
            blk[0] = dc_preds[ci] << al
        else:
            if reader.read_bit():
                blk[0] |= 1 << al

    def decode_ac_unit(ci: int, ac_dec, by: int, bx: int) -> None:
        nonlocal eobrun
        blk = coefs[ci][by, bx]
        if ah == 0:  # AC first scan
            if eobrun > 0:
                eobrun -= 1
                return
            k = ss
            while k <= se:
                rs = ac_dec.decode(reader)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:
                        k += 16  # ZRL
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                k += r
                if k > se:
                    raise ValueError("AC run past band end")
                blk[k] = reader.receive_extend(s) << al
                k += 1
            return
        # AC refinement scan
        p1, m1 = 1 << al, -1 << al
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = ac_dec.decode(reader)
                r, s = rs >> 4, rs & 0x0F
                if s:
                    if s != 1:
                        raise ValueError("invalid AC refinement size")
                    new_val = p1 if reader.read_bit() else m1
                else:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += reader.read_bits(r)
                        break
                    new_val = 0  # ZRL: 16 zero-history skips
                while k <= se:
                    if blk[k] != 0:
                        if reader.read_bit() and (blk[k] & p1) == 0:
                            blk[k] += p1 if blk[k] >= 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if new_val and k <= se:
                    blk[k] = new_val
                k += 1
        if eobrun > 0:
            while k <= se:
                if blk[k] != 0:
                    if reader.read_bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                k += 1
            eobrun -= 1

    def unit(ci: int, dc_dec, ac_dec, by: int, bx: int) -> None:
        if ss == 0:
            decode_dc_unit(ci, dc_dec, by, bx)
        else:
            decode_ac_unit(ci, ac_dec, by, bx)

    expected_rst = 0
    mcu_idx = 0

    def maybe_restart(total: int) -> None:
        nonlocal expected_rst, eobrun
        if (
            restart_interval
            and mcu_idx % restart_interval == 0
            and mcu_idx < total
        ):
            if reader.sync_restart() != expected_rst:
                raise ValueError("JPEG restart marker out of sequence")
            expected_rst = (expected_rst + 1) % 8
            eobrun = 0
            for i in range(len(dc_preds)):
                dc_preds[i] = 0

    if interleaved:
        if ss != 0:
            raise ValueError("interleaved progressive AC scan is illegal")
        total = mcu_y * mcu_x
        for my in range(mcu_y):
            for mx in range(mcu_x):
                for ci, dc_dec, ac_dec in scan_comps:
                    _cid, ch, cv, _tq = comps[ci]
                    for bv in range(cv):
                        for bhx in range(ch):
                            unit(ci, dc_dec, ac_dec, my * cv + bv, mx * ch + bhx)
                mcu_idx += 1
                maybe_restart(total)
    else:
        ci, dc_dec, ac_dec = scan_comps[0]
        cbh, cbw = grids[ci]
        total = cbh * cbw
        for by in range(cbh):
            for bx in range(cbw):
                unit(ci, dc_dec, ac_dec, by, bx)
                mcu_idx += 1
                maybe_restart(total)

    # resync the marker walk: entropy data ends at the next real marker
    p = max(reader.pos, entropy_pos)
    n = len(payload)
    while p + 1 < n and not (payload[p] == 0xFF and payload[p + 1] != 0x00):
        p += 1
    return p


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Parse a REAL baseline JPEG byte-for-byte: marker walk (with
    ancillary APPn/COM handling), DQT/DHT table registries (any legal
    table ids), SOF0 with 1 component (grayscale → 2-D uint8) or 3
    components at any sampling factors in {1, 2} — 4:4:4, 4:2:2,
    4:4:0 and the ubiquitous 4:2:0 all decode (YCbCr → (h, w, 3)
    uint8 RGB via the T.871 inverse transform, subsampled chroma
    replicated back up); restart intervals (DRI/RSTn with sequence
    checking) are honored. Progressive streams (SOF2) decode via
    per-component coefficient buffers accumulated across scans —
    spectral selection, successive approximation (DC and AC
    refinement), EOB runs — reconstructed at EOI. Sampling factors
    beyond 2 raise loudly. Canonical Huffman reconstruction from DHT,
    interleaved-MCU entropy decode (each MCU carries h×v blocks per
    component) with stuffing removal and per-component DC predictors,
    dequantize, un-zigzag, IDCT, level shift, clip, crop to the
    logical dimensions."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    dims: tuple[int, int] | None = None
    comps: list[tuple[int, int, int, int]] | None = None  # (id, h, v, quant_id)
    restart_interval = 0
    progressive = False
    coefs: list | None = None  # per-comp (nby, nbx, 64) buffers (progressive)
    grids: list | None = None  # per-comp non-interleaved (cbh, cbw)
    scanned = False
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("corrupt JPEG marker stream")
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
        # fill bytes — skip them so a spec-legal padded stream decodes
        # instead of parsing the pad as a marker with a garbage length
        while pos + 2 <= len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(payload):
            break
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI before any scan
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # standalone markers
            pos += 2
            continue
        if pos + 4 > len(payload):
            raise ValueError("truncated JPEG segment")
        seglen = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        if seglen < 2:
            raise ValueError("corrupt JPEG segment length")
        body = payload[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:
            # a DQT segment may carry several tables back to back
            off = 0
            while off < len(body):
                if body[off] & 0xF0:
                    raise ValueError("16-bit quant tables unsupported")
                if off + 65 > len(body):
                    raise ValueError("truncated JPEG quant table")
                qtables[body[off] & 0x0F] = np.frombuffer(
                    body[off + 1 : off + 65], dtype=np.uint8
                ).astype(np.int64)  # kept in zigzag order
                off += 65
        elif marker in (0xC1, 0xC3):
            raise ValueError(
                "only baseline sequential and progressive JPEG supported"
            )
        elif marker in (0xC0, 0xC2):
            progressive = marker == 0xC2
            if len(body) < 6:
                raise ValueError("truncated JPEG frame header")
            prec, ph, pw, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8 or ncomp not in (1, 3):
                raise ValueError("only 8-bit 1- or 3-component JPEG supported")
            if len(body) < 6 + 3 * ncomp:
                raise ValueError("truncated JPEG frame header")
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                ch, cv = hv >> 4, hv & 0x0F
                if ncomp == 1:
                    # a single-component scan is non-interleaved:
                    # sampling factors do not affect its block layout
                    ch = cv = 1
                if not (1 <= ch <= 2 and 1 <= cv <= 2):
                    raise ValueError(
                        "JPEG sampling factors beyond 2 unsupported"
                    )
                comps.append((cid, ch, cv, tq))
            dims = (ph, pw)
        elif marker == 0xC4:
            # a DHT segment may carry several tables back to back
            off = 0
            while off < len(body):
                if off + 17 > len(body):
                    raise ValueError("truncated JPEG Huffman table")
                cls, tid = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                if off + 17 + n > len(body):
                    raise ValueError("truncated JPEG Huffman table")
                vals = list(body[off + 17 : off + 17 + n])
                huff[(cls, tid)] = _HuffDecoder(bits, vals)
                off += 17 + n
        elif marker == 0xDD:
            if len(body) != 2:
                raise ValueError("malformed DRI segment")
            restart_interval = struct.unpack(">H", body)[0]
        elif marker == 0xDA:
            if dims is None or comps is None:
                raise ValueError("JPEG scan before frame header")
            if progressive:
                if len(body) < 1:
                    raise ValueError("truncated JPEG scan header")
                ns = body[0]
                if len(body) < 1 + 2 * ns + 3:
                    raise ValueError("truncated JPEG scan header")
                ph, pw = dims
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcu_y = -(-ph // (8 * vmax))
                mcu_x = -(-pw // (8 * hmax))
                if coefs is None:
                    coefs = [
                        np.zeros((mcu_y * cv, mcu_x * ch, 64), dtype=np.int64)
                        for _cid, ch, cv, _tq in comps
                    ]
                    grids = []
                    for _cid, ch, cv, _tq in comps:
                        comp_h = -(-(ph * cv) // vmax)  # ceil
                        comp_w = -(-(pw * ch) // hmax)
                        grids.append((-(-comp_h // 8), -(-comp_w // 8)))
                ss_, se_ = body[1 + 2 * ns], body[2 + 2 * ns]
                ah_, al_ = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
                if (ss_ == 0 and se_ != 0) or se_ > 63 or ss_ > se_:
                    raise ValueError(
                        "invalid progressive spectral selection"
                    )
                cid_to_idx = {c[0]: i for i, c in enumerate(comps)}
                scan_comps = []
                for i in range(ns):
                    cid, tsel = body[1 + 2 * i], body[2 + 2 * i]
                    if cid not in cid_to_idx:
                        raise ValueError("scan component not declared in frame")
                    td, ta = tsel >> 4, tsel & 0x0F
                    dc_dec = huff.get((0, td))
                    ac_dec = huff.get((1, ta))
                    if (ss_ == 0 and ah_ == 0 and dc_dec is None) or (
                        ss_ > 0 and ac_dec is None
                    ):
                        raise ValueError("JPEG scan references a missing table")
                    scan_comps.append((cid_to_idx[cid], dc_dec, ac_dec))
                pos = _decode_progressive_scan(
                    payload,
                    pos + 2 + seglen,
                    comps,
                    scan_comps,
                    coefs,
                    [0] * len(comps),
                    (ss_, se_, ah_, al_),
                    grids,
                    (mcu_y, mcu_x),
                    restart_interval,
                )
                scanned = True
                continue
            if len(body) < 1 or body[0] != len(comps):
                raise ValueError(
                    "multi-scan sequential JPEG unsupported (scan must "
                    "carry every frame component)"
                )
            ns = body[0]
            if len(body) < 1 + 2 * ns + 3:
                raise ValueError("truncated JPEG scan header")
            # per-scan-component entropy tables, in frame-component order
            scan: list[tuple[_HuffDecoder, _HuffDecoder, np.ndarray]] = []
            sel = {body[1 + 2 * i]: body[2 + 2 * i] for i in range(ns)}
            for cid, _ch, _cv, tq in comps:
                if cid not in sel:
                    raise ValueError("scan component not declared in frame")
                td, ta = sel[cid] >> 4, sel[cid] & 0x0F
                if (0, td) not in huff or (1, ta) not in huff or tq not in qtables:
                    raise ValueError("JPEG scan references a missing table")
                scan.append((huff[(0, td)], huff[(1, ta)], qtables[tq]))
            ph, pw = dims
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcu_y, mcu_x = -(-ph // (8 * vmax)), -(-pw // (8 * hmax))
            reader = _BitReader(payload, pos + 2 + seglen)
            planes = [
                np.empty((mcu_y * cv * 8, mcu_x * ch * 8), dtype=np.float64)
                for _cid, ch, cv, _tq in comps
            ]
            preds = [0] * len(comps)
            mcu_idx, total_mcus, expected_rst = 0, mcu_y * mcu_x, 0
            for my in range(mcu_y):
                for mx in range(mcu_x):
                    for ci, (dc_dec, ac_dec, qzz) in enumerate(scan):
                        _cid, ch, cv, _tq = comps[ci]
                        # h×v data units per component per MCU, raster order
                        for bv in range(cv):
                            for bhx in range(ch):
                                blk, preds[ci] = _decode_block(
                                    reader, dc_dec, ac_dec, qzz, preds[ci]
                                )
                                r0 = (my * cv + bv) * 8
                                c0 = (mx * ch + bhx) * 8
                                planes[ci][r0 : r0 + 8, c0 : c0 + 8] = blk
                    mcu_idx += 1
                    if (
                        restart_interval
                        and mcu_idx % restart_interval == 0
                        and mcu_idx < total_mcus
                    ):
                        if reader.sync_restart() != expected_rst:
                            raise ValueError(
                                "JPEG restart marker out of sequence"
                            )
                        expected_rst = (expected_rst + 1) % 8
                        preds = [0] * len(comps)
            # replicate subsampled components back to full resolution
            planes = [
                p.repeat(vmax // cv, axis=0).repeat(hmax // ch, axis=1)
                for p, (_cid, ch, cv, _tq) in zip(planes, comps)
            ]
            if len(comps) == 1:
                return np.clip(np.round(planes[0][:ph, :pw]), 0, 255).astype(
                    np.uint8
                )
            y, cb, cr = (p[:ph, :pw] for p in planes)
            return _ycbcr_to_rgb(y, cb, cr)
        pos += 2 + seglen
    if progressive and scanned:
        # all scans consumed (EOI or stream end): dequantize + IDCT the
        # accumulated coefficient buffers and assemble the image
        ph, pw = dims
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        planes = []
        for i, (_cid, ch, cv, tq) in enumerate(comps):
            if tq not in qtables:
                raise ValueError("JPEG scan references a missing table")
            p = _reconstruct_plane(coefs[i], qtables[tq])
            planes.append(p.repeat(vmax // cv, axis=0).repeat(hmax // ch, axis=1))
        if len(comps) == 1:
            return np.clip(np.round(planes[0][:ph, :pw]), 0, 255).astype(np.uint8)
        y, cb, cr = (p[:ph, :pw] for p in planes)
        return _ycbcr_to_rgb(y, cb, cr)
    raise ValueError("no JPEG scan found")


# ---------------------------------------------------------------- MP3
#
# MP3 AUDIO DECODE remains out of scope (it needs the full Layer III
# chain: side info, 34 Huffman tables, requantization, IMDCT,
# polyphase synthesis). What a curation pipeline actually needs from
# an MP3 column, though, is METADATA — duration, bitrate profile,
# sample rate, channel mode — and that only requires the frame-header
# walk below, which is implemented for real (ISO/IEC 11172-3 header
# layout; ID3v2 skip; CBR/VBR aware). Calling it on a non-MPEG
# payload fails loudly.

_MP3_BITRATES = {
    # (version_group, layer) -> kbps table indexed by the 4-bit field
    ("1", 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    ("1", 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    ("1", 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    ("2", 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    ("2", 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    ("2", 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
}
_MP3_RATES = {"1": [44100, 48000, 32000], "2": [22050, 24000, 16000],
              "2.5": [11025, 12000, 8000]}
_MP3_MODES = ["stereo", "joint_stereo", "dual_channel", "mono"]


def mp3_frame_stats(payload: bytes) -> dict:
    """Walk every MPEG audio frame header in ``payload`` and return
    container metadata: {n_frames, duration_ms, sample_rate, channels,
    channel_mode, layer, is_vbr, bitrate_kbps (mean, rounded)}.
    Skips a leading ID3v2 tag (syncsafe length). Raises on a payload
    that does not start with a valid frame sync, on a corrupt header
    mid-stream, or on free-format bitrate (frame length unknowable
    without decoding)."""
    pos = 0
    if payload[:3] == b"ID3":
        if len(payload) < 10:
            raise ValueError("truncated ID3v2 header")
        size = (
            (payload[6] << 21) | (payload[7] << 14)
            | (payload[8] << 7) | payload[9]
        )
        pos = 10 + size
        if payload[5] & 0x10:  # ID3v2.4 footer flag: 10 more bytes
            pos += 10
    n_frames = 0
    duration_s = 0.0
    bitrates: list[int] = []
    sample_rate = channel_mode = layer_out = None
    while pos + 4 <= len(payload):
        b0, b1, b2, b3 = payload[pos : pos + 4]
        if not (b0 == 0xFF and (b1 & 0xE0) == 0xE0):
            if n_frames == 0:
                raise ValueError("not an MPEG audio payload (no frame sync)")
            break  # trailing junk / ID3v1 tag after the last frame
        ver_bits = (b1 >> 3) & 0x03
        if ver_bits == 0x01:
            raise ValueError("reserved MPEG version")
        version = {0x00: "2.5", 0x02: "2", 0x03: "1"}[ver_bits]
        layer = 4 - ((b1 >> 1) & 0x03)  # 1..3; 4 = reserved
        if layer == 4:
            raise ValueError("reserved MPEG layer")
        br_idx = (b2 >> 4) & 0x0F
        sr_idx = (b2 >> 2) & 0x03
        if br_idx == 0x0F or sr_idx == 0x03:
            raise ValueError("invalid MPEG bitrate/samplerate index")
        if br_idx == 0:
            raise ValueError("free-format MPEG bitrate unsupported")
        vgroup = "1" if version == "1" else "2"
        kbps = _MP3_BITRATES[(vgroup, layer)][br_idx]
        rate = _MP3_RATES[version][sr_idx]
        padding = (b2 >> 1) & 0x01
        mode = _MP3_MODES[(b3 >> 6) & 0x03]
        if layer == 1:
            frame_len = (12 * kbps * 1000 // rate + padding) * 4
            samples = 384
        else:
            samples = 1152 if (layer == 2 or version == "1") else 576
            frame_len = samples // 8 * kbps * 1000 // rate + padding
        if frame_len <= 4:
            raise ValueError("corrupt MPEG frame length")
        sample_rate, channel_mode, layer_out = rate, mode, layer
        bitrates.append(kbps)
        duration_s += samples / rate
        n_frames += 1
        pos += frame_len
    if n_frames == 0:
        raise ValueError("not an MPEG audio payload (no frame sync)")
    return {
        "n_frames": n_frames,
        "duration_ms": int(round(duration_s * 1000)),
        "sample_rate": sample_rate,
        "channels": 1 if channel_mode == "mono" else 2,
        "channel_mode": channel_mode,
        "layer": layer_out,
        "is_vbr": len(set(bitrates)) > 1,
        "bitrate_kbps": int(round(sum(bitrates) / len(bitrates))),
    }


# ---------------------------------------------------------------- GIF
# GIF87a/89a (CompuServe spec): logical screen descriptor, color
# tables, extension blocks, 4-pass interlacing, and REAL variable-width
# LSB-first LZW with Clear/EOI codes and the 4096-entry table reset.

_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start, step)


def _gif_lzw_compress(indices: list[int], min_code_size: int) -> bytes:
    """GIF-variant LZW: codes start at ``min_code_size + 1`` bits,
    LSB-first packing, Clear emitted up front and on table overflow
    (4096), EOI last."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    def fresh_table() -> dict[tuple[int, ...], int]:
        return {(i,): i for i in range(clear)}

    table = fresh_table()
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    cur: tuple[int, ...] = ()
    for k in indices:
        cand = cur + (k,)
        if cand in table:
            cur = cand
            continue
        emit(table[cur], width)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear, width)
            table = fresh_table()
            next_code = eoi + 1
            width = min_code_size + 1
        cur = (k,)
    if cur:
        emit(table[cur], width)
    emit(eoi, width)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _gif_lzw_decompress(data: bytes, min_code_size: int, n_pixels: int) -> list[int]:
    """Inverse of ``_gif_lzw_compress`` incl. the KwKwK case (a code
    equal to the next unassigned entry decodes as prev + prev[0])."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    pos = 0
    bitbuf = 0
    nbits = 0
    out: list[int] = []
    prev: list[int] | None = None

    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF: LZW stream truncated before EOI")
            bitbuf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width

        if code == clear:
            table = [[i] for i in range(clear)] + [[], []]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and table[code]:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + [prev[0]]  # KwKwK
        else:
            raise ValueError(f"GIF: undefined LZW code {code}")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + [entry[0]])
            # widen when the NEXT code would not fit the current width
            if len(table) >= (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) >= n_pixels:
            # some encoders omit a trailing EOI inside the last block
            break
    return out[:n_pixels]


def encode_gif(raster: np.ndarray, interlace: bool = False) -> bytes:
    """Write a 2-D uint8 grayscale raster as a REAL GIF89a: 256-entry
    achromatic global color table, single image, genuine LZW (min code
    size 8) packed into <=255-byte sub-blocks; ``interlace=True``
    stores rows in the spec's 4-pass order with the interlace flag
    set. GIF is lossless for paletted data, so decode(encode(x)) == x
    exactly."""
    if raster.ndim != 2:
        raise ValueError("encode_gif expects a 2-D grayscale raster")
    h, w = raster.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes((0xF7, 0, 0))  # GCT present, 8-bit, 256 entries
    for v in range(256):
        out += bytes((v, v, v))
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes((0x40 if interlace else 0x00,))
    rows = raster
    if interlace:
        order = [
            r
            for start, step in _GIF_INTERLACE_PASSES
            for r in range(start, h, step)
        ]
        rows = raster[order]
    data = _gif_lzw_compress([int(x) for x in rows.ravel()], 8)
    out += bytes((8,))  # LZW min code size
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes((len(chunk),)) + chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """Parse a REAL GIF87a/89a payload into a 2-D uint8 grayscale
    raster: screen/image descriptors, global/local color tables,
    extension-block skipping (Graphic Control, Comment, Application),
    4-pass deinterlacing, and the full LZW decode. Achromatic palettes
    map through directly; color palettes reduce by integer BT.601 luma
    ((299r + 587g + 114b + 500) // 1000) so the result is
    deterministic. First image frame only (animation is out of scope —
    fail-loud on a second image descriptor would hide real data, so
    later frames are simply not read)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x21:  # extension: label + sub-blocks
            pos += 1
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            if pos >= len(payload):
                raise ValueError("GIF: truncated payload")
            pos += 1
        elif b == 0x2C:  # image descriptor
            if pos + 9 > len(payload):
                raise ValueError("GIF: truncated payload")
            _lx, _ty, w, h, ip = struct.unpack("<HHHHB", payload[pos : pos + 9])
            pos += 9
            pal = gct
            if ip & 0x80:
                n = 2 << (ip & 0x07)
                pal = payload[pos : pos + 3 * n]
                pos += 3 * n
            if pal is None:
                raise ValueError("GIF: no color table for image")
            if pos >= len(payload):
                raise ValueError("GIF: truncated payload")
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while pos < len(payload) and payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            if pos >= len(payload):
                raise ValueError("GIF: truncated payload")
            pos += 1
            idx = _gif_lzw_decompress(bytes(data), min_code, w * h)
            lut = np.array(
                [
                    pal[3 * i]
                    if pal[3 * i] == pal[3 * i + 1] == pal[3 * i + 2]
                    else (299 * pal[3 * i] + 587 * pal[3 * i + 1] + 114 * pal[3 * i + 2] + 500) // 1000
                    for i in range(len(pal) // 3)
                ],
                dtype=np.uint8,
            )
            raster = lut[np.array(idx, dtype=np.int32)].reshape(h, w)
            if ip & 0x40:  # deinterlace
                order = [
                    r
                    for start, step in _GIF_INTERLACE_PASSES
                    for r in range(start, h, step)
                ]
                fixed = np.empty_like(raster)
                fixed[order] = raster
                raster = fixed
            return raster
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"GIF: unexpected block id 0x{b:02x}")
    raise ValueError("GIF: no image descriptor before trailer")


# --------------------------------------------------------------- TIFF
# Baseline TIFF 6.0, uncompressed: the TAG-DIRECTORY container pattern
# (IFD walking, typed tag values, offset indirection, either byte
# order) — structurally unlike the chunk/marker walks of PNG/GIF/JPEG.

_TIFF_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def encode_tiff(raster: np.ndarray) -> bytes:
    """Write a 2-D uint8 grayscale raster as a REAL little-endian
    baseline TIFF: II header, one IFD (width / length / bits /
    compression=none / photometric=BlackIsZero / strip offset+count /
    rows-per-strip), one uncompressed strip. Lossless, so
    decode(encode(x)) == x exactly."""
    if raster.ndim != 2:
        raise ValueError("encode_tiff expects a 2-D grayscale raster")
    h, w = raster.shape
    if h > 0xFFFF or w > 0xFFFF:
        # width/length are written as SHORT-typed tags; silently
        # truncating a >65535 dimension would roundtrip to a wrong
        # raster with no error (the codec contract is fail-loud)
        raise ValueError(f"encode_tiff: dimension {h}x{w} exceeds 65535")
    data = raster.astype(np.uint8).tobytes()
    # layout: 8-byte header | pixel data | IFD
    data_off = 8
    ifd_off = data_off + len(data)
    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    out += data
    tags = [
        (256, 3, 1, w),            # ImageWidth
        (257, 3, 1, h),            # ImageLength
        (258, 3, 1, 8),            # BitsPerSample
        (259, 3, 1, 1),            # Compression: none
        (262, 3, 1, 1),            # Photometric: BlackIsZero
        (273, 4, 1, data_off),     # StripOffsets
        (278, 3, 1, h),            # RowsPerStrip
        (279, 4, 1, len(data)),    # StripByteCounts
    ]
    out += struct.pack("<H", len(tags))
    for tag, typ, cnt, val in tags:
        out += struct.pack("<HHI", tag, typ, cnt)
        out += struct.pack("<I", val)
    out += struct.pack("<I", 0)  # no next IFD
    return bytes(out)


def decode_tiff(payload: bytes) -> np.ndarray:
    """Parse a REAL baseline TIFF payload (either byte order) into a
    2-D uint8 grayscale raster: IFD walk with typed tag decoding and
    offset indirection, multi-strip reassembly, 8-bit grayscale
    (photometric 0 inverts WhiteIsZero) or 8-bit RGB reduced by
    integer BT.601 luma. Compression, tiling, and other bit depths
    fail loud — silently mis-decoding foreign data would poison a
    training corpus."""
    if payload[:4] == b"II\x2a\x00":
        e = "<"
    elif payload[:4] == b"MM\x00\x2a":
        e = ">"
    else:
        raise ValueError("not a TIFF payload")
    (ifd_off,) = struct.unpack(e + "I", payload[4:8])

    def read_tag(pos: int):
        tag, typ, cnt = struct.unpack(e + "HHI", payload[pos : pos + 8])
        size = _TIFF_TYPE_SIZES.get(typ)
        if size is None:
            return tag, None
        total = size * cnt
        raw = (
            payload[pos + 8 : pos + 8 + total]
            if total <= 4
            else payload[
                struct.unpack(e + "I", payload[pos + 8 : pos + 12])[0] :
            ][:total]
        )
        fmt = {1: "B", 2: "c", 3: "H", 4: "I", 5: "II"}[typ]
        if typ == 5:
            vals = [
                struct.unpack(e + "II", raw[i : i + 8]) for i in range(0, total, 8)
            ]
        else:
            vals = list(struct.unpack(e + fmt * cnt, raw[:total]))
        return tag, vals

    (n_tags,) = struct.unpack(e + "H", payload[ifd_off : ifd_off + 2])
    tags: dict[int, list] = {}
    for i in range(n_tags):
        tag, vals = read_tag(ifd_off + 2 + 12 * i)
        if vals is not None:
            tags[tag] = vals

    def one(tag: int, default=None):
        if tag in tags:
            return tags[tag][0]
        if default is None:
            raise ValueError(f"TIFF: required tag {tag} missing")
        return default

    w, h = one(256), one(257)
    comp = one(259, 1)
    if comp != 1:
        raise ValueError(f"TIFF: compression {comp} not supported (baseline uncompressed only)")
    if 322 in tags or 323 in tags:
        raise ValueError("TIFF: tiled layout not supported")
    photo = one(262, 1)
    spp = one(277, 1)
    bits = tags.get(258, [8])
    if any(b != 8 for b in bits):
        raise ValueError(f"TIFF: bits-per-sample {bits} not supported (8 only)")
    offsets = tags[273]
    counts = tags.get(279, [w * h * spp])
    data = b"".join(
        payload[o : o + c] for o, c in zip(offsets, counts)
    )
    if len(data) < w * h * spp:
        raise ValueError("TIFF: strip data shorter than raster")
    arr = np.frombuffer(data[: w * h * spp], dtype=np.uint8)
    if spp == 1 and photo in (0, 1):
        raster = arr.reshape(h, w)
        return (255 - raster) if photo == 0 else raster.copy()
    if spp == 3 and photo == 2:
        rgb = arr.reshape(h, w, 3).astype(np.int64)
        return (
            (299 * rgb[:, :, 0] + 587 * rgb[:, :, 1] + 114 * rgb[:, :, 2] + 500)
            // 1000
        ).astype(np.uint8)
    raise ValueError(f"TIFF: photometric {photo} / {spp} samples not supported")


# ---------------------------------------------------------------- AVI
# RIFF/AVI 1.0 with MJPEG video frames: the VIDEO container pattern —
# nested LIST chunks (hdrl/strl/movi), fixed-layout binary headers
# (avih/strh/BITMAPINFOHEADER), word-aligned data chunks, and an idx1
# frame index. Container-only responsibility (like the MP3 frame
# walk): the frames inside '00dc' chunks are complete baseline JPEGs
# handled by encode_jpeg/decode_jpeg, so frame SAMPLING can seek
# straight to the k-th chunk without decoding the rest — the property
# a 100 TB video pipeline needs.


def encode_avi(
    jpeg_frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Write complete JPEG payloads as a REAL AVI 1.0 / MJPEG file:
    RIFF('AVI ') > LIST hdrl (avih + LIST strl(strh 'vids'/'MJPG' +
    BITMAPINFOHEADER)) > LIST movi ('00dc' chunks, word-aligned) >
    idx1. Fail-loud on empty input or non-JPEG frame payloads."""
    if not jpeg_frames:
        raise ValueError("encode_avi needs at least one frame")
    for f in jpeg_frames:
        if f[:2] != b"\xff\xd8":
            raise ValueError("encode_avi: frame payload is not a JPEG (no SOI)")
    n = len(jpeg_frames)
    max_size = max(len(f) for f in jpeg_frames)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # microseconds per frame
        max_size * fps,    # max bytes per second
        0,                 # padding granularity
        0x10,              # AVIF_HASINDEX
        n,                 # total frames
        0,                 # initial frames
        1,                 # streams
        max_size,          # suggested buffer size
        width, height,
        0, 0, 0, 0,        # reserved
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4H",
        b"vids", b"MJPG",
        0, 0, 0,           # flags, priority, language+initial frames
        0,                 # initial frames
        1, fps,            # scale, rate -> fps frames/sec
        0, n,              # start, length (frames)
        max_size,          # suggested buffer
        0xFFFFFFFF,        # quality (default)
        0,                 # sample size (varies)
        0, 0, width, height,  # rcFrame
    )
    bmih = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )

    def chunk(ckid: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return ckid + struct.pack("<I", len(data)) + data + pad

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", bmih))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)

    movi_body = b"movi"
    offsets = []
    for f in jpeg_frames:
        offsets.append(len(movi_body) - 4)  # offset from after 'movi' tag
        movi_body += chunk(b"00dc", f)
    movi = chunk(b"LIST", movi_body)

    idx = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off + 4, len(f))
        for off, f in zip(offsets, jpeg_frames)
    )
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi(payload: bytes) -> tuple[dict, list[bytes]]:
    """Walk a REAL AVI payload into (metadata, jpeg_frames): RIFF
    validation, nested-LIST traversal, avih/strh header decode, movi
    '00dc' extraction with word-alignment, and a frame-count cross-
    check against the avih header. Truncation, non-AVI input, a
    missing header, or a frame-count mismatch all fail loud —
    silently mis-walking a container would poison every frame
    downstream."""
    # length check FIRST: python slicing never raises on short input,
    # so a <12-byte payload would otherwise fall through to the magic
    # comparison and report "not an AVI payload" instead of truncation
    if len(payload) < 12:
        raise ValueError("AVI: truncated payload")
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    if riff_size + 8 > len(payload):
        raise ValueError("AVI: truncated payload")

    meta: dict = {}
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            ckid = payload[pos : pos + 4]
            (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            data_start = pos + 8
            data_end = data_start + size
            if data_end > end:
                raise ValueError("AVI: truncated chunk")
            if ckid == b"LIST":
                walk(data_start + 4, data_end)
            elif ckid == b"avih":
                (uspf, _mbs, _pad, _flags, total, _init, streams, _buf,
                 w, h) = struct.unpack("<10I", payload[data_start : data_start + 40])
                meta.update(
                    us_per_frame=uspf, total_frames=total,
                    n_streams=streams, width=w, height=h,
                )
            elif ckid == b"strh":
                fcc_type = payload[data_start : data_start + 4]
                handler = payload[data_start + 4 : data_start + 8]
                if fcc_type == b"vids":
                    meta["handler"] = handler.decode("ascii", "replace")
            elif ckid == b"00dc":
                frames.append(payload[data_start:data_end])
            pos = data_end + (size % 2)  # word alignment

    walk(12, 8 + riff_size)
    if "total_frames" not in meta:
        raise ValueError("AVI: missing avih header")
    if meta.get("handler") not in ("MJPG",):
        raise ValueError(f"AVI: unsupported codec {meta.get('handler')!r}")
    if len(frames) != meta["total_frames"]:
        raise ValueError(
            f"AVI: avih declares {meta['total_frames']} frames, "
            f"movi holds {len(frames)}"
        )
    return meta, frames
