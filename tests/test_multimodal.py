"""Multimodal plumbing tests: schema, batch shape, deterministic stub
decode, feature extraction, frame-sampling fanout."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def media(spark):
    rows = [
        (1, "image", "image/png", b"payload-one", {"w": "8"}),
        (2, "image", "image/png", b"payload-two", {"w": "8"}),
        (3, "image", "image/png", b"payload-one", {"w": "8"}),  # dup of 1
        (4, "video", "video/mp4", b"0123456789abcdef" * 8, {}),
    ]
    from prohap_spark.multimodal import MEDIA_SCHEMA

    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_metadata_and_exact_dedup(spark, media):
    from prohap_spark.multimodal import attach_media_metadata

    out = attach_media_metadata(media)
    rows = {r["media_id"]: r.asDict() for r in out.collect()}
    assert rows[1]["n_bytes"] == len(b"payload-one")
    assert rows[1]["content_hash"] == rows[3]["content_hash"]
    assert rows[1]["content_hash"] != rows[2]["content_hash"]


def test_decode_deterministic(spark, media):
    from prohap_spark.multimodal import decode_images

    imgs = media.where(F.col("kind") == "image")
    out = {r["media_id"]: r["pixels"] for r in decode_images(imgs, width=4, height=4).collect()}
    assert len(out[1]) == 16
    assert out[1] == out[3]  # same payload → same fake decode
    assert out[1] != out[2]
    # rerun → identical (determinism across executions)
    out2 = {r["media_id"]: r["pixels"] for r in decode_images(imgs, width=4, height=4).collect()}
    assert out == out2


def test_bmp_roundtrip_including_padding():
    import numpy as np

    from prohap_spark.multimodal.codecs import decode_bmp, encode_bmp

    # width 6 → 18-byte rows padded to 20: exercises the stride logic
    raster = np.arange(30, dtype=np.uint8).reshape(5, 6) * 7
    payload = encode_bmp(raster)
    assert payload[:2] == b"BM"
    assert np.array_equal(decode_bmp(payload), raster)


def test_bmp_top_down_and_paletted():
    import struct

    import numpy as np

    from prohap_spark.multimodal.codecs import decode_bmp, encode_bmp

    raster = np.arange(16, dtype=np.uint8).reshape(4, 4) * 16
    # flip the encoded height negative → top-down row order; the pixel
    # rows must then be reinterpreted in reverse
    payload = bytearray(encode_bmp(raster))
    struct.pack_into("<i", payload, 22, -4)
    assert np.array_equal(decode_bmp(bytes(payload)), raster[::-1])

    # hand-built 8-bit paletted BMP: 2×2, identity grayscale palette
    pal = b"".join(bytes((i, i, i, 0)) for i in range(256))
    px_rows = bytes((10, 20, 0, 0)) + bytes((30, 40, 0, 0))  # bottom-up, padded
    offset = 14 + 40 + len(pal)
    hdr = struct.pack("<2sIHHI", b"BM", offset + len(px_rows), 0, 0, offset)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, len(px_rows), 0, 0, 256, 0)
    decoded = decode_bmp(hdr + info + pal + px_rows)
    assert np.array_equal(decoded, np.array([[30, 40], [10, 20]], dtype=np.uint8))


def test_bmp_rejects_malformed():
    import numpy as np

    from prohap_spark.multimodal.codecs import decode_bmp, encode_bmp

    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"not a bitmap at all, just bytes that are long enough to pass the length check....")
    good = encode_bmp(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(good[:-8])


def test_wav_roundtrip_mono_stereo_and_chunk_walk():
    import struct

    import numpy as np

    from prohap_spark.multimodal.codecs import decode_wav, encode_wav

    samples = (np.arange(100) * 257 - 12800).astype(np.int16)
    s, rate, ch = decode_wav(encode_wav(samples, sample_rate=16000))
    assert rate == 16000 and ch == 1 and np.array_equal(s, samples)

    stereo = np.stack([samples, -samples], axis=1).ravel()
    s2, _, ch2 = decode_wav(encode_wav(stereo, channels=2))
    assert ch2 == 2 and np.array_equal(s2, stereo)

    # inject an odd-sized LIST chunk between fmt and data: the chunk
    # walk must skip it (with the pad byte) and still find data
    payload = encode_wav(samples)
    fmt_end = 12 + 8 + 16
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # 5 odd → 1 pad
    patched = payload[:fmt_end] + junk + payload[fmt_end:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    s3, _, _ = decode_wav(patched)
    assert np.array_equal(s3, samples)

    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OGGS whatever")


def test_real_codec_spark_paths(spark):
    import numpy as np

    from prohap_spark.multimodal import audio_window_features, decode_images
    from prohap_spark.multimodal.codecs import encode_bmp, encode_wav

    raster = np.arange(64, dtype=np.uint8).reshape(8, 8)
    samples = (np.arange(80, dtype=np.int64) * 100 - 4000).astype(np.int16)
    df = spark.createDataFrame(
        [(1, bytearray(encode_bmp(raster)), bytearray(encode_wav(samples)))],
        ["media_id", "payload", "wav"],
    )
    pixels = decode_images(df.select("media_id", "payload"), real_codec=True).collect()[0]["pixels"]
    assert pixels == list(range(64))

    rows = audio_window_features(
        df.select("media_id", F.col("wav").alias("payload")),
        window=32, hop=16, max_windows=4, codec="pcm16_wav",
    ).collect()
    assert len(rows) == 4  # (80 - 32) // 16 + 1 = 4
    seg0 = samples[:32].astype(np.float64)
    r0 = next(r for r in rows if r["win_idx"] == 0)
    assert abs(r0["win_mean"] - seg0.mean()) < 1e-9
    assert abs(r0["win_rms"] - np.sqrt((seg0 * seg0).mean())) < 1e-9


def test_feature_extraction(spark, media):
    from prohap_spark.multimodal import decode_images, extract_image_features

    imgs = decode_images(media.where(F.col("kind") == "image"), width=4, height=4)
    feats = extract_image_features(imgs).collect()
    for r in feats:
        assert 0 <= r["px_mean"] <= 255
        assert r["px_std"] >= 0


def test_video_frame_sampling(spark, media):
    from prohap_spark.multimodal import sample_video_frames

    frames = sample_video_frames(media.where(F.col("kind") == "video"), max_frames=3).collect()
    assert {r["frame_idx"] for r in frames} == {0, 10, 20}
    assert all(len(r["frame_stub"]) > 0 for r in frames)


def test_resize_raster_block_means(spark):
    from pyspark.sql import functions as F

    from prohap_spark.multimodal import resize_raster

    # 4×4 raster with known values → 2×2 block means
    px = [
        0, 1, 2, 3,
        4, 5, 6, 7,
        8, 9, 10, 11,
        12, 13, 14, 15,
    ]
    df = spark.createDataFrame([(1,)], ["media_id"]).select(
        "media_id", F.array(*[F.lit(v) for v in px]).alias("pixels")
    )
    out = resize_raster(df, width=4, factor=2).collect()[0]["pixels_small"]
    assert out == [ (0+1+4+5)/4, (2+3+6+7)/4, (8+9+12+13)/4, (10+11+14+15)/4 ]


def test_audio_window_features_numpy_parity(spark):
    import numpy as np

    from prohap_spark.multimodal import audio_window_features

    payload = bytes(range(200))
    df = spark.createDataFrame([(7, bytearray(payload))], ["media_id", "payload"])
    rows = audio_window_features(df, window=64, hop=32, max_windows=8).collect()
    buf = np.frombuffer(payload, dtype=np.uint8)
    expected_n = sum(1 for w in range(8) if w * 32 + 64 <= len(buf))
    assert len(rows) == expected_n
    for r in rows:
        seg = buf[r["win_idx"] * 32 : r["win_idx"] * 32 + 64].astype(np.float64)
        assert abs(r["win_mean"] - seg.mean()) < 1e-9
        assert abs(r["win_rms"] - np.sqrt((seg * seg).mean())) < 1e-9


def test_png_roundtrip_filters_colortypes_and_shapes():
    import numpy as np

    from prohap_spark.multimodal.codecs import decode_png, encode_png

    rng = np.random.RandomState(7)
    for color_type in (0, 2):
        # heights ≥ 5 cycle through every scanline filter (row i uses
        # filter i % 5); odd widths probe the stride math
        for shape in [(8, 8), (1, 1), (5, 13), (16, 3)]:
            raster = rng.randint(0, 256, size=shape).astype(np.uint8)
            payload = encode_png(raster, color_type=color_type)
            assert payload[:8] == b"\x89PNG\r\n\x1a\n"
            assert np.array_equal(decode_png(payload), raster)


def test_png_multi_idat_ancillary_skip_and_rgba():
    import struct
    import zlib

    import numpy as np

    from prohap_spark.multimodal.codecs import decode_png, encode_png

    raster = np.arange(64, dtype=np.uint8).reshape(8, 8) * 3
    payload = encode_png(raster)
    assert payload.count(b"IDAT") == 2  # the stream really is split

    # splice a tEXt ancillary chunk between IHDR and the first IDAT
    t, d = b"tEXt", b"k\x00v"
    chunk = struct.pack(">I", len(d)) + t + d + struct.pack(
        ">I", zlib.crc32(t + d) & 0xFFFFFFFF
    )
    ihdr_end = 8 + 12 + 13
    spliced = payload[:ihdr_end] + chunk + payload[ihdr_end:]
    assert np.array_equal(decode_png(spliced), raster)

    # hand-built RGBA (color type 6, filter 0 rows): alpha ignored,
    # r=g=b luma exact
    w = h = 4
    rows = b""
    for r in range(h):
        rows += b"\x00" + b"".join(
            bytes((10 * r + c, 10 * r + c, 10 * r + c, 255)) for c in range(w)
        )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)

    def png_chunk(ctype, data):
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(
            ">I", zlib.crc32(ctype + data) & 0xFFFFFFFF
        )

    rgba = (
        b"\x89PNG\r\n\x1a\n"
        + png_chunk(b"IHDR", ihdr)
        + png_chunk(b"IDAT", zlib.compress(rows))
        + png_chunk(b"IEND", b"")
    )
    expected = np.array([[10 * r + c for c in range(w)] for r in range(h)], dtype=np.uint8)
    assert np.array_equal(decode_png(rgba), expected)


def test_png_rejects_malformed():
    import numpy as np

    from prohap_spark.multimodal.codecs import decode_png, encode_png

    good = encode_png(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"XXXX" + good[4:])
    with pytest.raises(ValueError, match="IEND|IDAT|IHDR"):
        decode_png(good[:-12])  # IEND stripped
    corrupted = bytearray(good)
    corrupted[8 + 12 + 6] ^= 0xFF  # flip an IHDR byte → CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupted))


def test_decode_images_dispatches_on_magic(spark):
    import numpy as np

    from prohap_spark.multimodal import decode_images
    from prohap_spark.multimodal.codecs import encode_bmp, encode_png

    raster = np.arange(64, dtype=np.uint8).reshape(8, 8)
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_bmp(raster))),
            (2, bytearray(encode_png(raster, color_type=0))),
            (3, bytearray(encode_png(raster, color_type=2))),
        ],
        ["media_id", "payload"],
    )
    rows = decode_images(df, real_codec=True).collect()
    assert all(r["pixels"] == list(range(64)) for r in rows)

    # GIF and TIFF gained real decoders in r6, so the
    # unrecognized-format probe uses a genuinely unknown magic
    bad = spark.createDataFrame([(9, bytearray(b"FARB not a format"))], ["media_id", "payload"])
    with pytest.raises(Exception, match="unrecognized image payload"):
        decode_images(bad, real_codec=True).collect()


def test_png_rejects_truncated_crc():
    import numpy as np

    from prohap_spark.multimodal.codecs import decode_png, encode_png

    good = encode_png(np.zeros((4, 4), dtype=np.uint8))
    # strip IEND (12 bytes) and 2 more bytes into the last IDAT's CRC:
    # the chunk DATA fits but its 4-byte CRC field is cut short — this
    # previously escaped as struct.error instead of ValueError
    with pytest.raises(ValueError, match="truncated"):
        decode_png(good[:-14])


def test_jpeg_constant_blocks_exact():
    """Constant 8x8 blocks are pure DC, and DC-only coding with an
    all-ones quant table round-trips byte-exact through the full
    FDCT -> Huffman -> IDCT pipeline — the property the driver oracle
    relies on."""
    import numpy as np

    from prohap_spark.multimodal.codecs import decode_jpeg, encode_jpeg

    vals = np.array([0, 1, 17, 128, 200, 254, 255, 63] * 8, dtype=np.uint8)
    raster = vals.repeat(64).reshape(512, 8)
    out = decode_jpeg(encode_jpeg(raster, quant=np.ones((8, 8))))
    assert (out == raster).all()


def test_jpeg_random_roundtrip_tolerance_and_stuffing():
    """Random rasters with quant=1: only the DCT-coefficient rounding
    is lossy, so every pixel lands within +/-2; the entropy stream of
    random data necessarily exercises 0xFF byte stuffing."""
    import numpy as np

    from prohap_spark.multimodal.codecs import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(11)
    x = rng.integers(0, 256, (40, 56)).astype(np.uint8)
    enc = encode_jpeg(x, quant=np.ones((8, 8)))
    assert b"\xff\x00" in enc  # stuffing really exercised
    y = decode_jpeg(enc)
    assert y.shape == x.shape
    assert np.abs(y.astype(int) - x.astype(int)).max() <= 2


def test_jpeg_standard_table_smooth_fidelity_and_crop():
    """Annex-K luminance table on a smooth gradient stays within a
    small bound (lossy but faithful), and non-multiple-of-8 rasters
    (true dims in SOF, ceil'd block counts) crop back exactly."""
    import numpy as np

    from prohap_spark.multimodal.codecs import decode_jpeg, encode_jpeg

    g = np.tile(np.linspace(0, 255, 40).astype(np.uint8), (24, 1))
    y = decode_jpeg(encode_jpeg(g))
    assert y.shape == g.shape
    assert np.abs(y.astype(int) - g.astype(int)).max() <= 4

    rng = np.random.default_rng(5)
    x = rng.integers(0, 256, (13, 10)).astype(np.uint8)
    y2 = decode_jpeg(encode_jpeg(x, quant=np.ones((8, 8))))
    assert y2.shape == (13, 10)
    assert np.abs(y2.astype(int) - x.astype(int)).max() <= 2


def test_jpeg_rejects_malformed():
    import numpy as np
    import pytest

    from prohap_spark.multimodal.codecs import decode_jpeg, encode_jpeg

    good = encode_jpeg(np.zeros((8, 8), dtype=np.uint8), quant=np.ones((8, 8)))
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x00\x01" + good[2:])
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(good[:30])
    # flip SOF0 (0xC0) to progressive SOF2 (0xC2): the sequential scan
    # header (Ss=0, Se=63) is an illegal progressive spectral range
    sof = good.index(b"\xff\xc0")
    with pytest.raises(ValueError, match="spectral"):
        decode_jpeg(good[:sof + 1] + b"\xc2" + good[sof + 2:])
    # lossless SOF3 -> explicit reject
    with pytest.raises(ValueError, match="baseline sequential and progressive"):
        decode_jpeg(good[:sof + 1] + b"\xc3" + good[sof + 2:])
    # 4-component (CMYK-style) frame header -> explicit reject
    ncomp_at = sof + 4 + 5  # marker(2) len(2) prec(1) h(2) w(2) -> ncomp
    with pytest.raises(ValueError, match="1- or 3-component"):
        decode_jpeg(good[:ncomp_at] + b"\x04" + good[ncomp_at + 1:])
    # sampling factor beyond 2 (3x3 luma) in a COLOR stream -> reject
    color = encode_jpeg(
        np.zeros((8, 8, 3), dtype=np.uint8), quant=np.ones((8, 8))
    )
    csof = color.index(b"\xff\xc0")
    hv_at = csof + 4 + 5 + 2  # header + ncomp(1) + cid(1) -> sampling
    with pytest.raises(ValueError, match="beyond 2"):
        decode_jpeg(color[:hv_at] + b"\x33" + color[hv_at + 1:])


def test_jpeg_decode_images_dispatch(spark):
    import numpy as np

    from prohap_spark.multimodal import decode_images
    from prohap_spark.multimodal.codecs import encode_jpeg

    raster = np.arange(64, dtype=np.uint8).repeat(64).reshape(512, 8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_jpeg(raster, quant=np.ones((8, 8)))))],
        ["media_id", "payload"],
    )
    (row,) = decode_images(df, real_codec=True).collect()
    assert row["pixels"] == raster.ravel().astype(int).tolist()


def test_jpeg_marker_walk_robustness():
    """Degenerate marker streams raise ValueError (never struct/numpy
    errors): scan-less SOI+EOI, standalone restart markers skipped,
    short DQT/DHT/SOF bodies, zero segment lengths."""
    import numpy as np
    import pytest

    from prohap_spark.multimodal.codecs import decode_jpeg, encode_jpeg

    with pytest.raises(ValueError, match="no JPEG scan"):
        decode_jpeg(b"\xff\xd8\xff\xd9")
    # RST0 standalone marker between SOI and a truncated DQT
    with pytest.raises(ValueError, match="truncated JPEG quant"):
        decode_jpeg(b"\xff\xd8\xff\xd0\xff\xdb\x00\x05\x00\x01\x02")
    with pytest.raises(ValueError, match="corrupt JPEG segment length"):
        decode_jpeg(b"\xff\xd8\xff\xdb\x00\x01")
    good = encode_jpeg(np.zeros((8, 8), dtype=np.uint8), quant=np.ones((8, 8)))
    dht = good.index(b"\xff\xc4")
    # shrink the first DHT to a 3-byte body -> truncated-table reject
    bad = good[:dht] + b"\xff\xc4\x00\x05" + good[dht + 4 : dht + 7] + good[dht + 7 :]
    with pytest.raises(ValueError):
        decode_jpeg(bad)


def test_jpeg_foreign_payload_shapes():
    """Real-world container variations (review findings): non-multiple-
    of-8 SOF dims decode deterministically with all blocks read; an
    extra chroma (id-1) DQT does not clobber the luma table; a 4-byte
    COM segment is inert, never a crop directive."""
    import struct

    import numpy as np

    from prohap_spark.multimodal.codecs import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(3)
    x = rng.integers(0, 256, (13, 13)).astype(np.uint8)
    enc = encode_jpeg(x, quant=np.ones((8, 8)))
    y1, y2 = decode_jpeg(enc), decode_jpeg(enc)
    assert (y1 == y2).all() and y1.shape == (13, 13)
    assert np.abs(y1.astype(int) - x.astype(int)).max() <= 2

    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    const = encode_jpeg(np.full((8, 8), 200, dtype=np.uint8), quant=np.ones((8, 8)))
    with_chroma = const[:2] + seg(0xDB, b"\x01" + bytes([99] * 64)) + const[2:]
    assert (decode_jpeg(with_chroma) == 200).all()
    with_com = const[:2] + seg(0xFE, b"\x00\x05\x00\x05") + const[2:]
    assert decode_jpeg(with_com).shape == (8, 8)

    with pytest.raises(ValueError, match="65535"):
        encode_jpeg(np.zeros((65536, 8), dtype=np.uint8))


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a
    marker. Injecting pads before the DQT segment must not change the
    decode — a naive walker would parse the pad pair as a marker with
    a garbage segment length."""
    import numpy as np

    from prohap_spark.multimodal.codecs import decode_jpeg, encode_jpeg

    vals = np.array([0, 1, 17, 128, 200, 254, 255, 63] * 8, dtype=np.uint8)
    raster = vals.repeat(64).reshape(512, 8)
    enc = bytes(encode_jpeg(raster, quant=np.ones((8, 8))))
    # pad immediately after SOI, before the first marker segment
    assert enc[:2] == b"\xff\xd8"
    padded = enc[:2] + b"\xff\xff\xff" + enc[2:]
    out = decode_jpeg(padded)
    assert (out == raster).all()


def test_jpeg_color_roundtrip_exact_grays_and_tolerance():
    """Baseline 4:4:4 color JPEG: (1) RGB grays (r=g=b) map to integer
    Y with Cb=Cr=128 exactly, so a gray-in-RGB image with all-ones
    luma quant round-trips byte-exact in every channel; (2) a smooth
    color ramp under the standard quant tables stays within a small
    tolerance; (3) non-multiple-of-8 dims crop correctly."""
    import numpy as np

    from prohap_spark.multimodal.codecs import decode_jpeg, encode_jpeg

    # (1) exact: constant-per-block gray levels in an RGB container
    vals = np.array([0, 1, 17, 128, 200, 254, 255, 63] * 2, dtype=np.uint8)
    gray = vals.repeat(64).reshape(128, 8)
    rgb = np.stack([gray, gray, gray], axis=-1)
    out = decode_jpeg(encode_jpeg(rgb, quant=np.ones((8, 8))))
    assert out.shape == (128, 8, 3)
    assert (out == rgb).all()

    # (2) tolerance: smooth color ramp, standard tables
    h, w = 24, 40
    yy, xx = np.mgrid[0:h, 0:w]
    ramp = np.stack(
        [
            (xx * 255 // max(w - 1, 1)).astype(np.uint8),
            (yy * 255 // max(h - 1, 1)).astype(np.uint8),
            ((xx + yy) * 255 // (h + w - 2)).astype(np.uint8),
        ],
        axis=-1,
    )
    dec = decode_jpeg(encode_jpeg(ramp))
    assert dec.shape == ramp.shape
    err = np.abs(dec.astype(np.int64) - ramp.astype(np.int64))
    assert err.mean() < 6 and err.max() < 60

    # (3) crop on non-multiple-of-8 dims with ones luma quant
    odd = np.stack([gray[:13, :5]] * 3, axis=-1)
    dec2 = decode_jpeg(encode_jpeg(odd, quant=np.ones((8, 8))))
    assert dec2.shape == (13, 5, 3)
    assert (dec2 == odd).all()


def test_jpeg_color_channels_are_independent():
    """A pure-red block must decode red, not gray — i.e. the chroma
    planes genuinely carry through the interleaved scan and the T.871
    inverse transform recovers the hue."""
    import numpy as np

    from prohap_spark.multimodal.codecs import decode_jpeg, encode_jpeg

    red = np.zeros((8, 8, 3), dtype=np.uint8)
    red[:, :, 0] = 200
    dec = decode_jpeg(encode_jpeg(red, quant=np.ones((8, 8))))
    err = np.abs(dec.astype(np.int64) - red.astype(np.int64))
    assert err.max() <= 2, dec[0, 0]


def test_jpeg_420_subsampled_roundtrip():
    """4:2:0 — the layout virtually every real-world JPEG uses: 16×16
    MCUs of 4 Y + 1 Cb + 1 Cr blocks, 2×2 box-mean chroma. (1)
    Constant-per-MCU grays with all-ones luma quant are exact (chroma
    constant 128 → zero coefficients under any table); (2) a smooth
    color ramp survives encode/decode within tolerance — chroma is
    halved and replicated, so the bound is looser than 4:4:4; (3)
    non-multiple-of-16 dims crop correctly."""
    import numpy as np

    from prohap_spark.multimodal.codecs import decode_jpeg, encode_jpeg

    vals = np.array([0, 17, 128, 255, 63, 200, 1, 254], dtype=np.uint8)
    gray = vals.repeat(256).reshape(128, 16)  # constant 16x16 MCUs
    rgb = np.stack([gray, gray, gray], axis=-1)
    out = decode_jpeg(encode_jpeg(rgb, quant=np.ones((8, 8)), subsample=True))
    assert out.shape == (128, 16, 3)
    assert (out == rgb).all()

    h, w = 40, 56
    yy, xx = np.mgrid[0:h, 0:w]
    ramp = np.stack(
        [
            (xx * 255 // (w - 1)).astype(np.uint8),
            (yy * 255 // (h - 1)).astype(np.uint8),
            ((xx + yy) * 255 // (h + w - 2)).astype(np.uint8),
        ],
        axis=-1,
    )
    dec = decode_jpeg(encode_jpeg(ramp, subsample=True))
    assert dec.shape == ramp.shape
    err = np.abs(dec.astype(np.int64) - ramp.astype(np.int64))
    assert err.mean() < 8 and err.max() < 80

    odd = np.stack([gray[:19, :11]] * 3, axis=-1)
    dec2 = decode_jpeg(encode_jpeg(odd, quant=np.ones((8, 8)), subsample=True))
    assert dec2.shape == (19, 11, 3)
    assert (dec2 == odd).all()


def test_jpeg_420_chroma_carries_hue():
    """A solid color block must keep its hue through the subsampled
    chroma path (constant chroma loses nothing to 2x2 averaging)."""
    import numpy as np

    from prohap_spark.multimodal.codecs import decode_jpeg, encode_jpeg

    teal = np.zeros((16, 16, 3), dtype=np.uint8)
    teal[:, :, 1] = 150
    teal[:, :, 2] = 180
    dec = decode_jpeg(encode_jpeg(teal, quant=np.ones((8, 8)), subsample=True))
    err = np.abs(dec.astype(np.int64) - teal.astype(np.int64))
    assert err.max() <= 2, dec[0, 0]


def test_jpeg_restart_intervals_roundtrip():
    """DRI/RSTn: restart markers byte-align the entropy stream, reset
    DC predictors, and cycle RST0-RST7 — all three layouts (gray,
    4:4:4, 4:2:0) must round-trip exactly on constant-block inputs
    with restarts every 3 MCUs, and an out-of-sequence restart marker
    must be rejected."""
    import numpy as np

    from prohap_spark.multimodal.codecs import decode_jpeg, encode_jpeg

    ones = np.ones((8, 8))
    vals = np.array([0, 17, 128, 255, 63, 200, 1, 254] * 4, dtype=np.uint8)
    gray = vals.repeat(64).reshape(256, 8)  # 32 blocks -> 10 restarts
    enc = encode_jpeg(gray, quant=ones, restart_interval=3)
    assert b"\xff\xdd" in enc and b"\xff\xd0" in enc and b"\xff\xd7" in enc
    assert (decode_jpeg(enc) == gray).all()

    rgb = np.stack([gray, gray, gray], axis=-1)
    enc444 = encode_jpeg(rgb, quant=ones, restart_interval=3)
    assert (decode_jpeg(enc444) == rgb).all()

    gray16 = vals[:8].repeat(256).reshape(128, 16)  # 8 16x16 MCUs
    rgb420 = np.stack([gray16, gray16, gray16], axis=-1)
    enc420 = encode_jpeg(rgb420, quant=ones, subsample=True, restart_interval=3)
    assert (decode_jpeg(enc420) == rgb420).all()

    # corrupt the first RST0 into RST5 -> sequence error
    bad = enc.replace(b"\xff\xd0", b"\xff\xd5", 1)
    import pytest

    with pytest.raises(ValueError, match="restart"):
        decode_jpeg(bad)


def test_jpeg_progressive_equals_sequential():
    """Progressive (SOF2) completeness: the scan script (DC first at
    Al=1, DC refinement, split-band AC first scans, AC refinement with
    correction bits and EOB runs) reconstructs the IDENTICAL
    coefficients the sequential encoder writes, so the decoded images
    are equal byte-for-byte across gray, 4:4:4 and 4:2:0 — and a
    constant-block image with all-ones luma quant decodes exactly."""
    import numpy as np

    from prohap_spark.multimodal.codecs import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(7)
    g = rng.integers(0, 256, (24, 40)).astype(np.uint8)
    assert (decode_jpeg(encode_jpeg_progressive(g)) ==
            decode_jpeg(encode_jpeg(g))).all()

    vals = np.array([0, 17, 128, 255, 63, 200, 1, 254], dtype=np.uint8)
    cg = vals.repeat(64).reshape(64, 8)
    assert (decode_jpeg(
        encode_jpeg_progressive(cg, quant=np.ones((8, 8)))) == cg).all()

    rgb = rng.integers(0, 256, (24, 40, 3)).astype(np.uint8)
    assert (decode_jpeg(encode_jpeg_progressive(rgb)) ==
            decode_jpeg(encode_jpeg(rgb))).all()
    assert (decode_jpeg(encode_jpeg_progressive(rgb, subsample=True)) ==
            decode_jpeg(encode_jpeg(rgb, subsample=True))).all()

    # smooth gradient: long EOB runs across blocks in the 6-63 band,
    # exercising EOBn codes with nonzero run-length extensions
    smooth = np.outer(np.linspace(0, 255, 48), np.ones(64)).astype(np.uint8)
    assert (decode_jpeg(encode_jpeg_progressive(smooth)) ==
            decode_jpeg(encode_jpeg(smooth))).all()


def test_jpeg_progressive_stream_shape():
    """The progressive stream is structurally progressive: SOF2 marker,
    multiple SOS scans, and the non-multiple-of-8 crop still works."""
    import numpy as np

    from prohap_spark.multimodal.codecs import decode_jpeg, encode_jpeg_progressive

    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, (13, 21, 3)).astype(np.uint8)
    enc = encode_jpeg_progressive(rgb)
    assert b"\xff\xc2" in enc and b"\xff\xc0" not in enc[:200]
    assert enc.count(b"\xff\xda") >= 6  # DC first + refine + per-comp AC scans
    assert decode_jpeg(enc).shape == (13, 21, 3)


def test_audio_container_stats_wav_and_mpeg(spark):
    """Container metadata over a mixed audio column: WAV duration from
    the real PCM parse; MPEG duration/bitrate from the real
    frame-header walk (with an ID3v2 tag to skip and a VBR stream to
    flag). Decode of MPEG audio itself stays out of scope."""
    import numpy as np

    from prohap_spark.multimodal import audio_container_stats
    from prohap_spark.multimodal.codecs import encode_wav

    def mp3_frame(kbps_idx, sr_idx=0, pad=0, mode=3):
        b2 = (kbps_idx << 4) | (sr_idx << 2) | (pad << 1)
        hdr = bytes([0xFF, 0xFB, b2, mode << 6])
        kbps = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320][kbps_idx]
        rate = [44100, 48000, 32000][sr_idx]
        return hdr + b"\x00" * (144 * kbps * 1000 // rate + pad - 4)

    wav = encode_wav((np.arange(8000) % 256 - 128).astype(np.int16),
                     sample_rate=8000)
    cbr = b"".join(mp3_frame(9) for _ in range(5))
    # flags byte 0x10 = ID3v2.4 FOOTER present: tag = 10 + size + 10
    id3 = (b"ID3\x04\x00\x10\x00\x00\x00\x0a" + b"x" * 10
           + b"3DI\x04\x00\x10\x00\x00\x00\x0a" + cbr)
    vbr = mp3_frame(9) + mp3_frame(12) + mp3_frame(5)
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(id3)), (3, bytearray(vbr))],
        ["media_id", "payload"],
    )
    rows = {r["media_id"]: r for r in audio_container_stats(df).collect()}
    assert rows[1]["fmt"] == "wav" and rows[1]["duration_ms"] == 1000
    assert rows[1]["sample_rate"] == 8000 and rows[1]["bitrate_kbps"] == 128
    assert rows[2]["fmt"] == "mpeg_audio" and rows[2]["n_frames"] == 5
    assert rows[2]["bitrate_kbps"] == 128 and not rows[2]["is_vbr"]
    assert rows[3]["is_vbr"] and rows[3]["n_frames"] == 3
    expected_ms = int(round(5 * 1152 / 44100 * 1000))
    assert abs(rows[2]["duration_ms"] - expected_ms) <= 1


def test_jpeg_progressive_ac_scan_codec_symmetry():
    """Drive the progressive AC scan coders directly on hand-crafted
    coefficient grids that force the rare paths the image roundtrips
    may not hit: refinement-scan ZRLs (>16 zero-history zeros before a
    newly nonzero coefficient), correction bits interleaved with zero
    runs, and multi-block EOB runs carrying pending correction bits.
    Encoding each grid as (AC first at Al=1) + (AC refine to Al=0) and
    decoding both scans must reproduce the grid exactly."""
    import numpy as np

    from prohap_spark.multimodal.codecs import (
        _AC_PROG_BITS,
        _AC_PROG_VALS,
        _BitWriter,
        _HuffDecoder,
        _decode_progressive_scan,
        _enc_ac_first_scan,
        _enc_ac_refine_scan,
        _huffman_codes,
    )

    patterns = []
    # A: 20 zero positions then +1 at band index 26 (forces ZRL in the
    # refinement scan: the +1 is invisible at Al=1, newly nonzero at 0)
    a = np.zeros(64, dtype=np.int64)
    a[26] = 1
    patterns.append(a)
    # B: correction coefficients (|v| > 1) interleaved with zeros and a
    # late newly-nonzero; negative values exercise the sign paths
    b = np.zeros(64, dtype=np.int64)
    b[2], b[5], b[24], b[40] = 5, -3, -1, 7
    patterns.append(b)
    # C/D: all-zero bands -> multi-block EOB run; D carries pending
    # correction bits into the run via a lone |v|>1 coefficient
    patterns.append(np.zeros(64, dtype=np.int64))
    dd = np.zeros(64, dtype=np.int64)
    dd[9] = -6
    patterns.append(dd)
    # E: dense low band with values straddling the Al=1 cut
    e = np.zeros(64, dtype=np.int64)
    e[1:12] = [2, 1, -1, 3, 0, -2, 1, 0, 0, -5, 1]
    patterns.append(e)

    grid = np.stack(patterns).reshape(len(patterns), 1, 64)
    ss, se = 1, 63
    ac_enc = _huffman_codes(_AC_PROG_BITS, _AC_PROG_VALS)
    ac_dec = _HuffDecoder(_AC_PROG_BITS, _AC_PROG_VALS)

    comps = [(1, 1, 1, 0)]
    grids_meta = [(len(patterns), 1)]
    decoded = [np.zeros((len(patterns), 1, 64), dtype=np.int64)]
    for ah, al in ((0, 1), (1, 0)):
        bw_ = _BitWriter()
        if ah == 0:
            _enc_ac_first_scan(bw_, grid, len(patterns), 1, ss, se, al, ac_enc)
        else:
            _enc_ac_refine_scan(bw_, grid, len(patterns), 1, ss, se, al, ac_enc)
        payload = bw_.flush() + b"\xff\xd9"
        _decode_progressive_scan(
            payload, 0, comps, [(0, None, ac_dec)], decoded, [0],
            (ss, se, ah, al), grids_meta, (len(patterns), 1), 0,
        )
    assert (decoded[0] == grid).all(), (decoded[0] - grid).nonzero()


def test_jpeg_progressive_ac_scan_codec_randomized():
    """Randomized scan-codec property check: 30 random sparse/dense
    multi-block coefficient grids, each encoded as first+refine scans
    over the full 1..63 band AND over a split band, must decode back
    exactly. Catches any residual mismatch between the encoder's
    buffered-correction-bit discipline and the decoder's advance."""
    import numpy as np

    from prohap_spark.multimodal.codecs import (
        _AC_PROG_BITS,
        _AC_PROG_VALS,
        _BitWriter,
        _HuffDecoder,
        _decode_progressive_scan,
        _enc_ac_first_scan,
        _enc_ac_refine_scan,
        _huffman_codes,
    )

    ac_enc = _huffman_codes(_AC_PROG_BITS, _AC_PROG_VALS)
    ac_dec = _HuffDecoder(_AC_PROG_BITS, _AC_PROG_VALS)
    rng = np.random.default_rng(99)
    for trial in range(30):
        nb = int(rng.integers(1, 6))
        grid = np.zeros((nb, 1, 64), dtype=np.int64)
        density = rng.uniform(0.02, 0.5)
        mask = rng.random((nb, 1, 64)) < density
        grid[mask] = rng.integers(-40, 41, mask.sum())
        grid[..., 0] = 0  # DC not part of AC scans
        for bands in (((1, 63),), ((1, 5), (6, 63))):
            dec = [np.zeros_like(grid)]
            for ss, se in bands:
                for ah, al in ((0, 1), (1, 0)):
                    bw_ = _BitWriter()
                    if ah == 0:
                        _enc_ac_first_scan(bw_, grid, nb, 1, ss, se, al, ac_enc)
                    else:
                        _enc_ac_refine_scan(bw_, grid, nb, 1, ss, se, al, ac_enc)
                    payload = bw_.flush() + b"\xff\xd9"
                    _decode_progressive_scan(
                        payload, 0, [(1, 1, 1, 0)], [(0, None, ac_dec)],
                        dec, [0], (ss, se, ah, al), [(nb, 1)], (nb, 1), 0,
                    )
            assert (dec[0] == grid).all(), (trial, bands)


def test_gif_roundtrip_interlace_and_lzw_reset():
    """From-scratch GIF89a: decode(encode(x)) == x exactly (paletted
    GIF is lossless), in both row orders — incl. a raster large enough
    to force multiple 4096-entry LZW table resets — and sub-block
    splitting of the compressed stream."""
    import numpy as np

    from prohap_spark.multimodal.codecs import decode_gif, encode_gif

    rng = np.random.default_rng(5)
    for shape in ((1, 1), (3, 17), (96, 80)):
        r = rng.integers(0, 256, shape).astype(np.uint8)
        assert (decode_gif(encode_gif(r)) == r).all()
        assert (decode_gif(encode_gif(r, interlace=True)) == r).all()


def test_gif_extension_skip_color_palette_and_failures():
    """Foreign-feature surface: Graphic Control + Comment extension
    blocks are skipped; a CHROMATIC palette reduces by integer BT.601
    luma; truncated streams and non-GIF payloads fail loud."""
    import numpy as np
    import pytest

    from prohap_spark.multimodal.codecs import decode_gif, encode_gif

    r = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    gif = encode_gif(r)
    # inject a Graphic Control Extension and a Comment after the GCT
    # (header 13 bytes + 768-byte global color table)
    cut = 13 + 768
    gce = bytes((0x21, 0xF9, 4, 0, 0, 0, 0, 0))
    comment = bytes((0x21, 0xFE, 5)) + b"hello" + bytes((0,))
    patched = gif[:cut] + gce + comment + gif[cut:]
    assert (decode_gif(patched) == r).all()

    # chromatic palette: overwrite GCT entries 0..3 with known colors
    pal = {0: (255, 0, 0), 1: (0, 255, 0), 2: (0, 0, 255), 3: (10, 20, 30)}
    buf = bytearray(gif)
    for i, (pr, pg, pb) in pal.items():
        buf[13 + 3 * i : 13 + 3 * i + 3] = bytes((pr, pg, pb))
    luma = lambda c: (299 * c[0] + 587 * c[1] + 114 * c[2] + 500) // 1000  # noqa: E731
    want = np.array([[luma(pal[0]), luma(pal[1])], [luma(pal[2]), luma(pal[3])]])
    assert (decode_gif(bytes(buf)) == want).all()

    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOPE" + gif)
    with pytest.raises(ValueError):
        decode_gif(gif[: len(gif) // 2])


def test_gif_through_real_decode_dispatch(spark):
    """decode_images(real_codec=True) must sniff the GIF magic and
    produce the exact pixel array through the Arrow-batched stage."""
    import numpy as np
    from pyspark.sql import functions as F

    from prohap_spark.multimodal import attach_media_metadata, decode_images
    from prohap_spark.multimodal.codecs import encode_gif

    rng = np.random.default_rng(9)
    r = rng.integers(0, 256, (6, 4)).astype(np.uint8)
    df = spark.createDataFrame(
        [(1, "image", "image/gif", bytearray(encode_gif(r)), {})],
        "media_id long, kind string, mime string, payload binary, meta map<string,string>",
    )
    out = decode_images(attach_media_metadata(df), real_codec=True).select(
        "media_id", F.col("pixels")
    ).collect()
    assert out[0]["pixels"] == [int(x) for x in r.ravel()]


def test_tiff_roundtrip_and_foreign_features():
    """From-scratch baseline TIFF: exact little-endian roundtrips; a
    hand-built BIG-endian multi-strip WhiteIsZero payload decodes with
    inversion; RGB reduces by integer luma; compressed payloads fail
    loud (silent mis-decode would poison a corpus)."""
    import struct

    import numpy as np
    import pytest

    from prohap_spark.multimodal.codecs import decode_tiff, encode_tiff

    rng = np.random.default_rng(3)
    for shape in ((1, 1), (7, 11), (40, 32)):
        r = rng.integers(0, 256, shape).astype(np.uint8)
        assert (decode_tiff(encode_tiff(r)) == r).all()

    def mm_tiff(photo, spp, strips, w, h, extra=()):
        data_off = 8
        data = b"".join(strips)
        ifd_off = data_off + len(data)
        out = bytearray(struct.pack(">2sHI", b"MM", 42, ifd_off))
        out += data
        offs, cnts, o = [], [], data_off
        for s_ in strips:
            offs.append(o); cnts.append(len(s_)); o += len(s_)
        tags = [
            (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8),
            (259, 3, 1, 1), (262, 3, 1, photo), (277, 3, 1, spp),
            (278, 3, 1, (h + len(strips) - 1) // len(strips)),
            *extra,
        ]
        # offsets/counts: inline when single strip, else via pointer
        assert len(strips) <= 2
        if len(strips) == 1:
            tags += [(273, 4, 1, offs[0]), (279, 4, 1, cnts[0])]
            tail = b""
        else:
            ptr = ifd_off + 2 + 12 * (len(tags) + 2) + 4
            tags += [(273, 4, 2, ptr), (279, 4, 2, ptr + 8)]
            tail = struct.pack(">II", *offs) + struct.pack(">II", *cnts)
        tags.sort()
        out += struct.pack(">H", len(tags))
        for tag, typ, cnt, val in tags:
            out += struct.pack(">HHI", tag, typ, cnt)
            # TIFF value fields are LEFT-justified: a big-endian SHORT
            # occupies bytes 8-9, not 10-11
            if typ == 3 and cnt == 1:
                out += struct.pack(">HH", val, 0)
            else:
                out += struct.pack(">I", val)
        out += struct.pack(">I", 0) + tail
        return bytes(out)

    # big-endian, two strips, WhiteIsZero -> values invert
    r = np.arange(24, dtype=np.uint8).reshape(4, 6)
    pay = mm_tiff(0, 1, [r[:2].tobytes(), r[2:].tobytes()], 6, 4)
    assert (decode_tiff(pay) == 255 - r).all()

    # RGB -> integer BT.601 luma
    rgb = np.zeros((2, 2, 3), dtype=np.uint8)
    rgb[0, 0] = (255, 0, 0); rgb[0, 1] = (0, 255, 0)
    rgb[1, 0] = (0, 0, 255); rgb[1, 1] = (10, 20, 30)
    pay = mm_tiff(2, 3, [rgb.tobytes()], 2, 2)
    luma = lambda c: (299 * c[0] + 587 * c[1] + 114 * c[2] + 500) // 1000  # noqa: E731
    want = np.array([[luma((255, 0, 0)), luma((0, 255, 0))],
                     [luma((0, 0, 255)), luma((10, 20, 30))]])
    assert (decode_tiff(pay) == want).all()

    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"XXXX" + pay)
    # LZW-compressed flag -> loud failure
    comp = bytearray(encode_tiff(r))
    # find the compression tag (259) in the little-endian IFD and set 5
    import re
    i = comp.find(struct.pack("<HHI", 259, 3, 1))
    comp[i + 8 : i + 10] = struct.pack("<H", 5)
    with pytest.raises(ValueError, match="compression"):
        decode_tiff(bytes(comp))


def test_gif_truncation_fails_loud_everywhere():
    """ADVICE r6: every truncation point — inside extension sub-blocks,
    mid image descriptor, mid LZW data sub-blocks, missing terminator —
    must raise the descriptive ValueError, never a bare IndexError or
    struct.error (the BMP/PNG/JPEG error contract)."""
    import numpy as np
    import pytest

    from prohap_spark.multimodal.codecs import decode_gif, encode_gif

    r = np.arange(16, dtype=np.uint8).reshape(4, 4)
    gif = encode_gif(r)
    cut = 13 + 768
    comment = bytes((0x21, 0xFE, 5)) + b"hello" + bytes((0,))
    patched = gif[:cut] + comment + gif[cut:]
    # chop at every byte boundary of the extension + descriptor region
    for end in range(cut + 1, cut + len(comment) + 12):
        with pytest.raises(ValueError):
            decode_gif(patched[:end])
    # chop the data terminator (and deeper, inside the LZW sub-blocks);
    # dropping ONLY the 0x3B trailer leaves a complete decodable image,
    # so start at len-2
    for end in (len(gif) - 2, len(gif) - 5):
        with pytest.raises(ValueError):
            decode_gif(gif[:end])


def test_tiff_encode_rejects_short_overflow_dims():
    """ADVICE r6: ImageWidth/ImageLength are SHORT-typed tags; a
    dimension over 65535 must be rejected, not silently truncated to
    a wrong raster (65537x2 used to roundtrip to 1x2)."""
    import numpy as np
    import pytest

    from prohap_spark.multimodal.codecs import encode_tiff

    with pytest.raises(ValueError, match="65535"):
        encode_tiff(np.zeros((65537, 2), dtype=np.uint8))
    with pytest.raises(ValueError, match="65535"):
        encode_tiff(np.zeros((2, 70000), dtype=np.uint8))


def test_avi_container_roundtrip_and_failures():
    """From-scratch AVI/MJPEG: exact mux/demux roundtrip (headers,
    word alignment, idx1), and fail-loud on non-AVI input, truncation,
    a frame-count/avih mismatch, a non-MJPEG codec, and non-JPEG frame
    payloads at encode time."""
    import struct

    import numpy as np
    import pytest

    from prohap_spark.multimodal.codecs import (
        decode_jpeg,
        encode_avi,
        encode_jpeg,
        parse_avi,
    )

    ones = np.ones((8, 8), dtype=np.int64)
    vals = (0, 7, 99, 200, 255)
    frames = [encode_jpeg(np.full((8, 8), v, dtype=np.uint8), quant=ones) for v in vals]
    avi = encode_avi(frames, 8, 8, fps=5)
    meta, got = parse_avi(avi)
    assert meta["total_frames"] == 5 and meta["width"] == 8
    assert meta["handler"] == "MJPG" and meta["us_per_frame"] == 200000
    assert got == frames
    for f, v in zip(got, vals):
        assert (decode_jpeg(f) == v).all()

    # ODD-length frame payloads force the 00dc word-alignment pad
    # byte: append a COM segment sized to flip parity when needed
    # (inserted before EOI so the JPEG stays valid)
    def make_odd(f: bytes) -> bytes:
        if len(f) % 2 == 1:
            return f
        com = b"\xff\xfe" + (3).to_bytes(2, "big") + b"x"
        return f[:2] + com + f[2:]

    odd_frames = [make_odd(f) for f in frames]
    assert all(len(f) % 2 == 1 for f in odd_frames)
    meta2, got2 = parse_avi(encode_avi(odd_frames, 8, 8))
    assert got2 == odd_frames  # pad bytes must not leak into payloads
    for f, v in zip(got2, vals):
        assert (decode_jpeg(f) == v).all()  # COM segment is skipped

    with pytest.raises(ValueError, match="not an AVI"):
        parse_avi(b"RIFX" + avi[4:])
    with pytest.raises(ValueError, match="truncated"):
        parse_avi(avi[: len(avi) // 2])
    # <12-byte input must report truncation, not "not an AVI": python
    # slicing never raises on short input, so the length check must
    # run BEFORE the magic comparison (r7 ADVICE — the branch was
    # unreachable when the magic check came first)
    with pytest.raises(ValueError, match="truncated"):
        parse_avi(avi[:8])
    with pytest.raises(ValueError, match="frames"):
        # patch avih total_frames (offset: RIFF(12) + LIST hdr(12) + avih hdr(8) + 16)
        bad = bytearray(avi)
        i = avi.find(b"avih") + 8 + 16
        bad[i : i + 4] = struct.pack("<I", 99)
        parse_avi(bytes(bad))
    with pytest.raises(ValueError, match="codec"):
        bad = bytearray(avi)
        i = avi.find(b"MJPG")
        bad[i : i + 4] = b"H264"
        parse_avi(bytes(bad))
    with pytest.raises(ValueError, match="JPEG"):
        encode_avi([b"not a jpeg"], 8, 8)
    with pytest.raises(ValueError, match="at least one"):
        encode_avi([], 8, 8)


def test_sample_avi_frames_spark_path(spark):
    """sample_avi_frames demuxes through Arrow batches and decodes only
    the sampled frames — every 3rd of 7 frames here, with exact
    constant-block pixel values."""
    import numpy as np

    from prohap_spark.multimodal import sample_avi_frames
    from prohap_spark.multimodal.codecs import encode_avi, encode_jpeg

    ones = np.ones((8, 8), dtype=np.int64)
    vals = [11, 22, 33, 44, 55, 66, 77]
    frames = [encode_jpeg(np.full((8, 8), v, dtype=np.uint8), quant=ones) for v in vals]
    df = spark.createDataFrame(
        [(1, bytearray(encode_avi(frames, 8, 8)))], "media_id long, payload binary"
    )
    rows = {r["frame_idx"]: r for r in sample_avi_frames(df, every_n=3).collect()}
    assert sorted(rows) == [0, 3, 6]
    for i in (0, 3, 6):
        assert rows[i]["p00"] == vals[i] and rows[i]["px_mean"] == float(vals[i])
        assert rows[i]["n_frames"] == 7 and rows[i]["height"] == 8
    # a nonsensical stride must fail at plan time, not slice garbage
    with pytest.raises(ValueError, match="every_n"):
        sample_avi_frames(df, every_n=0)


def test_lossless_codecs_hypothesis_roundtrip():
    """Property fuzz across the whole lossless codec suite: arbitrary
    raster shapes and contents must roundtrip EXACTLY through BMP,
    PNG, GIF (interlaced and not), and TIFF; random PCM16 buffers
    through WAV; and random frame groups through the AVI mux/demux.
    Catches stride/padding/filter/LZW-reset bugs the curated fixtures
    might miss."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from prohap_spark.multimodal.codecs import (
        decode_bmp,
        decode_gif,
        decode_png,
        decode_tiff,
        decode_wav,
        encode_avi,
        encode_bmp,
        encode_gif,
        encode_jpeg,
        encode_png,
        encode_tiff,
        encode_wav,
        parse_avi,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 24),
        w=st.integers(1, 24),
        seed=st.integers(0, 2**31 - 1),
        interlace=st.booleans(),
    )
    def raster_case(h, w, seed, interlace):
        r = np.random.default_rng(seed).integers(0, 256, (h, w)).astype(np.uint8)
        assert (decode_bmp(encode_bmp(r)) == r).all()
        assert (decode_png(encode_png(r)) == r).all()
        assert (decode_gif(encode_gif(r, interlace=interlace)) == r).all()
        assert (decode_tiff(encode_tiff(r)) == r).all()

    raster_case()

    @settings(max_examples=20, deadline=None)
    @given(n=st.integers(1, 300), rate=st.sampled_from([8000, 16000, 44100]),
           seed=st.integers(0, 2**31 - 1))
    def wav_case(n, rate, seed):
        s = (
            np.random.default_rng(seed)
            .integers(-(2**15), 2**15, n)
            .astype(np.int16)
        )
        got, got_rate, ch = decode_wav(encode_wav(s, sample_rate=rate))
        assert got_rate == rate and ch == 1 and np.array_equal(got, s)

    wav_case()

    @settings(max_examples=15, deadline=None)
    @given(nf=st.integers(1, 6), seed=st.integers(0, 2**31 - 1))
    def avi_case(nf, seed):
        rng = np.random.default_rng(seed)
        ones = np.ones((8, 8), dtype=np.int64)
        frames = [
            encode_jpeg(np.full((8, 8), int(v), dtype=np.uint8), quant=ones)
            for v in rng.integers(0, 256, nf)
        ]
        meta, got = parse_avi(encode_avi(frames, 8, 8))
        assert meta["total_frames"] == nf and got == frames

    avi_case()


def test_image_near_dup_pairs_stripe_ahash(spark):
    """Image near-dup via the exact-integer stripe aHash + the
    existing pigeonhole Hamming machinery: an exact re-encode hashes
    identically (hamming 0), a lightly-perturbed copy stays inside
    the ball, and an inverted image is far outside it. All through
    REAL BMP decode."""
    import numpy as np

    from prohap_spark.multimodal.binary_ops import (
        image_near_dup_pairs,
        perceptual_hash_images,
        decode_images,
    )
    from prohap_spark.multimodal.codecs import encode_bmp

    base = np.zeros((16, 16), dtype=np.uint8)
    base[:8, :] = 10    # top half dark
    base[8:, :] = 200   # bottom half bright
    near = base.copy()
    near[0, 5] = 11     # tiny edits far from the dark/bright boundary
    near[15, 10] = 199
    far = (255 - base).astype(np.uint8)  # inversion flips every stripe

    rows = [
        (1, "image", "image/bmp", bytearray(encode_bmp(base)), None),
        (2, "image", "image/bmp", bytearray(encode_bmp(base)), None),  # exact dup
        (3, "image", "image/bmp", bytearray(encode_bmp(near)), None),
        (4, "image", "image/bmp", bytearray(encode_bmp(far)), None),
    ]
    from prohap_spark.multimodal.binary_ops import MEDIA_SCHEMA

    df = spark.createDataFrame(rows, MEDIA_SCHEMA)

    sigs = {
        r["media_id"]: r["simhash"]
        for r in perceptual_hash_images(
            decode_images(df, real_codec=True), id_col="media_id"
        ).collect()
    }
    assert sigs[1] == sigs[2]
    h13 = bin(sigs[1] ^ sigs[3]).count("1")
    h14 = bin(sigs[1] ^ sigs[4]).count("1")
    assert h13 <= 3, h13
    assert h14 > 20, h14

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_dup_pairs(df, max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and (2, 3) in pairs
    assert not any(4 in p for p in pairs)


def test_audio_near_dup_gain_dc_invariance(spark):
    """Audio near-dup via the shared stripe hash: exact gain (×2) and
    DC offset (+100) remasters hash IDENTICALLY (the cross-multiplied
    mean comparison is invariant to both), a lightly-edited copy
    stays inside the Hamming ball, and a different waveform is far
    outside. Real RIFF/WAVE payloads throughout."""
    import numpy as np

    from prohap_spark.multimodal.binary_ops import (
        MEDIA_SCHEMA,
        audio_near_dup_pairs,
        decode_audio,
        perceptual_hash_images,
    )
    from prohap_spark.multimodal.codecs import encode_wav

    rng = np.random.default_rng(7)
    base = (rng.integers(-2000, 2000, size=2400)).astype(np.int16)
    gain = (base.astype(np.int32) * 2).astype(np.int16)       # exact ×2
    dc = (base.astype(np.int32) + 100).astype(np.int16)        # exact +100
    near = base.copy()
    near[5] += 3
    near[700] -= 2
    other = (rng.integers(-2000, 2000, size=2400)).astype(np.int16)

    rows = [
        (1, "audio", "audio/wav", bytearray(encode_wav(base)), None),
        (2, "audio", "audio/wav", bytearray(encode_wav(gain)), None),
        (3, "audio", "audio/wav", bytearray(encode_wav(dc)), None),
        (4, "audio", "audio/wav", bytearray(encode_wav(near)), None),
        (5, "audio", "audio/wav", bytearray(encode_wav(other)), None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    sigs = {
        r["media_id"]: r["simhash"]
        for r in perceptual_hash_images(
            decode_audio(df), id_col="media_id", pixels_col="samples"
        ).collect()
    }
    assert sigs[1] == sigs[2] == sigs[3]   # gain + DC invariance, exact
    assert bin(sigs[1] ^ sigs[4]).count("1") <= 3
    assert bin(sigs[1] ^ sigs[5]).count("1") > 10

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in audio_near_dup_pairs(df, max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 0 and pairs[(1, 3)] == 0 and pairs[(2, 3)] == 0
    assert (1, 4) in pairs
    assert not any(5 in p for p in pairs)


def test_video_near_dup_majority_vote(spark):
    """Video near-dup through the full real path (AVI demux → MJPEG
    frame decode → per-frame stripe hash → exact majority vote): an
    identical re-mux hashes the same; a copy with ONE edited frame is
    absorbed by the majority vote (hamming small or zero); an
    inverted video is far; the frame decode emits the sampled frames
    only."""
    import numpy as np

    from prohap_spark.multimodal.binary_ops import (
        MEDIA_SCHEMA,
        decode_video_frames,
        perceptual_hash_video,
        video_near_dup_pairs,
    )
    from prohap_spark.multimodal.codecs import encode_avi, encode_jpeg

    h = w = 16
    base_frames = []
    for f in range(5):
        img = np.zeros((h, w), dtype=np.uint8)
        img[: 8 + (f % 2), :] = 20   # slight frame-to-frame motion
        img[8 + (f % 2):, :] = 210
        base_frames.append(encode_jpeg(img))
    edited = list(base_frames)
    noisy = np.zeros((h, w), dtype=np.uint8)
    noisy[:, :8] = 20
    noisy[:, 8:] = 210               # one frame with different structure
    edited[2] = encode_jpeg(noisy)
    inv_img = np.zeros((h, w), dtype=np.uint8)
    inv_img[:8, :] = 210
    inv_img[8:, :] = 20
    inverted = [encode_jpeg(inv_img) for _ in range(5)]

    rows = [
        (1, "video", "video/avi", bytearray(encode_avi(base_frames, w, h)), None),
        (2, "video", "video/avi", bytearray(encode_avi(list(base_frames), w, h)), None),
        (3, "video", "video/avi", bytearray(encode_avi(edited, w, h)), None),
        (4, "video", "video/avi", bytearray(encode_avi(inverted, w, h)), None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)

    frames = decode_video_frames(df, every_n=2)
    got = frames.groupBy("media_id").count().collect()
    assert {r["media_id"]: r["count"] for r in got} == {1: 3, 2: 3, 3: 3, 4: 3}

    sigs = {
        r["media_id"]: r["simhash"]
        for r in perceptual_hash_video(frames).collect()
    }
    assert sigs[1] == sigs[2]
    assert bin(sigs[1] ^ sigs[3]).count("1") <= 3
    assert bin(sigs[1] ^ sigs[4]).count("1") > 10

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in video_near_dup_pairs(df, max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs
    assert not any(4 in p for p in pairs)
