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


def test_real_codec_is_stubbed(media):
    from prohap_spark.multimodal import decode_images

    with pytest.raises(NotImplementedError):
        decode_images(media, real_codec=True)


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
