"""Multimodal plumbing tests: decoder selection by availability, feature
extraction batch shape, and the import-guarded real decoder (conditionally
exercised when PIL is installed)."""

import numpy as np
import pytest

from fsst_spark.pipeline.multimodal import (
    FakeMediaDecoder,
    RealMediaDecoder,
    default_decoder,
    extract_features,
    pil_available,
)


def test_default_decoder_selected_by_availability():
    dec = default_decoder()
    if pil_available():
        assert isinstance(dec, RealMediaDecoder)
    else:
        assert isinstance(dec, FakeMediaDecoder)


@pytest.mark.skipif(pil_available(), reason="PIL installed: guard not reachable")
def test_real_decoder_raises_without_pil():
    with pytest.raises(NotImplementedError):
        RealMediaDecoder()


def test_real_decoder_roundtrip_with_pil():
    PIL = pytest.importorskip("PIL")
    import io

    from PIL import Image

    img = Image.fromarray(np.arange(48, dtype=np.uint8).reshape(4, 4, 3))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    out = RealMediaDecoder().decode(buf.getvalue())
    assert out.shape == (4, 4, 3) and out.dtype == np.uint8
    assert (out == np.arange(48, dtype=np.uint8).reshape(4, 4, 3)).all()


def test_fake_decoder_deterministic():
    d = FakeMediaDecoder(h=8, w=8)
    a, b = d.decode(b"payload"), d.decode(b"payload")
    assert (a == b).all() and a.shape == (8, 8, 3)
    assert not (a == d.decode(b"other")).all()


def test_extract_features_shape(spark):
    df = spark.createDataFrame(
        [(i, f"payload {i}".encode()) for i in range(10)],
        "doc_id long, payload binary",
    )
    feats = extract_features(df, "payload", "doc_id", decoder=FakeMediaDecoder(),
                             feat_dim=8)
    rows = feats.collect()
    assert len(rows) == 10
    assert all(len(r["feat"]) == 8 and r["feat_dim"] == 8 for r in rows)
    assert {r["payload_bytes"] for r in rows} == {len(f"payload {i}") for i in range(10)}


# ---------------------------------------------------------------------------
# perceptual-hash image near-dup
# ---------------------------------------------------------------------------
def test_ahash_locality_and_separation():
    """The hash must be a PERCEPTUAL hash: tiny pixel perturbations move
    few bits, unrelated images move ~half of them."""
    from fsst_spark.pipeline.multimodal import ahash_array

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    h0 = ahash_array(img)
    # identical -> identical
    assert ahash_array(img.copy()) == h0
    # small noise (+-2 levels) flips only cells straddling the mean
    noisy = np.clip(img.astype(np.int16)
                    + rng.integers(-2, 3, img.shape), 0, 255).astype(np.uint8)
    ham = bin((h0 ^ ahash_array(noisy)) & (2**64 - 1)).count("1")
    assert ham <= 6, ham
    # an unrelated image is ~32 bits away
    other = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    ham2 = bin((h0 ^ ahash_array(other)) & (2**64 - 1)).count("1")
    assert ham2 >= 15, ham2
    # grayscale input and non-multiple-of-8 sizes are accepted
    assert isinstance(ahash_array(img[:31, :29].mean(axis=2)), int)


def test_image_neardup_finds_planted_duplicates(spark):
    """Planted byte-identical payloads must pair at hamming 0 through
    decode -> aHash -> banded join; nothing else pairs (random fake images
    sit ~32 bits apart, past max_hamming)."""
    from fsst_spark.pipeline.multimodal import (FakeMediaDecoder,
                                                image_neardup_pairs)
    from pyspark.sql import functions as F

    rows = [(i, f"payload body {i}") for i in range(120)]
    rows += [(1000 + i, f"payload body {i}") for i in range(0, 120, 10)]  # dups
    df = spark.createDataFrame(rows, "doc_id long, t string") \
        .withColumn("payload", F.col("t").cast("binary"))
    pairs = image_neardup_pairs(df, "payload", "doc_id",
                                decoder=FakeMediaDecoder()).collect()
    got = sorted((r["id_a"], r["id_b"]) for r in pairs)
    assert got == [(i, 1000 + i) for i in range(0, 120, 10)]
    assert all(r["hamming"] == 0 for r in pairs)


def test_image_neardup_bucket_cap_bounds_mega_bucket(spark):
    """A boilerplate payload repeated 80x would explode the band join
    (80*79/2 pairs x 8 bands); the bucket cap drops those buckets while a
    genuine small duplicate pair elsewhere is still found."""
    from fsst_spark.pipeline.multimodal import (FakeMediaDecoder,
                                                image_neardup_pairs)
    from pyspark.sql import functions as F

    rows = [(i, "boilerplate") for i in range(80)]
    rows += [(500, "unique page"), (501, "unique page")]
    df = spark.createDataFrame(rows, "doc_id long, t string") \
        .withColumn("payload", F.col("t").cast("binary"))
    pairs = image_neardup_pairs(df, "payload", "doc_id",
                                decoder=FakeMediaDecoder(),
                                bucket_cap=16).collect()
    got = sorted((r["id_a"], r["id_b"]) for r in pairs)
    assert got == [(500, 501)]


# ---------------------------------------------------------------------------
# resize + video frame sampling plumbing
# ---------------------------------------------------------------------------
def test_resize_array_shapes_and_determinism():
    from fsst_spark.pipeline.multimodal import resize_array

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    small = resize_array(img, 8, 8)
    assert small.shape == (8, 8, 3) and small.dtype == np.uint8
    assert (small == resize_array(img, 8, 8)).all()
    # upscale and grayscale paths
    assert resize_array(img, 32, 40).shape == (32, 40, 3)
    assert resize_array(img.mean(axis=2), 8, 8).shape == (8, 8)
    # constant image stays constant through pooling
    flat = np.full((16, 16, 3), 77, dtype=np.uint8)
    assert (resize_array(flat, 4, 4) == 77).all()


def test_image_resize_spark_plumbing(spark):
    from fsst_spark.pipeline.multimodal import FakeMediaDecoder, image_resize
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, f"img {i}") for i in range(20)], "doc_id long, t string"
    ).withColumn("payload", F.col("t").cast("binary"))
    out = image_resize(df, 4, 6, "payload", "doc_id",
                       decoder=FakeMediaDecoder()).collect()
    assert len(out) == 20
    assert all(r["height"] == 4 and r["width"] == 6 for r in out)
    assert all(len(r["rgb"]) == 4 * 6 * 3 for r in out)
    # deterministic: same payload bytes -> same resized bytes
    by_id = {r["doc_id"]: bytes(r["rgb"]) for r in out}
    again = {r["doc_id"]: bytes(r["rgb"]) for r in
             image_resize(df, 4, 6, "payload", "doc_id",
                          decoder=FakeMediaDecoder()).collect()}
    assert by_id == again


def test_video_frame_sample_explodes_every_kth(spark):
    from fsst_spark.pipeline.multimodal import (FakeVideoDecoder,
                                                video_frame_sample)
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, f"video {i}") for i in range(10)], "doc_id long, t string"
    ).withColumn("payload", F.col("t").cast("binary"))
    dec = FakeVideoDecoder(n_frames=24)
    out = video_frame_sample(df, every_k=8, payload_col="payload",
                             decoder=dec).collect()
    # 24 frames / every 8 -> indices 0, 8, 16 per doc
    assert len(out) == 30
    idxs = sorted({r["frame_idx"] for r in out})
    assert idxs == [0, 8, 16]
    assert all(len(r["feat"]) == 6 for r in out)
    # payload-deterministic features
    one = sorted([r["feat"] for r in out if r["doc_id"] == 3],
                 key=lambda f: f[0])
    two = sorted([r["feat"] for r in
                  video_frame_sample(df, every_k=8, payload_col="payload",
                                     decoder=dec).collect()
                  if r["doc_id"] == 3], key=lambda f: f[0])
    assert one == two


def test_audio_features_shapes_and_determinism(spark):
    from fsst_spark.pipeline.multimodal import FakeAudioDecoder, audio_features
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, f"clip {i}") for i in range(15)], "doc_id long, t string"
    ).withColumn("payload", F.col("t").cast("binary"))
    dec = FakeAudioDecoder(n_samples=4096, rate=16000)
    out = audio_features(df, "payload", decoder=dec).collect()
    assert len(out) == 15
    for r in out:
        assert r["duration_sec"] == 4096 / 16000
        assert 0.0 < r["rms"] < 1.0  # uniform PCM: rms ~= 0.577
        assert 0.0 < r["zero_crossing_rate"] < 1.0
        assert len(r["band_energy"]) == 4
    # payload-deterministic
    a = {r["doc_id"]: r["rms"] for r in out}
    b = {r["doc_id"]: r["rms"] for r in
         audio_features(df, "payload", decoder=dec).collect()}
    assert a == b
