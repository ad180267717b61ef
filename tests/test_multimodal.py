"""Multimodal binary-column plumbing: schema, mapInPandas batch shape,
deterministic stub decode, frame sampling, per-modality profile."""

import pytest
from pyspark.sql import functions as F

from dataprofiler_spark.operators.multimodal import (
    ASSET_SCHEMA,
    FEATURE_SCHEMA,
    extract_features,
    frame_sample,
    gen_assets,
    profile_assets,
)


@pytest.fixture(scope="module")
def assets(spark):
    return gen_assets(spark, 300)


def test_asset_schema_and_determinism(spark, assets):
    # generated expressions carry tighter nullability; names+types must match
    assert [(f.name, f.dataType.simpleString()) for f in assets.schema.fields] == [
        (f.name, f.dataType.simpleString()) for f in ASSET_SCHEMA.fields
    ]
    a = assets.orderBy("asset_id").limit(3).collect()
    b = gen_assets(spark, 300).orderBy("asset_id").limit(3).collect()
    assert [r.data for r in a] == [r.data for r in b]  # seeded → identical bytes
    sizes = {r.modality: len(r.data) for r in assets.limit(50).collect()}
    assert sizes["image"] == 64 * 16 and sizes["video"] == 1024 * 16


def test_extract_features_batch_shape(spark, assets):
    feats = extract_features(assets)
    assert feats.schema == FEATURE_SCHEMA
    rows = feats.collect()
    assert len(rows) == 300
    r = rows[0]
    assert r.n_bytes > 0 and 0 <= r.byte_mean <= 255
    assert r.decoded is False  # stub decode clearly marked


def test_real_decode_png_wav(spark):
    """Valid PNG/WAV payloads are GENUINELY decoded in this container
    (decoded=True with pixel/sample statistics); video payloads fall back
    to byte stats with decoded=False (disclosed — no container codec)."""
    from dataprofiler_spark.operators.multimodal import gen_assets_real

    assets = gen_assets_real(spark, 60)
    feats = extract_features(assets)
    rows = {r.asset_id: r for r in feats.collect()}
    assert len(rows) == 60
    by_mod = {}
    for r in rows.values():
        by_mod.setdefault(r.modality, []).append(r)
    assert all(r.decoded for r in by_mod["image"])
    assert all(r.decoded for r in by_mod["audio"])
    assert all(not r.decoded for r in by_mod["video"])
    # decoded image stats are PIXEL stats (gradient ≈ mid-gray, nonzero std)
    img = by_mod["image"][0]
    assert 32 <= img.byte_mean <= 224 and img.byte_std > 0
    # decoded audio stats are PCM16 SAMPLE stats: a sine wave is zero-mean
    # with std ≈ amplitude/sqrt(2) — far outside the [0,255] byte range
    aud = by_mod["audio"][0]
    assert abs(aud.byte_mean) < 200 and 7000 < aud.byte_std < 10000


def test_png_codec_roundtrip():
    """The built-in PNG writer/decoder round-trip bit-exactly (zlib inflate
    + de-filtering is a real decode, not a byte-stats stub)."""
    import numpy as np

    from dataprofiler_spark.operators.multimodal import (
        decode_image,
        png_encode,
        wav_encode,
        decode_audio,
    )

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    out = decode_image(png_encode(px))
    assert out is not None and np.array_equal(out, px)
    samples = (rng.integers(-30000, 30000, 500)).astype("<i2")
    dec = decode_audio(wav_encode(samples, 8000))
    assert dec is not None
    got, rate = dec
    assert rate == 8000 and np.array_equal(got, samples)
    # garbage is rejected, not mis-decoded
    assert decode_image(b"not a png") is None
    assert decode_audio(b"not a wav") is None


def test_gen_assets_real_deterministic(spark):
    from dataprofiler_spark.operators.multimodal import gen_assets_real

    a = {r.asset_id: r.data for r in gen_assets_real(spark, 12).collect()}
    b = {r.asset_id: r.data for r in gen_assets_real(spark, 12).collect()}
    assert a == b
    assert a != {
        r.asset_id: r.data for r in gen_assets_real(spark, 12, seed=43).collect()
    }


def test_frame_sample(spark, assets):
    frames = frame_sample(assets, every_n=10, frame_bytes=16)
    rows = frames.collect()
    assert all(len(r.frame_data) == 16 for r in rows)
    per_asset = frames.groupBy("asset_id").count().collect()
    # n_frames in [1,30], sampled every 10 → 1-3 frames per video
    assert all(1 <= r["count"] <= 3 for r in per_asset)


def test_profile_assets(spark, assets):
    prof = {r.modality: r for r in profile_assets(assets).collect()}
    assert set(prof) == {"image", "audio", "video"}
    assert prof["video"].min_bytes == prof["video"].max_bytes == 1024 * 16
    assert prof["image"].asset_count == 100


def test_corrupt_png_falls_back_not_crashes(spark):
    """A payload with the PNG magic but a truncated/corrupt body must fall
    back to byte stats (decoded=False) — never kill the mapInPandas task."""
    from dataprofiler_spark.operators.multimodal import decode_image, png_encode

    import numpy as np

    valid = png_encode(np.zeros((4, 4), dtype=np.uint8))
    corrupt = valid[: len(valid) // 2]  # truncated IDAT
    assert decode_image(corrupt) is None
    assert decode_image(b"\x89PNG\r\n\x1a\n" + b"garbage" * 4) is None

    rows = [
        ("a1", "image", bytes(corrupt), None),
        ("a2", "image", bytes(valid), None),
    ]
    df = spark.createDataFrame(rows, ASSET_SCHEMA)
    out = {r.asset_id: r for r in extract_features(df).collect()}
    assert out["a1"].decoded is False  # fallback, job alive
    assert out["a2"].decoded is True


def test_resize_images_real_pixels(spark):
    """resize_images decodes, area-means to the target shape, re-encodes
    PNG — output payloads decode to exactly (target_h, target_w), and a
    constant image stays constant through the resample (mean-preserving).
    Corrupt payloads pass through with resized=False."""
    import numpy as np

    from dataprofiler_spark.operators.multimodal import (
        decode_image,
        gen_assets_real,
        png_encode,
        resize_images,
    )

    assets = gen_assets_real(spark, 30)
    out = resize_images(assets, 8, 8).collect()
    assert out and all(r.resized for r in out)
    for r in out:
        px = decode_image(bytes(r.data))
        assert px is not None and px.shape == (8, 8)

    flat = png_encode(np.full((20, 30), 77, dtype=np.uint8))
    rows = [("a", "image", flat, None), ("b", "image", b"\x89PNGgarbage", None)]
    df = spark.createDataFrame(rows, ASSET_SCHEMA)
    res = {r.asset_id: r for r in resize_images(df, 5, 5).collect()}
    got = decode_image(bytes(res["a"].data))
    assert (got == 77).all() and got.shape == (5, 5)
    assert res["b"].resized is False and bytes(res["b"].data) == b"\x89PNGgarbage"

    # upscale path: 2x2 -> 6x6 nearest-replication, values preserved
    tiny = png_encode(np.array([[0, 255], [255, 0]], dtype=np.uint8))
    up = resize_images(
        spark.createDataFrame([("c", "image", tiny, None)], ASSET_SCHEMA), 6, 6
    ).collect()[0]
    upx = decode_image(bytes(up.data))
    assert upx.shape == (6, 6) and upx[0, 0] == 0 and upx[0, 5] == 255


def test_block_mean_resize_exact_means():
    """Area resize is a true block mean including row 0 / col 0 (the
    review-found clip bug averaged without them)."""
    import numpy as np

    from dataprofiler_spark.operators.multimodal import _block_mean_resize

    assert _block_mean_resize(np.array([[0, 0], [0, 255]], dtype=np.uint8), 1, 1)[0, 0] == 63
    a = np.arange(16, dtype=np.uint8).reshape(4, 4)
    expect = np.array([[2, 4], [10, 12]])
    assert (_block_mean_resize(a, 2, 2) == expect).all()
    # non-divisible shapes stay exact block means over their boxes
    r = _block_mean_resize(np.arange(15, dtype=np.uint8).reshape(5, 3), 2, 2)
    assert r.shape == (2, 2) and r[0, 0] == np.arange(15).reshape(5, 3)[:2, :1].mean() // 1


def test_phash_invariance_and_discrimination():
    """Driver-side pHash properties on synthetic pixel fields: identical
    pixels hash identically; a mild brightness shift moves few bits; an
    unrelated random field moves ~half the bits."""
    import numpy as np

    from dataprofiler_spark.operators.multimodal import _phash_bits

    rng = np.random.default_rng(7)
    base = (rng.integers(0, 256, (48, 64))).astype(np.uint8)
    # smooth it so perceptual structure exists (pHash is a low-freq hash)
    smooth = base.astype(np.int64)
    for _ in range(3):
        smooth = (smooth + np.roll(smooth, 1, 0) + np.roll(smooth, 1, 1)) // 3
    img = smooth.astype(np.uint8)
    h1 = _phash_bits(img)
    h2 = _phash_bits(np.clip(img.astype(np.int64) + 6, 0, 255).astype(np.uint8))
    other = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    h3 = _phash_bits(other)
    assert h1 == _phash_bits(img.copy())
    assert bin((h1 ^ h2) & ((1 << 64) - 1)).count("1") <= 8  # brightness-robust
    assert bin((h1 ^ h3) & ((1 << 64) - 1)).count("1") >= 16  # discriminative


def test_image_near_dup_pairs_finds_planted_pair(spark):
    import numpy as np

    from dataprofiler_spark.operators.multimodal import (
        ASSET_SCHEMA,
        image_near_dup_pairs,
        png_encode,
    )

    rng = np.random.default_rng(11)

    def smooth_img(seed):
        r = np.random.default_rng(seed)
        px = r.integers(0, 256, (40, 40)).astype(np.int64)
        for _ in range(3):
            px = (px + np.roll(px, 1, 0) + np.roll(px, 1, 1)) // 3
        return px.astype(np.uint8)

    rows = []
    for i in range(6):
        px = smooth_img(100 + i)
        rows.append((f"img-{i}", "image", bytearray(png_encode(px)), (40, 40, None, None)))
    # planted near-dup of img-0: tiny brightness shift
    px0 = smooth_img(100)
    shifted = np.clip(px0.astype(np.int64) + 4, 0, 255).astype(np.uint8)
    rows.append(("img-dup", "image", bytearray(png_encode(shifted)), (40, 40, None, None)))
    # corrupt payload must not kill the job
    rows.append(("img-bad", "image", bytearray(b"not a png"), (None, None, None, None)))
    df = spark.createDataFrame(rows, ASSET_SCHEMA)
    pairs = {(r.key1, r.key2): r.hamming for r in image_near_dup_pairs(df, max_hamming=8).collect()}
    assert ("img-0", "img-dup") in pairs or ("img-dup", "img-0") in pairs
    for (a, b) in pairs:
        assert "img-bad" not in (a, b)


def test_audio_fingerprint_gain_invariance():
    import numpy as np

    from dataprofiler_spark.operators.multimodal import _audio_fp_bits

    rng = np.random.default_rng(3)
    x = (rng.standard_normal(16000) * 3000).astype(np.int16)
    h = _audio_fp_bits(x)
    # exact gain scaling preserves every energy comparison
    assert _audio_fp_bits((x * 0.5).astype(np.float64)) == h
    y = (rng.standard_normal(16000) * 3000).astype(np.int16)
    assert bin((h ^ _audio_fp_bits(y)) & ((1 << 64) - 1)).count("1") >= 16


def test_audio_near_dup_pairs_planted(spark):
    import numpy as np

    from dataprofiler_spark.operators.multimodal import (
        ASSET_SCHEMA,
        audio_near_dup_pairs,
        wav_encode,
    )

    rows = []
    for i in range(5):
        r = np.random.default_rng(50 + i)
        s = (r.standard_normal(8000) * 2500).astype(np.int16)
        rows.append((f"au-{i}", "audio", bytearray(wav_encode(s)), (None, None, 16000, None)))
        if i == 0:
            half = (s.astype(np.float64) * 0.5).astype(np.int16)  # gain-shifted copy
            rows.append(("au-dup", "audio", bytearray(wav_encode(half)), (None, None, 16000, None)))
    rows.append(("au-bad", "audio", bytearray(b"not a wav"), (None, None, None, None)))
    df = spark.createDataFrame(rows, ASSET_SCHEMA)
    pairs = {(r.key1, r.key2): r.hamming for r in audio_near_dup_pairs(df, max_hamming=6).collect()}
    assert ("au-0", "au-dup") in pairs or ("au-dup", "au-0") in pairs
    for a, b in pairs:
        assert "au-bad" not in (a, b)


def test_image_contamination_planted_leak(spark):
    import numpy as np

    from dataprofiler_spark.operators.multimodal import (
        ASSET_SCHEMA,
        image_contamination,
        png_encode,
    )

    def smooth_img(seed):
        r = np.random.default_rng(seed)
        px = r.integers(0, 256, (40, 40)).astype(np.int64)
        for _ in range(3):
            px = (px + np.roll(px, 1, 0) + np.roll(px, 1, 1)) // 3
        return px.astype(np.uint8)

    bench_px = smooth_img(900)
    bench = spark.createDataFrame(
        [("eval-0", "image", bytearray(png_encode(bench_px)), (40, 40, None, None))],
        ASSET_SCHEMA,
    )
    rows = [
        ("leak", "image",
         bytearray(png_encode(np.clip(bench_px.astype(np.int64) + 3, 0, 255).astype(np.uint8))),
         (40, 40, None, None)),
    ]
    for i in range(4):
        rows.append((f"clean-{i}", "image", bytearray(png_encode(smooth_img(300 + i))), (40, 40, None, None)))
    corpus = spark.createDataFrame(rows, ASSET_SCHEMA)
    hits = {r.asset_id: r for r in image_contamination(corpus, bench, max_hamming=6).collect()}
    assert "leak" in hits and hits["leak"].n_benchmark_matches == 1
    assert all(k == "leak" for k in hits)
