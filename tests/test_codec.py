"""Real image-codec kernels (multimodal.py): pure-numpy PPM round
trip, nearest resize, the PIL path when available, and the m04
decode pipeline end-to-end on Spark."""

from __future__ import annotations

import numpy as np
import pytest

from crossfire_spark.functions.multimodal import (
    decode_image,
    decode_ppm,
    encode_ppm,
    image_stats,
    resize_nearest,
    synthesize_ppm_images,
)


def test_ppm_roundtrip():
    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, size=(13, 9, 3), dtype=np.uint8)
    out = decode_ppm(encode_ppm(arr))
    assert out.shape == (13, 9, 3)
    assert (out == arr).all()


def test_ppm_comments_and_whitespace():
    arr = np.full((2, 3, 3), 42, dtype=np.uint8)
    raw = b"P6\n# a comment\n 3\t2 # trailing\n255\n" + arr.tobytes()
    assert (decode_ppm(raw) == arr).all()


def test_decode_image_dispatch():
    arr = np.full((4, 5, 3), 7, dtype=np.uint8)
    assert (decode_image(encode_ppm(arr)) == arr).all()
    with pytest.raises((NotImplementedError, Exception)):
        decode_image(b"\xff\xd8not-actually-jpeg")


def test_resize_nearest():
    arr = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    up = resize_nearest(arr, width=6, height=4)
    assert up.shape == (4, 6, 3)
    # corners preserved under nearest
    assert (up[0, 0] == arr[0, 0]).all() and (up[-1, -1] == arr[-1, -1]).all()
    const = resize_nearest(np.full((3, 4, 3), 9, np.uint8), 224, 224)
    assert const.shape == (224, 224, 3) and (const == 9).all()


def test_jpeg_decode_with_pil():
    """Exercises the PIL path with a real JPEG when the codec lib is
    present (skipped in envs without it)."""
    Image = pytest.importorskip("PIL.Image")
    import io

    buf = io.BytesIO()
    Image.fromarray(np.full((8, 8, 3), 128, dtype=np.uint8)).save(buf, "JPEG")
    arr = decode_image(buf.getvalue())
    assert arr.shape == (8, 8, 3)
    assert abs(float(arr.mean()) - 128.0) < 4.0  # lossy but close


def test_m04_pipeline(spark, sf_dir):
    docs = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    media = synthesize_ppm_images(docs)
    stats = {r.media_id: r for r in image_stats(media).collect()}
    for i in range(1, 8):
        r = stats[i]
        assert (r.width, r.height) == (4 + i % 5, 3 + i % 4)
        assert (r.rz_w, r.rz_h) == (224, 224)
        assert (r.mean_r, r.mean_g, r.mean_b) == (
            float(i % 251), float((2 * i) % 251), float((3 * i) % 251)
        )


def test_wav_roundtrip():
    """encode_wav -> decode_wav is the identity on 8-bit mono PCM and
    the bytes are a genuine RIFF/WAV container."""
    import numpy as np

    from crossfire_spark.functions.multimodal import (
        AUDIO_SR,
        decode_wav,
        encode_wav,
    )

    samples = np.arange(256, dtype=np.uint8)
    blob = encode_wav(samples)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    out, sr = decode_wav(blob)
    assert sr == AUDIO_SR
    assert np.array_equal(out, samples)


def test_pil_dispatch_with_mocked_pil(monkeypatch):
    """decode_image must prefer PIL whenever importable — covered here
    WITHOUT PIL by injecting a mock ``PIL.Image`` module: the mock
    records the call and returns a known array, proving the dispatch
    order (PIL first, PPM parser only as fallback) and the
    open→convert("RGB")→asarray contract the real-PIL path uses."""
    import sys
    import types

    expected = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    calls = []

    class _FakeImg:
        def convert(self, mode):
            calls.append(("convert", mode))
            return expected

    fake_image_mod = types.SimpleNamespace(
        open=lambda buf: (calls.append(("open", buf.read()[:2])) or _FakeImg())
    )
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image_mod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(
        sys.modules, "PIL.Image", types.ModuleType("PIL.Image")
    )

    # bytes that the PPM fallback would ALSO accept — PIL must win
    payload = encode_ppm(np.zeros((1, 1, 3), dtype=np.uint8))
    out = decode_image(payload)
    assert calls == [("open", b"P6"), ("convert", "RGB")]
    assert np.array_equal(out, expected)


def test_dhash_brightness_invariance_and_distinctness(spark):
    """dHash collapses brightness-shifted renders of one pattern into
    one hash (uniform offsets cancel in every adjacent difference)
    and separates distinct patterns — the two properties
    m07_image_neardup's closed-form oracle rests on."""
    from crossfire_spark.functions.multimodal import (
        DHASH_PATTERNS,
        dhash_images,
        synthesize_gradient_images,
    )

    # ids 0..49 render the 50 base patterns; ids 50..99 re-render them
    # brightness-shifted
    docs = spark.range(2 * DHASH_PATTERNS).withColumnRenamed("id", "doc_id")
    out = {
        r["media_id"]: r["dh"]
        for r in dhash_images(synthesize_gradient_images(docs)).collect()
    }
    for p in range(DHASH_PATTERNS):
        assert out[p] == out[p + DHASH_PATTERNS]
    assert len({out[p] for p in range(DHASH_PATTERNS)}) == DHASH_PATTERNS


def test_audio_fingerprint_gain_invariance_and_distinctness(spark):
    """The sign fingerprint collapses gain-scaled renders of one
    waveform into one hash (sign(g*x) = sign(x)) and separates
    distinct waveforms — the properties m08_audio_neardup's
    closed-form oracle rests on."""
    from crossfire_spark.functions.multimodal import (
        AFP_PATTERNS,
        audio_fingerprints,
        synthesize_gain_wavs,
    )

    # ids 0..39 render the 40 base waveforms at gain 1; ids 40..79
    # re-render them at gain 2
    docs = spark.range(2 * AFP_PATTERNS).withColumnRenamed("id", "doc_id")
    out = {
        r["media_id"]: r["fp"]
        for r in audio_fingerprints(synthesize_gain_wavs(docs)).collect()
    }
    for p in range(AFP_PATTERNS):
        assert out[p] == out[p + AFP_PATTERNS]
    assert len({out[p] for p in range(AFP_PATTERNS)}) == AFP_PATTERNS


def test_image_patches_real_roundtrip_and_coverage(spark, sf_dir):
    """m10: the patch grid covers the whole image exactly once
    (12 patches per 16x12 image), every mean is inside [0, 250], and
    re-assembling patch sums reproduces the full-image channel sum
    computed directly from the decoded array."""
    import numpy as np

    from crossfire_spark.catalog import load_table, spread
    from crossfire_spark.functions.multimodal import (
        PATCH_IMG_H,
        PATCH_IMG_W,
        PATCH_H,
        PATCH_W,
        decode_image,
        image_patches,
        synthesize_patch_images,
    )

    docs = spread(load_table(spark, sf_dir, "documents")).limit(20)
    media = synthesize_patch_images(docs)
    rows = image_patches(media).collect()
    per_img: dict = {}
    for r in rows:
        per_img.setdefault(r.media_id, []).append(r)
    n_patches = (PATCH_IMG_H // PATCH_H) * (PATCH_IMG_W // PATCH_W)
    assert all(len(v) == n_patches for v in per_img.values())
    assert all(0.0 <= r.m_r <= 250.0 for r in rows)
    raw = {r.media_id: bytes(r.content) for r in media.collect()}
    n = PATCH_H * PATCH_W
    for mid, patches in per_img.items():
        arr = decode_image(raw[mid]).astype(np.int64)
        assert arr.shape == (PATCH_IMG_H, PATCH_IMG_W, 3)
        got_sum = round(sum(p.m_r for p in patches) * n)
        assert got_sum == int(arr[:, :, 0].sum())
