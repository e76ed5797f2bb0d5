"""Pins for the rows-only m11_goertzel_bands entry (t36/zlib
discipline: Python-side signal → exact pure-Python recompute pin +
planted-signal sanity pins)."""

from __future__ import annotations

import math

import pytest


def _recompute_row(doc_id: int, n_chars: int):
    """Independent recompute: synthesize the closed-form m05 PCM
    stream and run the Goertzel recurrence in plain Python, importing
    nothing from the kernel under test except the declared constants."""
    from crossfire_spark.functions.multimodal import (
        AUDIO_MAX_SAMPLES,
        AUDIO_SR,
        GOERTZEL_FREQS,
    )

    n = min(int(n_chars), AUDIO_MAX_SAMPLES)
    xs = [float((doc_id * (i + 1)) % 251) for i in range(n)]
    powers = []
    for fq in GOERTZEL_FREQS:
        coeff = 2.0 * math.cos(2.0 * math.pi * fq / AUDIO_SR)
        s1 = s2 = 0.0
        for x in xs:
            s0 = x - 128.0 + coeff * s1 - s2
            s2 = s1
            s1 = s0
        p = (s1 * s1 + s2 * s2 - coeff * s1 * s2) / float(n * n)
        powers.append(round(round(p, 9) + 1e-12, 6) + 0.0)
    dom = max(range(len(GOERTZEL_FREQS)), key=lambda i: (powers[i], -i))
    return (doc_id, n, *powers, dom)


def test_m11_exact_recompute(spark, sf_dir):
    from crossfire_spark.catalog import load_table
    from crossfire_spark.functions.multimodal import m11_goertzel_bands

    docs = {
        r.doc_id: r.n_chars
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .collect()
        if r.doc_id % 3 == 1
    }
    expected = sorted(_recompute_row(d, nc) for d, nc in docs.items())
    got = sorted(tuple(r) for r in m11_goertzel_bands(spark, sf_dir).collect())
    assert got == expected


def test_m11_planted_tone_dominates(spark):
    """A pure 1 kHz sine must put its energy in the e1000 band, and a
    250 Hz sine in e250 — the end-to-end sanity a DSP reviewer asks
    for before trusting any band report."""
    from crossfire_spark.functions.multimodal import (
        AUDIO_SR,
        GOERTZEL_FREQS,
        audio_band_energy,
        encode_wav,
    )

    rows = []
    for mid, freq in enumerate((250, 1000)):
        samples = [
            min(255, max(0, int(128 + 100 * math.sin(2 * math.pi * freq * i / AUDIO_SR))))
            for i in range(400)
        ]
        rows.append((mid, encode_wav(samples)))
    media = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r.media_id: r for r in audio_band_energy(media).collect()}
    assert out[0].dominant == GOERTZEL_FREQS.index(250)
    assert out[1].dominant == GOERTZEL_FREQS.index(1000)
    # dominance is decisive, not marginal
    assert out[1].e1000 > 10 * max(out[1].e250, out[1].e500, out[1].e2000)


def test_m11_deterministic_across_runs(spark, sf_dir):
    from crossfire_spark.functions.multimodal import m11_goertzel_bands

    a = [tuple(r) for r in m11_goertzel_bands(spark, sf_dir).collect()]
    b = [tuple(r) for r in m11_goertzel_bands(spark, sf_dir).collect()]
    assert a and a == b
