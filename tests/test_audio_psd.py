"""Tests for the audio PSD operator (operators/audio.py): synthesized-tone
physics, Parseval energy sanity, batch-shape invariants, and the registry
entry's determinism."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ambient_sound_analysis_api_spark.operators.audio import (
    THIRD_OCTAVE_HZ,
    peak_band,
    psd_bands,
    synth_waveforms,
)


def _ids(spark, n):
    return spark.range(0, n).select(F.col("id").alias("media_id"))


def test_peak_band_matches_synth_tone(spark):
    """Each id's tone sits at THIRD_OCTAVE_HZ[id % 21]; the loudest PSD band
    must be exactly that band — the core FFT→banding correctness check."""
    n = 2 * len(THIRD_OCTAVE_HZ)
    waves = synth_waveforms(_ids(spark, n))
    peaks = {r.media_id: r.peak_band_hz for r in peak_band(psd_bands(waves)).collect()}
    assert len(peaks) == n
    for mid, got in peaks.items():
        assert got == THIRD_OCTAVE_HZ[mid % len(THIRD_OCTAVE_HZ)], mid


def test_psd_long_form_covers_all_bands_under_nyquist(spark):
    waves = synth_waveforms(_ids(spark, 3), sample_rate=16000)
    rows = psd_bands(waves).collect()
    bands_per_media = {}
    for r in rows:
        bands_per_media.setdefault(r.media_id, set()).add(r.band_hz)
    expected = {b for b in THIRD_OCTAVE_HZ if b * 2 ** (1 / 6) <= 8000}
    for got in bands_per_media.values():
        assert got == expected


def test_psd_matches_driver_side_numpy(spark):
    """Distributed result == straight-line numpy on the driver for one
    waveform (same normalization, same band edges)."""
    sr, sec = 16000, 0.25
    waves = synth_waveforms(_ids(spark, 1), sample_rate=sr, seconds=sec)
    row = waves.collect()[0]
    x = np.frombuffer(row.payload, dtype="<i2").astype(np.float64) / 32768.0
    ns = len(x)
    spec = np.fft.rfft(x)
    psd = (np.abs(spec) ** 2) / (sr * ns)
    psd[1:-1] *= 2.0
    freqs = np.fft.rfftfreq(ns, d=1.0 / sr)
    got = {
        (r.band_hz): r.value
        for r in psd_bands(waves).filter(F.col("media_id") == 0).collect()
    }
    for fc in THIRD_OCTAVE_HZ:
        lo, hi = fc / 2 ** (1 / 6), fc * 2 ** (1 / 6)
        if hi > sr / 2:
            continue
        mask = (freqs >= lo) & (freqs < hi)
        want = 10.0 * np.log10(psd[mask].sum() * (sr / ns) + 1e-20)
        assert abs(got[fc] - want) < 1e-9, fc


def test_tone_band_dominates_by_margin(spark):
    """The -40 dB secondary tone must sit well below the primary peak."""
    waves = synth_waveforms(_ids(spark, 5))
    rows = psd_bands(waves).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append((r.band_hz, r.value))
    for mid, pairs in by_media.items():
        vals = sorted((v for _, v in pairs), reverse=True)
        assert vals[0] - vals[1] > 10.0  # ≥10 dB peak-to-next margin


def test_registry_audio_query_is_deterministic(spark, sf_dir):
    from ambient_sound_analysis_api_spark.registry import q_mm_audio_psd

    a = sorted(tuple(r) for r in q_mm_audio_psd(spark, sf_dir).collect())
    b = sorted(tuple(r) for r in q_mm_audio_psd(spark, sf_dir).collect())
    assert a == b
    assert len(a) > 0


def test_spectrogram_framing_and_tone_tracking(spark):
    """0.25s at 16 kHz with 1/16s frames -> 4 frames per media; the tone
    band must be the per-frame argmax in every frame."""
    from ambient_sound_analysis_api_spark.operators.audio import spectrogram

    n = 6
    waves = synth_waveforms(_ids(spark, n))
    rows = spectrogram(waves).collect()
    frames = {}
    for r in rows:
        frames.setdefault((r.media_id, r.frame_idx), []).append((r.value, r.band_hz))
    media = {m for m, _ in frames}
    assert media == set(range(n))
    assert {f for _, f in frames} == {0, 1, 2, 3}
    for (mid, _), pairs in frames.items():
        peak = max(pairs)[1]
        assert peak == THIRD_OCTAVE_HZ[mid % len(THIRD_OCTAVE_HZ)], mid


def test_spectrogram_registry_query_shapes(spark, sf_dir):
    from ambient_sound_analysis_api_spark.registry import q_mm_audio_spectrogram

    rows = q_mm_audio_spectrogram(spark, sf_dir).collect()
    assert rows
    assert all(r.n_frames == 4 for r in rows)
