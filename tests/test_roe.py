"""Tests for the legacy RoE harmonic-novelty classifier."""

import numpy as np
import jax.numpy as jnp
import scipy.signal as spsig
import scipy.stats
import pytest

from audio_processing_tools_tpu.models.roe import (
    RoeConfig,
    build_roe_config,
    rain_detection_algo,
    python_classifier_boolean_wrapper,
    roe_detect_batch,
    _novelty_spectrum,
    _local_average_sorted3,
    _pulse_characteristics,
)

FS = 11162


def test_config_derivations():
    cfg = RoeConfig()
    assert cfg.frame_length == 256
    assert cfg.hop_length == 128
    assert cfg.min_average_len == 20
    assert abs(cfg.rain_thr_hn - 12.0) < 1e-9
    cfg2 = build_roe_config(sample_rate=FS, harmonic_threshold=[5, 4, 3, 3, 3, 3])
    assert cfg2.rain_thr_hn == 12.0


def test_local_average_matches_loop(rng):
    x = np.abs(rng.standard_normal(176)).astype(np.float32)
    M = 20
    ours = np.asarray(_local_average_sorted3(jnp.asarray(x), M))
    ref = np.zeros_like(x)
    for m in range(len(x)):
        a, b = max(m - M, 0), min(m + M + 1, len(x))
        xd = sorted(x[a:b])
        ref[m] = np.mean(xd[:3])
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_novelty_spectrum_matches_loop(rng):
    """Novelty = positive freq-diff sum, SNR-normalized, peak-masked,
    thresholded (loop oracle of compute_novelty_spectrum_new)."""
    F, T = 129, 100
    Y1 = np.abs(rng.standard_normal((F, T))).astype(np.float32)
    Y1[:10] = 0
    Y1[40:] = 0
    M, thr = 20, 4.5
    nov_t, nov1 = (np.asarray(a) for a in _novelty_spectrum(jnp.asarray(Y1), M, thr))

    d = np.diff(Y1.astype(np.float64), axis=0)
    d[d <= 0] = 0
    nov = np.concatenate([d.sum(axis=0), [0.0]])
    la = np.zeros_like(nov)
    for m in range(len(nov)):
        a, b = max(m - M, 0), min(m + M + 1, len(nov))
        la[m] = np.mean(sorted(nov[a:b])[:3])
    la[la <= 0] = nov.max() / 5
    nov[nov == 0] = 1
    la[la == 0] = 1
    nov = nov / la
    peaks, _ = spsig.find_peaks(nov, prominence=(None, None))
    mask = np.zeros(len(nov))
    mask[peaks] = 1
    ref_nov1 = nov * mask
    ref_t = np.where(nov > thr, np.minimum(nov, 1.5 * thr), 0.0) * mask
    np.testing.assert_allclose(nov1, ref_nov1, rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(nov_t, ref_t, rtol=2e-3, atol=1e-4)


def test_pulse_characteristics_match_loop(rng):
    cfg = RoeConfig()
    n = 22324
    x = (0.1 * rng.standard_normal(n)).astype(np.float32)
    x[5000:5200] += 0.8 * np.exp(-np.arange(200) / 30.0)
    T = 1 + n // 128  # centered stft frame count
    out = {k: np.asarray(v) for k, v in _pulse_characteristics(
        jnp.asarray(x), T, cfg).items()}

    padded = np.concatenate([np.zeros(128), x.astype(np.float64), np.zeros(128)])
    sos = spsig.butter(4, [400 / (FS / 2), 900 / (FS / 2)], "band", output="sos")
    filtered = spsig.sosfilt(sos, padded)
    nf = 1 + (len(filtered) - 256) // 128
    energy = np.array([
        np.sum(filtered[i * 128 : i * 128 + 256] ** 2) for i in range(min(nf, T))
    ])
    np.testing.assert_allclose(out["energy_list"][:T], energy[:T],
                               rtol=5e-3, atol=1e-6 * energy.max())
    # diff energy spot check
    k_ref = np.zeros(T)
    crest_ref = np.zeros(T)
    for i in range(1, T):
        fr = padded[i * 128 : i * 128 + 256]
        k_ref[i] = scipy.stats.kurtosis(fr, fisher=True)
        crest_ref[i] = np.max(np.abs(fr)) / (np.sqrt(np.mean(fr**2)) + 1e-12)
    np.testing.assert_allclose(out["kurtosis"][:T], k_ref, rtol=2e-2, atol=5e-2)
    np.testing.assert_allclose(out["crest_factor"][:T], crest_ref, rtol=5e-3, atol=1e-3)
    assert out["times"].shape == (T + 1,)


def _harmonic_rain(rng, seconds=10, fn=500.0, drop_rate=8):
    """Harmonic droplet train at fn + overtones (RoE's physical model)."""
    n = FS * seconds
    x = 0.003 * rng.standard_normal(n)
    n_drops = int(drop_rate * seconds)
    for t0 in rng.integers(0, n - 1200, n_drops):
        k = np.arange(1000)
        ping = np.zeros(1000)
        for h in range(1, 6):
            ping += (1.0 / h) * np.sin(2 * np.pi * fn * h * k / FS)
        x[t0 : t0 + 1000] += 0.6 * np.exp(-k / 80.0) * ping
    return x.astype(np.float32)


def test_roe_discriminates_rain_from_noise(rng):
    rain = _harmonic_rain(rng)
    noise = (0.02 * rng.standard_normal(FS * 10)).astype(np.float32)
    drops_r, frain_r, state_r = rain_detection_algo(rain, sample_rate=FS)
    drops_n, frain_n, state_n = rain_detection_algo(noise, sample_rate=FS)
    assert drops_r > 0, "rain clip should produce drops"
    assert 400 <= frain_r <= 700, f"frain_mean {frain_r} outside natural range"
    assert drops_n == 0, f"noise clip produced {drops_n} drops"
    assert state_r["rain_peaks_count"] > state_n["rain_peaks_count"]
    # state arrays cover all chunks
    assert state_r["raining"].shape[0] >= 5 * (1 + 22324 // 128)


def test_boolean_wrapper(rng):
    rain = _harmonic_rain(rng)
    assert python_classifier_boolean_wrapper(rain, sample_rate=FS) is True
    noise = (0.02 * rng.standard_normal(FS * 10)).astype(np.float32)
    assert python_classifier_boolean_wrapper(noise, sample_rate=FS) is False


def test_roe_batch_matches_single(rng):
    xb = np.stack([
        _harmonic_rain(rng, seconds=4),
        (0.02 * rng.standard_normal(FS * 4)).astype(np.float32),
    ])
    out = roe_detect_batch(xb, sample_rate=FS, check_duration=4)
    d0, f0, _ = rain_detection_algo(xb[0], sample_rate=FS, check_duration=4)
    d1, f1, _ = rain_detection_algo(xb[1], sample_rate=FS, check_duration=4)
    assert int(out["rain_drop_count_mod"][0]) == d0
    assert int(out["rain_drop_count_mod"][1]) == d1
    np.testing.assert_allclose(out["frain_mean"], [f0, f1], rtol=1e-5)


def test_nf_not_supported():
    with pytest.raises(NotImplementedError):
        rain_detection_algo(np.zeros(FS * 10, np.float32), sample_rate=FS, nf=1.0)
