"""Parity tests: vectorized peaks vs scipy; spectral features vs direct math."""

import numpy as np
import jax.numpy as jnp
import scipy.signal as spsig

from audio_processing_tools_tpu.ops.peaks import (
    local_maxima,
    peak_prominences,
    peak_widths_rel,
    find_peaks,
    select_peaks_by_distance,
)
from audio_processing_tools_tpu.ops.features_spec import (
    extract_raw_spectral_features,
    scipy_stft_power,
    clip_spectral_occupancy,
)

FS = 11162


def test_local_maxima_matches_scipy(rng):
    for _ in range(5):
        x = rng.standard_normal(200)
        ours = np.flatnonzero(np.asarray(local_maxima(jnp.asarray(x))))
        ref, _ = spsig.find_peaks(x)
        np.testing.assert_array_equal(ours, ref)


def test_local_maxima_plateau():
    x = np.array([0, 1, 3, 3, 3, 1, 0, 2, 0, 5, 5, 0], dtype=float)
    ours = np.flatnonzero(np.asarray(local_maxima(jnp.asarray(x))))
    ref, _ = spsig.find_peaks(x)
    np.testing.assert_array_equal(ours, ref)


def test_prominences_match_scipy(rng):
    x = rng.standard_normal(150)
    mask = local_maxima(jnp.asarray(x))
    prom = np.asarray(peak_prominences(jnp.asarray(x), mask))
    peaks, _ = spsig.find_peaks(x)
    prom_ref = spsig.peak_prominences(x, peaks)[0]
    np.testing.assert_allclose(prom[peaks], prom_ref, atol=1e-5)


def test_widths_match_scipy(rng):
    x = rng.standard_normal(150)
    mask = local_maxima(jnp.asarray(x))
    prom = peak_prominences(jnp.asarray(x), mask)
    w = np.asarray(peak_widths_rel(jnp.asarray(x), mask, prom, 0.5))
    peaks, _ = spsig.find_peaks(x)
    w_ref = spsig.peak_widths(x, peaks, rel_height=0.5)[0]
    np.testing.assert_allclose(w[peaks], w_ref, atol=1e-4)


def test_find_peaks_with_filters(rng):
    x = rng.standard_normal(120)
    mask, _ = find_peaks(jnp.asarray(x), height=0.5, prominence=0.8)
    ref, _ = spsig.find_peaks(x, height=0.5, prominence=0.8)
    np.testing.assert_array_equal(np.flatnonzero(np.asarray(mask)), ref)


def test_distance_filter_matches_scipy(rng):
    for _ in range(5):
        x = np.abs(rng.standard_normal(150))
        mask = local_maxima(jnp.asarray(x))
        kept = select_peaks_by_distance(jnp.asarray(x), mask, distance=7)
        ref, _ = spsig.find_peaks(x, distance=7)
        np.testing.assert_array_equal(np.flatnonzero(np.asarray(kept)), ref)


def test_scipy_stft_power_parity(rng):
    x = rng.standard_normal(4096).astype(np.float32)
    P = np.asarray(scipy_stft_power(jnp.asarray(x), FS, 256, 128))
    f, t, z = spsig.stft(
        x, fs=FS, window="hann", nperseg=256, noverlap=128, nfft=256,
        boundary=None, padded=False,
    )
    ref = np.abs(z) ** 2
    np.testing.assert_allclose(P, ref, atol=1e-6 * ref.max())


def test_raw_spectral_features_sanity(rng):
    # pure 523 Hz tone: centroid/dominant near 523, mode-0 ratio dominates
    n = FS
    x = np.sin(2 * np.pi * 523 * np.arange(n) / FS).astype(np.float32)
    P = scipy_stft_power(jnp.asarray(x), FS, 256, 128)
    out = extract_raw_spectral_features(
        P, fs=FS, n_fft=256, operating_band=(400.0, 3500.0)
    )
    assert out["raw_spectral_centroid_hz"].shape[0] == P.shape[1]
    mid = P.shape[1] // 2
    assert abs(float(out["raw_dominant_freq_hz"][mid]) - 523) < 45
    assert float(out["raw_mode_band_ratio_0"][mid]) > 0.9
    assert float(out["raw_spectral_flatness"][mid]) < 0.1
    # cepstrum coeff 0 tracks log energy scale: check finite
    assert np.isfinite(np.asarray(out["raw_cepstrum_coeff_0"])).all()


def test_raw_spectral_features_math_parity(rng):
    """Direct numpy recomputation of centroid/bandwidth/rolloff/ratios."""
    x = (0.1 * rng.standard_normal(FS)).astype(np.float32)
    P = np.asarray(scipy_stft_power(jnp.asarray(x), FS, 256, 128)).astype(np.float64)
    freqs = np.linspace(0, FS / 2, 129)
    out = extract_raw_spectral_features(
        jnp.asarray(P), fs=FS, n_fft=256, operating_band=(400.0, 3500.0)
    )
    op = (freqs >= 400) & (freqs <= 3500)
    sp = P[op]
    tot = sp.sum(0) + 1e-12
    centroid = (freqs[op][:, None] * sp).sum(0) / tot
    np.testing.assert_allclose(
        np.asarray(out["raw_spectral_centroid_hz"]), centroid, rtol=1e-3
    )
    bw = np.sqrt((((freqs[op][:, None] - centroid) ** 2) * sp).sum(0) / tot)
    np.testing.assert_allclose(
        np.asarray(out["raw_spectral_bandwidth_hz"]), bw, rtol=1e-3
    )
    cum = np.cumsum(sp, 0)
    ridx = np.argmax(cum >= 0.85 * tot, axis=0)
    np.testing.assert_allclose(
        np.asarray(out["raw_spectral_rolloff_hz"]), freqs[op][ridx], rtol=1e-5
    )
    # cepstrum parity
    cep = np.fft.irfft(np.log(np.maximum(sp, 1e-12)), axis=0)
    np.testing.assert_allclose(
        np.asarray(out["raw_cepstrum_coeff_1"]), cep[1], atol=2e-3
    )


def test_clip_occupancy_stats(rng):
    F, T = 129, 100
    P = np.abs(rng.standard_normal((F, T))).astype(np.float32)
    is_rain = np.zeros(T, bool)
    is_rain[40:60] = True
    out = clip_spectral_occupancy(
        jnp.asarray(P), jnp.asarray(is_rain), fs=FS, n_fft=256
    )
    assert int(out["rain_frame_count"]) == 20
    assert int(out["no_rain_frame_count"]) == 80
    assert out["rain_log_power_mean"].shape == (16,)
    # recompute one stat directly
    freqs = np.linspace(0, FS / 2, F)
    m = (freqs >= 436.015625) & (freqs < 654.0234375)  # mode_1, band index 3
    band_p = P[m].sum(0)
    total = np.zeros(T)
    from audio_processing_tools_tpu.ops.features_spec import (
        default_spectral_occupancy_bands,
    )
    for i, (_, lo, hi) in enumerate(default_spectral_occupancy_bands()):
        mm = (freqs >= lo) & ((freqs <= hi) if i == 15 else (freqs < hi))
        total += P[mm].sum(0)
    ratio = band_p / (total + 1e-12)
    ref_mean = ratio[is_rain].mean()
    np.testing.assert_allclose(
        float(out["rain_power_ratio_mean"][3]), ref_mean, rtol=1e-4
    )
    # empty split -> zeros
    out2 = clip_spectral_occupancy(
        jnp.asarray(P), jnp.zeros(T, bool), fs=FS, n_fft=256
    )
    assert float(np.abs(np.asarray(out2["rain_log_power_mean"])).max()) == 0.0


def test_local_maxima_plateau_fuzz_vs_scipy(rng):
    """Quantized signals are plateau-heavy — pins the scan-encoded
    plateau-midpoint formulation against scipy across shapes.

    Rows are batched per (kind, length) so each shape traces once (the
    per-shape eager variant measured ~4 min on the 1-core host)."""
    R = 12
    for n in (3, 5, 12, 33, 59):
        rows = []
        for kind in range(5):
            if kind == 0:
                b = rng.standard_normal((R, n))
            elif kind == 1:
                b = np.round(rng.standard_normal((R, n)) * 2) / 2
            elif kind == 2:
                b = np.round(rng.standard_normal((R, n)))
            elif kind == 3:
                b = np.repeat(rng.standard_normal((R, -(-n // 3))),
                              3, axis=-1)[:, :n]
            else:
                b = np.full((R, n), 1.0)
                b[np.arange(R), rng.integers(0, n, R)] += 1.0
            rows.append(b)
        batch = np.concatenate(rows).astype(np.float32)
        ours = np.asarray(local_maxima(jnp.asarray(batch)))
        for r in range(batch.shape[0]):
            ref, _ = spsig.find_peaks(batch[r].astype(np.float64))
            np.testing.assert_array_equal(
                np.flatnonzero(ours[r]), ref, err_msg=f"n={n} row={r}"
            )
