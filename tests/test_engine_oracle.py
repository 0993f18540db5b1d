"""Full-path parity: the flagship classifier vs an independent NumPy oracle."""

import numpy as np
import pytest

from audio_processing_tools_tpu.config import DEFAULT_MODE_BANDS
from audio_processing_tools_tpu.models.spectral_noise import SpectralNoiseEngine
from tests.oracles import spectral_engine_oracle

FS = 11162


@pytest.fixture(scope="module")
def engine():
    eng = SpectralNoiseEngine()
    eng.setup({
        "sample_rate": FS,
        "detector": {"mode_bands": list(DEFAULT_MODE_BANDS)},
        "return_detector_debug": True,
    })
    return eng


def _rain(rng, n=FS * 4):
    x = 0.005 * rng.standard_normal(n)
    for t0 in rng.integers(FS // 2, n - 2000, 25):
        k = np.arange(800)
        ping = sum(a * np.sin(2 * np.pi * f * k / FS)
                   for f, a in [(520, 1), (900, 0.5), (1600, 0.35), (2450, 0.25)])
        x[t0 : t0 + 800] += 0.5 * np.exp(-k / 60.0) * ping
    return x.astype(np.float32)


@pytest.mark.parametrize("kind", ["rain", "noise"])
def test_classifier_matches_full_oracle(engine, rng, kind):
    x = _rain(rng) if kind == "rain" else (0.02 * rng.standard_normal(FS * 4)).astype(np.float32)
    out = engine.process(x)
    ref = spectral_engine_oracle(x.astype(np.float64), FS)

    fc = np.asarray(out["frame_class"])
    fc_ref = ref["frame_class"]
    # float32 vs float64 near-threshold flips: require >= 99% agreement and
    # identical rain-frame counts within 1
    agree = (fc == fc_ref).mean()
    assert agree >= 0.99, f"frame_class agreement {agree:.3f}"
    n_rain = int((fc == 2).sum())
    n_rain_ref = int((fc_ref == 2).sum())
    assert abs(n_rain - n_rain_ref) <= max(1, int(0.05 * max(n_rain_ref, 1))), (
        n_rain, n_rain_ref
    )

    dd = out["det_debug"]
    np.testing.assert_allclose(
        np.asarray(dd["td_crest_factor"]), ref["td_crest"], rtol=5e-3, atol=5e-3
    )
    # normalized per-mode flux parity (the decision features)
    ours = np.asarray(dd["normalized_mode_flux_by_mode"])
    np.testing.assert_allclose(
        ours, ref["normalized_mode_flux"], rtol=0.05, atol=0.05
    )
    np.testing.assert_array_equal(np.asarray(dd["td_gate_mask"]), ref["td_gate"])


def test_suppressor_path_matches_composed_oracle(rng):
    """Full suppressor half vs an independent float64 composition of the
    loop oracles: classifier decisions -> NOISE-gated PSD tracker ->
    oversubtraction gain -> S_hat. Verifies the engine's second half end to
    end (reference rain_signal_processor.py:1028-1125)."""
    import scipy.signal as spsig

    from tests.oracles import (
        noise_psd_track_loop,
        spectral_engine_oracle,
        stft_librosa,
    )

    x = _rain(rng)
    eng = SpectralNoiseEngine()
    eng.setup({
        "sample_rate": FS,
        "detector": {"mode_bands": list(DEFAULT_MODE_BANDS)},
        "return_debug": True, "return_spectra": True,
        "return_detector_debug": True,
    })
    out = eng.process(x)
    G_eng = np.asarray(out["debug"]["G"])

    # ---- independent float64 oracle composition ----
    ref = spectral_engine_oracle(x.astype(np.float64), FS)
    n_fft, hop, eps = 256, 128, 1e-9
    S = stft_librosa(x.astype(np.float64), n_fft, hop)
    P = np.abs(S) ** 2
    F, T = P.shape
    freqs = np.linspace(0, FS / 2, F)
    band = (freqs >= 400.0) & (freqs <= 3500.0)

    is_noise = ref["frame_class"] == 0
    fps = FS / hop
    W = max(10, int(0.5 * fps))
    N_band = noise_psd_track_loop(P[band], ~is_noise, W=W, q=0.25,
                                  ema_up=0.6, ema_down=0.95)
    P_band = P[band]
    N_eff = np.minimum(N_band, P_band)  # maxr = 1.0, unlagged (defaults)

    noise_conf = 1.0 - ref["is_rain"].astype(np.float64)
    th, denom = 0.7, 0.3
    eff = np.clip((noise_conf - th) / denom, 0, 1)
    oversub = 1.0 + eff * 2.0
    ratio = np.clip(N_eff / (P_band + eps), 0, 1)
    G_raw = np.clip(1.0 - oversub[None, :] * np.sqrt(ratio), 0.0, 1.0)
    kernel = np.array([0.2, 0.6, 0.2])
    G_freq = G_raw.copy()
    for t in range(T):
        if noise_conf[t] >= th:
            G_freq[:, t] = np.convolve(G_raw[:, t], kernel, mode="same")
    G_time = np.empty_like(G_freq)
    G_time[:, 0] = G_freq[:, 0]
    for t in range(1, T):
        alpha = 0.0 if noise_conf[t] < th else 0.7 * (noise_conf[t] - th) / denom
        G_time[:, t] = alpha * G_time[:, t - 1] + (1 - alpha) * G_freq[:, t]
        if noise_conf[t] < th:
            G_time[:, t] = np.maximum(G_time[:, t], G_freq[:, t])
    G_ref = np.clip(G_time, 0.0, 1.0)

    # classifier decisions agree >=99%; on agreeing frames the gain must
    # match tightly (f32 engine vs f64 oracle through two causal trackers)
    agree_frames = ref["frame_class"] == np.asarray(out["frame_class"])
    assert agree_frames.mean() >= 0.99
    Gb_eng = G_eng[band][:, agree_frames]
    Gb_ref = G_ref[:, agree_frames]
    med_err = np.median(np.abs(Gb_eng - Gb_ref))
    p99_err = np.quantile(np.abs(Gb_eng - Gb_ref), 0.99)
    assert med_err < 0.01, med_err
    assert p99_err < 0.15, p99_err
    # out-of-band rows pass through untouched
    np.testing.assert_array_equal(G_eng[~band], 1.0)
    # suppressed spectrum = G * S on device
    S_dev = np.asarray(out["S"])
    Sh_dev = np.asarray(out["S_hat"])
    np.testing.assert_allclose(Sh_dev, G_eng * S_dev, rtol=1e-5, atol=1e-6)
