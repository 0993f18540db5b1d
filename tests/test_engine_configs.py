"""Config-space coverage for the spectral engine's optional paths."""

import numpy as np
import pytest

from audio_processing_tools_tpu.config import DEFAULT_MODE_BANDS, build_noise_config
from audio_processing_tools_tpu.models.spectral_noise import SpectralNoiseEngine
from audio_processing_tools_tpu.models.frame_classifier import FrameClass

FS = 11162
DET = {"mode_bands": list(DEFAULT_MODE_BANDS)}


def _rain(rng, n=FS * 3):
    x = 0.005 * rng.standard_normal(n)
    for t0 in rng.integers(FS // 2, n - 2000, 20):
        k = np.arange(800)
        ping = sum(a * np.sin(2 * np.pi * f * k / FS)
                   for f, a in [(520, 1), (900, 0.5), (1600, 0.35), (2450, 0.25)])
        x[t0 : t0 + 800] += 0.5 * np.exp(-k / 60.0) * ping
    return x.astype(np.float32)


def _run(rng, **over):
    eng = SpectralNoiseEngine()
    eng.setup({"sample_rate": FS, "detector": DET, "return_spectra": True,
               **over})
    return eng.process(_rain(rng))


def test_wiener_gain_mode(rng):
    out = _run(rng, gain_mode="wiener")
    S_pow = np.abs(out["S"]) ** 2
    Sh_pow = np.abs(out["S_hat"]) ** 2
    assert Sh_pow.sum() < S_pow.sum()  # suppression happened
    assert (out["frame_class"] == FrameClass.RAIN).sum() > 0


def test_snr_gating(rng):
    out = _run(rng, snr_gating_enable=True, return_debug=True)
    gate = out["debug"]["snr_gate"]
    assert gate is not None and gate.shape == out["frame_class"].shape
    assert (gate >= 0).all() and (gate <= 1).all()
    # rain bursts drive the mode-band SNR gate toward 1 somewhere
    assert gate.max() > 0.5


def test_lagged_noise_psd_and_median(rng):
    out = _run(rng, use_lagged_noise_psd=True, median_frames=5,
               pre_smooth_frames=3, return_noise_psd=True)
    assert np.isfinite(out["noise_psd"]).all()
    assert np.isfinite(out["mean_noise_floor_db"])


def test_adaptive_q(rng):
    out_a = _run(rng, adaptive_q_enable=True, return_noise_psd=True)
    out_b = _run(rng, adaptive_q_enable=False, return_noise_psd=True)
    # adaptive q lowers the tracked noise floor during rainy prevalence
    assert out_a["noise_psd"].sum() <= out_b["noise_psd"].sum() * 1.01


def test_bandpass_prefilter_and_none(rng):
    out_bp = _run(rng, pre_filter_mode="bandpass")
    out_none = _run(rng, pre_filter_mode="none")
    for out in (out_bp, out_none):
        assert (out["frame_class"] == FrameClass.RAIN).sum() > 0


def test_bypass_classifier(rng):
    eng = SpectralNoiseEngine()
    eng.setup({"sample_rate": FS,
               "detector": {**DET, "bypass_classifier": True}})
    out = eng.process(_rain(rng))
    assert (out["frame_class"] == FrameClass.NOISE).all()
    assert (out["rain_conf"] == 0).all()


def test_peak_gate_path_compiles(rng):
    eng = SpectralNoiseEngine()
    eng.setup({"sample_rate": FS,
               "detector": {**DET, "peak_features_enable": True},
               "return_detector_debug": True})
    out = eng.process(_rain(rng))
    dd = out["det_debug"]
    assert "peak_gate_score" in dd and "peak_valid_count" in dd
    assert dd["peak_count_by_mode"].shape[0] == 5


def test_ratio_db_norm_and_no_norm(rng):
    out_r = _run(rng, detector_noise_norm_mode="ratio_db")
    out_n = _run(rng, detector_use_noise_norm=False)
    for out in (out_r, out_n):
        assert out["frame_class"].shape[0] > 0


def test_mode_weights_and_winsor(rng):
    eng = SpectralNoiseEngine()
    eng.setup({"sample_rate": FS,
               "detector": {**DET, "mode_weights": [1, 1, 0.5, 0.5, 0.25],
                            "flux_modes_winsor_enable": True,
                            "td_soft_enable": True,
                            "td_envelope_features_enable": True,
                            "clip_spectral_occupancy_enable": True},
               "return_detector_debug": True})
    out = eng.process(_rain(rng))
    dd = out["det_debug"]
    assert "td_soft_score" in dd and "td_rise_time_sec" in dd
    occ = dd["clip_spectral_occupancy"]
    assert occ["rain_log_power_mean"].shape == (16,)


def test_invalid_configs():
    with pytest.raises(ValueError):
        build_noise_config(FS, {"detector": DET, "hop": 512}).validate()
    with pytest.raises(ValueError):
        build_noise_config(FS, {"detector": DET, "gain_floor": 2.0}).validate()
    with pytest.raises(AttributeError):
        build_noise_config(FS, {}).validate()  # missing mode_bands
    with pytest.raises(ValueError):
        build_noise_config(
            FS, {"detector": DET, "oversub_base": 5.0, "oversub_max": 1.0}
        ).validate()


def test_legacy_fmin_fmax():
    cfg = build_noise_config(FS, {"detector": DET, "fmin": 300, "fmax": 3000})
    assert cfg.operating_band == (300.0, 3000.0)
    # nested suppressor defaults lose to flat overrides
    cfg2 = build_noise_config(
        FS, {"detector": DET, "suppressor": {"oversub_max": 5.0, "q": 0.4},
             "oversub_max": 2.0}
    )
    assert cfg2.oversub_max == 2.0 and cfg2.q == 0.4


@pytest.mark.parametrize("kind", ["silence", "dc", "clipped"])
def test_engine_extreme_inputs_stay_finite(kind, rng):
    """Silence / DC offset / hard clipping never produce NaN/Inf outputs."""
    from audio_processing_tools_tpu.models.spectral_noise import SpectralNoiseEngine

    n = FS * 2
    if kind == "silence":
        x = np.zeros(n, np.float32)
    elif kind == "dc":
        x = np.full(n, 0.25, np.float32)
    else:
        x = np.clip(5.0 * rng.standard_normal(n), -1, 1).astype(np.float32)

    eng = SpectralNoiseEngine()
    eng.setup({"sample_rate": FS, "detector": DET})
    out = eng.process(x)
    assert np.isfinite(np.asarray(out["rain_conf"])).all()
    assert np.isfinite(np.asarray(out["noise_conf"])).all()
    fc = np.asarray(out["frame_class"])
    assert set(np.unique(fc)).issubset({0, 1, 2})
    if kind in ("silence", "dc"):
        assert (fc != 2).all(), "steady input must not classify as rain"


def test_roe_extreme_inputs_stay_finite(rng):
    from audio_processing_tools_tpu.models.roe import rain_detection_algo

    FS_ = 11162
    for x in (np.zeros(FS_ * 2, np.float32),
              np.clip(5 * rng.standard_normal(FS_ * 2), -1, 1).astype(np.float32)):
        drops, frain, state = rain_detection_algo(
            x, sample_rate=FS_, check_duration=2, return_spectra=False)
        assert np.isfinite(frain)
        assert drops >= 0
        assert np.isfinite(np.asarray(state["kurtosis"])).all()
