"""Differential tests executing the reference's FLAGSHIP ENGINE and legacy
RoE pipeline as oracles.

``edge/rain_signal_processor.py`` (the STFT detector + noise suppressor)
and ``edge/dsp_rain_detection.py`` (the 3,284-line RoE notebook) need
librosa only for ``stft`` / ``istft`` / ``fft_frequencies`` /
``frames_to_time`` / ``amplitude_to_db``; ``tests/ref_shims.py`` provides a
faithful NumPy implementation of exactly those (librosa>=0.10 semantics),
self-checked below, so the reference's OWN detector, gain, suppressor, and
harmonic-novelty logic — every line of it — executes here against the JAX
engines.

Skipped automatically when /root/reference is not mounted.
"""

import sys
from dataclasses import fields as dc_fields
from pathlib import Path

import numpy as np
import pytest

REF_ROOT = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not REF_ROOT.is_dir(), reason="reference repo not mounted"
)
if REF_ROOT.is_dir():
    if str(REF_ROOT) not in sys.path:
        sys.path.insert(0, str(REF_ROOT))
    from tests import ref_shims  # noqa: F401  (importing installs the shims)

ref_rsp = pytest.importorskip("audio_processing_tools.edge.rain_signal_processor")
ref_dsp = pytest.importorskip("audio_processing_tools.edge.dsp_rain_detection")

from audio_processing_tools_tpu.config import (  # noqa: E402
    DEFAULT_MODE_BANDS,
    build_noise_config,
)
from audio_processing_tools_tpu.models.roe import (  # noqa: E402
    rain_detection_algo,
)
from audio_processing_tools_tpu.models.spectral_noise import (  # noqa: E402
    SpectralNoiseEngine,
)
from audio_processing_tools_tpu.utils.corpus import synth_clip  # noqa: E402

FS = 11162
DET = {"mode_bands": tuple(tuple(b) for b in DEFAULT_MODE_BANDS)}


@pytest.fixture(scope="module", params=["rain_heavy", "noise", "wind"])
def clip(request):
    rng = np.random.default_rng({"rain_heavy": 5, "noise": 6, "wind": 7}[
        request.param
    ])
    return synth_clip(request.param, rng, fs=FS, seconds=2.0)


# ---------------------------------------------------------------------------
# the shim itself must be trustworthy before anything downstream is
# ---------------------------------------------------------------------------

def test_librosa_shim_selfchecks(rng):
    from tests.oracles import istft_librosa, stft_librosa
    from tests.ref_shims import (
        shim_amplitude_to_db,
        shim_fft_frequencies,
        shim_frames_to_time,
        shim_istft,
        shim_stft,
    )

    x = (0.1 * rng.standard_normal(4096)).astype(np.float32)
    S = shim_stft(x, n_fft=256, hop_length=128, win_length=256,
                  window="hann", center=True)
    # agrees with this suite's independently-written float64 oracle
    S2 = stft_librosa(x, n_fft=256, hop=128, center=True)
    np.testing.assert_allclose(S.astype(np.complex128), S2, atol=1e-6)
    # perfect reconstruction through istft (hann COLA at 50% overlap)
    y = shim_istft(S.astype(np.complex128), hop_length=128, win_length=256,
                   window="hann", center=True, length=len(x))
    np.testing.assert_allclose(y, x, atol=1e-6)
    y2 = istft_librosa(S2, n_fft=256, hop=128, length=len(x))
    np.testing.assert_allclose(y, y2, atol=1e-6)

    np.testing.assert_allclose(
        shim_fft_frequencies(sr=FS, n_fft=256),
        np.linspace(0, FS / 2, 129), rtol=1e-12,
    )
    np.testing.assert_allclose(
        shim_frames_to_time(np.arange(5), sr=FS, hop_length=128),
        np.arange(5) * 128 / FS,
    )
    # amplitude_to_db: 20log10 magnitude w/ ref=max and 80 dB floor
    a = np.array([1.0, 0.1, 1e-9])
    db = shim_amplitude_to_db(a, ref=np.max)
    np.testing.assert_allclose(db[:2], [0.0, -20.0], atol=1e-9)
    assert db[2] == pytest.approx(-80.0)


# ---------------------------------------------------------------------------
# config builder precedence (rain_signal_processor.py:202-255)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("params", [
    {"detector": dict(DET)},
    {"detector": dict(DET), "n_fft": 512, "hop": 256, "q": 0.4},
    {"detector": dict(DET), "fmin": 300, "fmax": 3000},          # legacy band
    {"detector": dict(DET), "operating_band": (500, 2800), "fmin": 300},
    {"detector": dict(DET),
     "suppressor": {"gain_floor": 0.2, "oversub_base": 1.5},
     "gain_floor": 0.3},                                         # flat > nested
])
def test_build_noise_config_matches_reference(params):
    ref_cfg = ref_rsp.build_noise_config(FS, dict(params))
    got_cfg = build_noise_config(FS, dict(params))
    shared = {f.name for f in dc_fields(ref_cfg)} & set(
        got_cfg.__dataclass_fields__
    )
    assert len(shared) > 20, "config field overlap unexpectedly small"
    for name in sorted(shared):
        ref_v = getattr(ref_cfg, name)
        got_v = getattr(got_cfg, name)
        if isinstance(ref_v, tuple) or isinstance(got_v, tuple):
            assert tuple(got_v) == tuple(ref_v), name
        elif isinstance(ref_v, dict):
            continue  # nested dicts compared via behavior below
        else:
            assert got_v == ref_v, (
                f"config field {name!r}: got {got_v!r}, reference {ref_v!r}"
            )


# ---------------------------------------------------------------------------
# the flagship engine, classifier path
# ---------------------------------------------------------------------------

def _ref_engine(extra=None):
    params = {"detector": dict(DET), "classifier_only_mode": True,
              "return_detector_debug": True, **(extra or {})}
    cfg = ref_rsp.build_noise_config(FS, params)
    return ref_rsp.SpectralNoiseProcessor(cfg)


def _got_engine(extra=None):
    eng = SpectralNoiseEngine()
    eng.setup({"sample_rate": FS, "detector": dict(DET),
               "classifier_only_mode": True, "return_detector_debug": True,
               **(extra or {})})
    return eng


ENGINE_VARIANTS = {
    "default": {},
    "highpass": {"pre_filter_mode": "highpass"},
    "bandpass": {"pre_filter_mode": "bandpass"},
    "wiener": {"classifier_only_mode": False, "gain_mode": "wiener",
               "compute_output_audio": True},
}


@pytest.mark.parametrize("variant", sorted(ENGINE_VARIANTS))
def test_spectral_engine_classifier_matches_reference(clip, variant):
    extra = ENGINE_VARIANTS[variant]
    ref_out = _ref_engine(extra).process(clip, FS)
    got_out = _got_engine(extra).process(clip)

    ref_fc = np.asarray(ref_out["frame_class"], np.int32)
    got_fc = np.asarray(got_out["frame_class"], np.int32)
    assert got_fc.shape == ref_fc.shape
    np.testing.assert_allclose(np.asarray(got_out["times"]),
                               np.asarray(ref_out["times"]), atol=1e-6)

    # measured: EXACT agreement on every variant x clip class; a regression
    # that flips any frame vs the real reference engine should fail loudly
    # (if a legitimately borderline fixture appears, re-pin with a bound)
    np.testing.assert_array_equal(
        got_fc, ref_fc,
        err_msg=f"frame_class diverges from the reference engine ({variant})",
    )
    for key in ("rain_conf", "noise_conf"):
        ref_v = np.asarray(ref_out[key], np.float64)
        got_v = np.asarray(got_out[key], np.float64)
        np.testing.assert_allclose(
            got_v, ref_v, rtol=5e-3, atol=5e-3,
            err_msg=f"{key} diverges from the reference engine",
        )
    # detector debug flux features drive the decision — they must agree
    # tightly, not just the quantized labels
    for key in ("primary_mode_flux", "mode_flux_score"):
        ref_v = np.asarray(ref_out["det_debug"][key], np.float64)
        got_v = np.asarray(got_out["det_debug"][key], np.float64)
        scale = float(np.abs(ref_v).max()) + 1e-9
        np.testing.assert_allclose(
            got_v, ref_v, rtol=2e-3, atol=2e-3 * scale,
            err_msg=f"det_debug[{key!r}] diverges from the reference engine",
        )


@pytest.mark.parametrize("draw", range(4))
def test_spectral_engine_classifier_matches_reference_fuzzed(draw):
    """Seeded fuzz over the classifier decision thresholds + noise tracking.

    The fixed variants above pin exact frame parity on three corners; each
    draw here randomizes the flux thresholds, support voting, TD gate,
    noise gating, quantile tracking, and SNR gating
    (``rain_signal_processor.py:202-255`` + ``rain_frame_classifier.py``
    dget surface) and runs a mixed rain+noise clip through both engines.
    Thresholds land at random distances from the (2e-3-agreeing) flux
    features, so single borderline frames may legitimately flip: the bound
    is >=98% frame agreement plus the same tight float bounds as the fixed
    variants.
    """
    rng = np.random.default_rng(3000 + draw)
    det = dict(DET)
    det.update({
        "new_rain_primary_flux_min": float(rng.uniform(1.2, 2.5)),
        "new_rain_mode12_flux_min": float(rng.uniform(2.0, 3.2)),
        "new_rain_mode3_flux_min": float(rng.uniform(2.4, 3.6)),
        "new_rain_min_support_count": int(rng.integers(1, 4)),
        "td_gate_threshold": float(rng.uniform(2.0, 3.0)),
        "mode_flux_noise_max": float(rng.uniform(1.0, 2.0)),
        "noise_hi": float(rng.uniform(0.7, 0.9)),
        "mode_flux_norm_win_sec": float(rng.uniform(0.3, 0.8)),
        "mode_flux_norm_q": float(rng.uniform(0.2, 0.4)),
    })
    extra = {
        "detector": det,
        "q": float(rng.uniform(0.2, 0.4)),
        "win_sec": float(rng.uniform(0.3, 0.8)),
        "adaptive_q_enable": bool(rng.integers(0, 2)),
        "snr_gating_enable": bool(rng.integers(0, 2)),
        "pre_filter_mode": str(rng.choice(["highpass", "bandpass", "none"])),
    }
    half = synth_clip("rain_heavy", rng, fs=FS, seconds=1.0)
    rest = synth_clip("noise", rng, fs=FS, seconds=1.0)
    clip_mix = np.concatenate([rest[: FS // 2], half, rest[FS // 2 :]])

    ref_out = _ref_engine(extra).process(clip_mix, FS)
    got_out = _got_engine(extra).process(clip_mix)

    ref_fc = np.asarray(ref_out["frame_class"], np.int32)
    got_fc = np.asarray(got_out["frame_class"], np.int32)
    assert got_fc.shape == ref_fc.shape
    agreement = float(np.mean(got_fc == ref_fc))
    assert agreement >= 0.98, (
        f"frame agreement {agreement:.3f} < 0.98 (draw {draw})"
    )
    for key in ("rain_conf", "noise_conf"):
        ref_v = np.asarray(ref_out[key], np.float64)
        got_v = np.asarray(got_out[key], np.float64)
        np.testing.assert_allclose(
            got_v, ref_v, rtol=5e-3, atol=5e-3,
            err_msg=f"{key} diverges from the reference engine (draw {draw})",
        )
    for key in ("primary_mode_flux", "mode_flux_score"):
        ref_v = np.asarray(ref_out["det_debug"][key], np.float64)
        got_v = np.asarray(got_out["det_debug"][key], np.float64)
        scale = float(np.abs(ref_v).max()) + 1e-9
        np.testing.assert_allclose(
            got_v, ref_v, rtol=2e-3, atol=2e-3 * scale,
            err_msg=f"det_debug[{key!r}] diverges (draw {draw})",
        )


def test_spectral_engine_suppressor_matches_reference(clip):
    extra = {"classifier_only_mode": False, "compute_output_audio": True,
             "return_spectra": True, "return_filtered_audio": True,
             "return_noise_psd": True}
    ref_out = _ref_engine(extra).process(clip, FS)
    got_out = _got_engine(extra).process(clip)

    ref_S = np.asarray(ref_out["S"])
    got_S = np.asarray(got_out["S"])
    scale_S = float(np.abs(ref_S).max()) + 1e-12
    np.testing.assert_allclose(got_S, ref_S, atol=2e-4 * scale_S,
                               err_msg="input spectrogram differs")

    ref_Sh = np.abs(np.asarray(ref_out["S_hat"]))
    got_Sh = np.abs(np.asarray(got_out["S_hat"]))
    np.testing.assert_allclose(
        got_Sh, ref_Sh, atol=2e-2 * scale_S,
        err_msg="suppressed spectrogram diverges from the reference engine",
    )
    # suppression depth agrees: per-frame band energy ratio out/in
    Pin = (np.abs(ref_S) ** 2).sum(0) + 1e-12
    r_ref = (ref_Sh ** 2).sum(0) / Pin
    r_got = (got_Sh ** 2).sum(0) / Pin
    np.testing.assert_allclose(r_got, r_ref, atol=5e-2)

    ref_y = np.asarray(ref_out["y"], np.float64)
    got_y = np.asarray(got_out["y"], np.float64)
    assert got_y.shape == ref_y.shape
    scale_y = float(np.abs(ref_y).max()) + 1e-12
    np.testing.assert_allclose(
        got_y, ref_y, atol=5e-2 * scale_y,
        err_msg="output audio diverges from the reference engine",
    )


@pytest.mark.parametrize("draw", range(3))
def test_spectral_engine_suppressor_matches_reference_fuzzed(draw):
    """Seeded fuzz over the suppressor's gain-shaping space: gain mode,
    oversubtraction, floor/ceil, temporal + frequency smoothing, SNR
    gating (``rain_signal_processor.py:400-533``). Same spectra/audio
    bounds as the fixed-config suppressor test."""
    rng = np.random.default_rng(4000 + draw)
    of = float(rng.uniform(0.0, 0.3))
    extra = {
        "classifier_only_mode": False, "compute_output_audio": True,
        "return_spectra": True,
        "gain_mode": str(rng.choice(["sqrt_sub", "wiener"])),
        "oversub_base": float(rng.uniform(1.0, 2.0)),
        "oversub_max": float(rng.uniform(2.0, 4.0)),
        "gain_floor": of,
        "gain_ceil": float(rng.uniform(max(of + 0.1, 0.8), 1.0)),
        "gain_smooth_alpha": float(rng.uniform(0.4, 0.9)),
        "gain_freq_smooth_enable": bool(rng.integers(0, 2)),
        "adaptive_gain_enable": bool(rng.integers(0, 2)),
        "snr_gating_enable": bool(rng.integers(0, 2)),
        "ema_up": float(rng.uniform(0.4, 0.8)),
        "ema_down": float(rng.uniform(0.85, 0.99)),
    }
    half = synth_clip("rain_heavy", rng, fs=FS, seconds=1.0)
    rest = synth_clip("noise", rng, fs=FS, seconds=1.0)
    clip_mix = np.concatenate([rest[: FS // 2], half, rest[FS // 2 :]])

    ref_out = _ref_engine(extra).process(clip_mix, FS)
    got_out = _got_engine(extra).process(clip_mix)

    ref_S = np.asarray(ref_out["S"])
    scale_S = float(np.abs(ref_S).max()) + 1e-12
    ref_Sh = np.abs(np.asarray(ref_out["S_hat"]))
    got_Sh = np.abs(np.asarray(got_out["S_hat"]))
    np.testing.assert_allclose(
        got_Sh, ref_Sh, atol=2e-2 * scale_S,
        err_msg=f"suppressed spectrogram diverges (draw {draw}: {extra})",
    )
    ref_y = np.asarray(ref_out["y"], np.float64)
    got_y = np.asarray(got_out["y"], np.float64)
    scale_y = float(np.abs(ref_y).max()) + 1e-12
    np.testing.assert_allclose(
        got_y, ref_y, atol=5e-2 * scale_y,
        err_msg=f"output audio diverges (draw {draw}: {extra})",
    )


# ---------------------------------------------------------------------------
# legacy RoE pipeline (dsp_rain_detection.py:2566-2575 entry)
# ---------------------------------------------------------------------------

def _roe_clip(kind, seed, n_drops):
    """RoE-shaped fixture: harmonic pings at the natural frequency."""
    rng = np.random.default_rng(seed)
    n = FS * 10
    x = 0.004 * rng.standard_normal(n)
    if kind == "rain":
        k = np.arange(800)
        ping = np.exp(-k / 60.0) * sum(
            a * np.sin(2 * np.pi * f * k / FS)
            for f, a in [(520, 1.0), (1040, 0.5), (1560, 0.35), (2080, 0.25)]
        )
        for t0 in rng.integers(FS // 2, n - 1000, n_drops):
            x[t0 : t0 + 800] += 0.6 * ping
    return np.clip(x, -1, 1).astype(np.float32)


@pytest.mark.parametrize("kind,seed,n_drops", [
    ("rain", 31, 40),
    ("none", 32, 0),
])
def test_roe_matches_reference(kind, seed, n_drops):
    x = _roe_clip(kind, seed, n_drops)
    # the reference entry requires the full parameter dict (its own
    # default_params, dsp_rain_detection.py:1097-1124) — pass it to BOTH
    params = dict(ref_dsp.default_params)
    ref_drops, ref_fmean, ref_state = ref_dsp.rain_detection_algo(x, **params)
    got_drops, got_fmean, got_state = rain_detection_algo(x, **params)

    if kind == "none":
        assert ref_drops == 0, "reference found rain in pure noise?"
        assert got_drops == 0
    else:
        assert ref_drops > 0, "reference found no rain in the rain fixture"
        assert got_drops > 0
        # drop counts within 25% of the reference's own count
        assert abs(got_drops - ref_drops) <= max(3, 0.25 * ref_drops), (
            f"drops: got {got_drops}, reference {ref_drops}"
        )
        # natural-frequency estimate within one bin (~44 Hz)
        assert abs(got_fmean - ref_fmean) <= 45.0, (
            f"frain_mean: got {got_fmean}, reference {ref_fmean}"
        )


def test_roe_boolean_wrapper_matches_reference():
    x_rain = _roe_clip("rain", 41, 40)
    x_none = _roe_clip("none", 42, 0)
    from audio_processing_tools_tpu.models.roe import (
        python_classifier_boolean_wrapper,
    )

    params = dict(ref_dsp.default_params)
    assert bool(ref_dsp.python_classifier_boolean_wrapper(x_rain, **params)) is True
    assert bool(python_classifier_boolean_wrapper(x_rain, **params)) is True
    assert bool(ref_dsp.python_classifier_boolean_wrapper(x_none, **params)) is False
    assert bool(python_classifier_boolean_wrapper(x_none, **params)) is False


def test_native_cpp_agrees_with_reference_python_roe():
    """Close the differential triangle: the C++ classifier
    (native/roe_classifier.cpp, rebuilt from the closed dylib's ABI) vs the
    reference's OWN Python RoE pipeline — the same cross-implementation
    check the reference runs between its Python and C classifiers
    (edge/parameter_tuning/classification_algo.py:18-63)."""
    from audio_processing_tools_tpu.tuning.call_native import (
        build_native_library,
        load_native_library,
        rain_detection_algo as native_algo,
    )

    try:
        build_native_library()
        lib = load_native_library()
    except Exception as e:
        pytest.skip(f"native library unavailable: {e}")

    params = dict(ref_dsp.default_params)
    for kind, seed, n_drops, expected in [
        ("rain", 51, 40, True), ("none", 52, 0, False),
    ]:
        x = _roe_clip(kind, seed, n_drops)
        ref_drops, _, _ = ref_dsp.rain_detection_algo(x, **params)
        nat_drops, _ = native_algo(x, lib=lib, params=params)
        assert (ref_drops > 0) == (nat_drops > 0) == expected, (
            f"{kind}: reference python {ref_drops} vs native C++ {nat_drops}"
        )


def test_detect_gusts_matches_reference(rng):
    """Wind gust detection (dsp_rain_detection.py:171-211) on a shared
    magnitude spectrogram."""
    from audio_processing_tools_tpu.models.wind import detect_gusts

    x = synth_clip("wind", rng, fs=FS, seconds=3.0)
    from tests.ref_shims import shim_stft

    mag = np.abs(shim_stft(x, n_fft=256, hop_length=128, win_length=256,
                           window="hann", center=True)).astype(np.float64)
    ref_times, ref_wraw, ref_rraw, ref_w, ref_r = ref_dsp.detect_gusts(
        mag, FS)
    got_times, got_wraw, got_rraw, got_w, got_r = detect_gusts(mag, FS)
    np.testing.assert_allclose(np.asarray(got_wraw), ref_wraw,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_rraw), ref_rraw,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_w), ref_w, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_times), ref_times, atol=1e-9)


def test_compute_rain_mod_matches_reference(rng):
    from audio_processing_tools_tpu.models.wind import compute_rain_mod

    T = 80
    nov_rain = np.abs(rng.standard_normal(T))
    nov_gust = np.abs(rng.standard_normal(T))
    raining = (rng.random(T) < 0.4).astype(np.float64)
    ref_mod = ref_dsp.compute_rain_mod(nov_rain, nov_gust, raining, 0.5)
    got_mod = compute_rain_mod(nov_rain, nov_gust, raining, 0.5)
    np.testing.assert_array_equal(np.asarray(got_mod), np.asarray(ref_mod))


def test_eac_pitch_matches_reference(rng):
    """Enhanced-autocorrelation pitch front-end
    (dsp_rain_detection.py:287-363)."""
    from audio_processing_tools_tpu.models.pitch import compute_eac_for_frames

    t = np.arange(4 * 256) / FS
    tone = 0.5 * np.sin(2 * np.pi * 520.0 * t) + 0.01 * rng.standard_normal(
        t.size)
    frames = tone.reshape(4, 256)
    ref_eac = ref_dsp.compute_eac_for_frames(frames)
    got_eac = np.asarray(compute_eac_for_frames(frames))
    assert got_eac.shape == np.asarray(ref_eac).shape
    scale = float(np.abs(ref_eac).max()) + 1e-12
    np.testing.assert_allclose(got_eac, ref_eac, atol=5e-5 * scale)
