"""End-to-end tests for the flagship spectral-noise engine."""

import numpy as np
import jax.numpy as jnp
import pytest

from audio_processing_tools_tpu.config import build_noise_config, DEFAULT_MODE_BANDS
from audio_processing_tools_tpu.models.spectral_noise import (
    SpectralNoiseEngine,
    RainDetectorProcessor,
    compute_gain,
    clip_aggregate,
)
from audio_processing_tools_tpu.models.frame_classifier import FrameClass

FS = 11162

DET = {
    "mode_bands": list(DEFAULT_MODE_BANDS),
}


def make_rain(rng, n=FS * 4, n_drops=25, amp=0.5):
    """Noise + impulsive multi-mode 'raindrop' pings."""
    x = 0.005 * rng.standard_normal(n)
    drop_times = rng.integers(FS // 2, n - 2000, n_drops)
    k = np.arange(800)
    for t0 in drop_times:
        ping = np.zeros(800)
        for f, a in [(520, 1.0), (900, 0.5), (1600, 0.35), (2450, 0.25)]:
            ping += a * np.sin(2 * np.pi * f * k / FS)
        ping *= amp * np.exp(-k / 60.0)
        x[t0 : t0 + 800] += ping
    return x.astype(np.float32)


def make_noise(rng, n=FS * 4):
    return (0.02 * rng.standard_normal(n)).astype(np.float32)


@pytest.fixture(scope="module")
def engine():
    eng = SpectralNoiseEngine()
    eng.setup({"sample_rate": FS, "detector": DET})
    return eng


def test_engine_shapes(engine, rng):
    x = make_noise(rng)
    out = engine.process(x)
    T = 1 + x.size // 128
    assert out["frame_class"].shape == (T,)
    assert out["rain_conf"].shape == (T,)
    assert out["noise_conf"].shape == (T,)
    assert out["times"].shape == (T,)
    assert np.isfinite(out["mean_noise_floor_db"])


def test_rain_vs_noise_discrimination(rng):
    eng = SpectralNoiseEngine()
    eng.setup({"sample_rate": FS, "detector": DET})
    rain_out = eng.process(make_rain(rng))
    noise_out = eng.process(make_noise(rng))
    rain_frames = int((rain_out["frame_class"] == FrameClass.RAIN).sum())
    noise_rain_frames = int((noise_out["frame_class"] == FrameClass.RAIN).sum())
    assert rain_frames >= 5, f"expected rain frames, got {rain_frames}"
    assert noise_rain_frames <= 2, f"false rain on noise: {noise_rain_frames}"
    # most noise-clip frames should be classified NOISE
    assert (noise_out["frame_class"] == FrameClass.NOISE).mean() > 0.5


def test_classifier_only_mode(rng):
    eng = SpectralNoiseEngine()
    eng.setup({
        "sample_rate": FS, "detector": DET, "classifier_only_mode": True,
        "return_spectra": True, "return_filtered_audio": True,
    })
    x = make_rain(rng)
    out = eng.process(x)
    assert "mean_noise_floor_db" not in out  # suppressor path skipped
    assert out["S"].shape[0] == 129
    np.testing.assert_array_equal(out["S"], out["S_hat"])  # untouched spectra
    assert out["x_filt"].shape == x.shape


def test_suppressor_reduces_noise(rng):
    eng = SpectralNoiseEngine()
    eng.setup({
        "sample_rate": FS, "detector": DET, "compute_output_audio": True,
        "return_spectra": True,
    })
    x = make_noise(rng)
    out = eng.process(x)
    # steady noise: suppressed spectrum energy in band well below input
    S_pow = np.abs(out["S"]) ** 2
    Sh_pow = np.abs(out["S_hat"]) ** 2
    freqs = np.linspace(0, FS / 2, 129)
    band = (freqs >= 400) & (freqs <= 3500)
    # skip warmup frames
    ratio = Sh_pow[band, 100:].sum() / S_pow[band, 100:].sum()
    assert ratio < 0.5, f"suppression too weak: {ratio}"
    assert out["y"].shape == x.shape


def test_suppressor_bypass(rng):
    eng = SpectralNoiseEngine()
    eng.setup({
        "sample_rate": FS, "detector": DET, "suppressor_bypass": True,
        "return_spectra": True,
    })
    out = eng.process(make_noise(rng))
    np.testing.assert_array_equal(out["S"], out["S_hat"])


def test_batch_matches_single(rng):
    eng = SpectralNoiseEngine()
    eng.setup({"sample_rate": FS, "detector": DET})
    xb = np.stack([make_rain(rng), make_noise(rng)])
    outb = eng.process_batch(xb)
    for i in range(2):
        outi = eng.process(xb[i])
        np.testing.assert_array_equal(
            np.asarray(outb["frame_class"])[i], outi["frame_class"]
        )
        np.testing.assert_allclose(
            np.asarray(outb["rain_conf"])[i], outi["rain_conf"], atol=1e-6
        )


def test_compute_gain_matches_loop(rng):
    """Gain computation vs direct numpy re-derivation."""
    cfg = build_noise_config(FS, {"detector": DET})
    K, T = 20, 50
    P = np.abs(rng.standard_normal((K, T))).astype(np.float32) + 0.1
    N = (0.3 * np.abs(rng.standard_normal((K, T)))).astype(np.float32)
    nc = rng.random(T).astype(np.float32)
    G = np.asarray(compute_gain(cfg, jnp.asarray(P), jnp.asarray(N), jnp.asarray(nc)))

    th, denom = 0.7, 0.3
    eff = np.clip((nc - th) / denom, 0, 1)
    oversub = 1.0 + eff * 2.0
    ratio = np.clip(N / (P + 1e-9), 0, 1)
    G_raw = np.clip(1.0 - oversub[None, :] * np.sqrt(ratio), 0.0, 1.0)
    kernel = np.array([0.2, 0.6, 0.2]) / 1.0
    G_freq = G_raw.copy()
    for t in range(T):
        if nc[t] >= th:
            G_freq[:, t] = np.convolve(G_raw[:, t], kernel, mode="same")
    G_time = np.empty_like(G_freq)
    G_time[:, 0] = G_freq[:, 0]
    for t in range(1, T):
        if nc[t] < th:
            alpha = 0.0
        else:
            alpha = 0.7 * (nc[t] - th) / denom
        G_time[:, t] = alpha * G_time[:, t - 1] + (1 - alpha) * G_freq[:, t]
        if nc[t] < th:
            G_time[:, t] = np.maximum(G_time[:, t], G_freq[:, t])
    ref = np.clip(G_time, 0.0, 1.0)
    np.testing.assert_allclose(G, ref, atol=1e-5)


def test_clip_aggregate():
    fc = np.zeros(100, np.int8)
    fc[10:20] = FrameClass.RAIN
    rc = np.zeros(100, np.float32)
    rc[10:20] = 1.0
    agg = clip_aggregate(fc, rc, clip_rain_min_frames=3)
    assert agg["rain_frame_count"] == 10
    assert agg["clip_is_rain"] is True
    assert agg["clip_rain_conf"] == 1.0
    assert abs(agg["clip_rain_fraction"] - 0.1) < 1e-9
    agg2 = clip_aggregate(np.zeros(100, np.int8), np.zeros(100, np.float32))
    assert agg2["clip_is_rain"] is False and agg2["clip_rain_conf"] == 0.0


def test_rain_detector_processor(rng):
    proc = RainDetectorProcessor()
    params = {"sample_rate": FS, "check_duration": 4, "detector": DET}
    metrics, state = proc.run(make_rain(rng), params)
    for k in ("rain_frame_fraction", "rain_frame_count", "clip_is_rain",
              "clip_rain_conf", "median_rain_conf", "latency_s",
              "mean_noise_floor_db"):
        assert k in metrics, k
    assert metrics["clip_is_rain"] is True
    assert state["processor"] == "rain_detector"
    # engine cache reused
    metrics2, _ = proc.run(make_rain(rng), params)
    assert len(proc._cache) == 1


def test_processor_validates_short_audio():
    proc = RainDetectorProcessor()
    with pytest.raises(ValueError):
        proc.run(np.zeros(100, np.float32),
                 {"sample_rate": FS, "check_duration": 4, "detector": DET})


def test_feature_dump(rng):
    eng = SpectralNoiseEngine()
    eng.setup({
        "sample_rate": FS, "dump_features": True,
        "detector": {**DET, "feature_dump_level": 1},
    })
    out = eng.process(make_rain(rng))
    feats = out["features"]
    for k in ("primary_mode_flux", "support_mode_flux_1", "td_block_energy_crest",
              "frame_class", "frame_times"):
        assert k in feats, k


def test_feature_dump_sparse_tier_matches_flatnonzero_oracle(rng):
    """Static top-K sparse gather == the reference's flatnonzero gather.

    Parity with reference ``rain_frame_classifier.py:1096-1161``: gathered
    indices are an exact prefix of ``np.flatnonzero(mask)`` and every
    ``sparse_<name>`` value equals the dense feature at that frame.
    """
    K = 16
    eng = SpectralNoiseEngine()
    eng.setup({
        "sample_rate": FS, "dump_features": True,
        "return_detector_debug": True,
        "detector": {
            **DET, "feature_dump_level": 1,
            "feature_dump_sparse_enable": True,
            "feature_dump_sparse_max_frames": K,
            "feature_dump_include_raw_spectral_basic": True,
        },
    })
    out = eng.process(make_rain(rng))
    feats = out["features"]
    dbg = out["det_debug"]

    mask = np.asarray(feats["sparse_frame_mask"])
    oracle_idx = np.flatnonzero(mask).astype(np.int32)
    got_idx = np.asarray(feats["sparse_frame_idx"])
    n_cap = int(feats["sparse_captured_count"])
    assert int(feats["sparse_valid_count"]) == len(oracle_idx)
    assert n_cap == min(K, len(oracle_idx))
    assert n_cap > 0, "synthetic rain should gate some frames"
    np.testing.assert_array_equal(got_idx[:n_cap], oracle_idx[:n_cap])
    assert np.all(got_idx[n_cap:] == -1)

    # gathered values equal the dense (aligned) features at those frames;
    # default name selection = full list minus the basic trio + basic trio
    # (basic flag on), i.e. all 21 raw spectral names
    names = [k for k in feats if k.startswith("sparse_raw_")]
    assert len(names) == 21
    for name in names:
        dense = np.asarray(dbg[name.removeprefix("sparse_")])
        got = np.asarray(feats[name])
        np.testing.assert_allclose(got[:n_cap], dense[oracle_idx[:n_cap]],
                                   rtol=1e-6)
        assert np.all(got[n_cap:] == 0.0)


def test_feature_dump_sparse_top_select(rng):
    """'top' selection keeps the K highest-gate frames, time-ordered."""
    K = 4
    eng = SpectralNoiseEngine()
    eng.setup({
        "sample_rate": FS, "dump_features": True,
        "return_detector_debug": True,
        "detector": {
            **DET, "feature_dump_level": 1,
            "feature_dump_sparse_enable": True,
            "feature_dump_sparse_max_frames": K,
            "feature_dump_sparse_select": "top",
            "feature_dump_include_raw_spectral_frame_features": False,
        },
    })
    out = eng.process(make_rain(rng))
    feats = out["features"]
    mask = np.asarray(feats["sparse_frame_mask"])
    src = np.asarray(out["det_debug"]["td_block_energy_crest"])
    got_idx = np.asarray(feats["sparse_frame_idx"])
    n_cap = int(feats["sparse_captured_count"])
    if len(np.flatnonzero(mask)) >= K:
        assert n_cap == K
        score = np.where(mask, src, -np.inf)
        oracle = np.sort(np.argsort(-score)[:K])
        np.testing.assert_array_equal(got_idx[:n_cap], oracle)
    assert np.all(np.diff(got_idx[:n_cap]) > 0)  # time-ordered


def test_long_clip_60s(rng):
    """60-second clip (the transform.py truncation length) runs clean."""
    eng = SpectralNoiseEngine()
    eng.setup({"sample_rate": FS, "detector": DET})
    n = FS * 60
    x = 0.01 * rng.standard_normal(n)
    for t0 in rng.integers(FS, n - 2000, 120):
        k = np.arange(800)
        ping = sum(a * np.sin(2 * np.pi * f * k / FS)
                   for f, a in [(520, 1), (900, 0.5), (1600, 0.35)])
        x[t0 : t0 + 800] += 0.5 * np.exp(-k / 60.0) * ping
    out = eng.process(x.astype(np.float32))
    T = 1 + n // 128
    assert out["frame_class"].shape == (T,)
    assert (out["frame_class"] == FrameClass.RAIN).sum() > 20
    assert np.isfinite(out["mean_noise_floor_db"])
