"""Stage-2 time-domain confirmer: parity vs a scipy loop oracle."""

import numpy as np
import scipy.signal as spsig
import scipy.stats
import pytest

from audio_processing_tools_tpu.models.time_domain import (
    TimeDomainRainDetector,
    TimeDomainDetectorConfig,
    build_time_domain_config,
    hilbert_envelope,
)

FS = 11162
MODE_BANDS = ((450.0, 650.0), (800.0, 1050.0), (1500.0, 1800.0),
              (2350.0, 2550.0), (3150.0, 3350.0))


def _oracle(x, cfg: TimeDomainDetectorConfig, stage1, sr=FS):
    """Loop-form oracle of TimeDomainRainDetector.process."""
    bands = list(cfg.mode_bands) if cfg.mode_bands else [cfg.operating_band]
    nyq = 0.5 * sr
    y = np.zeros_like(x, dtype=np.float64)
    for lo, hi in bands:
        lo_c = np.clip(lo, 1e-3, nyq * 0.999)
        hi_c = np.clip(hi, lo_c + 1e-3, nyq * 0.999)
        sos = spsig.butter(cfg.bp_order, [lo_c / nyq, hi_c / nyq], "bandpass",
                           output="sos")
        y += spsig.sosfiltfilt(sos, x)

    T = stage1.shape[0]
    conf = np.zeros(T, bool)
    counts = np.zeros(T, np.int32)
    crest = np.zeros(T)
    kurt = np.zeros(T)
    cand = np.zeros(T, np.int32)
    smooth_len = max(1, int(round(cfg.envelope_smooth_ms * 1e-3 * sr)))
    dist = max(1, int(round(cfg.peak_distance_ms * 1e-3 * sr)))
    for t in range(T):
        if not stage1[t]:
            continue
        fs_ = t * cfg.hop
        s = max(0, fs_ - cfg.prev_context_hops * cfg.hop)
        e = min(x.size, fs_ + cfg.n_fft + cfg.future_context_hops * cfg.hop)
        seg = y[s:e]
        if seg.size == 0:
            continue
        env = np.abs(spsig.hilbert(seg))
        if smooth_len > 1:
            env = np.convolve(env, np.ones(smooth_len) / smooth_len, "same")
        prom = max(cfg.eps, cfg.peak_prominence_ratio * env.max())
        pk, _ = spsig.find_peaks(env, prominence=prom, distance=dist)
        rms = np.sqrt(np.mean(seg**2) + cfg.eps)
        crest[t] = np.max(np.abs(seg)) / max(rms, cfg.eps)
        kv = scipy.stats.kurtosis(seg, fisher=False, bias=False) if seg.size >= 4 else 0.0
        kurt[t] = kv if np.isfinite(kv) else 0.0
        cand[t] = pk.size
        conf[t] = (pk.size > 0) and (crest[t] >= cfg.min_crest_factor) and (
            kurt[t] >= cfg.min_kurtosis
        )
        counts[t] = pk.size if conf[t] else 0
    return conf, counts, crest, kurt, cand


def _signal(rng, seconds=2):
    n = FS * seconds
    x = 0.01 * rng.standard_normal(n)
    for t0 in (4000, 9000, 14000):
        if t0 + 600 > n:
            continue
        k = np.arange(600)
        ping = sum(a * np.sin(2 * np.pi * f * k / FS)
                   for f, a in [(520, 1), (900, 0.5), (1600, 0.3)])
        x[t0 : t0 + 600] += 0.7 * np.exp(-k / 50.0) * ping
    return x.astype(np.float32)


def test_hilbert_matches_scipy(rng):
    for n in (256, 384, 255):
        x = rng.standard_normal((3, n)).astype(np.float32)
        ours = np.asarray(hilbert_envelope(x))
        ref = np.abs(spsig.hilbert(x.astype(np.float64), axis=-1))
        np.testing.assert_allclose(ours, ref, atol=2e-4 * np.abs(ref).max())


def test_confirmer_matches_oracle(rng):
    x = _signal(rng)
    cfg = build_time_domain_config({
        "sample_rate": FS, "detector": {"mode_bands": list(MODE_BANDS)},
    })
    T = 1 + (x.size - cfg.n_fft) // cfg.hop
    stage1 = np.zeros(T, bool)
    for t0 in (4000, 9000, 14000):  # frames at / near pings + some noise frames
        f = t0 // cfg.hop
        stage1[f - 1 : f + 3] = True
    stage1[5] = True  # a pure-noise frame

    det = TimeDomainRainDetector(cfg)
    out = det.process(x, stage1_is_rain=stage1)
    conf, counts, crest, kurt, cand = _oracle(x.astype(np.float64), cfg, stage1)

    np.testing.assert_allclose(out["crest_factor"], crest, rtol=5e-3, atol=1e-3)
    np.testing.assert_allclose(out["kurtosis"], kurt, rtol=2e-2, atol=5e-2)
    np.testing.assert_array_equal(out["candidate_peaks"], cand)
    np.testing.assert_array_equal(out["confirmed_mask"], conf)
    np.testing.assert_array_equal(out["confirmed_counts"], counts)
    # pings confirmed, noise frame not
    assert out["confirmed_mask"][4000 // cfg.hop]
    assert not out["confirmed_mask"][5]
    # details only for run-mask frames
    assert len(out["details"]) == int(stage1.sum())


def test_confirmer_all_frames_mode(rng):
    x = _signal(rng, seconds=1)
    det = TimeDomainRainDetector()
    out = det.process(x, sr=FS)
    T = 1 + (x.size - 256) // 128
    assert out["confirmed_mask"].shape == (T,)
    assert out["run_mask"].all()


def test_config_builder():
    cfg = build_time_domain_config({
        "sample_rate": FS,
        "detector": {"mode_bands": [(450, 650), ("bad",), (800, 700)]},
        "time_domain": {"min_crest_factor": 2.5, "peak_distance_ms": 6.0},
    })
    assert cfg.mode_bands == ((450.0, 650.0),)
    assert cfg.min_crest_factor == 2.5
    assert cfg.peak_distance_ms == 6.0
