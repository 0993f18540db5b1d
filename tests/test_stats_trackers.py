"""Parity tests for stats primitives and causal trackers."""

import numpy as np
import jax.numpy as jnp
import scipy.stats
import pytest

from audio_processing_tools_tpu.ops.stats import (
    kurtosis,
    crest_factor,
    masked_quantile,
    quantile_linear,
)
from audio_processing_tools_tpu.ops.trackers import (
    causal_low_quantile_baseline,
    noise_psd_track,
    make_psd_params,
    causal_time_median,
    causal_time_mean,
)
from tests.oracles import causal_low_quantile_baseline_loop, noise_psd_track_loop


@pytest.mark.parametrize("fisher,bias", [(False, False), (True, True), (False, True)])
def test_kurtosis_matches_scipy(rng, fisher, bias):
    x = rng.standard_normal((5, 256)).astype(np.float32)
    ours = np.asarray(kurtosis(jnp.asarray(x), axis=-1, fisher=fisher, bias=bias))
    ref = scipy.stats.kurtosis(x.astype(np.float64), axis=-1, fisher=fisher, bias=bias)
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_crest_factor(rng):
    x = rng.standard_normal((4, 256)).astype(np.float32)
    ours = np.asarray(crest_factor(jnp.asarray(x), eps=1e-9))
    ref = np.max(np.abs(x), axis=-1) / np.maximum(
        np.sqrt(np.mean(x**2, axis=-1) + 1e-9), 1e-9
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_masked_quantile_matches_numpy(rng):
    x = rng.standard_normal(30).astype(np.float32)
    valid = rng.random(30) > 0.3
    for q in [0.2, 0.3, 0.5, 0.9]:
        ours = float(masked_quantile(jnp.asarray(x), jnp.asarray(valid), q))
        ref = np.quantile(x[valid].astype(np.float64), q)
        assert abs(ours - ref) < 1e-5
    # all-invalid -> 0
    assert float(masked_quantile(jnp.asarray(x), jnp.zeros(30, bool), 0.5)) == 0.0


def test_masked_quantile_rankselect_bitexact_vs_sort(rng):
    """The no-sort rank-selection path must match the sort path BITWISE,
    including exact duplicate values (index tie-break) and partial masks —
    it sits inside the band-noise estimator's per-frame scan."""
    from audio_processing_tools_tpu.ops.stats import masked_quantile_rankselect

    for trial in range(20):
        x = rng.standard_normal(30).astype(np.float32)
        # force exact duplicates in ~half the trials
        if trial % 2:
            dup = rng.integers(0, 30, size=10)
            x[dup] = x[dup[0]]
        valid = rng.random(30) > rng.random() * 0.8
        for q in [0.0, 0.2, 0.3, rng.random(), 0.9, 1.0]:
            a = np.asarray(masked_quantile(jnp.asarray(x), jnp.asarray(valid), q))
            b = np.asarray(
                masked_quantile_rankselect(jnp.asarray(x), jnp.asarray(valid), q)
            )
            np.testing.assert_array_equal(a, b)
    # all-invalid -> 0, like the sort path
    assert float(
        masked_quantile_rankselect(jnp.asarray(x), jnp.zeros(30, bool), 0.5)
    ) == 0.0


def test_quantile_linear_axis(rng):
    x = rng.standard_normal((4, 50)).astype(np.float32)
    ours = np.asarray(quantile_linear(jnp.asarray(x), 0.25, axis=-1))
    ref = np.quantile(x, 0.25, axis=-1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_causal_baseline_matches_loop(rng):
    x = np.abs(rng.standard_normal(500)).astype(np.float32) * 10
    x[100:110] += 100  # burst
    ours, warm = causal_low_quantile_baseline(
        jnp.asarray(x), q_percent=20.0, samples_per_sec=87.2, win_sec=0.5,
        floor=1.0,
    )
    ref, warm_ref = causal_low_quantile_baseline_loop(x, 20.0, 87.2, 0.5, floor=1.0)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(warm), warm_ref)


def test_causal_baseline_batched(rng):
    xb = np.abs(rng.standard_normal((3, 200))).astype(np.float32)
    ours = np.asarray(
        causal_low_quantile_baseline(
            jnp.asarray(xb), q_percent=20.0, samples_per_sec=87.2, win_sec=0.5
        )[0]
    )
    for i in range(3):
        ref, _ = causal_low_quantile_baseline_loop(xb[i], 20.0, 87.2, 0.5)
        np.testing.assert_allclose(ours[i], ref, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("adaptive", [False, True])
def test_noise_psd_track_matches_loop(rng, adaptive):
    K, T = 16, 300
    P = (np.abs(rng.standard_normal((K, T))) * 0.01).astype(np.float32)
    P[:, 120:140] *= 50  # loud rain burst
    is_rain = np.zeros(T, bool)
    is_rain[118:145] = True
    params = make_psd_params(
        cfg_q=0.25, win_sec=0.5, frames_per_sec=87.2, ema_up=0.6, ema_down=0.95,
        eps=1e-9, adaptive_q_enable=adaptive,
    )
    ours = np.asarray(noise_psd_track(jnp.asarray(P), jnp.asarray(is_rain), params))
    ref = noise_psd_track_loop(
        P, is_rain, W=params.W, q=0.25, ema_up=0.6, ema_down=0.95,
        adaptive_q_enable=adaptive,
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-7)


def test_causal_time_median_matches_loop(rng):
    X = rng.standard_normal((4, 60)).astype(np.float32)
    L = 5
    ours = np.asarray(causal_time_median(jnp.asarray(X), L))
    ref = np.empty_like(X)
    for t in range(60):
        t0 = max(0, t - L + 1)
        ref[:, t] = np.median(X[:, t0 : t + 1], axis=1)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_causal_time_mean_matches_loop(rng):
    X = rng.standard_normal((4, 60)).astype(np.float32)
    L = 7
    ours = np.asarray(causal_time_mean(jnp.asarray(X), L))
    ref = np.empty_like(X)
    for t in range(60):
        t0 = max(0, t - L + 1)
        ref[:, t] = np.mean(X[:, t0 : t + 1], axis=1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)
