"""Parity tests for the IIR filter layer against scipy."""

import numpy as np
import jax.numpy as jnp
import scipy.signal as spsig
import pytest

from audio_processing_tools_tpu.ops.filters import (
    butter_sos,
    sosfilt,
    sosfilt_zi,
    sosfiltfilt,
    design_highpass,
    design_bandpass,
)

FS = 11162


def _freq_response_close(sos_a, sos_b, atol=1e-7):
    w, h_a = spsig.sosfreqz(sos_a, worN=512)
    _, h_b = spsig.sosfreqz(sos_b, worN=512)
    np.testing.assert_allclose(h_a, h_b, atol=atol)


@pytest.mark.parametrize(
    "order,wn,btype",
    [
        (4, 350 / (FS / 2), "highpass"),
        (4, [400 / (FS / 2), 3500 / (FS / 2)], "bandpass"),
        (4, [400 / (FS / 2), 700 / (FS / 2)], "bandpass"),
        (2, 0.3, "lowpass"),
        (8, [60 / (FS / 2), 1500 / (FS / 2)], "bandpass"),
        (8, [350 / (FS / 2), 400 / (FS / 2)], "bandstop"),
    ],
)
def test_butter_design_matches_scipy(order, wn, btype):
    ours = butter_sos(order, wn, btype)
    ref = spsig.butter(order, wn, btype=btype, output="sos")
    assert ours.shape == ref.shape
    _freq_response_close(ours, ref)


def test_sosfilt_zi_matches_scipy():
    sos = spsig.butter(4, [400 / (FS / 2), 3500 / (FS / 2)], "bandpass", output="sos")
    np.testing.assert_allclose(sosfilt_zi(sos), spsig.sosfilt_zi(sos), atol=1e-12)


def test_sosfilt_matches_scipy(rng):
    x = rng.standard_normal(4096).astype(np.float32)
    sos = spsig.butter(4, [400 / (FS / 2), 3500 / (FS / 2)], "bandpass", output="sos")
    y = np.asarray(sosfilt(sos, jnp.asarray(x)))
    ref = spsig.sosfilt(sos, x.astype(np.float64))
    np.testing.assert_allclose(y, ref, atol=2e-4 * np.abs(ref).max())


def test_sosfilt_with_zi_matches_scipy(rng):
    x = rng.standard_normal(2048).astype(np.float64)
    sos = spsig.butter(4, 350 / (FS / 2), "highpass", output="sos")
    zi = spsig.sosfilt_zi(sos) * x[0]
    y, zf = sosfilt(sos, jnp.asarray(x), zi=jnp.asarray(zi))
    ref, zf_ref = spsig.sosfilt(sos, x, zi=zi)
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5 * np.abs(ref).max())
    np.testing.assert_allclose(np.asarray(zf), zf_ref, atol=1e-5 * np.abs(zf_ref).max())


def test_sosfilt_streaming_chunks_match_full(rng):
    """Carried zi across chunks == one-shot filter (the firmware pattern)."""
    x = rng.standard_normal(2048).astype(np.float64)
    sos = spsig.butter(4, [400 / (FS / 2), 700 / (FS / 2)], "bandpass", output="sos")
    zi = np.zeros((sos.shape[0], 2))
    outs = []
    z = jnp.asarray(zi)
    for i in range(0, 2048, 512):
        y, z = sosfilt(sos, jnp.asarray(x[i : i + 512]), zi=z)
        outs.append(np.asarray(y))
    full = np.asarray(sosfilt(sos, jnp.asarray(x), zi=jnp.asarray(zi))[0])
    np.testing.assert_allclose(np.concatenate(outs), full, atol=1e-5 * np.abs(full).max())


def test_sosfiltfilt_matches_scipy(rng):
    x = (0.1 * rng.standard_normal(FS) + np.sin(2 * np.pi * 523 * np.arange(FS) / FS)).astype(
        np.float64
    )
    for sos in [
        spsig.butter(4, 350 / (FS / 2), "highpass", output="sos"),
        spsig.butter(4, [400 / (FS / 2), 3500 / (FS / 2)], "bandpass", output="sos"),
    ]:
        y = np.asarray(sosfiltfilt(sos, jnp.asarray(x)))
        ref = spsig.sosfiltfilt(sos, x)
        np.testing.assert_allclose(y, ref, atol=5e-5 * np.abs(ref).max())


def test_sosfiltfilt_batched(rng):
    xb = rng.standard_normal((3, 4096))
    sos = spsig.butter(4, 350 / (FS / 2), "highpass", output="sos")
    yb = np.asarray(sosfiltfilt(sos, jnp.asarray(xb)))
    for i in range(3):
        ref = spsig.sosfiltfilt(sos, xb[i])
        np.testing.assert_allclose(yb[i], ref, atol=5e-5 * np.abs(ref).max())


def test_design_helpers_match_engine_clipping():
    _freq_response_close(
        design_highpass(FS, 350.0, 4),
        spsig.butter(4, np.clip(350 / (FS / 2), 1e-4, 0.9999), "highpass", output="sos"),
    )
    nyq = FS / 2
    lo = np.clip(400.0, 1e-3, nyq * 0.999)
    hi = np.clip(3500.0, lo + 1e-3, nyq * 0.999)
    _freq_response_close(
        design_bandpass(FS, 400.0, 3500.0, 4),
        spsig.butter(4, [lo / nyq, hi / nyq], "bandpass", output="sos"),
    )


def test_sosfilt_lean_path_matches_zi_path(rng):
    """The zf-free fast path (return_zf=False: unrolled scans, halved
    prefix emission) computes the same y as the zi path to float32 ulp
    tolerance — pins the refactor contract behind sosfiltfilt."""
    x = rng.standard_normal(6000).astype(np.float32)
    sos = spsig.butter(4, [400 / (FS / 2), 3500 / (FS / 2)], "bandpass",
                       output="sos")
    zi = np.zeros((sos.shape[0], 2), np.float32)
    y_zi, _ = sosfilt(sos, jnp.asarray(x), zi=jnp.asarray(zi))
    y_lean = sosfilt(sos, jnp.asarray(x), zi=jnp.asarray(zi),
                     return_zf=False)
    y_zi = np.asarray(y_zi)
    y_lean = np.asarray(y_lean)
    scale = np.abs(y_zi).max() + 1e-12
    # different unroll factors regroup FMAs -> ulp-level shifts only
    np.testing.assert_allclose(y_lean, y_zi, atol=1e-5 * scale)


def test_cascade_reverse_matches_flip_filter_flip(rng):
    """reverse=True folds the sosfiltfilt backward pass into rotated
    constants; must equal flip(sosfilt(flip(y))) to float32 tolerance."""
    from audio_processing_tools_tpu.ops.filters import _sosfilt_cascade_matmul

    sos = spsig.butter(4, [400 / (FS / 2), 3500 / (FS / 2)], "bandpass",
                       output="sos")
    y = rng.standard_normal((2, 7001)).astype(np.float32)
    zi = (0.1 * rng.standard_normal((2, sos.shape[0], 2))).astype(np.float32)
    rev = np.asarray(_sosfilt_cascade_matmul(
        sos, jnp.asarray(y), jnp.asarray(zi), reverse=True))
    ref = np.asarray(sosfilt(
        sos, jnp.asarray(y[..., ::-1].copy()), zi=jnp.asarray(zi),
        return_zf=False))[..., ::-1]
    scale = np.abs(ref).max() + 1e-12
    np.testing.assert_allclose(rev, ref, atol=2e-5 * scale)
