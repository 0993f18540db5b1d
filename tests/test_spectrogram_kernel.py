"""Fused Pallas spectrogram kernel: parity + fallback behavior."""

import numpy as np
import jax
import jax.numpy as jnp

from audio_processing_tools_tpu.ops.spectrogram import (
    spectrogram_power,
    _dft_matrix,
    _kernel_applicable,
)
from audio_processing_tools_tpu.ops.stft import stft_power

FS = 11162


def test_dft_matrix_is_windowed_dft(rng):
    W = _dft_matrix(256)
    assert W.shape == (256, 512)
    x = rng.standard_normal(256).astype(np.float32)
    y = x @ W
    from scipy.signal import get_window
    ref = np.fft.fft(x * get_window("hann", 256, True))
    np.testing.assert_allclose(y[:256], ref.real, atol=1e-3)
    np.testing.assert_allclose(y[256:], ref.imag, atol=1e-3)


def test_fallback_on_cpu_matches_stft_power(rng):
    x = (0.1 * rng.standard_normal((3, FS))).astype(np.float32)
    P = np.asarray(spectrogram_power(jnp.asarray(x)))  # auto -> fallback on CPU
    ref = np.asarray(stft_power(jnp.asarray(x)))
    np.testing.assert_array_equal(P, ref)
    assert not _kernel_applicable(256, 128)  # CPU backend


def test_pallas_interpret_matches_stft_power(rng):
    """Interpret-mode run of the actual kernel on CPU."""
    x = (0.1 * rng.standard_normal((2, FS))).astype(np.float32)
    P = np.asarray(spectrogram_power(jnp.asarray(x), use_pallas=True,
                                     interpret=True))
    ref = np.asarray(stft_power(jnp.asarray(x)))
    denom = ref.max()
    assert P.shape == ref.shape
    assert np.abs(P - ref).max() / denom < 1e-5


def test_pallas_1d_and_odd_length(rng):
    x = (0.1 * rng.standard_normal(FS + 37)).astype(np.float32)
    P = np.asarray(spectrogram_power(jnp.asarray(x), use_pallas=True,
                                     interpret=True))
    ref = np.asarray(stft_power(jnp.asarray(x)))
    assert P.shape == ref.shape
    assert np.abs(P - ref).max() / ref.max() < 1e-5
