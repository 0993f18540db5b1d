"""Property-based kernel tests (hypothesis): mathematical invariants that
hold for ALL inputs, complementing the example-based oracle suites.

Shapes are kept static per combo so jit caches compile once; hypothesis
randomizes content and parameters.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from hypothesis import given, settings, strategies as st

from audio_processing_tools_tpu.ops.framing import frame_signal
from audio_processing_tools_tpu.ops.stft import stft_power
from audio_processing_tools_tpu.ops.stats import quantile_linear
from audio_processing_tools_tpu.ops.filters import butter_sos, sosfilt
from audio_processing_tools_tpu.ops.windows import hann_window
from audio_processing_tools_tpu.io.audio import safe_to_float

N = 2048
FS = 11162

finite_signal = st.integers(0, 2**31 - 1).map(
    lambda seed: (0.1 * np.random.default_rng(seed).standard_normal(N))
    .astype(np.float32)
)


@settings(max_examples=20, deadline=None)
@given(x=finite_signal, scale=st.floats(0.25, 4.0))
def test_stft_power_scales_quadratically(x, scale):
    P1 = np.asarray(stft_power(jnp.asarray(x)))
    P2 = np.asarray(stft_power(jnp.asarray(np.float32(scale) * x)))
    # Tolerance is measured in units of the spectrum's peak: near-zero bins
    # suffer float32 cancellation (scale*x rounds before squaring), so a
    # fixed tiny atol (1e-10) falsified e.g. scale=3.0 at 1/2193 bins with
    # abs diff ~1e-9 — a test bug, not an engine bug.
    atol = 1e-6 * float(scale**2 * P1.max() + 1e-30)
    np.testing.assert_allclose(P2, scale**2 * P1, rtol=5e-4, atol=atol)


@settings(max_examples=20, deadline=None)
@given(x=finite_signal)
def test_stft_power_frame_parseval(x):
    """Per-frame Parseval: sum over rfft power bins (with symmetric bins
    doubled) == n_fft * energy of the windowed frame."""
    n_fft, hop = 256, 128
    P = np.asarray(stft_power(jnp.asarray(x), n_fft=n_fft, hop=hop,
                              center=False))
    w = hann_window(n_fft)
    F, T = P.shape
    weights = np.full(F, 2.0)
    weights[0] = 1.0
    weights[-1] = 1.0  # Nyquist bin for even n_fft
    for t in range(0, T, 5):
        frame = x[t * hop : t * hop + n_fft] * w
        lhs = float((weights * P[:, t]).sum())
        rhs = n_fft * float((frame**2).sum())
        np.testing.assert_allclose(lhs, rhs, rtol=2e-3, atol=1e-8)


@settings(max_examples=20, deadline=None)
@given(x=finite_signal, hop=st.sampled_from([64, 128, 256]))
def test_framing_matches_strided_view(x, hop):
    n_fft = 256
    got = np.asarray(frame_signal(jnp.asarray(x), n_fft, hop))
    T = 1 + (N - n_fft) // hop
    idx = np.arange(T)[:, None] * hop + np.arange(n_fft)[None, :]
    np.testing.assert_array_equal(got, x[idx])


@settings(max_examples=25, deadline=None)
@given(x=finite_signal, q=st.floats(0.0, 1.0))
def test_quantile_matches_numpy(x, q):
    got = float(quantile_linear(jnp.asarray(x), q))
    ref = float(np.quantile(x, q))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


@settings(max_examples=15, deadline=None)
@given(x=finite_signal, cut=st.floats(200.0, 2000.0))
def test_sosfilt_linearity_and_chunk_invariance(x, cut):
    sos = butter_sos(4, cut / (FS / 2), "highpass")
    y = np.asarray(sosfilt(sos, jnp.asarray(x)))
    # linearity
    y2 = np.asarray(sosfilt(sos, jnp.asarray(2.0 * x)))
    np.testing.assert_allclose(y2, 2.0 * y, rtol=1e-4, atol=1e-6)
    # streaming chunk invariance with carried zi
    zi = jnp.zeros((sos.shape[0], 2), jnp.float32)
    y_a, zf = sosfilt(sos, jnp.asarray(x[: N // 2]), zi=zi)
    y_b, _ = sosfilt(sos, jnp.asarray(x[N // 2 :]), zi=zf)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(y_a), np.asarray(y_b)]), y,
        rtol=1e-4, atol=1e-6,
    )


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_safe_to_float_bounds(seed):
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-32768, 32768, 512, dtype=np.int16)
    y = safe_to_float(pcm)
    assert y.dtype == np.float32
    # exact scaling by 32767 (reference audio_io.safe_to_float:34-72;
    # note pcm_to_float uses 1<<15 — a different function)
    assert np.abs(y).max() <= np.float32(32768.0 / 32767.0)
    np.testing.assert_allclose(y, pcm.astype(np.float32) / np.float32(32767.0),
                               atol=0)
