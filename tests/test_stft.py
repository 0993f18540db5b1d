"""Golden parity tests for the STFT kernel layer against NumPy oracles."""

import numpy as np
import jax.numpy as jnp
import scipy.signal as spsig

from audio_processing_tools_tpu.ops import (
    stft,
    istft,
    stft_power,
    fft_frequencies,
    frames_to_time,
    frame_signal,
    hann_window,
)
from tests.oracles import stft_librosa, istft_librosa

FS = 11162


def _sig(rng, n=FS * 2):
    t = np.arange(n) / FS
    x = 0.1 * rng.standard_normal(n) + 0.3 * np.sin(2 * np.pi * 523.0 * t)
    return x.astype(np.float32)


def test_hann_matches_scipy():
    w = hann_window(256)
    ref = spsig.get_window("hann", 256, fftbins=True)
    np.testing.assert_allclose(w, ref, atol=1e-7)


def test_frame_signal_matches_strides(rng):
    x = _sig(rng, 5000)
    frames = np.asarray(frame_signal(jnp.asarray(x), 256, 128))
    T = 1 + (5000 - 256) // 128
    assert frames.shape == (T, 256)
    for t in [0, 1, T - 1]:
        np.testing.assert_array_equal(frames[t], x[t * 128 : t * 128 + 256])


def test_stft_matches_librosa_semantics(rng):
    x = _sig(rng)
    S = np.asarray(stft(jnp.asarray(x), n_fft=256, hop=128))
    ref = stft_librosa(x, 256, 128)
    assert S.shape == ref.shape == (129, 1 + x.size // 128)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(S, ref, atol=1e-5 * scale)


def test_stft_power_deviation_below_north_star(rng):
    """<1e-5 max relative spectrogram deviation vs the float64 CPU oracle."""
    x = _sig(rng, FS * 10)
    P = np.asarray(stft_power(jnp.asarray(x)))
    ref = np.abs(stft_librosa(x)) ** 2
    denom = ref.max()
    assert np.max(np.abs(P - ref)) / denom < 1e-5


def test_stft_causal_mode(rng):
    x = _sig(rng, 4096)
    S = np.asarray(stft(jnp.asarray(x), n_fft=256, hop=128, center=False))
    T = 1 + (4096 - 256) // 128
    assert S.shape == (129, T)
    # first frame = rfft(hann * x[:256])
    ref0 = np.fft.rfft(spsig.get_window("hann", 256, True) * x[:256])
    np.testing.assert_allclose(S[:, 0], ref0, atol=1e-4 * np.abs(ref0).max())


def test_stft_batched(rng):
    xb = np.stack([_sig(rng, 4096) for _ in range(3)])
    Sb = np.asarray(stft(jnp.asarray(xb)))
    for i in range(3):
        Si = np.asarray(stft(jnp.asarray(xb[i])))
        np.testing.assert_allclose(Sb[i], Si, atol=1e-6)


def test_istft_roundtrip(rng):
    x = _sig(rng, FS)
    S = stft(jnp.asarray(x))
    y = np.asarray(istft(S, length=x.size))
    # interior reconstruction is near-exact (COLA); edges are attenuated
    np.testing.assert_allclose(y[256:-256], x[256:-256], atol=2e-4)


def test_istft_matches_oracle(rng):
    x = _sig(rng, FS)
    S = np.asarray(stft(jnp.asarray(x)))
    y = np.asarray(istft(jnp.asarray(S), length=x.size))
    ref = istft_librosa(S, length=x.size)
    np.testing.assert_allclose(y, ref, atol=1e-5)


def test_axes_helpers():
    f = fft_frequencies(FS, 256)
    assert f.shape == (129,)
    assert f[0] == 0.0 and abs(f[-1] - FS / 2) < 1e-9
    t = frames_to_time(np.arange(5), FS, 128)
    np.testing.assert_allclose(t, np.arange(5) * 128 / FS)


def test_frame_signal_geometries_match_gather(rng):
    """The reshape/concat fast path (hop | frame_len) and the gather
    fallback must agree across geometries, including non-dividing hops,
    non-overlapping frames, and too-short signals."""
    for (f, h, n) in [(256, 128, 5000), (8, 8, 999), (128, 128, 1000),
                      (300, 100, 2000), (7, 3, 50), (256, 128, 255),
                      (4, 2, 11), (10, 10, 95)]:
        x = rng.standard_normal((2, n)).astype(np.float32)
        got = np.asarray(frame_signal(jnp.asarray(x), f, h))
        if n < f:
            assert got.shape == (2, 0, f)
            continue
        t = 1 + (n - f) // h
        idx = np.arange(t)[:, None] * h + np.arange(f)[None, :]
        np.testing.assert_array_equal(got, x[:, idx], err_msg=f"{f=} {h=} {n=}")
