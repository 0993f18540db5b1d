"""EAC pitch estimation + instantaneous frequency, batched.

Parity with the FP-analysis tools of ``edge/dsp_rain_detection.py:287-363,
570-597`` (Enhanced Autocorrelation pitch with harmonic summation, Hilbert
instantaneous frequency).  The reference loops per frame with scipy; here
autocorrelation runs as batched FFT correlation and the harmonic-summation
lag search is a masked tensor argmax — one jitted program per frame shape.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp



@partial(jax.jit, static_argnames=("center_clip_threshold",))
def compute_eac_for_frames(audio_frames: jnp.ndarray,
                           center_clip_threshold: float = 0.3) -> jnp.ndarray:
    """Per-frame normalized autocorrelation (batched FFT correlation).

    Note: the reference's center clipping is disabled in its own code
    (``clipped = frame``); kept that way for parity.
    """
    frames = jnp.asarray(audio_frames, jnp.float32)
    n = frames.shape[-1]
    # full autocorrelation via rFFT with zero padding to >= 2n-1
    nfft = 1 << int(np.ceil(np.log2(2 * n - 1)))
    F = jnp.fft.rfft(frames, n=nfft, axis=-1)
    ac_full = jnp.fft.irfft(F * jnp.conj(F), n=nfft, axis=-1)
    ac = ac_full[..., :n]  # non-negative lags
    peak = jnp.max(jnp.abs(ac), axis=-1, keepdims=True)
    return jnp.where(peak > 0, ac / peak, ac)


@partial(jax.jit, static_argnames=("fs", "fmin", "fmax", "harmonic_weights"))
def estimate_pitch_from_eac(eac_matrix: jnp.ndarray, fs: int,
                            fmin: float = 50, fmax: float = 1000,
                            harmonic_weights: Tuple[float, ...] = (1.0, 0.5, 0.25)
                            ) -> jnp.ndarray:
    """Harmonic-summation pitch per frame (vectorized lag search)."""
    eac = jnp.asarray(eac_matrix, jnp.float32)
    n = eac.shape[-1]
    lag_min = int(fs / fmax)
    lag_max = min(int(fs / fmin), n)
    if lag_max <= lag_min:
        return jnp.zeros(eac.shape[:-1], jnp.float32)

    lags = np.arange(lag_min, lag_max)
    score = jnp.zeros(eac.shape[:-1] + (lags.size,), jnp.float32)
    for h, w in enumerate(harmonic_weights, start=1):
        h_lag = lags * h
        valid = h_lag < n
        idx = np.where(valid, h_lag, 0)
        contrib = jnp.where(jnp.asarray(valid), eac[..., idx], 0.0)
        score = score + float(w) * contrib
    best = jnp.argmax(score, axis=-1)
    best_lag = jnp.asarray(lags)[best]
    return jnp.where(best_lag > 0, fs / best_lag, 0.0).astype(jnp.float32)


def compute_instantaneous_frequency(frame: np.ndarray, fs: float) -> np.ndarray:
    """Hilbert instantaneous frequency (``dsp_rain_detection.py:570-597``)."""
    frame = jnp.asarray(frame, jnp.float32)
    n = frame.shape[-1]
    X = jnp.fft.fft(frame, axis=-1)
    h = np.zeros(n)
    if n % 2 == 0:
        h[0] = h[n // 2] = 1.0
        h[1 : n // 2] = 2.0
    else:
        h[0] = 1.0
        h[1 : (n + 1) // 2] = 2.0
    analytic = jnp.fft.ifft(X * jnp.asarray(h), axis=-1)
    phase = jnp.unwrap(jnp.angle(analytic), axis=-1)
    dphi = jnp.diff(phase, axis=-1)
    f_inst = (fs / (2.0 * jnp.pi)) * dphi
    return np.asarray(jnp.concatenate([f_inst, f_inst[..., -1:]], axis=-1))
