"""NumPy reference implementations used as parity oracles.

librosa is not installed in this environment, so these functions implement
the *documented* librosa semantics directly in NumPy (hann periodic window,
center zero-padding, rFFT).  Where scipy provides the ground truth
(sosfilt/sosfiltfilt/kurtosis/find_peaks/stft) tests call scipy directly.
"""

import numpy as np


def hann_periodic(n: int) -> np.ndarray:
    k = np.arange(n)
    return 0.5 - 0.5 * np.cos(2 * np.pi * k / n)


def stft_librosa(x, n_fft=256, hop=128, center=True, pad_mode="constant"):
    """librosa.stft equivalent (float64 NumPy)."""
    x = np.asarray(x, dtype=np.float64)
    if center:
        pad = n_fft // 2
        if pad_mode == "constant":
            x = np.pad(x, (pad, pad))
        else:
            x = np.pad(x, (pad, pad), mode=pad_mode)
    if x.size < n_fft:
        return np.zeros((1 + n_fft // 2, 0), dtype=np.complex128)
    T = 1 + (x.size - n_fft) // hop
    w = hann_periodic(n_fft)
    frames = np.stack([x[t * hop : t * hop + n_fft] * w for t in range(T)])
    return np.fft.rfft(frames, axis=-1).T  # (F, T)


def istft_librosa(S, n_fft=256, hop=128, length=None, center=True):
    """librosa.istft equivalent (float64 NumPy overlap-add)."""
    S = np.asarray(S)
    F, T = S.shape
    w = hann_periodic(n_fft)
    frames = np.fft.irfft(S.T, n=n_fft, axis=-1) * w
    total = (T - 1) * hop + n_fft
    y = np.zeros(total)
    wsq = np.zeros(total)
    for t in range(T):
        y[t * hop : t * hop + n_fft] += frames[t]
        wsq[t * hop : t * hop + n_fft] += w**2
    y = y / np.where(wsq > 1e-10, wsq, 1.0)
    if center:
        y = y[n_fft // 2 :]
    if length is not None:
        if length <= y.size:
            y = y[:length]
        else:
            y = np.pad(y, (0, length - y.size))
    return y
