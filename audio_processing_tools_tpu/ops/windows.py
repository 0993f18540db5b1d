"""Window functions with librosa/scipy-compatible semantics."""

from __future__ import annotations

import numpy as np


def hann_window(n: int, periodic: bool = True, dtype=np.float32) -> np.ndarray:
    """Hann window.

    ``periodic=True`` matches ``scipy.signal.get_window("hann", n,
    fftbins=True)`` which is what librosa uses for its STFT (the reference
    engine calls ``librosa.stft(..., window="hann")``, see
    reference ``edge/rain_signal_processor.py:818-825``).

    Returned as a NumPy array: windows are trace-time constants folded into
    the compiled program, not traced values.
    """
    if n <= 0:
        raise ValueError(f"window length must be positive, got {n}")
    if n == 1:
        return np.ones(1, dtype=dtype)
    denom = n if periodic else (n - 1)
    k = np.arange(n, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * k / denom)
    return w.astype(dtype)
