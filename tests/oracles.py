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


# ---------------------------------------------------------------------------
# Causal trackers (loop-form oracles mirroring the reference algorithms)
# ---------------------------------------------------------------------------


def causal_low_quantile_baseline_loop(x, q_percent, samples_per_sec, win_sec,
                                      min_hist_sec=0.0, floor=1e-6):
    """Loop-form oracle of the stochastic low-quantile tracker
    (edge/rain_frame_classifier.py:31-82 semantics)."""
    x = np.asarray(x, dtype=np.float32).reshape(-1)
    T = x.size
    if T == 0:
        return x.copy(), np.zeros(0, bool)
    q = float(np.clip(q_percent, 0, 100)) / 100.0
    floor = max(floor, 1e-12)
    sps = max(samples_per_sec, 1e-6)
    W = max(3, int(round(win_sec * sps)))
    eta = float(np.clip(2.0 / max(W + 1, 2), 1e-4, 1.0))
    min_hist = max(1, int(round(min_hist_sec * sps)))
    sa = float(np.clip(1.0 - eta, 0.0, 0.9999))
    baseline = float(max(x[0], floor))
    scale = float(max(abs(x[0]), floor))
    out = np.empty(T, np.float32)
    warm = np.zeros(T, bool)
    for t in range(T):
        out[t] = baseline
        warm[t] = t >= min_hist
        err = float(x[t]) - baseline
        scale = sa * scale + (1 - sa) * abs(err)
        step = eta * max(scale, floor)
        delta = q * step if x[t] >= baseline else -(1 - q) * step
        baseline = max(baseline + delta, floor)
    return np.maximum(np.nan_to_num(out, nan=floor, posinf=floor, neginf=floor), floor), warm


def noise_psd_track_loop(P_band, is_rain, W, q, ema_up, ema_down, eps=1e-9,
                         maxr=1.0, adaptive_q_enable=False, adaptive_q_min=0.10,
                         adaptive_q_alpha=0.95):
    """Loop-form oracle of the PSD tracker
    (edge/rain_signal_processor.py:555-721 semantics)."""
    P = np.asarray(P_band, dtype=np.float32)
    K, T = P.shape
    eta = float(np.clip(2.0 / max(W + 1, 2), 1e-4, 1.0))
    sa = float(ema_down)
    sf = max(eps, 1e-9)
    warm_need = max(10, W // 2)
    maxr = 1.0 if not np.isfinite(maxr) else float(np.clip(maxr, 0.0, 1.0))
    aq_min = float(np.clip(adaptive_q_min, 1e-4, q))
    tracker = np.maximum(P[:, 0].copy(), 0.0)
    scale = np.maximum(np.abs(P[:, 0]), sf)
    wcount = 0
    rain_ema = 0.0
    prev_N = None
    out = np.zeros_like(P)
    for t in range(T):
        Pt = P[:, t]
        allow = (wcount < warm_need) or (not bool(is_rain[t]))
        if prev_N is None:
            raw = tracker
            if allow:
                wcount += 1
        else:
            err = Pt - tracker
            scale = sa * scale + (1 - sa) * np.abs(err)
            step = eta * np.maximum(scale, sf)
            if adaptive_q_enable:
                q_eff = float(np.clip(q - (q - aq_min) * rain_ema, aq_min, q))
            else:
                q_eff = q
            delta = np.where(Pt >= tracker, q_eff * step, -(1 - q_eff) * step)
            cand = np.maximum(tracker + delta, 0.0)
            if allow:
                tracker = cand
                wcount += 1
            raw = tracker
        if prev_N is None:
            N = raw
        else:
            lam = np.where(raw > prev_N, ema_up, ema_down)
            N = lam * prev_N + (1 - lam) * raw
        N = np.minimum(N, maxr * Pt)
        N = np.maximum(N, 0.0)
        rain_ema = adaptive_q_alpha * rain_ema + (1 - adaptive_q_alpha) * float(bool(is_rain[t]))
        out[:, t] = N
        prev_N = N
    return out
