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


# ---------------------------------------------------------------------------
# Full spectral-engine classifier oracle (default config path)
# ---------------------------------------------------------------------------


def spectral_engine_oracle(x, fs=11162, mode_bands=((450.0, 650.0), (800.0, 1050.0),
                                                    (1500.0, 1800.0), (2350.0, 2550.0),
                                                    (3150.0, 3350.0))):
    """End-to-end loop oracle of the default detector path of
    SpectralNoiseProcessor.process + _detect_rain_over_time:

      stft -> detector PSD normalization (all-frames tracker, lagged, log_sub)
      -> TD features on highpass-filtered audio -> t-vs-t-2 mode flux
      -> causal low-quantile normalization -> TD gate -> log1p decision.

    Pure NumPy/scipy float64.  Returns dict of per-frame arrays.
    """
    import scipy.signal as spsig
    import scipy.stats

    x = np.asarray(x, np.float64)
    n_fft, hop = 256, 128
    eps = 1e-9
    op_lo, op_hi = 400.0, 3500.0

    S = stft_librosa(x, n_fft, hop)
    P = np.abs(S) ** 2
    F, T = P.shape
    freqs = np.linspace(0, fs / 2, F)
    band = (freqs >= op_lo) & (freqs <= op_hi)
    fps = fs / hop

    # detector noise PSD over band rows, all frames treated as noise
    W = max(10, int(0.5 * fps))
    N_band = noise_psd_track_loop(P[band].astype(np.float32),
                                  np.zeros(T, bool), W=W, q=0.25,
                                  ema_up=0.6, ema_down=0.95)
    N_full = np.zeros_like(P)
    N_full[band] = N_band
    N_lag = np.roll(N_full, 1, axis=1)
    N_lag[:, 0] = N_full[:, 0]
    N_lag = np.minimum(N_lag, P)

    P_masked = P.copy()
    P_masked[~band] = 0.0
    P_det = 10 * np.log10(P_masked + eps) - 10 * np.log10(N_lag + eps)
    P_det_band = P_det[band]
    freqs_band = freqs[band]

    # TD features on highpass(350, order 4) filtfilt audio
    sos = spsig.butter(4, np.clip(350 / (fs / 2), 1e-4, 0.9999), "highpass",
                       output="sos")
    x_td = spsig.sosfiltfilt(sos, x)
    T_td = 1 + (x_td.size - n_fft) // hop
    td_crest = np.zeros(T)
    td_kurt = np.zeros(T)
    for t in range(min(T_td, T)):
        seg = x_td[t * hop : t * hop + n_fft]
        rms = np.sqrt(np.mean(seg**2) + eps)
        td_crest[t] = np.max(np.abs(seg)) / max(rms, eps)
        kv = scipy.stats.kurtosis(seg, fisher=False, bias=False)
        td_kurt[t] = kv if np.isfinite(kv) else 0.0

    # flux: positive t vs t-2 rise, per mode band (frames 0,1 zero)
    masks = [ (freqs_band >= lo) & (freqs_band <= hi) for lo, hi in mode_bands ]
    n_modes = len(mode_bands)
    mode_flux = np.zeros((n_modes, T))
    for t in range(2, T):
        d2 = np.maximum(P_det_band[:, t] - P_det_band[:, t - 2], 0.0)
        for i, m in enumerate(masks):
            mode_flux[i, t] = d2[m].sum()

    norm_flux = np.zeros_like(mode_flux)
    for i in range(n_modes):
        base, _ = causal_low_quantile_baseline_loop(
            mode_flux[i].astype(np.float32), 20.0, fps, 0.5, floor=1.0
        )
        excess = np.maximum(mode_flux[i] - base, 0.0)
        norm_flux[i] = np.nan_to_num(excess / (base + 1.0), nan=0, posinf=0,
                                     neginf=0)

    gate = td_crest > 2.5
    g = gate.astype(np.float64)
    f0 = np.log1p(np.maximum(norm_flux[0] * g, 0))
    f1 = np.log1p(np.maximum(norm_flux[1] * g, 0))
    f2 = np.log1p(np.maximum(norm_flux[2] * g, 0))
    f3 = np.log1p(np.maximum(norm_flux[3] * g, 0))
    hits = (f1 >= 2.6).astype(int) + (f2 >= 2.6).astype(int) + (f3 >= 3.0).astype(int)
    is_rain = (f0 >= 1.8) & (hits >= 2)

    # combined-mode flux score for NOISE assignment
    flux_modes = mode_flux.sum(axis=0)
    base_all, _ = causal_low_quantile_baseline_loop(
        flux_modes.astype(np.float32), 20.0, fps, 0.5, floor=1.0
    )
    score = np.nan_to_num(np.maximum(flux_modes - base_all, 0) / (base_all + 1.0))
    weak = (score * g) <= 1.5
    noise_conf = 1.0 - is_rain.astype(np.float64)
    frame_class = np.full(T, 1, np.int8)
    frame_class[(noise_conf >= 0.80) & weak & (~is_rain)] = 0
    frame_class[is_rain] = 2

    return {
        "frame_class": frame_class,
        "is_rain": is_rain,
        "td_crest": td_crest,
        "td_gate": gate,
        "mode_flux": mode_flux,
        "normalized_mode_flux": norm_flux,
        "P_det_band": P_det_band,
    }


# ---------------------------------------------------------------------------
# Full RoE classifier oracle (loop-form, float64)
# ---------------------------------------------------------------------------


def _roe_novelty_loop(mag_band_zeroed, M, thr):
    """compute_novelty_spectrum_new semantics on a band-zeroed magnitude."""
    import scipy.signal as spsig

    d = np.diff(mag_band_zeroed, axis=0)
    d[d <= 0] = 0
    nov = np.concatenate([d.sum(axis=0), [0.0]])
    L = len(nov)
    la = np.zeros(L)
    mx = nov.max()
    for m in range(L):
        a, b = max(m - M, 0), min(m + M + 1, L)
        la[m] = np.mean(sorted(nov[a:b])[:3])
        if la[m] <= 0:
            la[m] = mx / 5
        if la[m] == 0:
            la[m] = 1.0
    nov2 = nov.copy()
    nov2[nov2 == 0] = 1.0
    nov2 = nov2 / la
    peaks, _ = spsig.find_peaks(nov2, prominence=(None, None))
    mask = np.zeros(L)
    mask[peaks] = 1
    out = np.where(nov2 > thr, np.minimum(nov2, 1.5 * thr), 0.0) * mask
    return out


def _roe_first_peak_loop(mag, s_lo, s_hi, a_lo, a_hi, fs, max_peaks=3):
    """find_peaks_in_frequency_range semantics (129-bin denominator quirk)."""
    import scipy.signal as spsig

    F, T = mag.shape
    fn_half = fs / 2
    b1 = int(s_lo * F / fn_half)
    b2 = int(s_hi * F / fn_half)
    found = np.zeros(T, int)
    fpeak = np.zeros(T)
    for t in range(T):
        pk, _ = spsig.find_peaks(mag[b1:b2, t])
        pk = pk + b1
        count = min(len(pk), max_peaks)
        for k in range(count):
            f = pk[k] * fn_half / F
            if a_lo < f < a_hi:
                found[t] = 1
                fpeak[t] = f
                break
    return found, fpeak


def roe_oracle(x, fs=11162, check_duration=10, op=(400.0, 3500.0),
               nat=(400.0, 700.0), fn=400.0, num_harmonics=6,
               thr=(4.5, 4.0, 3.5, 3.5, 3.5, 3.5), min_drop_count=0.3,
               handle_fp=True, handle_fn=True):
    """End-to-end loop oracle of rain_detection_algo (float64)."""
    import math

    import scipy.signal as spsig
    import scipy.stats

    N, H, M = 256, 128, 20
    thr_hn = thr[0] + thr[1] + thr[2]
    nyq = fs / 2
    x = np.asarray(x, np.float64)
    n_samples = x.size

    rain_drop_count = 0
    frain_mean = 0.0
    kurt_all, crest_all, de_all = [], [], []

    remaining, offset = check_duration, 0.0
    while remaining > 0:
        part = min(remaining, 2)
        read_size = int(N * (part * fs / N))
        read_off = int(fs * offset)
        remaining -= part
        offset += part
        if read_off >= n_samples or n_samples - read_off < fs:
            continue
        chunk = x[read_off : read_off + read_size]

        sos = spsig.butter(8, [op[0] / nyq, op[1] / nyq], "band", output="sos")
        audio = spsig.sosfilt(sos, chunk)
        S = stft_librosa(audio, N, H)
        mag = np.abs(S)
        F, T = mag.shape

        # pulse characteristics
        padded = np.concatenate([np.zeros(H), audio, np.zeros(H)])
        sos49 = spsig.butter(4, [400 / nyq, 900 / nyq], "band", output="sos")
        filt = spsig.sosfilt(sos49, padded)
        n_e = 1 + (len(filt) - N) // H
        energy = np.array([
            np.sum(filt[i * H : i * H + N] ** 2) for i in range(min(n_e, T))
        ])
        energy = np.pad(energy, (0, max(0, T - len(energy))))
        k_l = np.zeros(T + 1)
        c_l = np.zeros(T + 1)
        d_l = np.zeros(T + 1)
        for i in range(T):
            if i >= 2:
                last = energy[i - 1] if energy[i - 2] >= energy[i - 1] else energy[i - 2]
                if energy[i] > last:
                    d_l[i] = energy[i] / (last + 1e-12)
            if i > 0 and (i * H + N) <= len(padded):
                fr = padded[i * H : i * H + N]
                k_l[i] = scipy.stats.kurtosis(fr, fisher=True)
                c_l[i] = np.max(np.abs(fr)) / (np.sqrt(np.mean(fr**2)) + 1e-12)
        kurt_all.append(k_l)
        crest_all.append(c_l)
        de_all.append(d_l)

        f_res = fs / N

        def band_zero(f1, f2):
            i1 = int(f1 // f_res) + 1
            i2 = int(f2 // f_res)
            Y = np.zeros_like(mag)
            Y[max(i1, 0) : i2 + 1] = mag[max(i1, 0) : i2 + 1]
            return Y

        nov = []
        nov0 = _roe_novelty_loop(band_zero(fn, fn + 300), M, thr[0])
        found0, fpk0 = _roe_first_peak_loop(mag, op[0], op[1], fn, fn + 300, fs)
        for k in range(T):
            if nov0[k] != 0 and found0[k] == 0:
                nov0[k] = 0
        nov.append(nov0)
        nz = fpk0[fpk0 != 0]
        frain = nz.mean() if nz.size else 0.0
        frain_mean = frain

        in_nat = nat[0] <= frain <= nat[1]
        overflow = frain * num_harmonics + 300 > op[1] + 100
        for hn in range(1, num_harmonics):
            active = in_nat and not (hn == num_harmonics - 1 and overflow)
            if not active:
                nov.append(np.zeros(T + 1))
                continue
            f1 = frain * (hn + 1) - 100
            novx = _roe_novelty_loop(band_zero(f1, f1 + 300), M, thr[min(hn, 5)])
            s_lo = max(frain * (hn + 1) - 200, op[0])
            s_hi = min(frain * (hn + 1) + 300, op[1])
            _, fpkh = _roe_first_peak_loop(mag, s_lo, s_hi, f1, f1 + 300, fs)
            for k in range(T):
                if novx[k] != 0 and fpkh[k] == 0:
                    novx[k] = 0
            nov.append(novx)

        nov = np.stack(nov)
        nov[1:, nov[0] == 0] = 0
        s = nov.sum(axis=0)
        rain_drop_count += int((s >= thr_hn).sum())

    duration = check_duration
    rd_thr = math.ceil(min_drop_count * duration)
    raining = rain_drop_count > rd_thr
    kurt = np.concatenate(kurt_all)
    crest = np.concatenate(crest_all)
    de = np.concatenate(de_all)
    peaks = (kurt > 2.5) & (crest > 3.75) & (de > 6.5)
    rain_peaks_count = int(peaks.sum())

    mod = rain_drop_count
    if handle_fn and not raining and (
        rain_drop_count > 50 or rain_peaks_count > 30
    ):
        raining = True
        mod = max(rain_drop_count, rain_peaks_count)
    if handle_fp and raining and (
        rain_peaks_count < 9 or rain_drop_count < rd_thr
    ):
        raining = False
        mod = 0
    if not raining:
        mod = 0
    return mod, frain_mean, rain_peaks_count
