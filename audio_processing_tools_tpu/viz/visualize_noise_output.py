"""Engine debug dashboards (parity with ``visualize_noise_output.py``).

Panels are built from the spectral engine's output/state payloads
(``det_debug`` / ``debug`` keys returned by ``SpectralNoiseEngine.process``
with ``return_debug`` / ``return_detector_debug``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np
import pandas as pd


def frames_to_df(det_debug: Dict[str, Any], times: Optional[np.ndarray] = None
                 ) -> pd.DataFrame:
    """Per-frame detector streams as a DataFrame
    (``visualize_noise_output.py:197-239`` equivalent)."""
    n = None
    cols: Dict[str, np.ndarray] = {}
    for k, v in det_debug.items():
        arr = np.asarray(v) if not isinstance(v, (dict, str, bool, int, float)) else None
        if arr is not None and arr.ndim == 1:
            if n is None:
                n = arr.shape[0]
            if arr.shape[0] == n:
                cols[k] = arr
    df = pd.DataFrame(cols)
    if times is not None and len(times) == len(df):
        df.insert(0, "time_s", np.asarray(times))
    return df


def show_noise_processing_results(out: Dict[str, Any], sample_rate: int = 11162,
                                  title: str = "Noise processing"):
    """Waveform / spectrogram / noise-PSD / gain overview panels
    (``visualize_noise_output.py:15-196``)."""
    import matplotlib.pyplot as plt

    from audio_processing_tools_tpu.viz.visualize_audio import (
        plot_audio_signal,
        plot_audio_spectrogram,
    )

    n_panels = 2
    debug = out.get("debug") or {}
    has_psd = "noise_psd" in out or "noise_psd" in debug
    has_gain = "G" in debug
    n_panels += int(has_psd) + int(has_gain)

    fig, axes = plt.subplots(n_panels, 1, figsize=(11, 3 * n_panels))
    axes = np.atleast_1d(axes)
    i = 0
    y = out.get("y", out.get("x_filt"))
    if y is not None:
        plot_audio_signal(np.asarray(y), sample_rate, title=f"{title}: waveform",
                          ax=axes[i])
    i += 1
    src = out.get("y", out.get("x_filt"))
    if src is not None:
        plot_audio_spectrogram(np.asarray(src), sample_rate,
                               title=f"{title}: spectrogram", ax=axes[i])
    i += 1
    if has_psd:
        psd = np.asarray(out.get("noise_psd", debug.get("noise_psd")))
        im = axes[i].imshow(
            10 * np.log10(np.maximum(psd, 1e-12)), origin="lower",
            aspect="auto", cmap="viridis",
        )
        axes[i].set_title("noise PSD (dB)")
        fig.colorbar(im, ax=axes[i])
        i += 1
    if has_gain:
        im = axes[i].imshow(np.asarray(debug["G"]), origin="lower",
                            aspect="auto", vmin=0, vmax=1, cmap="cividis")
        axes[i].set_title("suppression gain G")
        fig.colorbar(im, ax=axes[i])
    fig.tight_layout()
    return fig


def plot_frame_classifier_debug(det_debug: Dict[str, Any],
                                times: Optional[np.ndarray] = None,
                                title: str = "Frame classifier"):
    """Flux + gates + frame classes (``visualize_noise_output.py:241-393``)."""
    import matplotlib.pyplot as plt

    df = frames_to_df(det_debug, times)
    x = df["time_s"] if "time_s" in df else np.arange(len(df))
    fig, axes = plt.subplots(3, 1, figsize=(11, 8), sharex=True)

    for key in ("primary_mode_flux", "support_mode_flux_1", "support_mode_flux_2",
                "support_mode_flux_3"):
        if key in df:
            axes[0].plot(x, np.log1p(np.maximum(df[key], 0)), label=key,
                         linewidth=0.8)
    axes[0].legend(fontsize=7)
    axes[0].set_title(f"{title}: normalized mode flux (log1p)")

    for key in ("td_crest_factor", "td_kurtosis", "td_block_energy_crest"):
        if key in df:
            axes[1].plot(x, df[key], label=key, linewidth=0.8)
    axes[1].legend(fontsize=7)
    axes[1].set_title("TD features")

    if "frame_class" in df:
        axes[2].step(x, df["frame_class"], where="mid", label="frame_class")
    if "rain_conf" in df:
        axes[2].plot(x, df["rain_conf"], alpha=0.6, label="rain_conf")
    axes[2].set_ylim(-0.1, 2.2)
    axes[2].legend(fontsize=7)
    axes[2].set_title("decision (0=noise 1=uncertain 2=rain)")
    axes[2].set_xlabel("time (s)")
    fig.tight_layout()
    return fig


def plot_frame_classifier_tuning(det_debug: Dict[str, Any],
                                 thresholds: Optional[Dict[str, float]] = None,
                                 times: Optional[np.ndarray] = None):
    """Threshold-tuning view: log1p flux vs decision thresholds
    (``visualize_noise_output.py:395-639``)."""
    import matplotlib.pyplot as plt

    thresholds = thresholds or {
        "new_rain_primary_flux_min": 1.8,
        "new_rain_mode1_flux_min": 2.6,
        "new_rain_mode2_flux_min": 2.6,
        "new_rain_mode3_flux_min": 3.0,
    }
    df = frames_to_df(det_debug, times)
    x = df["time_s"] if "time_s" in df else np.arange(len(df))
    names = [
        ("primary_mode_flux_gated", "new_rain_primary_flux_min"),
        ("support_mode_flux_1_gated", "new_rain_mode1_flux_min"),
        ("support_mode_flux_2_gated", "new_rain_mode2_flux_min"),
        ("support_mode_flux_3_gated", "new_rain_mode3_flux_min"),
    ]
    fig, axes = plt.subplots(len(names), 1, figsize=(11, 2.2 * len(names)),
                             sharex=True)
    for ax, (col, thr_key) in zip(np.atleast_1d(axes), names):
        if col in df:
            ax.plot(x, np.log1p(np.maximum(df[col], 0)), linewidth=0.8)
        thr = thresholds.get(thr_key)
        if thr is not None:
            ax.axhline(thr, color="r", linestyle="--", linewidth=0.8)
        ax.set_title(f"{col} (thr {thr})", fontsize=8)
    fig.tight_layout()
    return fig


def plot_noise_suppressor_debug(debug: Dict[str, Any],
                                times: Optional[np.ndarray] = None):
    """Suppressor-side panels: PSD ratio, gain stats, PSD-update gating
    (``visualize_noise_output.py:641-727``)."""
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(3, 1, figsize=(11, 8), sharex=True)
    G = debug.get("G")
    if G is not None:
        G = np.asarray(G)
        x = times if times is not None else np.arange(G.shape[1])
        axes[0].plot(x, np.median(G, axis=0), label="median G")
        axes[0].plot(x, np.percentile(G, 10, axis=0), label="p10 G", alpha=0.7)
        axes[0].legend(fontsize=7)
        axes[0].set_title("gain over time")
    ratio = debug.get("np_ratio_median_t")
    if ratio is not None:
        ratio = np.asarray(ratio)
        x = times if times is not None else np.arange(ratio.shape[0])
        axes[1].plot(x, ratio)
        axes[1].set_title("median N/P ratio")
    used = debug.get("use_for_noise_psd")
    if used is not None:
        used = np.asarray(used)
        x = times if times is not None else np.arange(used.shape[0])
        axes[2].step(x, used.astype(int), where="mid")
        axes[2].set_title("frames used for PSD update")
    fig.tight_layout()
    return fig
