"""Visualization: waveforms, spectrograms, engine debug dashboards.

Parity targets: ``visualize_audio.py`` and ``visualize_noise_output.py``.
The reference uses plotly for interactive panels; this environment renders
with matplotlib (same function names/signatures; figures are returned so
notebooks and tests can assert on them).
"""

from audio_processing_tools_tpu.viz.visualize_audio import (
    plot_audio_signal,
    plot_audio_fft,
    plot_audio_spectrogram,
)
from audio_processing_tools_tpu.viz.visualize_noise_output import (
    show_noise_processing_results,
    frames_to_df,
    plot_frame_classifier_debug,
    plot_frame_classifier_tuning,
    plot_noise_suppressor_debug,
)

__all__ = [
    "plot_audio_signal",
    "plot_audio_fft",
    "plot_audio_spectrogram",
    "show_noise_processing_results",
    "frames_to_df",
    "plot_frame_classifier_debug",
    "plot_frame_classifier_tuning",
    "plot_noise_suppressor_debug",
]
