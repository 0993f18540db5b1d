"""Smoke tests for visualization panels and the labeler's headless pieces."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pandas as pd
import pytest

from audio_processing_tools_tpu.viz import (
    plot_audio_signal,
    plot_audio_fft,
    plot_audio_spectrogram,
    show_noise_processing_results,
    frames_to_df,
    plot_frame_classifier_debug,
    plot_frame_classifier_tuning,
    plot_noise_suppressor_debug,
)
from audio_processing_tools_tpu.labeler import TestVectorLabeler
from audio_processing_tools_tpu.config import DEFAULT_MODE_BANDS
from audio_processing_tools_tpu.models.spectral_noise import SpectralNoiseEngine

FS = 11162


def test_audio_plots(rng):
    x = (0.1 * rng.standard_normal(FS)).astype(np.float32)
    assert plot_audio_signal(x, FS) is not None
    assert plot_audio_fft(x, FS) is not None
    assert plot_audio_spectrogram(x, FS) is not None


@pytest.fixture(scope="module")
def engine_out():
    rng = np.random.default_rng(0)
    x = (0.02 * np.random.default_rng(0).standard_normal(FS * 2)).astype(np.float32)
    eng = SpectralNoiseEngine()
    eng.setup({
        "sample_rate": FS, "detector": {"mode_bands": list(DEFAULT_MODE_BANDS)},
        "return_debug": True, "return_detector_debug": True,
        "return_noise_psd": True, "compute_output_audio": True,
    })
    return eng.process(x)


def test_frames_to_df(engine_out):
    df = frames_to_df(engine_out["det_debug"], engine_out["times"])
    assert "td_crest_factor" in df.columns
    assert "time_s" in df.columns
    assert len(df) == engine_out["frame_class"].shape[0]


def test_debug_dashboards(engine_out):
    assert show_noise_processing_results(engine_out, FS) is not None
    assert plot_frame_classifier_debug(
        engine_out["det_debug"], engine_out["times"]
    ) is not None
    assert plot_frame_classifier_tuning(engine_out["det_debug"]) is not None
    assert plot_noise_suppressor_debug(
        engine_out["debug"], engine_out["times"]
    ) is not None


def test_labeler_validation():
    with pytest.raises(ValueError):
        TestVectorLabeler(pd.DataFrame({"x": [1]}), db_engine=None)
    df = pd.DataFrame({"source_file": ["a", "a"]})
    with pytest.raises(ValueError):
        TestVectorLabeler(df, db_engine=None)


def test_labeler_uid_and_bool():
    uid = TestVectorLabeler.generate_uid("key0.015.0")
    assert len(uid) == 64 and uid == TestVectorLabeler.generate_uid("key0.015.0")
    assert TestVectorLabeler.str_to_bool("TRUE") is True
    assert TestVectorLabeler.str_to_bool("false") is False


def test_labeler_save_for_review(tmp_path, rng):
    from audio_processing_tools_tpu.io.mark import write_mark_audio_file
    from ipywidgets import Output

    df = pd.DataFrame({
        "source_file": ["k1"], "device_id": ["DEV1"],
        "time": [pd.Timestamp("2024-01-01")],
    })
    lab = TestVectorLabeler(df, db_engine=None, out_folder=str(tmp_path))
    pcm = (rng.standard_normal(FS) * 1000).astype(np.int16)
    blob = write_mark_audio_file(pcm, sample_rate=FS, device_id="DEV1")
    lab.save_file_for_review(df.iloc[0], blob, Output())
    saved = list(tmp_path.glob("*.wav"))
    assert len(saved) == 1 and saved[0].name == "DEV1_k1.wav"
