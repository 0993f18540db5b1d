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
        "return_spectra": True, "return_filtered_audio": True,
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


# ---------------------------------------------------------------------------
# content-level dashboard tests (panel/series counts, not just "no crash")


def test_overview_dashboard_panel_content(engine_out):
    fig = show_noise_processing_results(engine_out, FS, play_audio=False)
    # waveform + S + S_hat + noise PSD + G + P_band_all + N_band_all
    assert len(fig.axes) >= 7
    wf = fig.axes[0]
    assert len(wf.lines) == 2  # original + denoised overlay
    labels = [ln.get_label() for ln in wf.lines]
    assert "Original" in labels and "Denoised" in labels
    # spectrogram/heatmap panels carry QuadMesh artists
    heat_axes = [ax for ax in fig.axes if ax.collections]
    assert len(heat_axes) >= 4  # S, S_hat, noise PSD, G (+colorbars excluded)
    titles = " | ".join(ax.get_title() for ax in fig.axes)
    for frag in ("Waveforms", "Original spectrogram", "Denoised spectrogram",
                 "noise PSD", "Gain G", "P_band_all", "N_band_all"):
        assert frag in titles, frag


def test_overview_dashboard_playback_widget(engine_out, monkeypatch):
    """Audio playback panels call IPython.display.Audio (reference :32-36)."""
    import IPython.display as ipd

    played = []
    monkeypatch.setattr(ipd, "Audio", lambda *a, **k: played.append(k) or "w")
    monkeypatch.setattr(ipd, "display", lambda *a, **k: None)
    show_noise_processing_results(engine_out, FS, play_audio=True)
    assert len(played) == 2  # original + denoised
    assert all(k.get("rate") == FS for k in played)


def test_classifier_debug_panels(engine_out):
    dbg = engine_out["det_debug"]
    fig = plot_frame_classifier_debug(dbg, engine_out["times"])
    assert len(fig.axes) == 5
    score_ax = fig.axes[0]
    labels = {ln.get_label() for ln in score_ax.lines}
    assert "rain_conf" in labels and "noise_conf" in labels
    # audio panel prepends a row
    x = np.asarray(engine_out["x_filt"])
    fig2 = plot_frame_classifier_debug(dbg, engine_out["times"], audio=x, sr=FS)
    assert len(fig2.axes) == 6
    assert len(fig2.axes[0].lines) == 1  # the waveform


def test_classifier_tuning_panels_and_window(engine_out):
    dbg = engine_out["det_debug"]
    fig = plot_frame_classifier_tuning(dbg, times=engine_out["times"])
    assert len(fig.axes) == 5  # confidence + 4 flux panels
    conf_ax = fig.axes[0]
    labels = {ln.get_label() for ln in conf_ax.lines}
    assert "rain_conf" in labels
    # threshold overlays drawn as horizontal lines
    for ax in fig.axes[1:]:
        hlines = [ln for ln in ax.lines if ln.get_linestyle() == "--"]
        assert len(hlines) == 1
    # time windowing restricts the plotted span
    times = np.asarray(engine_out["times"])
    figw = plot_frame_classifier_tuning(dbg, times=times, t0=0.5, t1=1.0)
    xs = figw.axes[0].lines[0].get_xdata()
    assert xs.min() >= 0.5 - 1e-6 and xs.max() <= 1.0 + 1e-6


def test_suppressor_debug_panels(engine_out):
    fig = plot_noise_suppressor_debug(engine_out["debug"], engine_out["times"])
    titles = " | ".join(ax.get_title() for ax in fig.axes)
    for frag in ("Gain G", "P_band_all", "N_band_all", "PSD update"):
        assert frag in titles, frag
    # empty debug -> graceful fallback figure with a message
    fig2 = plot_noise_suppressor_debug({})
    assert len(fig2.axes) == 1 and fig2.axes[0].texts


def test_labeler_process_index_plays_audio(tmp_path, rng, monkeypatch):
    """The labeling loop surfaces the IPython audio widget
    (reference labeler.py:216-262)."""
    import IPython.display as ipd
    import audio_processing_tools_tpu.io.fetch as fetch
    from audio_processing_tools_tpu.io.mark import write_mark_audio_file
    from ipywidgets import Output

    pcm = (rng.standard_normal(FS * 2) * 1000).astype(np.int16)
    blob = write_mark_audio_file(pcm, sample_rate=FS, device_id="DEV1")
    monkeypatch.setattr(fetch, "get_device_raw_audio_data",
                        lambda keys=(), **kw: {k: blob for k in keys})

    df = pd.DataFrame({
        "source_file": ["k1"], "device_id": ["DEV1"],
        "time": [pd.Timestamp("2024-01-01")],
    })
    lab = TestVectorLabeler(df, db_engine=None, out_folder=str(tmp_path),
                            local_audio_cache=str(tmp_path))

    played = []

    class FakeAudio:
        def __init__(self, data=None, rate=None, **kw):
            played.append((np.asarray(data), rate))

    monkeypatch.setattr(ipd, "Audio", FakeAudio)
    lab.process_index("k1", next_index_callback=lambda: None,
                      output_widget=Output())
    assert len(played) == 1
    data, rate = played[0]
    assert rate == FS
    # first <=15 s segment, float-scaled
    assert data.shape[0] == min(len(pcm), 15 * FS)
    assert np.abs(data).max() <= 1.0


def test_labeler_button_flow_upserts_label(tmp_path, rng, monkeypatch):
    """Raining/Not-Raining button flow: label row built (uid, creator,
    manual flags) and upserted to device_audio_rain_classification
    (reference labeler.py:264-301, 358-414)."""
    import audio_processing_tools_tpu.io.db as db
    import audio_processing_tools_tpu.labeler as labeler_mod
    from ipywidgets import Output

    upserts = []
    monkeypatch.setattr(db, "upsert_df",
                        lambda df, table, eng, **kw: upserts.append((table, df)))
    # no network for the creator-IP lookup
    import sys as _sys
    import types as _types
    fake_requests = _types.ModuleType("requests")
    def _boom(*a, **k):
        raise OSError("no egress")
    fake_requests.get = _boom
    monkeypatch.setitem(_sys.modules, "requests", fake_requests)
    # run the upsert inline instead of a daemon thread
    import threading

    class InlineThread:
        def __init__(self, target=None, args=(), daemon=None):
            self.target, self.args = target, args

        def start(self):
            self.target(*self.args)

    monkeypatch.setattr(labeler_mod.threading, "Thread", InlineThread,
                        raising=False) if hasattr(labeler_mod, "threading") \
        else monkeypatch.setattr(threading, "Thread", InlineThread)

    df = pd.DataFrame({
        "source_file": ["k1"], "device_id": ["DEV1"],
        "time": [pd.Timestamp("2024-01-01")],
    })
    lab = TestVectorLabeler(df, db_engine=None, db_engine_upsert=object(),
                            out_folder=str(tmp_path))
    data = df.iloc[0].copy()
    data["segment_start_seconds"] = 0
    data["segment_end_seconds"] = 15

    clicked = []
    handler = lab.make_button_handler(
        data, Output(), True, lambda: clicked.append(True))
    handler(None)

    assert clicked == [True]
    assert len(upserts) == 1
    table, row_df = upserts[0]
    assert table == "device_audio_rain_classification"
    row = row_df.reset_index().iloc[0]
    assert row["raining"] == True  # noqa: E712
    assert row["manually_labeled"] == True  # noqa: E712
    assert row["source"] == "manually labeled"
    assert row["creator"] == "unknown"  # network-less fallback
    assert row_df.index.name == "uid"
    uid = row_df.index[0]
    assert uid == TestVectorLabeler.generate_uid("k1" + "0" + "15")


def test_labeler_device_context_plot_with_ibm_overlay(monkeypatch):
    """Device-context plot + IBM precip overlay on a fake DB
    (reference labeler.py:133-214)."""
    import matplotlib.pyplot as plt

    import audio_processing_tools_tpu.io.db as db

    t0 = pd.Timestamp("2024-03-01 12:00:00")
    audio_df = pd.DataFrame({
        "source_file": [f"k{i}" for i in range(5)],
        "device_id": ["DEV1"] * 4 + ["DEV2"],
        "time": [t0 + pd.Timedelta(hours=h) for h in (-30, -2, 0, 2, 0)],
        "lat": [45.0] * 5, "long": [-122.0] * 5,
    }).set_index("source_file", drop=False)

    ibm = pd.DataFrame({
        "time": [t0 + pd.Timedelta(hours=h) for h in range(-4, 5)],
        "ibm_precip": np.linspace(0, 2.0, 9),
    })
    queries = []

    def fake_get_db_data(q, eng, **kw):
        queries.append(q)
        return ibm

    monkeypatch.setattr(db, "get_db_data", fake_get_db_data)
    monkeypatch.setattr(plt, "show", lambda: None)

    TestVectorLabeler.plot_device_context(
        object(), "k2", audio_df, window_size=5, display_ibm_data=True)
    fig = plt.gcf()
    # main axis: adjacent recordings + current file; twin axis: IBM precip
    assert len(fig.axes) == 2
    main, twin = fig.axes
    assert len(main.lines) == 2
    adjacent_x = main.lines[0].get_xdata()
    assert len(adjacent_x) == 4  # all DEV1 recordings in window; DEV2 excluded
    assert len(twin.lines) == 1 and len(twin.lines[0].get_ydata()) == 9
    assert "ext_weather.hist_local_hourly" in queries[0]
    assert "lat BETWEEN 45.0 - 0.005" in queries[0]  # +-0.005 coord window
    plt.close("all")

    # bad coordinates: plot still renders, no IBM query
    queries.clear()
    audio_df2 = audio_df.assign(lat=0.0, long=0.0)
    TestVectorLabeler.plot_device_context(
        object(), "k2", audio_df2, window_size=5, display_ibm_data=True)
    assert not queries
    plt.close("all")
