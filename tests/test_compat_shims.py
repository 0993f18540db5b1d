"""Migration shims expose the reference's module paths and names."""


def test_edge_shims_import():
    from audio_processing_tools_tpu.edge.rain_signal_processor import (
        NoiseProcessorConfig, SpectralNoiseProcessor, RainDetectorProcessor,
        build_noise_config,
    )
    from audio_processing_tools_tpu.edge.rain_frame_classifier import (
        FrameClass, causal_stochastic_low_quantile_baseline,
    )
    from audio_processing_tools_tpu.edge.feature_extraction import (
        TD_FEATURE_NAMES, RAW_SPECTRAL_FEATURE_NAMES,
        extract_td_features_inline,
    )
    from audio_processing_tools_tpu.edge.band_noise_estimator import (
        BandNoiseEstimatorConfig, NoiseFrameDetectorConfig,
    )
    from audio_processing_tools_tpu.edge.band_noise_processor import (
        BandNoiseEstimatorProcessor,
    )
    from audio_processing_tools_tpu.edge.time_domain_detector import (
        TimeDomainRainDetector,
    )
    from audio_processing_tools_tpu.edge.dsp_rain_detection import (
        rain_detection_algo,
    )
    from audio_processing_tools_tpu.edge.device_dsd_processing_emulator import (
        DsdProcessingEmualtor,
    )
    from audio_processing_tools_tpu.edge.parameter_tuning.grid_search import (
        grid_search,
    )
    from audio_processing_tools_tpu.edge.parameter_tuning.classification_algo import (
        python_classifier_boolean_wrapper, c_classifier_boolean_wrapper,
    )
    from audio_processing_tools_tpu.edge.parameter_tuning.call_c_fun import (
        rain_cl_config_param_t, rain_detection_algo_device,
    )
    assert int(FrameClass.RAIN) == 2
    assert len(TD_FEATURE_NAMES) == 12
    assert len(RAW_SPECTRAL_FEATURE_NAMES) == 21


def test_device_backend_requires_hardware():
    import numpy as np
    import pytest

    from audio_processing_tools_tpu.tuning.device_backend import (
        rain_detection_algo_device, DeviceBackendError, parse_device_response,
    )
    with pytest.raises(DeviceBackendError):
        rain_detection_algo_device(
            np.zeros(100, np.int16), m3cli_path="definitely_not_m3cli"
        )
    # fake transport round-trip
    import ctypes
    from audio_processing_tools_tpu.tuning.call_native import rain_cl_optional_data_t

    out = rain_cl_optional_data_t()
    out.raindrops = 7
    out.mean_freq[0] = 512.0
    raw = bytes(out)

    def fake_runner(cmd, inp=None):
        return raw

    drops, freq = rain_detection_algo_device(
        np.zeros(100, np.int16), runner=fake_runner
    )
    assert drops == 7 and abs(freq - 512.0) < 1e-6


def test_tabular_helpers(rng):
    import numpy as np
    from audio_processing_tools_tpu.io.tabular import (
        AudioSignal, tabularize_audio_data,
    )
    from audio_processing_tools_tpu.io.mark import write_mark_audio_file

    pcm = (rng.standard_normal(1000) * 500).astype(np.int16)
    blob = write_mark_audio_file(pcm, sample_rate=11162, timestamp=1678743960,
                                 device_id="DEV9")
    df = tabularize_audio_data({"audio/DEV9/site-a/1678743960": blob})
    assert len(df) == 1
    row = df.iloc[0]
    assert isinstance(row["signal"], AudioSignal)
    np.testing.assert_array_equal(row["signal"].contents, pcm)
    assert row["device_id"] == "DEV9"
    assert row["source_file"] == "audio/DEV9/site-a/1678743960"


def test_tuning_viz_results_loading(tmp_path):
    import json

    from audio_processing_tools_tpu.tuning.visualization_utils import (
        load_results, add_derived_metrics,
    )

    result = {
        "test_name": "exp1", "parameters": {"thr": 2.0},
        "overall_accuracy": 0.9,
        "tp_classifications": [1, 2], "tn_classifications": [3],
        "fp_classifications": [], "fn_classifications": [4],
    }
    (tmp_path / "exp1_abcdef0123_2024-01-01_00-00-00.json").write_text(
        json.dumps(result)
    )
    df = load_results(str(tmp_path / "exp1_*.json"))
    assert len(df) == 1
    add_derived_metrics(df)
    assert abs(df["true_positive_rate"].iloc[0] - 2 / 3) < 1e-9
    assert df["true_negative_rate"].iloc[0] == 1.0


def test_dsp_integ_two_pass(rng):
    import numpy as np
    from audio_processing_tools_tpu.tuning.dsp_integ import (
        analyse_raw_audio_wrapper, sample_classifier_to_evaluate,
    )

    FS = 11162
    n = FS * 4
    # quiet noise: first window under threshold, second window also quiet
    noise = (0.01 * rng.standard_normal(n)).astype(np.float32)
    count, _ = analyse_raw_audio_wrapper(noise, sample_rate=FS)
    assert count == 0
    assert sample_classifier_to_evaluate(noise, sample_rate=FS) is False

    # harmonic rain across both windows: either first-pass pass or combined
    x = 0.003 * rng.standard_normal(n)
    for t0 in rng.integers(0, n - 1200, 40):
        k = np.arange(1000)
        ping = sum((1.0 / h) * np.sin(2 * np.pi * 500 * h * k / FS)
                   for h in range(1, 6))
        x[t0 : t0 + 1000] += 0.6 * np.exp(-k / 80.0) * ping
    count_r, frain = analyse_raw_audio_wrapper(
        x.astype(np.float32), sample_rate=FS,
        op_freq_range=[400, 3500], n_freq_range=[400, 700],
        harmonic_threshold=[4.5, 4, 3.5, 3.5, 3.5, 3.5],
    )
    assert count_r > 0
    assert sample_classifier_to_evaluate(
        x.astype(np.float32), sample_rate=FS,
        op_freq_range=[400, 3500], n_freq_range=[400, 700],
        harmonic_threshold=[4.5, 4, 3.5, 3.5, 3.5, 3.5],
    ) is True


def test_profiling_utils():
    import time

    from audio_processing_tools_tpu.utils import Timer, timed

    t = Timer()
    with t.section("a"):
        time.sleep(0.01)
    with t.section("a"):
        pass
    rep = t.report()
    assert rep["a"]["count"] == 2 and rep["a"]["total_s"] > 0.005
    out, dt = timed(lambda v: v * 2, 21)
    assert out == 42 and dt >= 0
