"""Wind/gust analysis tools + multi-processor orchestrator chain."""

import numpy as np
import jax.numpy as jnp
import pytest

from audio_processing_tools_tpu.models.wind import (
    detect_gusts,
    compare_novelties,
    novelty_based_gust_detection,
    compute_rain_mod,
    analyze_energy_peaks,
)
from audio_processing_tools_tpu.ops.stft import stft

FS = 11162


def _gusty(rng, n=FS * 4):
    """Low-frequency swelling 'wind' + background noise."""
    t = np.arange(n) / FS
    swell = (1 + np.sin(2 * np.pi * 0.4 * t)) ** 2
    x = 0.02 * rng.standard_normal(n) + 0.3 * swell * np.sin(2 * np.pi * 250 * t)
    return x.astype(np.float32)


def test_detect_gusts(rng):
    x = _gusty(rng)
    mag = np.abs(np.asarray(stft(jnp.asarray(x))))
    gust_times, w_raw, r_raw, w_t, r_t = detect_gusts(mag, FS)
    T = mag.shape[1] + 1
    assert w_raw.shape == (T,) and r_raw.shape == (T,)
    assert w_raw.mean() >= 0
    comp = compare_novelties(w_raw, r_raw, w_raw > 10, r_raw > 5)
    assert set(comp) >= {"wind_raw_max", "rain_spike_count", "overlap_spikes"}
    state = novelty_based_gust_detection(mag, FS)
    assert "gust_time" in state and "novelty_comparison" in state


def test_compute_rain_mod():
    nov_rain = np.array([0.0, 10.0, 20.0, 5.0])
    nov_gust = np.array([0.0, 2.0, 0.0, 10.0])
    raining = np.array([1.0, 1.0, 1.0, 1.0])
    out = compute_rain_mod(nov_rain, nov_gust, raining, rain_thr=4.0)
    # frame1: ratio 5 >= 4 -> thr; frame2: no gust -> nov_rain*raining=20 -> thr
    # frame3: ratio 0.5 < 4 -> 0; frame0: 0
    np.testing.assert_array_equal(out, [0.0, 4.0, 4.0, 0.0])


def test_analyze_energy_peaks(rng):
    n = FS * 2
    # uniform noise: block energies concentrate tightly around their mean, so
    # the 1.2x-local-min rise/decay walk terminates quickly (the algorithm
    # assumes the local minimum is representative of the inter-pulse floor)
    x = 0.02 * rng.uniform(-1.0, 1.0, n)
    for t0 in (5000, 12000):
        k = np.arange(150)
        x[t0 : t0 + 150] += 1.5 * np.exp(-k / 12.0) * np.sin(2 * np.pi * 500 * k / FS)
    pulses, energy, efs = analyze_energy_peaks(x.astype(np.float32), FS)
    assert efs == FS / 48
    assert len(pulses) >= 1
    times = [p["peak_time_ms"] for p in pulses]
    assert any(abs(t - 5000 / FS * 1000) < 30 for t in times)
    for p in pulses:
        assert p["pulse_time"] <= 50


def test_multiprocessor_chain_device_batch(tmp_path, rng):
    """Rain detector + band-noise estimator chained, both device-batched."""
    from audio_processing_tools_tpu.config import DEFAULT_MODE_BANDS
    from audio_processing_tools_tpu.framework import process_audio_batches_v2
    from audio_processing_tools_tpu.models.spectral_noise import RainDetectorProcessor
    from audio_processing_tools_tpu.models.band_noise import (
        BandNoiseEstimatorProcessor,
    )
    from audio_processing_tools_tpu.io.mark import write_mark_audio_file

    d = tmp_path / "corpus"
    d.mkdir()
    for i, label in enumerate(["true", "false"]):
        x = 0.01 * rng.standard_normal(FS * 2)
        if label == "true":
            for t0 in rng.integers(FS // 4, FS * 2 - 2000, 15):
                k = np.arange(800)
                ping = sum(a * np.sin(2 * np.pi * f * k / FS)
                           for f, a in [(520, 1), (900, .5), (1600, .35), (2450, .25)])
                x[t0 : t0 + 800] += 0.5 * np.exp(-k / 60.0) * ping
        pcm = (np.clip(x, -1, 1) * 32767).astype(np.int16)
        (d / f"c{i}_{label}.bin").write_bytes(
            write_mark_audio_file(pcm, sample_rate=FS)
        )

    results, states = process_audio_batches_v2(
        processors=[
            RainDetectorProcessor(name="rain_detector"),
            BandNoiseEstimatorProcessor(name="band_noise"),
        ],
        params_global={
            "sample_rate": FS, "check_duration": 2.0,
            "detector": {"mode_bands": list(DEFAULT_MODE_BANDS)},
            "clip_rain_min_frames": 3,
        },
        InputType="LocalPath", test_vector_path=str(d), batch_save_dir=None,
    )
    assert "rain_detector__clip_is_rain" in results.columns
    assert "band_noise__median_N_E" in results.columns
    by_key = results.set_index("file_key")
    for fk, row in by_key.iterrows():
        assert bool(row["rain_detector__clip_is_rain"]) == ("true" in fk)
    assert set(states) == {"rain_detector", "band_noise"}


def test_misc_roe_utilities(rng):
    from audio_processing_tools_tpu.models.wind import (
        compute_novelty_energy, moving_average_smoothing,
        check_energy_threshold,
    )

    x = np.zeros(FS)
    x[4000:4200] = 0.5  # energy step
    nov, fsf = compute_novelty_energy(x, Fs=FS, N=512, H=256)
    assert fsf == FS / 256
    assert nov.argmax() in range(13, 19)  # onset near sample 4000 / 256

    y = moving_average_smoothing(np.array([0, 0, 10, 0, 0.0]), 3)
    assert y.shape == (5,)
    assert abs(y[2] - 10 / 3) < 1e-9
    import pytest
    with pytest.raises(ValueError):
        moving_average_smoothing(x, 0)

    spec = np.zeros(129)
    spec[20] = 5.0
    assert check_energy_threshold(spec, (400, 3500), FS, 256, threshold=1.0)
    assert not check_energy_threshold(spec, (400, 3500), FS, 256, threshold=100.0)


def test_eac_pitch(rng):
    from audio_processing_tools_tpu.models.pitch import (
        compute_eac_for_frames, estimate_pitch_from_eac,
        compute_instantaneous_frequency,
    )
    import scipy.signal as spsig

    # frames of a 220 Hz sawtooth-ish harmonic tone
    n, L = 6, 1024
    k = np.arange(L)
    frames = np.stack([
        sum((1.0 / h) * np.sin(2 * np.pi * 220 * h * (k + 17 * i) / FS)
            for h in range(1, 5))
        for i in range(n)
    ]).astype(np.float32)
    eac = np.asarray(compute_eac_for_frames(frames))
    assert eac.shape == (n, L)
    # parity with scipy full correlation per frame
    ref = spsig.correlate(frames[0].astype(np.float64), frames[0].astype(np.float64),
                          mode="full")
    ref = ref[len(ref) // 2 : len(ref) // 2 + L]
    ref = ref / np.max(np.abs(ref))
    np.testing.assert_allclose(eac[0], ref, atol=2e-3)

    f0 = np.asarray(estimate_pitch_from_eac(eac, FS))
    assert np.all(np.abs(f0 - 220) < 15), f0

    # instantaneous frequency of a pure tone ~ constant 500 Hz
    tone = np.sin(2 * np.pi * 500 * k / FS).astype(np.float32)
    fi = compute_instantaneous_frequency(tone, FS)
    assert abs(np.median(fi) - 500) < 5
