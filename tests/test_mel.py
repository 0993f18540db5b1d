"""Mel filterbank parity (librosa Slaney semantics re-derived) + features."""

import numpy as np
import jax.numpy as jnp

from audio_processing_tools_tpu.ops.mel import (
    hz_to_mel,
    mel_to_hz,
    mel_filterbank,
    mel_spectrogram,
    band_energies,
)
from audio_processing_tools_tpu.ops.stft import stft_power, fft_frequencies

FS = 11162


def test_mel_scale_roundtrip():
    f = np.array([0.0, 200.0, 999.0, 1000.0, 2000.0, 5000.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-10)
    # slaney scale: linear below 1 kHz (200/3 Hz per mel)
    assert abs(hz_to_mel(200.0) - 3.0) < 1e-9
    # htk variant
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f, htk=True), htk=True), f,
                               rtol=1e-10)
    assert abs(hz_to_mel(1000.0, htk=True) - 2595 * np.log10(1 + 1000 / 700)) < 1e-9


def test_filterbank_properties():
    fb = mel_filterbank(FS, 256, n_mels=24)
    assert fb.shape == (24, 129)
    assert (fb >= 0).all()
    # every filter has support and triangles peak once
    assert (fb.sum(axis=1) > 0).all()
    # slaney normalization: approx constant-energy per channel in the
    # well-covered region -> column sums roughly flat mid-band
    col = fb.sum(axis=0)
    mid = col[20:100]
    assert mid.min() > 0.1 * mid.max()


def test_mel_spectrogram_tone(rng):
    t = np.arange(FS) / FS
    x = np.sin(2 * np.pi * 520.0 * t).astype(np.float32)
    M = np.asarray(mel_spectrogram(jnp.asarray(x), sr=FS, n_mels=40))
    assert M.shape[0] == 40
    # the peak mel channel's center frequency should be near 520 Hz
    fb = mel_filterbank(FS, 256, 40)
    freqs = fft_frequencies(FS, 256)
    centers = (fb * freqs[None, :]).sum(1) / np.maximum(fb.sum(1), 1e-9)
    peak_ch = int(M[:, M.shape[1] // 2].argmax())
    assert abs(centers[peak_ch] - 520) < 120
    # log variant finite
    Ml = np.asarray(mel_spectrogram(jnp.asarray(x), sr=FS, log=True))
    assert np.isfinite(Ml).all()


def test_band_energies(rng):
    x = (0.1 * rng.standard_normal(FS)).astype(np.float32)
    P = stft_power(jnp.asarray(x))
    freqs = fft_frequencies(FS, 256)
    bands = ((400, 700), (800, 1050))
    E = np.asarray(band_energies(P, freqs, bands))
    assert E.shape[0] == 2
    ref0 = np.asarray(P)[(freqs >= 400) & (freqs <= 700)].sum(0)
    np.testing.assert_allclose(E[0], ref0, rtol=1e-5)
    Edb = np.asarray(band_energies(P, freqs, bands, db=True))
    np.testing.assert_allclose(Edb[0], 10 * np.log10(np.maximum(ref0, 1e-10)),
                               rtol=1e-4)


def test_mel_features_to_rain_label_end_to_end(rng):
    """BASELINE config #3: mel-filterbank dB band energies -> rain/no-rain
    labels, end to end on a labeled synthetic corpus.

    A minimal mel-domain detector (rain-band mel flux vs causal floor)
    separates rain from noise/wind/tonal clips using only the mel kernel
    layer — evidence that the mel features carry the label signal.
    """
    import jax.numpy as jnp

    from audio_processing_tools_tpu.ops.mel import mel_spectrogram, mel_to_hz, hz_to_mel
    from audio_processing_tools_tpu.utils.corpus import make_labeled_corpus

    FS = 11162
    clips, labels, kinds = make_labeled_corpus(
        seed=13, fs=FS, seconds=2.0,
        counts={"rain_heavy": 4, "rain_light": 3, "noise": 4, "wind": 3,
                "tonal": 3},
    )

    n_mels = 40
    M = np.asarray(mel_spectrogram(jnp.asarray(clips), sr=FS, n_mels=n_mels))
    M_db = 10.0 * np.log10(M + 1e-9)                      # (B, n_mels, T)

    # mel bins covering the rain/mode bands (~450-2600 Hz)
    centers = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(FS / 2),
                                    n_mels + 2))[1:-1]
    band = (centers >= 450) & (centers <= 2600)

    # impulsive rise of band energy vs a 2-frame-back reference
    E = M_db[:, band, :].mean(axis=1)                     # (B, T)
    flux = np.maximum(E[:, 2:] - E[:, :-2], 0.0)
    score = np.quantile(flux, 0.98, axis=-1)              # impulsiveness

    thr = 12.0  # dB rise (measured margin: rain >= ~20, non-rain <= ~7.5)
    predicted = score > thr
    acc = (predicted == labels).mean()
    assert acc == 1.0, (acc, list(zip(kinds, score.round(1), labels)))


def test_mel_classifier_engine_separates_corpus():
    """MelRainClassifier (the pipeline consumer of ops/mel) labels the
    synthetic corpus perfectly, batched in one jitted program."""
    from audio_processing_tools_tpu.models.mel_classifier import MelRainClassifier
    from audio_processing_tools_tpu.utils.corpus import make_labeled_corpus

    clips, labels, kinds = make_labeled_corpus(
        seed=13, fs=FS, seconds=2.0,
        counts={"rain_heavy": 4, "rain_light": 3, "noise": 4, "wind": 3,
                "tonal": 3},
    )
    eng = MelRainClassifier()
    eng.setup({"sample_rate": FS})
    out = eng.process_batch(clips)
    got = np.asarray(out["clip_is_rain"])
    assert (got == labels).all(), list(zip(kinds, np.asarray(
        out["clip_score_db"]).round(1), labels))
    # single-clip path agrees with the batch
    one = eng.process(clips[0])
    assert bool(one["clip_is_rain"]) == bool(got[0])
    np.testing.assert_allclose(float(one["clip_score_db"]),
                               float(out["clip_score_db"][0]), rtol=1e-6)


def test_mel_processor_through_framework(tmp_path):
    """BASELINE config #3 through the ORCHESTRATOR: MARK files on disk ->
    batch loader -> MelRainProcessor (device-batch fast path) -> labeled
    results frame."""
    from audio_processing_tools_tpu.framework.batch import process_audio_batches_v2
    from audio_processing_tools_tpu.models.mel_classifier import MelRainProcessor
    from audio_processing_tools_tpu.utils.corpus import (
        make_labeled_corpus,
        write_corpus_dir,
    )

    clips, labels, kinds = make_labeled_corpus(
        seed=29, fs=FS, seconds=2.0,
        counts={"rain_heavy": 2, "rain_light": 2, "noise": 2, "wind": 2},
    )
    d = tmp_path / "corpus"
    d.mkdir()
    write_corpus_dir(str(d), clips, labels, kinds, fs=FS)

    results, states = process_audio_batches_v2(
        processors=[MelRainProcessor()],
        params_global={"sample_rate": FS, "check_duration": 2.0},
        InputType="LocalPath",
        test_vector_path=str(d),
        batch_save_dir=None,
    )
    assert "mel_rain__clip_is_rain" in results.columns
    labeled = results.set_index("file_key")
    for fk, row in labeled.iterrows():
        expected = "true" in fk.lower()
        assert bool(row["mel_rain__clip_is_rain"]) == expected, fk
    # per-file path agrees with the device-batch path
    r2, _ = process_audio_batches_v2(
        processors=[MelRainProcessor()],
        params_global={"sample_rate": FS, "check_duration": 2.0},
        InputType="LocalPath", test_vector_path=str(d), batch_save_dir=None,
        debug_params={"device_batch": False},
    )
    a = results.set_index("file_key")["mel_rain__clip_score_db"]
    b = r2.set_index("file_key")["mel_rain__clip_score_db"]
    np.testing.assert_allclose(a.values, b.loc[a.index].values, rtol=1e-6)
