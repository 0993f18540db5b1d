"""End-to-end orchestrator tests over a synthetic local corpus."""

import numpy as np
import pandas as pd
import pytest

from audio_processing_tools_tpu.config import DEFAULT_MODE_BANDS
from audio_processing_tools_tpu.framework import (
    process_audio_batches_v2,
    RainProcessor,
    NoiseProcessor,
    has_processor,
    restore_state_df_from_parquet,
)
from audio_processing_tools_tpu.models.spectral_noise import RainDetectorProcessor
from audio_processing_tools_tpu.io.mark import write_mark_audio_file

FS = 11162
DUR = 2.0
DET = {"mode_bands": list(DEFAULT_MODE_BANDS)}


def _make_corpus(tmp_path, rng, n_rain=3, n_noise=3):
    d = tmp_path / "corpus"
    d.mkdir()
    for i in range(n_rain):
        x = 0.005 * rng.standard_normal(int(FS * DUR))
        for t0 in rng.integers(FS // 4, int(FS * DUR) - 2000, 15):
            k = np.arange(800)
            ping = sum(
                a * np.sin(2 * np.pi * f * k / FS)
                for f, a in [(520, 1), (900, 0.5), (1600, 0.35), (2450, 0.25)]
            )
            x[t0 : t0 + 800] += 0.5 * np.exp(-k / 60.0) * ping
        pcm = (np.clip(x, -1, 1) * 32767).astype(np.int16)
        (d / f"clip{i}_true.bin").write_bytes(
            write_mark_audio_file(pcm, sample_rate=FS)
        )
    for i in range(n_noise):
        x = 0.02 * rng.standard_normal(int(FS * DUR))
        pcm = (np.clip(x, -1, 1) * 32767).astype(np.int16)
        (d / f"quiet{i}_false.bin").write_bytes(
            write_mark_audio_file(pcm, sample_rate=FS)
        )
    return d


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    rng = np.random.default_rng(42)
    return _make_corpus(tmp_path_factory.mktemp("fw"), rng)


def _params():
    return {
        "sample_rate": FS,
        "check_duration": DUR,
        "detector": DET,
        "clip_rain_min_frames": 3,
    }


def test_orchestrator_device_batch(corpus, tmp_path):
    proc = RainDetectorProcessor(name="rain_detector")
    results, states = process_audio_batches_v2(
        processors=[proc],
        params_global=_params(),
        InputType="LocalPath",
        test_vector_path=str(corpus),
        batch_save_dir=str(tmp_path / "save"),
    )
    assert len(results) == 6
    assert "rain_detector__clip_is_rain" in results.columns
    assert results.attrs["files_per_sec_total"] > 0
    labeled = results.set_index("file_key")
    for fk, row in labeled.iterrows():
        expected = "true" in fk
        assert bool(row["rain_detector__clip_is_rain"]) == expected, fk
    # states present with file keys
    sdf = states["rain_detector"]
    assert len(sdf) == 6 and "frame_class" in sdf.columns
    # parquet spill happened on the final flush
    assert len(results.attrs["saved_parquet_files"]) == 1


def test_orchestrator_per_file_path_matches(corpus, tmp_path):
    proc = RainDetectorProcessor(name="rain_detector")
    r1, _ = process_audio_batches_v2(
        processors=[proc], params_global=_params(), InputType="LocalPath",
        test_vector_path=str(corpus), batch_save_dir=None,
        debug_params={"device_batch": False},
    )
    proc2 = RainDetectorProcessor(name="rain_detector")
    r2, _ = process_audio_batches_v2(
        processors=[proc2], params_global=_params(), InputType="LocalPath",
        test_vector_path=str(corpus), batch_save_dir=None,
    )
    a = r1.set_index("file_key")["rain_detector__rain_frame_count"]
    b = r2.set_index("file_key")["rain_detector__rain_frame_count"]
    pd.testing.assert_series_equal(a, b)


def test_rain_processor_predicted_mismatch(corpus):
    """RainProcessor + rain_drop_min_thr -> rain__predicted/mismatch columns."""

    def dummy_algo(x, **params):
        drops = int((np.abs(x) > 0.2).sum() // 50)
        return drops, 500.0, {"rain_drop_count": drops, "nov": [0.1]}

    proc = RainProcessor(name="rain", fn=dummy_algo)
    results, _ = process_audio_batches_v2(
        processors=[proc],
        params_global={"sample_rate": FS, "check_duration": DUR,
                       "rain_drop_min_thr": 3},
        InputType="LocalPath", test_vector_path=str(corpus),
        batch_save_dir=None,
        debug_params={"print_mismatched": True},
    )
    assert "rain__predicted" in results.columns
    assert "rain__mismatch" in results.columns
    assert results["rain__rain_drops"].notna().all()


def test_param_updates_chain(corpus):
    """_param_updates propagate between chained processors."""
    seen = {}

    class A:
        name = "a"

        def run(self, audio, params):
            return {"v": 1}, {"_param_updates": {"injected": 42}}

    class B:
        name = "b"

        def run(self, audio, params):
            seen["injected"] = params.get("injected")
            return {"v": 2}, {}

    process_audio_batches_v2(
        processors=[A(), B()],
        params_global={"sample_rate": FS, "check_duration": DUR},
        InputType="LocalPath", test_vector_path=str(corpus),
        batch_save_dir=None, max_files=1,
    )
    assert seen["injected"] == 42


def test_noise_processor(corpus):
    proc = NoiseProcessor(name="noise")
    results, states = process_audio_batches_v2(
        processors=[proc],
        params_global={**_params()},
        InputType="LocalPath", test_vector_path=str(corpus),
        batch_save_dir=None, max_files=2,
        debug_params={"device_batch": False},
    )
    assert "noise__mean_noise_floor_db" in results.columns
    assert np.isfinite(results["noise__mean_noise_floor_db"]).all()
    assert has_processor([proc], "noise") and not has_processor([proc], "x")


def test_parquet_spill_and_restore(corpus, tmp_path):
    proc = RainDetectorProcessor(name="rain_detector")
    save_dir = tmp_path / "spill"
    params = _params()
    params["dump_features"] = True
    params["detector"] = {**DET, "feature_dump_level": 1}
    results, states = process_audio_batches_v2(
        processors=[proc], params_global=params, InputType="LocalPath",
        test_vector_path=str(corpus), batch_size=2, max_batch_save=2,
        batch_save_dir=str(save_dir),
    )
    saved = states["rain_detector"].attrs["saved_parquet_files"]
    assert len(saved) >= 2  # periodic flushes happened
    df = restore_state_df_from_parquet(saved[0])
    assert "file_key" in df.columns


def test_max_files_and_empty(corpus):
    proc = RainDetectorProcessor(name="rain_detector")
    results, _ = process_audio_batches_v2(
        processors=[proc], params_global=_params(), InputType="LocalPath",
        test_vector_path=str(corpus), max_files=0, batch_save_dir=None,
    )
    assert results.empty
