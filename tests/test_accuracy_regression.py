"""Pinned labeled-corpus accuracy regression.

The reference's real test strategy (SURVEY §4): run the classifier over a
labeled test-vector corpus and split FP/FN
(``edge/dsp_rain_detection.py:3248-3282``). Here the corpus is synthesized
deterministically (rain / noise / wind / tonal classes with known labels),
run through the full framework path (LocalPath discovery -> MARK parse ->
device-batched detector), and the confusion counts are PINNED: a detector
regression that flips any clip fails the suite.
"""

import numpy as np
import pytest

from audio_processing_tools_tpu.config import DEFAULT_MODE_BANDS
from audio_processing_tools_tpu.evaluation import evaluate_corpus
from audio_processing_tools_tpu.framework import process_audio_batches_v2
from audio_processing_tools_tpu.models.spectral_noise import RainDetectorProcessor
from audio_processing_tools_tpu.utils.corpus import (
    CLASS_IS_RAIN,
    make_labeled_corpus,
    write_corpus_dir,
)

FS = 11162
SECONDS = 2.0


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    clips, labels, kinds = make_labeled_corpus(seed=7, seconds=SECONDS)
    d = tmp_path_factory.mktemp("acc") / "corpus"
    write_corpus_dir(str(d), clips, labels, kinds)
    return d, kinds


@pytest.fixture(scope="module")
def results(corpus_dir):
    d, kinds = corpus_dir
    proc = RainDetectorProcessor(name="rain_detector")
    res, _ = process_audio_batches_v2(
        processors=[proc],
        params_global={
            "sample_rate": FS, "check_duration": SECONDS,
            "detector": {"mode_bands": list(DEFAULT_MODE_BANDS)},
            "clip_rain_min_frames": 3,
        },
        InputType="LocalPath", test_vector_path=str(d), batch_save_dir=None,
    )
    return res


def test_corpus_is_deterministic():
    a, la, ka = make_labeled_corpus(seed=7)
    b, lb, kb = make_labeled_corpus(seed=7)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(la, lb)
    assert ka == kb
    c, _, _ = make_labeled_corpus(seed=8)
    assert not np.array_equal(a, c)


def test_accuracy_regression_pinned(results):
    stats = evaluate_corpus(
        results, predicted_col="rain_detector__clip_is_rain",
        actual_col="rain_actual",
    )
    # PINNED confusion counts for corpus seed=7 (24 clips: 10 rain / 14 not).
    # If a detector change flips any clip, this fails — inspect whether the
    # change is an improvement before re-pinning.
    assert stats["n"] == 24
    assert stats == {
        "n": 24, "n_tp": 10, "n_tn": 14, "n_fp": 0, "n_fn": 0,
        "accuracy": 1.0, "true_positive_rate": 1.0, "true_negative_rate": 1.0,
    }, stats


def test_accuracy_by_class(results):
    """Every adversarial non-rain class (wind gusts, tonal hum) stays clean,
    and both rain intensities are detected."""
    df = results.copy()
    df["kind"] = df["file_key"].map(lambda k: k.split("/")[-1].rsplit("_", 2)[0])
    for kind, group in df.groupby("kind"):
        expected = CLASS_IS_RAIN[kind]
        got = group["rain_detector__clip_is_rain"].astype(bool)
        assert (got == expected).all(), (
            f"{kind}: {int((got != expected).sum())}/{len(got)} misclassified"
        )


def test_evaluation_csv_outputs(results, tmp_path):
    stats = evaluate_corpus(
        results, predicted_col="rain_detector__clip_is_rain",
        actual_col="rain_actual", out_dir=str(tmp_path),
    )
    assert (tmp_path / "results_fp.csv").exists()
    assert (tmp_path / "results_fn.csv").exists()
    assert (tmp_path / "test_results.csv").exists()
    assert stats["accuracy"] == 1.0
