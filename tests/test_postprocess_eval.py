"""Postprocess legacy shapes + corpus evaluation harness."""

import numpy as np
import pandas as pd

from audio_processing_tools_tpu.postprocess import postprocess_rain, postprocess_noise
from audio_processing_tools_tpu.evaluation import evaluate_corpus, confusion_split


def _results_df():
    return pd.DataFrame({
        "file_key": ["a", "b", "c", "d"],
        "rain_actual": [True, True, False, False],
        "rain__rain_drops": [12, 1, 8, 0],
        "rain__rain_drop_count": [12, 1, 8, 0],
        "rain__rain_peaks_count": [20, 2, 11, 0],
        "rain__rain_drop_count_mod": [12, 0, 8, 0],
        "rain__frain_mean": [510.0, 0.0, 480.0, 0.0],
        "rain__predicted": [True, False, True, False],
    })


def test_postprocess_rain_shapes():
    states = pd.DataFrame({
        "file_key": ["a", "b", "c", "d"],
        "nov": [[1.0], [0.0], [2.0], [0.0]],
        "kurtosis": [[3.0]] * 4,
        "crest_factor": [[4.0]] * 4,
        "diff_energy": [[7.0]] * 4,
    })
    tr, feat = postprocess_rain(_results_df(), states, {"handle_fp": True})
    assert list(tr.columns) == [
        "test_count", "file_key", "rain_actual", "rain_predicted",
        "rain_drop_count", "rain_peaks_count", "rain_drop_count_mod",
        "frain_mean",
    ]
    assert tr["rain_predicted"].tolist() == [True, False, True, False]
    for c in ("nov", "kurtosis", "crest_factor", "diff_energy"):
        assert c in feat.columns
    # predicted falls back to threshold when rain__predicted column missing
    df2 = _results_df().drop(columns=["rain__predicted"])
    tr2, _ = postprocess_rain(df2, pd.DataFrame(columns=["file_key"]),
                              {"rain_drop_min_thr": 3})
    assert tr2["rain_predicted"].tolist() == [True, False, True, False]
    # empty input
    tr3, feat3 = postprocess_rain(pd.DataFrame(), pd.DataFrame(), {})
    assert tr3.empty and feat3.empty


def test_postprocess_noise_shape():
    df = pd.DataFrame({
        "file_key": ["a"], "rain_actual": [True], "noise__snr_db": [4.2],
    })
    out = postprocess_noise(df, pd.DataFrame(), {})
    assert out["noise_snr_db"].iloc[0] == 4.2
    assert np.isnan(out["noise_floor_db"].iloc[0])


def test_evaluate_corpus(tmp_path):
    stats = evaluate_corpus(
        _results_df(), predicted_col="rain__predicted",
        out_dir=str(tmp_path),
    )
    assert stats["n"] == 4
    assert stats["n_tp"] == 1 and stats["n_fn"] == 1 and stats["n_fp"] == 1
    assert abs(stats["accuracy"] - 0.5) < 1e-9
    assert (tmp_path / "results_fp.csv").exists()
    assert (tmp_path / "results_fn.csv").exists()
    assert (tmp_path / "test_results.csv").exists()
    fp = pd.read_csv(tmp_path / "results_fp.csv")
    assert fp["file_key"].tolist() == ["c"]
    split = confusion_split(_results_df(), "rain__predicted")
    assert split["fn"]["file_key"].tolist() == ["b"]
