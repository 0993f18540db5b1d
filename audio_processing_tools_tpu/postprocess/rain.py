"""Convert framework rain outputs to the legacy
``(test_results_df, feature_df)`` shapes (parity with reference
``postprocess/rain.py:8-104``)."""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
import pandas as pd

_TEST_COLS = [
    "test_count", "file_key", "rain_actual", "rain_predicted",
    "rain_drop_count", "rain_peaks_count", "rain_drop_count_mod", "frain_mean",
]
_FEAT_COLS = [
    "test_count", "file_key", "rain_actual", "frain_mean",
    "kurtosis", "crest_factor", "diff_energy", "nov",
]


def postprocess_rain(results_df: pd.DataFrame, rain_states_df: pd.DataFrame,
                     params: Dict[str, Any]) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Build the old-style result/feature tables for the 'rain' processor."""
    if results_df.empty:
        return pd.DataFrame(columns=_TEST_COLS), pd.DataFrame(columns=_FEAT_COLS)

    rd_col = (
        "rain__rain_drop_count"
        if "rain__rain_drop_count" in results_df.columns
        else "rain__rain_drops"
    )
    rain_drops = results_df[rd_col]
    frain_mean = results_df["rain__frain_mean"]
    thr = params.get("rain_drop_min_thr", 3)

    if "rain__predicted" in results_df.columns:
        rain_predicted = results_df["rain__predicted"].astype(bool)
    else:
        rain_predicted = rain_drops > thr

    test_results_df = pd.DataFrame({
        "test_count": np.arange(len(results_df), dtype=int),
        "file_key": results_df["file_key"],
        "rain_actual": results_df.get(
            "rain_actual", pd.Series([None] * len(results_df))
        ),
        "rain_predicted": rain_predicted.astype(bool),
        "rain_drop_count": rain_drops,
        "rain_peaks_count": results_df.get("rain__rain_peaks_count", np.nan),
        "rain_drop_count_mod": results_df.get("rain__rain_drop_count_mod", np.nan),
        "frain_mean": frain_mean,
    })

    base = pd.DataFrame({
        "test_count": np.arange(len(results_df), dtype=int),
        "file_key": results_df["file_key"],
        "rain_actual": results_df.get(
            "rain_actual", pd.Series([None] * len(results_df))
        ),
        "frain_mean": frain_mean,
    })

    cols_needed = ["file_key", "nov"]
    if params.get("handle_fp") or params.get("handle_fn"):
        cols_needed += ["kurtosis", "crest_factor", "diff_energy"]
    cols_available = [c for c in cols_needed if c in rain_states_df.columns]

    if cols_available:
        feature_df = base.merge(
            rain_states_df[cols_available].copy(), on="file_key", how="left"
        )
    else:
        feature_df = base.copy()
        feature_df["nov"] = np.nan
        if params.get("handle_fp") or params.get("handle_fn"):
            for c in ("kurtosis", "crest_factor", "diff_energy"):
                feature_df[c] = np.nan
    return test_results_df, feature_df
