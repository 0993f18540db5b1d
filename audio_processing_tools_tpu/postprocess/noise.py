"""Per-file noise summary (parity with reference ``postprocess/noise.py``)."""

from __future__ import annotations

from typing import Any, Dict

import numpy as np
import pandas as pd


def postprocess_noise(results_df: pd.DataFrame, noise_states_df: pd.DataFrame,
                      params: Dict[str, Any]) -> pd.DataFrame:
    if results_df.empty:
        return pd.DataFrame(
            columns=["file_key", "rain_actual", "noise_snr_db", "noise_floor_db"]
        )
    return pd.DataFrame({
        "file_key": results_df["file_key"],
        "rain_actual": results_df.get("rain_actual", None),
        "noise_snr_db": results_df.get("noise__snr_db", np.nan),
        "noise_floor_db": results_df.get("noise__floor_db", np.nan),
    })
