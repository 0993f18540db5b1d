"""Full-path parity: the flagship classifier vs an independent NumPy oracle."""

import numpy as np
import pytest

from audio_processing_tools_tpu.config import DEFAULT_MODE_BANDS
from audio_processing_tools_tpu.models.spectral_noise import SpectralNoiseEngine
from tests.oracles import spectral_engine_oracle

FS = 11162


@pytest.fixture(scope="module")
def engine():
    eng = SpectralNoiseEngine()
    eng.setup({
        "sample_rate": FS,
        "detector": {"mode_bands": list(DEFAULT_MODE_BANDS)},
        "return_detector_debug": True,
    })
    return eng


def _rain(rng, n=FS * 4):
    x = 0.005 * rng.standard_normal(n)
    for t0 in rng.integers(FS // 2, n - 2000, 25):
        k = np.arange(800)
        ping = sum(a * np.sin(2 * np.pi * f * k / FS)
                   for f, a in [(520, 1), (900, 0.5), (1600, 0.35), (2450, 0.25)])
        x[t0 : t0 + 800] += 0.5 * np.exp(-k / 60.0) * ping
    return x.astype(np.float32)


@pytest.mark.parametrize("kind", ["rain", "noise"])
def test_classifier_matches_full_oracle(engine, rng, kind):
    x = _rain(rng) if kind == "rain" else (0.02 * rng.standard_normal(FS * 4)).astype(np.float32)
    out = engine.process(x)
    ref = spectral_engine_oracle(x.astype(np.float64), FS)

    fc = np.asarray(out["frame_class"])
    fc_ref = ref["frame_class"]
    # float32 vs float64 near-threshold flips: require >= 99% agreement and
    # identical rain-frame counts within 1
    agree = (fc == fc_ref).mean()
    assert agree >= 0.99, f"frame_class agreement {agree:.3f}"
    n_rain = int((fc == 2).sum())
    n_rain_ref = int((fc_ref == 2).sum())
    assert abs(n_rain - n_rain_ref) <= max(1, int(0.05 * max(n_rain_ref, 1))), (
        n_rain, n_rain_ref
    )

    dd = out["det_debug"]
    np.testing.assert_allclose(
        np.asarray(dd["td_crest_factor"]), ref["td_crest"], rtol=5e-3, atol=5e-3
    )
    # normalized per-mode flux parity (the decision features)
    ours = np.asarray(dd["normalized_mode_flux_by_mode"])
    np.testing.assert_allclose(
        ours, ref["normalized_mode_flux"], rtol=0.05, atol=0.05
    )
    np.testing.assert_array_equal(np.asarray(dd["td_gate_mask"]), ref["td_gate"])
