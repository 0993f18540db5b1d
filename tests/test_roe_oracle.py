"""Three-way RoE agreement: JAX engine == NumPy loop oracle (== C++ in
tests/test_native.py)."""

import numpy as np
import pytest

from audio_processing_tools_tpu.models.roe import rain_detection_algo
from tests.oracles import roe_oracle, stft_librosa

FS = 11162
PARAMS = dict(
    sample_rate=FS, check_duration=10, op_freq_range=[400, 3500],
    n_freq_range=[400, 700], harmonic_threshold=[4.5, 4.0, 3.5, 3.5, 3.5, 3.5],
    min_drop_count=0.3,
)


def _harmonic_rain(rng, drops=80, fn=500.0):
    n = FS * 10
    x = 0.003 * rng.standard_normal(n)
    for t0 in rng.integers(0, n - 1200, drops):
        k = np.arange(1000)
        ping = sum((1.0 / h) * np.sin(2 * np.pi * fn * h * k / FS)
                   for h in range(1, 6))
        x[t0 : t0 + 1000] += 0.6 * np.exp(-k / 80.0) * ping
    return x.astype(np.float32)


@pytest.mark.parametrize("kind,drops", [("rain", 80), ("light", 30),
                                        ("noise", 0)])
def test_roe_matches_full_oracle(rng, kind, drops):
    if kind == "noise":
        x = (0.02 * rng.standard_normal(FS * 10)).astype(np.float32)
    else:
        x = _harmonic_rain(rng, drops=drops)
    ours, frain_ours, state = rain_detection_algo(x, **PARAMS)
    ref, frain_ref, peaks_ref = roe_oracle(x.astype(np.float64), FS)

    # boolean decision must agree
    assert (ours > 0) == (ref > 0), (ours, ref)
    # counts close (float32 engine vs float64 oracle near thresholds)
    assert abs(ours - ref) <= max(2, int(0.1 * max(ref, 1))), (ours, ref)
    if frain_ref > 0:
        assert abs(frain_ours - frain_ref) < 25, (frain_ours, frain_ref)
    assert abs(int(state["rain_peaks_count"]) - peaks_ref) <= max(
        2, int(0.1 * max(peaks_ref, 1))
    )


def test_roe_debug_spectra_match_oracle(rng):
    """algo_state carries the plotting spectra (dsp_rain_detection.py:2336-2341),
    matching a float64 scipy+librosa-form oracle chunk for chunk."""
    import scipy.signal as spsig

    x = _harmonic_rain(rng, drops=40)
    _, _, state = rain_detection_algo(x, **PARAMS)
    sp0, sp = state["spectrum_db0"], state["spectrum_db"]
    # nf == 0 and log_factor == 0: pre/post-suppression spectra identical
    np.testing.assert_array_equal(sp0, sp)

    N, H = 256, 128
    sos = spsig.butter(8, [400 / (FS / 2), 3500 / (FS / 2)], "bandpass",
                       output="sos")
    parts = []
    remaining, offset, n_samples = 10, 0.0, x.size
    while remaining > 0:
        part = min(remaining, 2)
        read_size = int(N * (part * FS / N))
        read_off = int(FS * offset)
        remaining -= part
        offset += part
        if read_off >= n_samples or n_samples - read_off < FS:
            continue
        chunk = x[read_off : read_off + read_size].astype(np.float64)
        mag = np.abs(stft_librosa(spsig.sosfilt(sos, chunk), N, H))
        m = np.maximum(mag, 1e-5)
        ref = np.maximum(mag.max(), 1e-5)
        db = 20 * np.log10(m) - 20 * np.log10(ref)
        parts.append(np.maximum(db, db.max() - 80.0))
    expected = np.concatenate(parts, axis=-1)
    assert sp.shape == expected.shape
    assert abs(float(sp.max())) < 1e-5  # ref=max normalization (f32 rounding)
    np.testing.assert_allclose(sp, expected, atol=0.5)
    # most bins should be far tighter than the dB tolerance
    assert np.quantile(np.abs(sp - expected), 0.99) < 0.1
