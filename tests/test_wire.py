"""Mu-law int8 wire format (VERDICT r3 item 4: the H2D-ceiling lever).

Pins (a) codec round-trip quality, (b) the jax/numpy decode twins, and
(c) corpus-wide detection parity vs the int16 wire: clip decisions through
the flagship engine must be IDENTICAL on the 24-clip easy corpus; on the
32-clip hard corpus at most ONE clip may flip, and only from the
near-threshold classes (drizzle / rain_faint / rain_in_wind / wind_gusty —
the measured flip is a wind_gusty clip; frame agreement stays >= 0.97 on
both corpora).
"""

import numpy as np
import pytest

from audio_processing_tools_tpu.config import DEFAULT_MODE_BANDS
from audio_processing_tools_tpu.models.spectral_noise import (
    SpectralNoiseEngine,
    clip_aggregate,
)
from audio_processing_tools_tpu.ops.wire import (
    mulaw_decode,
    mulaw_decode_np,
    mulaw_encode,
)
from audio_processing_tools_tpu.utils.corpus import (
    make_hard_corpus,
    make_labeled_corpus,
)

FS = 11162


def test_roundtrip_snr_and_monotonicity(rng):
    x = (rng.standard_normal(200_000) * 3000).clip(-32767, 32767
                                                   ).astype(np.int16)
    codes = mulaw_encode(x)
    assert codes.dtype == np.int8
    xf = x.astype(np.float32) / 32768.0
    xd = mulaw_decode_np(codes)
    snr = 10 * np.log10(np.mean(xf**2) / np.mean((xd - xf) ** 2))
    assert snr > 35.0, snr  # G.711-class companding quality
    # the code is a monotone function of the sample value
    ramp = np.arange(-32768, 32768, 7, dtype=np.int16)
    assert (np.diff(mulaw_encode(ramp).astype(np.int32)) >= 0).all()
    # extremes map to the extreme codes and decode inside [-1, 1]
    ext = mulaw_encode(np.array([-32768, 32767], np.int16))
    np.testing.assert_array_equal(ext, [-127, 127])
    assert np.abs(mulaw_decode_np(ext)).max() <= 1.0


def test_device_decode_matches_numpy(rng):
    codes = rng.integers(-127, 128, 4096).astype(np.int8)
    np.testing.assert_allclose(
        np.asarray(mulaw_decode(codes)), mulaw_decode_np(codes), atol=1e-7
    )


@pytest.fixture(scope="module")
def engine():
    eng = SpectralNoiseEngine()
    eng.setup({
        "sample_rate": FS,
        "detector": {"mode_bands": list(DEFAULT_MODE_BANDS)},
        "classifier_only_mode": True,
    })
    return eng


def _decisions(engine, xb):
    out = engine.process_batch(xb.astype(np.float32))
    fc = np.asarray(out["frame_class"])
    rc = np.asarray(out["rain_conf"])
    dec = np.array([
        bool(clip_aggregate(fc[i], rc[i], 3)["clip_is_rain"])
        for i in range(xb.shape[0])
    ])
    return dec, fc


def _both_wires(clips):
    i16 = np.clip(np.asarray(clips) * 32767.0, -32768, 32767
                  ).astype(np.int16)
    x_int16 = i16.astype(np.float32) / 32767.0
    x_mulaw = (mulaw_decode_np(mulaw_encode(i16))
               * (32768.0 / 32767.0)).astype(np.float32)
    return x_int16, x_mulaw


def test_easy_corpus_decisions_identical(engine):
    clips, _labels, _kinds = make_labeled_corpus(seed=7, seconds=2.0)
    x16, xm = _both_wires(clips)
    d16, f16 = _decisions(engine, x16)
    dm, fm = _decisions(engine, xm)
    np.testing.assert_array_equal(dm, d16)
    assert float((f16 == fm).mean()) >= 0.97


def test_hard_corpus_decisions_pinned(engine):
    """One near-threshold clip is ALLOWED to flip (and currently does):
    the 8-bit companding noise moves a drizzle clip that sits at the
    decision boundary.  Anything beyond that single known flip fails."""
    clips, _labels, kinds = make_hard_corpus(seed=17, per_class=8)
    x16, xm = _both_wires(clips)
    d16, f16 = _decisions(engine, x16)
    dm, fm = _decisions(engine, xm)
    flips = np.flatnonzero(dm != d16)
    assert flips.size <= 1, [(i, kinds[i]) for i in flips]
    if flips.size:
        # every hard-corpus class sits at the decision boundary by
        # construction; the measured flip is a wind_gusty clip
        assert kinds[flips[0]] in ("drizzle", "rain_faint", "rain_in_wind",
                                   "wind_gusty"), kinds[flips[0]]
    assert float((f16 == fm).mean()) >= 0.97


def test_block4_roundtrip_and_decode_twins(rng):
    """int4 block-scaled wire: device/NumPy decode twins agree exactly;
    SQNR lands in the expected ~19 dB band (vs mu-law ~38 dB)."""
    import jax.numpy as jnp
    from audio_processing_tools_tpu.ops.wire import (
        BLK4, block4_decode, block4_decode_np, block4_encode)

    x = (rng.standard_normal((3, 64 * BLK4)) * 4000).astype(np.int16)
    p, s = block4_encode(x)
    assert p.shape[-1] == x.shape[-1] // 2 and s.shape[-1] == x.shape[-1] // BLK4
    y_np = block4_decode_np(p, s)
    y_dev = np.asarray(block4_decode(jnp.asarray(p), jnp.asarray(s)))
    np.testing.assert_array_equal(y_np, y_dev)
    ref = x.astype(np.float32) / 32768.0
    sqnr = 10 * np.log10(np.mean(ref**2) / np.mean((y_np - ref) ** 2))
    assert 15.0 < sqnr < 25.0, sqnr
    with np.testing.assert_raises(ValueError):
        block4_encode(x[..., :-1])


def test_block4_detection_parity_is_documented_as_insufficient(engine):
    """The int4 wire's REJECTION is a measurement, not an opinion: on the
    hard corpus it must flip MORE clip decisions than mu-law's single
    known flip (if quantization ever stops mattering here, the wire
    decision in ops/wire.py should be revisited)."""
    from audio_processing_tools_tpu.ops.wire import (
        BLK4, block4_decode_np, block4_encode)

    clips, _labels, _kinds = make_hard_corpus(seed=17, per_class=8)
    i16 = np.clip(np.asarray(clips) * 32767.0, -32768, 32767).astype(np.int16)
    n = i16.shape[-1] // BLK4 * BLK4
    x16 = i16[..., :n].astype(np.float32) / 32767.0
    p, s = block4_encode(i16[..., :n])
    x4 = (block4_decode_np(p, s) * (32768.0 / 32767.0)).astype(np.float32)
    d16, _ = _decisions(engine, x16)
    d4, _ = _decisions(engine, x4)
    flips = int((d16 != d4).sum())
    assert flips > 1, (
        f"int4 wire now flips only {flips} hard-corpus decisions - "
        "revisit the mu-law-only wire decision in ops/wire.py"
    )
