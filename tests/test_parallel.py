"""Sharded pipeline tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import pytest

from audio_processing_tools_tpu.config import DEFAULT_MODE_BANDS
from audio_processing_tools_tpu.parallel import (
    make_mesh,
    shard_batch,
    ShardedRainPipeline,
)

FS = 11162
PARAMS = {
    "sample_rate": FS,
    "detector": {"mode_bands": list(DEFAULT_MODE_BANDS)},
    "clip_rain_min_frames": 2,
}


def _rain_clip(rng, n):
    x = 0.005 * rng.standard_normal(n)
    for t0 in rng.integers(FS // 4, n - 2000, 10):
        k = np.arange(800)
        ping = sum(a * np.sin(2 * np.pi * f * k / FS)
                   for f, a in [(520, 1), (900, 0.5), (1600, 0.35), (2450, 0.25)])
        x[t0 : t0 + 800] += 0.5 * np.exp(-k / 60.0) * ping
    return x.astype(np.float32)


def test_make_mesh():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("files",)
    with pytest.raises(ValueError):
        make_mesh(1000)


def test_sharded_step_matches_engine(rng):
    n = FS  # 1-second clips for speed
    clips = np.stack(
        [_rain_clip(rng, n) for _ in range(4)]
        + [(0.02 * rng.standard_normal(n)).astype(np.float32) for _ in range(4)]
    )
    mesh = make_mesh(8)
    pipe = ShardedRainPipeline(PARAMS, mesh)
    out = pipe.step(clips)

    fc = np.asarray(out["per_clip"]["frame_class"])
    assert fc.shape[0] == 8
    agg = {k: int(np.asarray(v)) if np.asarray(v).ndim == 0 else v
           for k, v in out["aggregates"].items()}
    assert agg["total_clips"] == 8

    # sharded result == unsharded engine result
    from audio_processing_tools_tpu.models.spectral_noise import SpectralNoiseEngine

    eng = SpectralNoiseEngine()
    eng.setup(dict(PARAMS))
    for i in (0, 5):
        ref = eng.process(clips[i])
        np.testing.assert_array_equal(fc[i], ref["frame_class"])

    # aggregate equals the fold of per-clip counts
    counts = np.asarray(out["per_clip"]["rain_frame_count"])
    assert agg["total_rain_frames"] == int(counts.sum())


def test_sharded_step_pads_ragged_batch(rng):
    n = FS
    clips = np.stack([_rain_clip(rng, n) for _ in range(5)])  # 5 % 8 != 0
    mesh = make_mesh(8)
    pipe = ShardedRainPipeline(PARAMS, mesh)
    out = pipe.run_corpus(clips, batch=8)
    assert out["aggregates"]["total_clips"] == 5
    assert out["per_clip"]["frame_class"].shape[0] == 5


def test_shard_batch_places_on_mesh(rng):
    mesh = make_mesh(4)
    xb = shard_batch(np.zeros((8, 256), np.float32), mesh)
    assert xb.sharding.num_devices == 4


def test_sharded_pipeline_roe_model(rng):
    """The legacy RoE classifier runs fleet-sharded through the same step
    contract; sharded == unsharded batch."""
    import jax.numpy as jnp

    from audio_processing_tools_tpu.models.roe import roe_detect_batch
    from audio_processing_tools_tpu.parallel import make_mesh, ShardedRainPipeline

    FS = 11162
    n = FS * 4
    k = np.arange(1000)
    ping = sum((1.0 / h) * np.sin(2 * np.pi * 520 * h * k / FS)
               for h in range(1, 6))
    clips = []
    for b in range(8):
        x = 0.003 * rng.standard_normal(n)
        for t0 in rng.integers(0, n - 1200, 40 if b < 4 else 0):
            x[t0 : t0 + 1000] += 0.6 * np.exp(-k / 80.0) * ping
        clips.append(x)
    xb = np.stack(clips).astype(np.float32)

    pipe = ShardedRainPipeline(
        {"sample_rate": FS, "check_duration": 4}, make_mesh(8), model="roe",
    )
    out = pipe.step(xb)
    mod = np.asarray(out["per_clip"]["rain_drop_count_mod"])
    ref = roe_detect_batch(xb, sample_rate=FS, check_duration=4)
    np.testing.assert_array_equal(mod, ref["rain_drop_count_mod"])
    agg = {k: int(np.asarray(v)) for k, v in out["aggregates"].items()
           if k != "mean_noise_energy"}
    assert agg["total_clips"] == 8
    assert agg["total_rain_clips"] == int((ref["rain_drop_count_mod"] > 0).sum())
    assert np.asarray(out["per_clip"]["clip_is_rain"]).sum() >= 3


def test_sharded_pipeline_band_noise_model(rng):
    import jax.numpy as jnp

    from audio_processing_tools_tpu.models.band_noise import (
        BandNoiseEstimatorConfig,
        band_noise_process,
    )
    from audio_processing_tools_tpu.parallel import make_mesh, ShardedRainPipeline

    FS = 11162
    n = FS * 3
    clips = []
    for b in range(8):
        x = 0.01 * rng.standard_normal(n)
        if b % 2 == 0:  # bursty rain-band energy
            for t0 in range(FS, n - 3000, FS):
                kk = np.arange(2500)
                x[t0 : t0 + 2500] += 0.5 * np.exp(-kk / 400.0) * np.sin(
                    2 * np.pi * 520 * kk / FS)
        clips.append(x)
    xb = np.stack(clips).astype(np.float32)

    pipe = ShardedRainPipeline({"sample_rate": FS}, make_mesh(8),
                               model="band_noise")
    out = pipe.step(xb)
    frac = np.asarray(out["per_clip"]["fft_rain_fraction"])
    # sharded result == direct per-clip run
    cfg = BandNoiseEstimatorConfig()
    ref = np.asarray(band_noise_process(jnp.asarray(xb[0]), cfg)
                     ["fft_rain_frame"]).astype(np.float32).mean()
    assert abs(frac[0] - ref) < 1e-7
    assert int(np.asarray(out["aggregates"]["total_clips"])) == 8


def test_sharded_pipeline_rejects_unknown_model():
    from audio_processing_tools_tpu.parallel import make_mesh, ShardedRainPipeline

    with pytest.raises(ValueError, match="unknown model"):
        ShardedRainPipeline({"sample_rate": 11162}, make_mesh(2), model="bogus")


def test_grid_search_vmapped_sharded_matches_unsharded(rng):
    """Combo-axis sharding over the mesh returns identical results to the
    single-device sweep, including when the combo count is not a device
    multiple (pad rows dropped)."""
    from audio_processing_tools_tpu.tuning.grid_search import (
        grid_search_vmapped,
    )

    n = FS * 2
    def rain(seed):
        r = np.random.default_rng(seed)
        x = 0.005 * r.standard_normal(n)
        for t0 in r.integers(FS // 4, n - 2000, 20):
            k = np.arange(800)
            ping = sum(a * np.sin(2 * np.pi * f * k / FS)
                       for f, a in [(520, 1), (900, 0.5), (1600, 0.35),
                                    (2450, 0.25)])
            x[t0 : t0 + 800] += 0.5 * np.exp(-k / 60.0) * ping
        return x.astype(np.float32)

    clips = np.stack([rain(1), rain(2),
                      (0.02 * rng.standard_normal(n)).astype(np.float32),
                      (0.01 * rng.standard_normal(n)).astype(np.float32)])
    labels = np.array([True, True, False, False])
    grid = {
        "new_rain_primary_flux_min": [1.2, 1.8, 2.6, 4.0, 6.0],  # 5 combos
        "clip_rain_min_frames": [3, 5],                          # x2 = 10
    }  # 10 % 8 != 0 -> exercises padding

    base = {"sample_rate": FS}
    plain = grid_search_vmapped(clips, labels, grid, base_params=base)
    sharded = grid_search_vmapped(clips, labels, grid, base_params=base,
                                  mesh=make_mesh(8))
    assert len(plain) == len(sharded) == 10
    for a, b in zip(plain, sharded):
        assert a["parameters"] == b["parameters"]
        assert a["overall_accuracy"] == b["overall_accuracy"]
        for key in ("tp_classifications", "tn_classifications",
                    "fp_classifications", "fn_classifications"):
            assert a[key] == b[key], (a["parameters"], key)
