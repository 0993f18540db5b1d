"""Time-axis sharding (sequence parallelism) equals the unsharded causal path."""

import numpy as np
import pytest
import jax.numpy as jnp

from audio_processing_tools_tpu.parallel import make_mesh
from audio_processing_tools_tpu.parallel.sequence import (
    sequence_sharded_stft_power,
    sequence_sharded_band_flux,
)
from audio_processing_tools_tpu.ops.stft import stft_power, fft_frequencies

FS = 11162
HOP, NFFT = 128, 256


def _signal(rng, n):
    x = 0.01 * rng.standard_normal(n)
    for t0 in rng.integers(2000, n - 2000, 20):
        k = np.arange(800)
        x[t0 : t0 + 800] += 0.5 * np.exp(-k / 60.0) * np.sin(2 * np.pi * 520 * k / FS)
    return x.astype(np.float32)


def test_sequence_sharded_stft_matches_unsharded(rng):
    mesh = make_mesh(8)
    n = 8 * HOP * 64  # 65536 samples
    x = _signal(rng, n)
    P_sharded = np.asarray(sequence_sharded_stft_power(jnp.asarray(x), mesh))
    P_ref = np.asarray(stft_power(jnp.asarray(x), center=False))
    assert P_sharded.shape == P_ref.shape
    np.testing.assert_allclose(P_sharded, P_ref, atol=1e-5 * P_ref.max())


def test_sequence_sharded_flux_matches_unsharded(rng):
    mesh = make_mesh(8)
    n = 8 * HOP * 64
    x = _signal(rng, n)
    out = sequence_sharded_band_flux(jnp.asarray(x), mesh, fs=FS)
    flux = np.asarray(out["mode_flux"])
    Pb = np.asarray(out["band_power"])

    # unsharded oracle
    P_ref = np.asarray(stft_power(jnp.asarray(x), center=False))
    freqs = fft_frequencies(FS, NFFT)
    band = (freqs >= 400) & (freqs <= 3500)
    Pb_ref = P_ref[band]
    np.testing.assert_allclose(Pb, Pb_ref, atol=1e-5 * Pb_ref.max())

    T = Pb_ref.shape[1]
    d2 = np.zeros_like(Pb_ref)
    d2[:, 2:] = np.maximum(Pb_ref[:, 2:] - Pb_ref[:, :-2], 0.0)
    bands = ((450, 650), (800, 1050), (1500, 1800), (2350, 2550), (3150, 3350))
    fb = freqs[band]
    ref_flux = np.stack([d2[(fb >= lo) & (fb <= hi)].sum(0) for lo, hi in bands])
    np.testing.assert_allclose(flux, ref_flux, atol=1e-4 * max(ref_flux.max(), 1))


def test_sequence_sharded_length_validation(rng):
    mesh = make_mesh(8)
    import pytest

    with pytest.raises(ValueError):
        sequence_sharded_stft_power(jnp.zeros(1000, jnp.float32), mesh)


def test_batch_sequence_2d_mesh_matches_unsharded(rng):
    """Composite DP x SP: (files=2, seq=4) mesh equals per-clip unsharded."""
    import jax
    from jax.sharding import Mesh
    from audio_processing_tools_tpu.parallel.sequence import (
        batch_sequence_sharded_stft_power,
    )

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("files", "seq"))
    n = 4 * HOP * 32
    xb = np.stack([_signal(rng, n), _signal(rng, n)])
    P2d = np.asarray(batch_sequence_sharded_stft_power(jnp.asarray(xb), mesh))
    for i in range(2):
        P_ref = np.asarray(stft_power(jnp.asarray(xb[i]), center=False))
        assert P2d[i].shape == P_ref.shape
        np.testing.assert_allclose(P2d[i], P_ref, atol=1e-5 * P_ref.max())


def test_batch_sequence_2d_mesh_validation(rng):
    import jax
    from jax.sharding import Mesh
    from audio_processing_tools_tpu.parallel.sequence import (
        batch_sequence_sharded_stft_power,
    )

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("files", "seq"))
    with pytest.raises(ValueError, match="batch"):
        batch_sequence_sharded_stft_power(jnp.zeros((3, 4 * HOP * 8)), mesh)
    with pytest.raises(ValueError, match="multiple"):
        batch_sequence_sharded_stft_power(jnp.zeros((2, 4 * HOP * 8 + 1)), mesh)


@pytest.mark.parametrize("draw", range(4))
def test_sequence_sharded_stft_geometry_fuzz(draw):
    """Seeded fuzz over (n_fft, hop, shard count, length): the ring-halo
    sequence-parallel STFT must equal the unsharded causal STFT for any
    geometry, not just the default 256/128 on 8 shards."""
    prng = np.random.default_rng(600 + draw)
    n_fft = int(prng.choice([128, 256, 512]))
    hop = int(prng.choice([n_fft // 4, n_fft // 2]))
    n_dev = int(prng.choice([2, 4, 8]))
    mesh = make_mesh(n_dev)
    # long enough for _signal's ping placement (needs n > 4000) at the
    # smallest (n_dev=2, hop=32) geometry
    n = n_dev * hop * int(prng.integers(80, 160))
    x = _signal(prng, n)
    P_sharded = np.asarray(sequence_sharded_stft_power(
        jnp.asarray(x), mesh, n_fft=n_fft, hop=hop))
    P_ref = np.asarray(stft_power(jnp.asarray(x), n_fft=n_fft, hop=hop,
                                  center=False))
    assert P_sharded.shape == P_ref.shape, (n_fft, hop, n_dev, n)
    np.testing.assert_allclose(
        P_sharded, P_ref, atol=1e-5 * P_ref.max(),
        err_msg=f"n_fft={n_fft} hop={hop} devs={n_dev} n={n}",
    )
