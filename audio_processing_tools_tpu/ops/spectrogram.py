"""Fused Pallas spectrogram kernel: frame -> window -> DFT -> power.

The north-star fusion (BASELINE.md): one kernel maps the STFT power
spectrogram onto the MXU by expressing the windowed rFFT as a matmul.

Key idea: for ``hop = n_fft/2`` the frames of a signal are adjacent pairs of
hop-sized blocks, so a (T, n_fft) frame matrix is just a reshape+concat of
the input tile — no gather.  The window folds into the DFT matrix:

    W_cat = [diag(w) @ C  |  diag(w) @ S]   with  C[k, f] = cos(-2 pi k f/N),
                                                  S[k, f] = sin(-2 pi k f/N)

so   Y = frames @ W_cat  -> (T, 2 n_fft)  on the MXU (one f32 matmul), and
    P[t, f] = Y[t, f]^2 + Y[t, n_fft + f]^2.

FLOP cost is ~13x a radix-2 FFT, but the work lands on the 128x128 systolic
array instead of the VPU and fuses windowing + power, so the kernel is HBM-
bound: read ~4 B/sample, write F*4/hop B/sample.

This kernel requires ``hop * 2 == n_fft`` (the stack's 256/128 default).
``spectrogram_power`` handles librosa-parity center padding and falls back
to the XLA rFFT path on non-TPU backends or non-matching geometry.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from audio_processing_tools_tpu.ops.windows import hann_window
from audio_processing_tools_tpu.ops.stft import stft_power


def _dft_matrix(n_fft: int) -> np.ndarray:
    """(n_fft, 2*n_fft) fused window+DFT matrix [w*cos | w*sin], float32."""
    k = np.arange(n_fft)[:, None].astype(np.float64)
    f = np.arange(n_fft)[None, :].astype(np.float64)
    ang = -2.0 * np.pi * k * f / n_fft
    w = hann_window(n_fft, dtype=np.float64)[:, None]
    cat = np.concatenate([w * np.cos(ang), w * np.sin(ang)], axis=1)
    return cat.astype(np.float32)


def _power_kernel(a_ref, b_ref, w_ref, out_ref):
    """One (frames_tile, n_fft) -> (frames_tile, n_fft) power tile.

    Frame t = (hop-block t, hop-block t+1); the two halves arrive as aligned
    refs and the concat folds into the matmul:
    ``frames @ W == first_half @ W[:hop] + second_half @ W[hop:]``
    (two MXU matmuls; Mosaic cannot concatenate sublane-offset slices).
    """
    hop = a_ref.shape[-1]
    # HIGHEST precision: full-f32 MXU passes so the spectrogram meets the
    # <1e-5 parity bound (default bf16 passes deviate ~2e-3)
    y = jnp.dot(a_ref[0], w_ref[:hop, :], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    y = y + jnp.dot(b_ref[0], w_ref[hop:, :], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    n = w_ref.shape[1] // 2
    out_ref[0] = y[:, :n] ** 2 + y[:, n:] ** 2


@partial(jax.jit, static_argnames=("n_fft", "hop", "frames_tile", "interpret"))
def _pallas_power(x_blocks: jnp.ndarray, n_fft: int, hop: int,
                  frames_tile: int = 256, interpret: bool = False) -> jnp.ndarray:
    """x_blocks: (B, n_blocks, hop) with n_blocks = T + 1; returns (B, T, n_fft)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n_blocks, _ = x_blocks.shape
    T = n_blocks - 1
    n_tiles = -(-T // frames_tile)
    pad_frames = n_tiles * frames_tile - T
    # aligned non-overlapping views: frame t = (blocks[t], blocks[t+1])
    first = x_blocks[:, :-1, :]
    second = x_blocks[:, 1:, :]
    if pad_frames:
        first = jnp.pad(first, ((0, 0), (0, pad_frames), (0, 0)))
        second = jnp.pad(second, ((0, 0), (0, pad_frames), (0, 0)))

    W = jnp.asarray(_dft_matrix(n_fft))

    out = pl.pallas_call(
        _power_kernel,
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * frames_tile, n_fft),
                                       jnp.float32),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, frames_tile, hop), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, frames_tile, hop), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, 2 * n_fft), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, frames_tile, n_fft), lambda b, t: (b, t, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(first, second, W)
    return out[:, :T, :]


def _kernel_shape_ok(n_fft: int, hop: int) -> bool:
    return hop * 2 == n_fft and n_fft % 128 == 0


def _kernel_applicable(n_fft: int, hop: int) -> bool:
    return _kernel_shape_ok(n_fft, hop) and jax.default_backend() == "tpu"


def spectrogram_power(x: jnp.ndarray, n_fft: int = 256, hop: int = 128,
                      center: bool = True, use_pallas: bool | None = None,
                      interpret: bool = False) -> jnp.ndarray:
    """|STFT|^2 -> (..., 1 + n_fft//2, T); fused Pallas path on TPU.

    Matches :func:`audio_processing_tools_tpu.ops.stft.stft_power` to float32
    matmul precision.  ``use_pallas=None`` auto-selects *per lowering
    platform* (``jax.lax.platform_dependent``): the Pallas path on TPU, the
    XLA rfft path elsewhere — so the same traced engine works when jitted
    for the CPU backend inside a TPU-default process (the bench's CPU/TPU
    agreement canary does exactly that; Pallas cannot lower on CPU).
    """
    if use_pallas is None:
        if _kernel_shape_ok(n_fft, hop):
            from jax.lax import platform_dependent

            return platform_dependent(
                jnp.asarray(x, jnp.float32),
                tpu=lambda v: _spectrogram_pallas(
                    v, n_fft=n_fft, hop=hop, center=center,
                    interpret=interpret),
                default=lambda v: stft_power(v, n_fft=n_fft, hop=hop,
                                             center=center),
            )
        return stft_power(x, n_fft=n_fft, hop=hop, center=center)
    if not use_pallas:
        return stft_power(x, n_fft=n_fft, hop=hop, center=center)
    return _spectrogram_pallas(x, n_fft=n_fft, hop=hop, center=center,
                               interpret=interpret)


def _spectrogram_pallas(x: jnp.ndarray, *, n_fft: int, hop: int,
                        center: bool, interpret: bool) -> jnp.ndarray:
    x = jnp.asarray(x, jnp.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
    orig_batch = x.shape[:-1]
    x = x.reshape((-1, x.shape[-1]))
    n = x.shape[-1]

    if center:
        pad = n_fft // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)))
        n = n + 2 * pad
    T = 1 + (n - n_fft) // hop

    # hop-aligned blocks; frame t = blocks[t] ++ blocks[t+1]
    n_blocks = T + 1
    need = n_blocks * hop
    if need > n:
        x = jnp.pad(x, ((0, 0), (0, need - n)))
    x_blocks = x[:, : n_blocks * hop].reshape(x.shape[0], n_blocks, hop)

    P_full = _pallas_power(x_blocks, n_fft, hop, interpret=interpret)
    P = jnp.swapaxes(P_full[..., : 1 + n_fft // 2], -1, -2)  # (B, F, T)
    P = P.reshape(orig_batch + P.shape[1:])
    if squeeze:
        P = P[0]
    return P
