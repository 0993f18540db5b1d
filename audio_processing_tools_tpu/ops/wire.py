"""Companded wire formats for host->device PCM transfer.

The measured bottleneck of the ingest pipeline on this deployment is the
host->device link, not the chip (BENCH_r03: 505 ms H2D vs 42 ms compute per
28.6 MB batch).  The wire already ships int16 (half of float32); this module
adds the next lever: **mu-law int8** — half of int16 again — with the
expansion done ON DEVICE as part of the jitted decode tail, so the link
carries 1 byte/sample and the MXU path still sees float32.

Encode (host, producer side — the bench pipeline, or the edge device in the
serving story) is a single 65536-entry table gather per sample; decode
(device) is a closed-form ``expm1`` over the batch, fused by XLA into the
int->float decode tail it replaces.

Quality: mu-law (mu=255, the G.711 companding curve at 8-bit) keeps ~38 dB
SQNR on full-scale signals; detection parity vs the int16 wire is pinned
corpus-wide in ``tests/test_wire.py`` (identical clip decisions on both
labeled corpora) and the headline-vs-mu-law agreement is re-checked on
hardware by ``bench.py``.

No reference counterpart (the reference reads S3 files on the host it
computes on); this is transport engineering for the TPU deployment.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

MU = 255.0
_LOG1P_MU = float(np.log1p(MU))

_ENC_LUT: np.ndarray | None = None


def _encode_lut() -> np.ndarray:
    """int8 mu-law code for every uint16-viewed int16 sample value."""
    global _ENC_LUT
    if _ENC_LUT is None:
        idx = np.arange(65536, dtype=np.uint16).view(np.int16)
        x = idx.astype(np.float64) / 32768.0
        y = np.sign(x) * np.log1p(MU * np.abs(x)) / _LOG1P_MU
        _ENC_LUT = np.round(y * 127.0).astype(np.int8)
    return _ENC_LUT


# Encode in ~1 MB slabs rather than one monolithic gather.  Two reasons,
# both measured on this host: (1) the slab + its LUT stay cache-resident
# (~47 ms vs 80 ms for a 28.6 MB batch standalone); (2) each np.take holds
# the GIL only ~1.5 ms, so the encode interleaves with the axon tunnel
# client instead of stalling behind it — a monolithic gather measured
# 717 ms inside the transfer-pipelined bench loop (the tunnel client
# starves long GIL holders), the slabbed one ~50 ms, flipping the mu-law
# wire from 0.5x to ~1.8x the int16 headline.
_ENC_SLAB = 1 << 19  # samples per slab (= 1 MB of int16 source)


def mulaw_encode(pcm_i16: np.ndarray, out: np.ndarray | None = None
                 ) -> np.ndarray:
    """int16 PCM -> mu-law int8 codes in [-127, 127] (slabbed table gather)."""
    pcm_i16 = np.ascontiguousarray(pcm_i16, dtype=np.int16)
    lut = _encode_lut()
    if out is None:
        out = np.empty(pcm_i16.shape, np.int8)
    elif not out.flags.c_contiguous:
        # reshape(-1) on a strided target would gather into a copy and drop
        # the writes; fall back to the monolithic path for exotic outputs
        out[...] = lut[pcm_i16.view(np.uint16)]
        return out
    src = pcm_i16.view(np.uint16).reshape(-1)
    dst = out.reshape(-1)
    for i in range(0, src.size, _ENC_SLAB):
        np.take(lut, src[i:i + _ENC_SLAB], out=dst[i:i + _ENC_SLAB])
    return out


def mulaw_decode(codes_i8) -> jnp.ndarray:
    """Device-side expansion: mu-law int8 codes -> float32 in [-1, 1].

    Pure elementwise math (``expm1``), so XLA fuses it into the consuming
    program exactly like the int16 ``astype/scale`` tail it replaces.
    """
    y = codes_i8.astype(jnp.float32) * (1.0 / 127.0)
    return jnp.sign(y) * jnp.expm1(jnp.abs(y) * _LOG1P_MU) * (1.0 / MU)


def mulaw_decode_np(codes_i8: np.ndarray) -> np.ndarray:
    """NumPy twin of :func:`mulaw_decode` (host-side oracle/tests)."""
    y = codes_i8.astype(np.float32) * (1.0 / 127.0)
    return np.sign(y) * np.expm1(np.abs(y) * _LOG1P_MU) * (1.0 / MU)


# ---------------------------------------------------------------------------
# Block-scaled int4 wire (the lever past mu-law: 4.25 bits/sample)
#
# MEASURED AND REJECTED for the detection product: at ~19 dB SQNR (vs
# mu-law's ~38 dB) the quantization noise moves clip decisions — 1/24
# flips on the easy labeled corpus and 7/32 on the near-threshold hard
# corpus (vs mu-law's 0 and 1; tests/test_wire.py pins the comparison).
# Kept as an opt-in experimental codec for bandwidth-over-accuracy
# deployments; the supported low-rate wire is mu-law.
# ---------------------------------------------------------------------------

BLK4 = 64  # samples per scale block -> 4 + 16/64 = 4.25 bits/sample


def block4_encode(pcm_i16: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """int16 PCM -> (packed uint8 codes (..., n/2), uint16 scales (..., n/64)).

    Per 64-sample block: scale = max|x| (uint16), codes = round(x/scale * 7)
    in [-7, 7], two codes per byte (lo nibble first).  ~53% of the mu-law
    wire's bytes.  The trailing partial block must not exist: n must be a
    multiple of 64 (the bench/serving chunk geometries all are).
    """
    x = np.ascontiguousarray(pcm_i16, dtype=np.int16)
    n = x.shape[-1]
    if n % BLK4:
        raise ValueError(f"length {n} must be a multiple of {BLK4}")
    xb = x.reshape(x.shape[:-1] + (n // BLK4, BLK4)).astype(np.int32)
    scale = np.max(np.abs(xb), axis=-1).astype(np.uint16)  # (..., n/64)
    s = np.maximum(scale, 1).astype(np.float32)[..., None]
    q = np.rint(xb.astype(np.float32) * (7.0 / s)).astype(np.int8)
    qu = (q + 8).astype(np.uint8).reshape(x.shape[:-1] + (n,))
    packed = (qu[..., 0::2] | (qu[..., 1::2] << 4)).astype(np.uint8)
    return packed, scale


def block4_decode(packed, scales) -> jnp.ndarray:
    """Device-side expansion: packed int4 + block scales -> float32 [-1, 1].

    Elementwise unpack + broadcast multiply; XLA fuses it into the decode
    tail like :func:`mulaw_decode`.
    """
    lo = (packed & 0xF).astype(jnp.int32) - 8
    hi = (packed >> 4).astype(jnp.int32) - 8
    q = jnp.stack([lo, hi], axis=-1).reshape(packed.shape[:-1] + (-1,))
    nb = scales.shape[-1]
    qb = q.reshape(q.shape[:-1] + (nb, BLK4)).astype(jnp.float32)
    s = scales.astype(jnp.float32)[..., None] * (1.0 / (7.0 * 32768.0))
    return (qb * s).reshape(q.shape)


def block4_decode_np(packed: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """NumPy twin of :func:`block4_decode` (host-side oracle/tests)."""
    lo = (packed & 0xF).astype(np.int32) - 8
    hi = (packed >> 4).astype(np.int32) - 8
    q = np.stack([lo, hi], axis=-1).reshape(packed.shape[:-1] + (-1,))
    nb = scales.shape[-1]
    qb = q.reshape(q.shape[:-1] + (nb, BLK4)).astype(np.float32)
    s = scales.astype(np.float32)[..., None] * (1.0 / (7.0 * 32768.0))
    return (qb * s).reshape(q.shape)
