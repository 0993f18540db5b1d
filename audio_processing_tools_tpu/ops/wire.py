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
