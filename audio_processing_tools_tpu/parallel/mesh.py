"""Device mesh + sharded execution of the flagship pipeline.

Design (scaling-book recipe): pick a mesh, annotate shardings, let XLA insert
the collectives.

  * ``files`` axis: data parallelism over clips — each device runs the full
    engine on its shard of the batch (the audio analogue of DP).  This is
    embarrassingly parallel; XLA inserts no communication for the per-clip
    outputs.
  * Corpus aggregates (rain-frame counters, accuracy counts, noise-floor
    means — the reference's ``pd.concat``/upsert "collectives") are reduced
    in-graph to replicated scalars; XLA lowers the reduction to an
    ``all-reduce`` over ICI.

For very long single recordings the time axis can additionally be sharded
(sequence parallelism): the engine's carries (noise trackers) are small, so
a ``ppermute`` halo/carry handoff is cheap — see ``models.band_noise`` for
the chunked-state streaming form this builds on.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audio_processing_tools_tpu.config import build_noise_config
from audio_processing_tools_tpu.models.spectral_noise import SpectralNoiseEngine
from audio_processing_tools_tpu.models.frame_classifier import FrameClass


def make_mesh(n_devices: Optional[int] = None, axis: str = "files") -> Mesh:
    """1-D mesh over available devices (pad-free: uses first n)."""
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devs)} available"
            )
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(xb: np.ndarray, mesh: Mesh, axis: str = "files"):
    """Place a (B, N) batch sharded over the mesh's file axis.

    Single-process: ``xb`` is the global batch. Multi-process (multi-host
    slice): ``xb`` is this host's *local* rows — every process contributes
    its equal-sized shard of the global array (DCN-free; data never leaves
    the host that loaded it).
    """
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(
            sharding, np.ascontiguousarray(np.asarray(xb, np.float32))
        )
    return jax.device_put(jnp.asarray(xb, jnp.float32), sharding)


def local_rows(a) -> np.ndarray:
    """This host's rows of an axis-0-sharded global array, in order."""
    shards = sorted(
        a.addressable_shards,
        key=lambda s: (s.index[0].start or 0) if s.index else 0,
    )
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


class ShardedRainPipeline:
    """A batched engine step, pjit-sharded over a ``files`` mesh axis.

    ``step(xb)`` returns per-clip outputs (sharded) plus replicated corpus
    aggregates — the multi-chip equivalent of
    ``process_audio_batches_v2``'s per-batch collection + ``pd.concat``.

    ``model`` selects the engine: ``"spectral"`` (flagship detector,
    default), ``"roe"`` (legacy harmonic-novelty classifier), or
    ``"band_noise"`` (streaming firmware-shaped estimator) — every engine
    family runs fleet-sharded through the same step contract.
    """

    def __init__(self, params: Dict[str, Any], mesh: Mesh, axis: str = "files",
                 model: str = "spectral"):
        if model not in ("spectral", "roe", "band_noise"):
            raise ValueError(f"unknown model {model!r}")
        self.model = model
        sr = int(params.get("sample_rate", params.get("fs", 11162)))
        self.sr = sr
        self.mesh = mesh
        self.axis = axis
        self.params = dict(params)
        self.clip_rain_min_frames = max(1, int(params.get("clip_rain_min_frames", 1)))
        if model == "spectral":
            self.cfg = build_noise_config(sr, params)
            self.cfg.validate()
            self._engine = SpectralNoiseEngine(self.cfg)
        elif model == "roe":
            from audio_processing_tools_tpu.models.roe import build_roe_config

            self.cfg = build_roe_config(
                **{**params, "return_spectra": False}
            )
        else:
            from audio_processing_tools_tpu.models.band_noise import (
                build_band_noise_config,
            )

            self.cfg = build_band_noise_config(params)
            self.cfg.validate()
        self._compiled: Dict[Any, Any] = {}

    # ------------------------------------------------------------------
    def _traced_step(self, xb: jnp.ndarray) -> Dict[str, Any]:
        if self.model == "roe":
            return self._traced_step_roe(xb)
        if self.model == "band_noise":
            return self._traced_step_band_noise(xb)
        single = lambda x: self._engine._trace_single(x, self.sr)
        out = jax.vmap(single)(xb)

        frame_class = out["frame_class"]          # (B, T)
        rain_conf = out["rain_conf"]
        is_rain = frame_class == jnp.int8(FrameClass.RAIN)
        rain_frame_count = jnp.sum(is_rain, axis=-1)            # (B,)
        clip_rain_fraction = jnp.mean(is_rain.astype(jnp.float32), axis=-1)
        clip_is_rain = rain_frame_count >= self.clip_rain_min_frames

        per_clip = {
            "frame_class": frame_class,
            "rain_conf": rain_conf,
            "noise_conf": out["noise_conf"],
            "rain_frame_count": rain_frame_count,
            "clip_rain_fraction": clip_rain_fraction,
            "clip_is_rain": clip_is_rain,
        }
        if "mean_noise_floor_db" in out:
            per_clip["mean_noise_floor_db"] = out["mean_noise_floor_db"]

        # corpus aggregates -> replicated scalars (ICI all-reduce)
        aggregates = {
            "total_rain_frames": jnp.sum(rain_frame_count),
            "total_rain_clips": jnp.sum(clip_is_rain.astype(jnp.int32)),
            "total_clips": jnp.asarray(xb.shape[0], jnp.int32),
            "mean_rain_fraction": jnp.mean(clip_rain_fraction),
        }
        return {"per_clip": per_clip, "aggregates": aggregates}

    def _traced_step_roe(self, xb: jnp.ndarray) -> Dict[str, Any]:
        from audio_processing_tools_tpu.models.roe import _roe_traced

        n = int(xb.shape[-1])
        out = jax.vmap(lambda x: _roe_traced(x, self.cfg, n))(xb)
        mod = out["rain_drop_count_mod"]
        per_clip = {
            "rain_drop_count_mod": mod,
            "rain_drop_count": out["rain_drop_count"],
            "rain_peaks_count": out["rain_peaks_count"],
            "frain_mean": out["frain_mean"],
            "clip_is_rain": mod > 0,
        }
        aggregates = {
            "total_rain_clips": jnp.sum((mod > 0).astype(jnp.int32)),
            "total_drops": jnp.sum(mod),
            "total_clips": jnp.asarray(xb.shape[0], jnp.int32),
        }
        return {"per_clip": per_clip, "aggregates": aggregates}

    def _traced_step_band_noise(self, xb: jnp.ndarray) -> Dict[str, Any]:
        from audio_processing_tools_tpu.models.band_noise import (
            band_noise_process,
        )

        out = jax.vmap(lambda x: band_noise_process(x, self.cfg))(xb)
        fft_rain_frac = jnp.mean(
            out["fft_rain_frame"].astype(jnp.float32), axis=-1)
        median_N_E = jnp.median(out["N_E"], axis=-1)
        per_clip = {
            "fft_rain_fraction": fft_rain_frac,
            "median_N_E": median_N_E,
            "median_G": jnp.median(out["G_mag"], axis=-1),
            "clip_is_rain": fft_rain_frac > 0.05,
        }
        aggregates = {
            "total_rain_clips": jnp.sum(
                per_clip["clip_is_rain"].astype(jnp.int32)),
            "mean_noise_energy": jnp.mean(median_N_E),
            "total_clips": jnp.asarray(xb.shape[0], jnp.int32),
        }
        return {"per_clip": per_clip, "aggregates": aggregates}

    def _get_fn(self, shape):
        fn = self._compiled.get(shape)
        if fn is None:
            data_sharding = NamedSharding(self.mesh, P(self.axis))
            repl = NamedSharding(self.mesh, P())
            out_shardings = {
                "per_clip": jax.tree_util.tree_map(
                    lambda _: data_sharding, self._out_structure(shape)["per_clip"]
                ),
                "aggregates": jax.tree_util.tree_map(
                    lambda _: repl, self._out_structure(shape)["aggregates"]
                ),
            }
            fn = jax.jit(
                self._traced_step,
                in_shardings=(data_sharding,),
                out_shardings=out_shardings,
            )
            self._compiled[shape] = fn
        return fn

    def _out_structure(self, shape):
        return jax.eval_shape(
            self._traced_step, jax.ShapeDtypeStruct(shape, jnp.float32)
        )

    # ------------------------------------------------------------------
    def step(self, xb) -> Dict[str, Any]:
        """One sharded batch step.

        Single-process: ``xb`` is the global (B, N) batch. Multi-process:
        ``xb`` is this host's local rows, and every host must call ``step``
        with the SAME local row count (the global batch is the processes'
        shards concatenated). Batches are silence-padded to the device
        count; per-clip outputs stay sharded (use :func:`local_rows` to read
        this host's rows), aggregates come back replicated.
        """
        if jax.process_count() > 1:
            n_pad_to = sum(
                d.process_index == jax.process_index()
                for d in self.mesh.devices.flat
            )
            if n_pad_to == 0:
                raise ValueError(
                    "this process owns no devices in the mesh; every "
                    "participating host must contribute devices (and rows)"
                )
        else:
            n_pad_to = self.mesh.devices.size
        B = xb.shape[0]
        if B % n_pad_to != 0:
            pad = n_pad_to - (B % n_pad_to)
            xb = np.concatenate([xb, np.zeros((pad,) + xb.shape[1:], xb.dtype)])
        xb_dev = shard_batch(xb, self.mesh, self.axis)
        out = self._get_fn(xb_dev.shape)(xb_dev)
        return out

    def run_corpus(self, clips: np.ndarray, batch: int = 32) -> Dict[str, Any]:
        """Process a corpus in sharded batches and fold aggregates."""
        totals = {"total_rain_frames": 0, "total_rain_clips": 0, "total_clips": 0}
        per_clip_parts = []
        n = clips.shape[0]
        for i in range(0, n, batch):
            out = self.step(clips[i : i + batch])
            real = min(batch, n - i)
            pc = jax.tree_util.tree_map(
                lambda a: np.asarray(a)[:real], out["per_clip"]
            )
            per_clip_parts.append(pc)
            totals["total_rain_frames"] += int(
                np.asarray(pc["rain_frame_count"]).sum()
            )
            totals["total_rain_clips"] += int(np.asarray(pc["clip_is_rain"]).sum())
            totals["total_clips"] += real
        merged = {
            k: np.concatenate([p[k] for p in per_clip_parts])
            for k in per_clip_parts[0]
        }
        return {"per_clip": merged, "aggregates": totals}
