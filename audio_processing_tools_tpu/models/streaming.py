"""Streaming chunked rain detection with explicit carried state.

BASELINE config #4 ("streaming edge-style chunked inference: overlapped
frames with stateful noise-floor tracking"): the flagship detector in a
strictly causal, chunk-by-chunk form — the deployment shape of the firmware
(``edge/README.md``: no look-ahead, ``center=False``).

Differences from the offline engine (all inherent to causality):
  * causal framing (``center=False``) instead of librosa center padding,
  * the TD front-end uses a *causal* streaming prefilter (``sosfilt`` with
    carried ``zi``) instead of zero-phase ``filtfilt``,
  * block-energy/peak diagnostics are omitted (they are tuning payloads; the
    TD gate uses the per-frame crest factor, as in the offline default).

The invariant tested is **chunk invariance**: processing a stream in any
chunking (multiples of ``hop``) produces bit-identical outputs to processing
it in one call, because every tracker threads an explicit carry
(:mod:`ops.trackers` carry variants).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from audio_processing_tools_tpu.config import NoiseConfig, build_noise_config
from audio_processing_tools_tpu.models.frame_classifier import (
    FrameClass,
    build_prefilter_sos,
    rain_frame_decision,
)
from audio_processing_tools_tpu.ops.stft import fft_frequencies
from audio_processing_tools_tpu.ops.windows import hann_window
from audio_processing_tools_tpu.ops.filters import sosfilt
from audio_processing_tools_tpu.ops.stats import kurtosis, crest_factor, nan_to_num
from audio_processing_tools_tpu.ops.trackers import (
    make_psd_params,
    noise_psd_track_chunk,
    causal_low_quantile_baseline_chunk,
)


class StreamingRainDetector:
    """Causal chunked rain-frame detector with explicit state threading.

    Usage::

        det = StreamingRainDetector(); det.setup(params)
        state = det.init_state()
        for chunk in hop_multiple_chunks(stream):
            state, out = det.process_chunk(state, chunk)
    """

    def __init__(self, config: Optional[NoiseConfig] = None):
        self.cfg = config
        self._is_setup = config is not None
        if self._is_setup:
            self.cfg.validate()
        self._compiled: Dict[Any, Any] = {}

    def setup(self, params: Dict[str, Any]) -> None:
        if self._is_setup:
            return
        sr = int(params.get("sample_rate", params.get("fs", 11162)))
        self.cfg = build_noise_config(sr, params)
        self.cfg.validate()
        self._is_setup = True

    # ------------------------------------------------------------------
    def _static(self):
        cfg = self.cfg
        sr = cfg.fs
        n_fft, hop = cfg.n_fft, cfg.hop
        freqs = fft_frequencies(sr, n_fft)
        op_lo, op_hi = cfg.operating_band
        band_mask = (freqs >= op_lo) & (freqs <= op_hi)
        band_rows = np.flatnonzero(band_mask)
        freqs_band = freqs[band_mask]
        mode_bands = tuple(
            (float(a), float(b)) for a, b in cfg.dget("mode_bands")
        )
        mode_masks = np.stack(
            [(freqs_band >= lo) & (freqs_band <= hi) for lo, hi in mode_bands]
        )
        fps = float(sr) / float(hop)
        psd_params = make_psd_params(
            cfg_q=cfg.q, win_sec=cfg.win_sec, frames_per_sec=fps,
            ema_up=cfg.ema_up, ema_down=cfg.ema_down, eps=cfg.eps,
            noise_psd_max_ratio=cfg.noise_psd_max_ratio,
            adaptive_q_enable=cfg.adaptive_q_enable,
            adaptive_q_min=cfg.adaptive_q_min,
            adaptive_q_alpha=cfg.adaptive_q_alpha,
        )
        td_mode = str(
            cfg.dget("td_prefilter_mode", cfg.dget("pre_filter_mode", "none"))
        ).lower()
        td_sos = None
        if cfg.dflag("td_apply_input_prefilter", True) and td_mode not in ("", "none"):
            td_sos = build_prefilter_sos(cfg, sr, td_mode)
        return (sr, n_fft, hop, band_rows, mode_masks, fps, psd_params, td_sos)

    def init_state(self) -> Dict[str, Any]:
        """Fresh stream state (all carries at their pre-first-sample values)."""
        cfg = self.cfg
        (sr, n_fft, hop, band_rows, mode_masks, fps, psd_params, td_sos) = (
            self._static()
        )
        K = band_rows.size
        n_modes = mode_masks.shape[0]
        floor = max(float(cfg.dget("mode_flux_norm_min", 1.0)), cfg.eps)
        state: Dict[str, Any] = {
            "raw_tail": jnp.zeros((n_fft - hop,), jnp.float32),
            "td_tail": jnp.zeros((n_fft - hop,), jnp.float32),
            "frame_idx": jnp.int32(0),
            # PSD tracker carry (initialized lazily on the first frame)
            "psd": (
                jnp.zeros((K,), jnp.float32), jnp.zeros((K,), jnp.float32),
                jnp.zeros((K,), jnp.float32), jnp.int32(0), jnp.float32(0),
                jnp.asarray(True),
            ),
            "last_N": jnp.zeros((K,), jnp.float32),
            # flux needs P_det frames at t-1 and t-2
            "pdet_tail": jnp.zeros((2, K), jnp.float32),
            # per-mode + combined baseline carries (flux[0] == 0 -> floor init)
            "mode_base": (
                jnp.full((n_modes,), floor, jnp.float32),
                jnp.full((n_modes,), floor, jnp.float32),
            ),
            "all_base": (jnp.float32(floor), jnp.float32(floor)),
        }
        if td_sos is not None:
            state["td_zi"] = jnp.zeros((td_sos.shape[0], 2), jnp.float32)
        return state

    # ------------------------------------------------------------------
    def _trace_chunk(self, state: Dict[str, Any], chunk: jnp.ndarray
                     ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
        cfg = self.cfg
        (sr, n_fft, hop, band_rows, mode_masks, fps, psd_params, td_sos) = (
            self._static()
        )
        eps = float(cfg.eps)
        chunk = chunk.astype(jnp.float32).reshape(-1)
        n = chunk.shape[-1]
        if n % hop != 0:
            raise ValueError(f"chunk length {n} must be a multiple of hop {hop}")
        T_c = n // hop
        state = dict(state)

        # ---- causal STFT power over this chunk ----
        xa = jnp.concatenate([state["raw_tail"], chunk])
        idx = np.arange(T_c)[:, None] * hop + np.arange(n_fft)[None, :]
        frames = xa[idx]
        w = jnp.asarray(hann_window(n_fft))
        spec = jnp.fft.rfft(frames * w, axis=-1)
        P = (spec.real**2 + spec.imag**2).astype(jnp.float32)  # (T_c, F)
        state["raw_tail"] = xa[-(n_fft - hop):]
        P_band = P[:, band_rows]  # (T_c, K)

        # ---- detector PSD normalization (streaming tracker) ----
        psd_carry = state["psd"]
        tracker, scale, prev_N, wcount, rain_ema, is_first = psd_carry
        first_frame = P_band[0]
        step_floor = float(max(cfg.eps, 1e-9))
        tracker = jnp.where(is_first, jnp.maximum(first_frame, 0.0), tracker)
        scale = jnp.where(
            is_first, jnp.maximum(jnp.abs(first_frame), step_floor), scale
        )
        psd_carry = (tracker, scale, prev_N, wcount, rain_ema, is_first)
        N_band, psd_carry = noise_psd_track_chunk(
            P_band.T, jnp.zeros((T_c,), bool), psd_carry, psd_params
        )
        N_band = N_band.T  # (T_c, K)
        state["psd"] = psd_carry

        # lag by one frame across the stream
        N_lag = jnp.concatenate([state["last_N"][None, :], N_band[:-1]], axis=0)
        N_lag = jnp.where(
            jnp.arange(T_c)[:, None] + state["frame_idx"] == 0,
            N_band[:1], N_lag,
        )  # very first frame uses its own estimate (reference roll semantics)
        maxr = float(np.clip(cfg.noise_psd_max_ratio, 0.0, 1.0))
        N_lag = jnp.minimum(N_lag, maxr * P_band)
        state["last_N"] = N_band[-1]

        P_det = 10.0 * jnp.log10(P_band + eps) - 10.0 * jnp.log10(N_lag + eps)

        # ---- t-vs-(t-2) positive flux with carried frames ----
        hist = jnp.concatenate([state["pdet_tail"], P_det], axis=0)  # (T_c+2, K)
        d2 = jnp.maximum(P_det - hist[:-2], 0.0)  # (T_c, K)
        # global frames 0 and 1 carry zero flux
        gidx = state["frame_idx"] + jnp.arange(T_c)
        d2 = jnp.where((gidx >= 2)[:, None], d2, 0.0)
        state["pdet_tail"] = hist[-2:]

        sel = jnp.asarray(mode_masks.astype(np.float32))     # (n_modes, K)
        mode_flux = jax.lax.dot(d2, sel.T,
                                precision=jax.lax.Precision.HIGHEST)  # (T_c, n_modes)
        flux_all = jnp.sum(mode_flux, axis=-1)               # (T_c,)

        # ---- causal baselines (carried) ----
        norm_min = max(float(cfg.dget("mode_flux_norm_min", 1.0)), eps)
        norm_q = float(np.clip(float(cfg.dget("mode_flux_norm_q", 20.0)), 0, 100))
        win_sec = float(cfg.dget("mode_flux_norm_win_sec", 0.5))
        base_m, carry_m = causal_low_quantile_baseline_chunk(
            mode_flux.T, state["mode_base"], q_percent=norm_q,
            samples_per_sec=fps, win_sec=win_sec, floor=norm_min,
        )
        state["mode_base"] = carry_m
        norm_flux = nan_to_num(
            jnp.maximum(mode_flux.T - base_m, 0.0) / (base_m + norm_min)
        )  # (n_modes, T_c)

        base_a, carry_a = causal_low_quantile_baseline_chunk(
            flux_all, state["all_base"], q_percent=norm_q,
            samples_per_sec=fps, win_sec=win_sec, floor=norm_min,
        )
        state["all_base"] = carry_a
        score_all = nan_to_num(
            jnp.maximum(flux_all - base_a, 0.0) / (base_a + norm_min)
        )

        # ---- TD gate (causal streaming prefilter) ----
        if td_sos is not None:
            x_td_chunk, zi = sosfilt(td_sos, chunk, zi=state["td_zi"])
            state["td_zi"] = zi
        else:
            x_td_chunk = chunk
        ta = jnp.concatenate([state["td_tail"], x_td_chunk])
        td_frames = ta[idx]
        state["td_tail"] = ta[-(n_fft - hop):]
        td_crest = nan_to_num(crest_factor(td_frames, axis=-1, eps=eps))
        td_kurt = kurtosis(td_frames, axis=-1, fisher=False, bias=False)
        td_kurt = nan_to_num(jnp.where(jnp.isfinite(td_kurt), td_kurt, 0.0))

        td_gate_threshold = float(cfg.dget("td_gate_threshold", 2.5))
        gate_mask = td_crest > td_gate_threshold
        tk_up = cfg.dget("td_kurtosis_upper_threshold", None)
        if tk_up is not None:
            gate_mask = gate_mask & (td_kurt <= float(tk_up))
        gate = gate_mask.astype(jnp.float32)

        # ---- decision ----
        legacy12 = float(cfg.dget("new_rain_mode12_flux_min", 2.6))
        is_rain, rain_conf = rain_frame_decision(
            norm_flux[0] * gate, norm_flux[1] * gate, norm_flux[2] * gate,
            norm_flux[3] * gate,
            primary_flux_min=float(cfg.dget("new_rain_primary_flux_min", 1.8)),
            mode1_flux_min=float(cfg.dget("new_rain_mode1_flux_min", legacy12)),
            mode2_flux_min=float(cfg.dget("new_rain_mode2_flux_min", legacy12)),
            mode3_flux_min=float(cfg.dget("new_rain_mode3_flux_min", 3.0)),
            min_support_count=int(cfg.dget("new_rain_min_support_count", 2)),
        )
        noise_conf = jnp.clip(1.0 - rain_conf, 0.0, 1.0)
        weak = (score_all * gate) <= max(
            float(cfg.dget("mode_flux_noise_max", 1.5)), 0.0
        )
        noise_hi = float(cfg.dget("noise_hi", 0.80))
        frame_class = jnp.full((T_c,), int(FrameClass.UNCERTAIN), jnp.int8)
        frame_class = jnp.where(
            (noise_conf >= noise_hi) & weak & (~is_rain),
            jnp.int8(FrameClass.NOISE), frame_class,
        )
        frame_class = jnp.where(is_rain, jnp.int8(FrameClass.RAIN), frame_class)

        times = (state["frame_idx"] + jnp.arange(T_c)).astype(jnp.float32) * (
            hop / float(sr)
        )
        state["frame_idx"] = state["frame_idx"] + T_c

        out = {
            "frame_class": frame_class,
            "rain_conf": rain_conf,
            "noise_conf": noise_conf,
            "times": times,
            "td_crest_factor": td_crest,
            "td_kurtosis": td_kurt,
            "normalized_mode_flux_by_mode": norm_flux,
            "mode_flux_score": score_all,
            "noise_psd_band": N_band,
        }
        return state, out

    # ------------------------------------------------------------------
    def process_chunk(self, state: Dict[str, Any], chunk) -> Tuple[Dict[str, Any],
                                                                   Dict[str, Any]]:
        """Process one chunk (length a multiple of ``hop``); returns
        ``(new_state, outputs)`` with NumPy-convertible device arrays."""
        chunk = jnp.asarray(np.asarray(chunk, np.float32).reshape(-1))
        key = int(chunk.shape[-1])
        fn = self._compiled.get(key)
        if fn is None:
            fn = jax.jit(self._trace_chunk)
            self._compiled[key] = fn
        return fn(state, chunk)

    # ------------------------------------------------------------------
    def init_state_batch(self, n_streams: int) -> Dict[str, Any]:
        """Stacked fresh state for ``n_streams`` independent live streams."""
        one = self.init_state()
        return jax.tree_util.tree_map(
            lambda a: jnp.repeat(jnp.asarray(a)[None], int(n_streams), axis=0),
            one,
        )

    def process_chunk_batch(self, state: Dict[str, Any], chunks
                            ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
        """Process one hop-multiple chunk from EACH of B live streams as a
        single vmapped device program — the multi-stream serving fast path
        (per-stream results are bit-identical to ``process_chunk``).

        ``chunks``: (B, L) with one chunk per stream (same L — lockstep
        batching; servers coalesce connections that have a full chunk
        pending).  ``state`` comes from :meth:`init_state_batch` (or
        stacked per-stream states).
        """
        chunks = jnp.asarray(np.asarray(chunks, np.float32))
        if chunks.ndim != 2:
            raise ValueError("chunks must be (n_streams, chunk_len)")
        key = ("batch", int(chunks.shape[0]), int(chunks.shape[-1]))
        fn = self._compiled.get(key)
        if fn is None:
            fn = jax.jit(jax.vmap(self._trace_chunk))
            self._compiled[key] = fn
        return fn(state, chunks)

    def process_stream(self, x, chunk_sec: float = 2.0) -> Dict[str, np.ndarray]:
        """Convenience: run a whole recording through fixed-size chunks."""
        cfg = self.cfg
        hop = cfg.hop
        chunk_len = max(hop, int(cfg.fs * chunk_sec) // hop * hop)
        x = np.asarray(x, np.float32).reshape(-1)
        usable = x.size // hop * hop
        state = self.init_state()
        outs = []
        for start in range(0, usable, chunk_len):
            piece = x[start : min(start + chunk_len, usable)]
            if piece.size % hop:
                piece = piece[: piece.size // hop * hop]
            if piece.size == 0:
                break
            state, out = self.process_chunk(state, piece)
            outs.append(jax.tree_util.tree_map(np.asarray, out))
        cat = {
            k: np.concatenate([o[k] for o in outs],
                              axis=-1 if outs[0][k].ndim == 1 else
                              (1 if k == "normalized_mode_flux_by_mode" else 0))
            for k in outs[0]
        }
        return cat
