"""Headline benchmark: audio-hours/hour/chip through decode -> STFT -> rain
features (north-star target: 500).

Pipeline shape (the production design):
  host: MARK container bytes -> ``parse_mark_audio_file`` (the real container
        decode: header parse + payload alignment + PCM decode) -> int16 batch
  device: int16->float scaling (decode tail), prefilter, STFT, detector
          noise normalization, rain-frame classification, clip aggregates.

Transfers ship int16 (half the bytes of float32) and are double-buffered:
batch k+1 is decoded on the host and placed on device while batch k
computes; only small per-clip outputs (frame classes + counts) come back.

On TPU the run also records Pallas-vs-XLA spectrogram parity
(``pallas_max_rel_dev`` in the JSON) and asserts the <1e-5 BASELINE bound.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
``--quick`` runs a small CPU smoke version.
"""

import argparse
import json
import sys
import time

import numpy as np


def _hbm_in_use(jax) -> int | None:
    """Device memory in use (bytes), when the backend reports it."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        return int(stats.get("bytes_in_use")) if stats else None
    except Exception:
        return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small CPU smoke run")
    ap.add_argument("--alac", action="store_true",
                    help="BASELINE config #2: containers carry real ALAC "
                         "payloads; host decode becomes libavcodec ALAC")
    ap.add_argument("--batch", type=int, default=0, help="fixed batch size (0 = sweep)")
    ap.add_argument("--clip-sec", type=float, default=10.0)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.quick:
        jax.config.update("jax_platforms", "cpu")

    from audio_processing_tools_tpu.config import build_noise_config, DEFAULT_MODE_BANDS
    from audio_processing_tools_tpu.models.spectral_noise import SpectralNoiseEngine
    from audio_processing_tools_tpu.models.frame_classifier import FrameClass
    from audio_processing_tools_tpu.io.mark import (
        parse_mark_audio_file,
        write_mark_audio_file,
    )

    FS = 11162
    cfg = build_noise_config(FS, {
        "detector": {"mode_bands": list(DEFAULT_MODE_BANDS)},
        "classifier_only_mode": True,  # decode -> STFT -> rain features
    })
    eng = SpectralNoiseEngine(cfg)

    clip_len = int(FS * args.clip_sec)
    rng = np.random.default_rng(0)

    def step_fn(pcm_i16):
        # device-side decode tail: int16 -> float32 [-1, 1]
        xb = pcm_i16.astype(jnp.float32) / 32767.0
        out = jax.vmap(lambda x: eng._trace_single(x, FS))(xb)
        fc = out["frame_class"]
        return {
            "rain_frame_count": jnp.sum(
                fc == jnp.int8(FrameClass.RAIN), axis=-1
            ).astype(jnp.int32),
            "mean_rain_conf": jnp.mean(out["rain_conf"], axis=-1),
        }

    step = jax.jit(step_fn)

    file_version = 0
    if args.alac:
        from audio_processing_tools_tpu.io.alac_native import have_alac_shim

        if not have_alac_shim():
            print("# --alac requested but libalac_shim.so unavailable",
                  file=sys.stderr)
            raise SystemExit(2)
        file_version = 1

    def make_mark_batch(B):
        """B synthetic MARK container files (the real on-disk format)."""
        return [
            write_mark_audio_file(
                (rng.standard_normal(clip_len) * 2000).astype(np.int16),
                sample_rate=FS, timestamp=1700000000 + i, device_id=f"DEV{i:05d}",
                file_version=file_version,
            )
            for i in range(B)
        ]

    def decode_batch(files, out=None):
        # host-side container decode: the north-star metric's "decode" stage
        if out is None:
            return np.stack([parse_mark_audio_file(fc)[0] for fc in files])
        for i, fc in enumerate(files):
            out[i] = parse_mark_audio_file(fc)[0]
        return out

    # pipeline depth: keep 2 batches in flight (measured sweet spot on the
    # tunnel: transfer is host-blocking, so depth hides compute + fetch)
    DEPTH = 2

    def run_once(B, iters):
        from concurrent.futures import ThreadPoolExecutor

        mark_batches = [make_mark_batch(B) for _ in range(2)]
        # preallocated decode buffers (first-touch page faults on this host
        # cost seconds per 28 MB; reuse keeps decode at ~35 ms)
        mats = [np.empty((B, clip_len), np.int16) for _ in range(DEPTH + 1)]

        # warm-up: compile + touch every buffer and both file sets
        for j in range(len(mats)):
            r = step(jax.device_put(decode_batch(mark_batches[j % 2], mats[j])))
        np.asarray(r["rain_frame_count"])

        # decode worker: overlap container parsing with the (host-blocking)
        # device_put of the previous batch
        pool = ThreadPoolExecutor(1)
        t0 = time.perf_counter()
        fut = pool.submit(decode_batch, mark_batches[0], mats[0])
        inflight = []
        for i in range(iters):
            m = fut.result()
            if i + 1 < iters:
                fut = pool.submit(
                    decode_batch, mark_batches[(i + 1) % 2],
                    mats[(i + 1) % len(mats)],
                )
            inflight.append(step(jax.device_put(m)))
            while len(inflight) > DEPTH:
                np.asarray(inflight.pop(0)["rain_frame_count"])
        for out in inflight:
            np.asarray(out["rain_frame_count"])
        dt = (time.perf_counter() - t0) / iters
        pool.shutdown()
        return B * args.clip_sec / dt

    if args.quick:
        batches, iters = [args.batch or 4], 2
    elif args.batch:
        batches, iters = [args.batch], args.iters
    else:
        # measured sweet spot on v5e through the axon tunnel: B=128
        batches, iters = [128], args.iters

    best_rate, best_B = 0.0, 0
    for B in batches:
        rate = run_once(B, iters)
        print(f"# batch={B}: {rate:.0f} audio-sec/sec", file=sys.stderr)
        if rate > best_rate:
            best_rate, best_B = rate, B

    # secondary primary metric (BASELINE.md): p50 per-file latency (B=1),
    # container-decode included
    mark1 = make_mark_batch(1)
    r = step(jax.device_put(jnp.asarray(decode_batch(mark1))))
    np.asarray(r["rain_frame_count"])
    lats = []
    for _ in range(5 if not args.quick else 2):
        t0 = time.perf_counter()
        r = step(jax.device_put(jnp.asarray(decode_batch(mark1))))
        np.asarray(r["rain_frame_count"])
        lats.append(time.perf_counter() - t0)
    p50_ms = float(np.median(lats) * 1000)
    print(f"# p50 per-file latency: {p50_ms:.1f} ms", file=sys.stderr)

    # Pallas-vs-XLA spectrogram parity, captured on hardware every run
    # (BASELINE.md bound: <1e-5 normalized max deviation)
    pallas_dev = None
    if jax.default_backend() == "tpu":
        from audio_processing_tools_tpu.ops.spectrogram import spectrogram_power
        from audio_processing_tools_tpu.ops.stft import stft_power

        xv = jnp.asarray(
            (rng.standard_normal((4, FS)) * 0.1).astype(np.float32)
        )
        Pk = np.asarray(jax.jit(
            lambda x: spectrogram_power(x, use_pallas=True))(xv))
        Px = np.asarray(jax.jit(
            lambda x: stft_power(x))(xv))
        pallas_dev = float(np.max(np.abs(Pk - Px)) / np.max(np.abs(Px)))
        print(f"# pallas max rel dev: {pallas_dev:.2e}", file=sys.stderr)
        assert pallas_dev < 1e-5, (
            f"Pallas spectrogram parity regression: {pallas_dev:.2e} >= 1e-5"
        )

    print(json.dumps({
        "metric": ("audio-hours/hour/chip (ALAC decode->STFT->rain features)"
                   if args.alac else
                   "audio-hours/hour/chip (decode->STFT->rain features)"),
        "value": round(best_rate, 1),
        "unit": "audio-hours/hour",
        "vs_baseline": round(best_rate / 500.0, 3),
        "batch": best_B,
        "clip_sec": args.clip_sec,
        "p50_file_latency_ms": round(p50_ms, 1),
        "pallas_max_rel_dev": pallas_dev,
        "codec": "alac" if args.alac else "pcm",
        "hbm_bytes_in_use": _hbm_in_use(jax),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
