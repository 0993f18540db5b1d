"""Headline benchmark: audio-hours/hour/chip through decode -> STFT -> rain
features (the project north-star metric; baseline target 500).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Run on the real TPU by default; ``--quick`` runs a small CPU smoke version.
"""

import argparse
import json
import sys
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small CPU smoke run")
    ap.add_argument("--batch", type=int, default=0, help="fixed batch size (0 = sweep)")
    ap.add_argument("--clip-sec", type=float, default=10.0)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax

    if args.quick:
        jax.config.update("jax_platforms", "cpu")

    from audio_processing_tools_tpu.config import DEFAULT_MODE_BANDS
    from audio_processing_tools_tpu.models.spectral_noise import SpectralNoiseEngine
    from audio_processing_tools_tpu.io.audio import safe_to_float

    FS = 11162
    eng = SpectralNoiseEngine()
    eng.setup({
        "sample_rate": FS,
        "detector": {"mode_bands": list(DEFAULT_MODE_BANDS)},
        "classifier_only_mode": True,  # decode -> STFT -> rain features
    })

    clip_len = int(FS * args.clip_sec)
    rng = np.random.default_rng(0)

    def make_batch(B):
        # int16 "decoded sensor PCM" -> float (the decode stage is host-side)
        pcm = (rng.standard_normal((B, clip_len)) * 2000).astype(np.int16)
        return pcm

    def run_once(B, iters):
        pcm = make_batch(B)
        # warm-up / compile
        xb = np.stack([safe_to_float(row) for row in pcm])
        out = eng.process_batch(xb)
        np.asarray(out["frame_class"])
        t0 = time.perf_counter()
        for _ in range(iters):
            xb = np.stack([safe_to_float(row) for row in pcm])  # decode stage
            out = eng.process_batch(xb)
            np.asarray(out["frame_class"])  # force completion
        dt = (time.perf_counter() - t0) / iters
        return B * args.clip_sec / dt  # audio-seconds per wall-second

    if args.quick:
        batches = [args.batch or 4]
        iters = 1
    elif args.batch:
        batches = [args.batch]
        iters = args.iters
    else:
        batches = [16, 32, 64]
        iters = args.iters

    best_rate = 0.0
    best_B = 0
    for B in batches:
        rate = run_once(B, iters)
        print(f"# batch={B}: {rate:.0f} audio-sec/sec", file=sys.stderr)
        if rate > best_rate:
            best_rate, best_B = rate, B

    # audio-sec/wall-sec == audio-hours/wall-hour
    value = best_rate
    print(json.dumps({
        "metric": "audio-hours/hour/chip (decode->STFT->rain features)",
        "value": round(value, 1),
        "unit": "audio-hours/hour",
        "vs_baseline": round(value / 500.0, 3),
        "batch": best_B,
        "clip_sec": args.clip_sec,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
