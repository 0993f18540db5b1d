"""Real-time chunked rain detection (StreamingRainDetector demo).

Simulates a live audio feed: quiet background for the first half of the
stream, rain starting mid-stream. Audio arrives in hop-multiple chunks; the
detector threads its state between chunks and reports rain frames as they
happen, with NO lookahead — the same causality contract as the reference
firmware (reference ``edge/rain_frame_classifier.py``; chunk-invariance is
pinned bit-exactly in ``tests/test_streaming.py``).

Run: ``python examples/streaming_detect.py`` (CPU, a few seconds).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from audio_processing_tools_tpu.config import DEFAULT_MODE_BANDS
from audio_processing_tools_tpu.models.frame_classifier import FrameClass
from audio_processing_tools_tpu.models.streaming import StreamingRainDetector
from audio_processing_tools_tpu.utils.corpus import synth_clip

FS = 11162


def main() -> None:
    rng = np.random.default_rng(7)
    quiet = synth_clip("noise", rng, fs=FS, seconds=4.0)
    rainy = synth_clip("rain_heavy", rng, fs=FS, seconds=4.0)
    stream = np.concatenate([quiet, rainy]).astype(np.float32)

    det = StreamingRainDetector()
    det.setup({
        "sample_rate": FS,
        "detector": {"mode_bands": list(DEFAULT_MODE_BANDS)},
    })
    state = det.init_state()
    hop = det.cfg.hop
    chunk_len = 32 * hop  # ~0.37 s of audio per "network packet"

    print(f"streaming {len(stream) / FS:.0f} s of audio in "
          f"{chunk_len / FS * 1000:.0f} ms chunks (rain starts at 4.0 s)")
    t_cursor = 0.0
    first_rain_t = None
    total_rain = 0
    for start in range(0, len(stream) - chunk_len + 1, chunk_len):
        chunk = stream[start : start + chunk_len]
        state, out = det.process_chunk(state, chunk)
        rain_frames = int(
            np.sum(np.asarray(out["frame_class"]) == FrameClass.RAIN)
        )
        total_rain += rain_frames
        # sustained-detection gate (the clip aggregator's min-frames rule):
        # a lone rain frame during tracker warmup is not an event
        if rain_frames >= 3 and first_rain_t is None:
            first_rain_t = t_cursor
        bar = "#" * min(rain_frames, 40)
        print(f"  t={t_cursor:5.2f}s  rain_frames={rain_frames:3d} {bar}")
        t_cursor += chunk_len / FS

    print(f"\nfirst rain detected at t={first_rain_t:.2f} s "
          f"(ground truth onset 4.00 s); {total_rain} rain frames total")
    assert first_rain_t is not None and 3.5 <= first_rain_t <= 6.0, (
        "expected detection shortly after the 4 s onset"
    )
    print("OK")


if __name__ == "__main__":
    main()
