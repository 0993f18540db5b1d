"""Cross-cutting utilities: profiling/tracing helpers."""

from audio_processing_tools_tpu.utils.profiling import (
    device_trace,
    Timer,
    timed,
)

__all__ = ["device_trace", "Timer", "timed"]
