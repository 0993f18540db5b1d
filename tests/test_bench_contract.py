"""The driver artifact contract: bench.py must print one valid JSON line.

Runs the real ``python bench.py --quick`` as a subprocess (CPU) and
validates the schema the driver and the docs rely on. A bench.py broken by
refactors would otherwise only be discovered at round end on hardware.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench_json():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--quick"],
        capture_output=True, text=True, timeout=900, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def test_bench_quick_schema(bench_json):
    j = bench_json
    assert j["unit"] == "audio-hours/hour"
    assert isinstance(j["value"], (int, float)) and j["value"] > 0
    assert j["vs_baseline"] == round(j["value"] / 500.0, 3)
    for key in ("decode_ms", "h2d_ms", "compute_ms", "dispatch_floor_ms",
                "device_audio_sec_per_sec"):
        assert isinstance(j[key], (int, float)), key
    # sub-measurements present (values may be null only if a codec is
    # unavailable; the quick CPU path has all of them)
    for key in ("suppress_value", "mel_value", "stream_value"):
        assert isinstance(j[key], (int, float)) and j[key] > 0, key
    assert j["backend"] in ("cpu", "tpu")
    assert isinstance(j["runs"], list) and len(j["runs"]) >= 1


def test_bench_quick_stream_value_is_realtime_capable(bench_json):
    # 8 quick-mode streams of 2 s chunks: even the CPU smoke must beat
    # realtime (8 streams x 1x) comfortably, else serving claims are hollow
    assert bench_json["stream_value"] > 8 * 2
