"""Streaming chunked inference: chunk invariance + detection behavior."""

import numpy as np
import jax
import pytest

from audio_processing_tools_tpu.config import DEFAULT_MODE_BANDS
from audio_processing_tools_tpu.models.streaming import StreamingRainDetector
from audio_processing_tools_tpu.models.frame_classifier import FrameClass

FS = 11162
PARAMS = {"sample_rate": FS, "detector": {"mode_bands": list(DEFAULT_MODE_BANDS)}}


def _rain(rng, n=FS * 6):
    x = 0.005 * rng.standard_normal(n)
    for t0 in rng.integers(FS, n - 2000, 30):
        k = np.arange(800)
        ping = sum(a * np.sin(2 * np.pi * f * k / FS)
                   for f, a in [(520, 1), (900, 0.5), (1600, 0.35), (2450, 0.25)])
        x[t0 : t0 + 800] += 0.5 * np.exp(-k / 60.0) * ping
    return x.astype(np.float32)


def _run_chunked(det, x, chunk_len):
    state = det.init_state()
    outs = []
    usable = x.size // 128 * 128
    for s in range(0, usable, chunk_len):
        piece = x[s : min(s + chunk_len, usable)]
        piece = piece[: piece.size // 128 * 128]
        if piece.size == 0:
            break
        state, out = det.process_chunk(state, piece)
        outs.append(jax.tree_util.tree_map(np.asarray, out))
    return np.concatenate([o["frame_class"] for o in outs]), np.concatenate(
        [o["rain_conf"] for o in outs]
    )


def test_chunk_invariance(rng):
    """Any chunking yields identical outputs (explicit carries)."""
    x = _rain(rng)
    det = StreamingRainDetector()
    det.setup(dict(PARAMS))
    usable = x.size // 128 * 128
    fc_one, rc_one = _run_chunked(det, x, usable)       # one big chunk
    fc_2s, rc_2s = _run_chunked(det, x, FS * 2 // 128 * 128)
    fc_small, rc_small = _run_chunked(det, x, 128 * 7)  # odd small chunks
    np.testing.assert_array_equal(fc_one, fc_2s)
    np.testing.assert_array_equal(fc_one, fc_small)
    np.testing.assert_allclose(rc_one, rc_2s, atol=1e-6)


def test_streaming_detects_rain(rng):
    det = StreamingRainDetector()
    det.setup(dict(PARAMS))
    out = det.process_stream(_rain(rng))
    rain_frames = int((out["frame_class"] == FrameClass.RAIN).sum())
    assert rain_frames >= 5
    out_noise = StreamingRainDetector()
    out_noise.setup(dict(PARAMS))
    res = out_noise.process_stream(
        (0.02 * rng.standard_normal(FS * 6)).astype(np.float32)
    )
    assert int((res["frame_class"] == FrameClass.RAIN).sum()) <= 2
    # timestamps are continuous across chunks
    t = out["times"]
    np.testing.assert_allclose(np.diff(t), 128 / FS, atol=1e-6)


def test_chunk_length_validation(rng):
    det = StreamingRainDetector()
    det.setup(dict(PARAMS))
    state = det.init_state()
    with pytest.raises(ValueError):
        det.process_chunk(state, np.zeros(100, np.float32))


def test_chunk_invariance_random_mixed_splits(rng):
    """MIXED chunk sizes within one stream (the live-serving arrival
    pattern) are bit-identical to one whole-clip pass: 3 seeded random
    hop-multiple partitions."""
    x = _rain(rng)
    det = StreamingRainDetector()
    det.setup(dict(PARAMS))
    usable = x.size // 128 * 128
    fc_one, rc_one = _run_chunked(det, x, usable)

    for seed in range(3):
        prng = np.random.default_rng(100 + seed)
        state = det.init_state()
        outs = []
        s = 0
        while s < usable:
            n_hops = int(prng.integers(1, 40))
            piece = x[s : min(s + n_hops * 128, usable)]
            state, out = det.process_chunk(state, piece)
            outs.append(jax.tree_util.tree_map(np.asarray, out))
            s += piece.size
        fc = np.concatenate([o["frame_class"] for o in outs])
        rc = np.concatenate([o["rain_conf"] for o in outs])
        np.testing.assert_array_equal(fc, fc_one, err_msg=f"seed {seed}")
        np.testing.assert_array_equal(rc, rc_one, err_msg=f"seed {seed}")


def test_batched_multistream_matches_per_stream(rng):
    """process_chunk_batch: B concurrent streams in one vmapped program,
    bit-identical to B independent process_chunk streams (the serving
    fast path)."""
    B = 4
    clips = [_rain(np.random.default_rng(200 + i)) for i in range(B)]
    clips[2] = (0.02 * np.random.default_rng(7).standard_normal(FS * 6)
                ).astype(np.float32)
    det = StreamingRainDetector()
    det.setup(dict(PARAMS))
    chunk_len = 128 * 16

    # independent single-stream runs
    singles = []
    for x in clips:
        state = det.init_state()
        fcs = []
        for s in range(0, FS * 6 // chunk_len * chunk_len, chunk_len):
            state, out = det.process_chunk(state, x[s : s + chunk_len])
            fcs.append(np.asarray(out["frame_class"]))
        singles.append(np.concatenate(fcs))

    # lockstep batched run
    bstate = det.init_state_batch(B)
    fcs_b = []
    for s in range(0, FS * 6 // chunk_len * chunk_len, chunk_len):
        batch = np.stack([x[s : s + chunk_len] for x in clips])
        bstate, out = det.process_chunk_batch(bstate, batch)
        fcs_b.append(np.asarray(out["frame_class"]))
    batched = np.concatenate(fcs_b, axis=-1)  # (B, T)

    for i in range(B):
        np.testing.assert_array_equal(batched[i], singles[i],
                                      err_msg=f"stream {i}")


def test_batched_multistream_heterogeneous_ages(rng):
    """Streams batched together at DIFFERENT stream positions (the
    dynamic-batching case: a connection joins while another is mid-flight)
    stay bit-identical to their solo runs."""
    import jax as _jax

    xa = _rain(np.random.default_rng(500))
    xb = _rain(np.random.default_rng(501))
    det = StreamingRainDetector()
    det.setup(dict(PARAMS))
    chunk = 128 * 16

    # solo runs
    solo = {}
    for name, x in (("a", xa), ("b", xb)):
        st = det.init_state()
        fcs = []
        for s in range(0, chunk * 5, chunk):
            st, out = det.process_chunk(st, x[s : s + chunk])
            fcs.append(np.asarray(out["frame_class"]))
        solo[name] = np.concatenate(fcs)

    # stream a runs 3 chunks alone, then b joins; 2 batched steps follow
    st_a = det.init_state()
    fcs_a = []
    for s in range(0, chunk * 3, chunk):
        st_a, out = det.process_chunk(st_a, xa[s : s + chunk])
        fcs_a.append(np.asarray(out["frame_class"]))
    st_b = det.init_state()
    fcs_b = []
    stacked = _jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(v) for v in xs]), st_a, st_b
    )
    for k in range(2):
        batch = np.stack([
            xa[(3 + k) * chunk : (4 + k) * chunk],
            xb[k * chunk : (k + 1) * chunk],
        ])
        stacked, out = det.process_chunk_batch(stacked, batch)
        fc = np.asarray(out["frame_class"])
        fcs_a.append(fc[0])
        fcs_b.append(fc[1])

    np.testing.assert_array_equal(
        np.concatenate(fcs_a), solo["a"], err_msg="older stream diverged"
    )
    np.testing.assert_array_equal(
        np.concatenate(fcs_b), solo["b"][: chunk // 128 * 2],
        err_msg="younger stream diverged",
    )
