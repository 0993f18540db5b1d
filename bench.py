"""Headline benchmark: audio-hours/hour/chip through decode -> STFT -> rain
features (north-star target: 500), plus sub-measurements for every BASELINE
config: ALAC ingest (config #2), the mel feature pipeline (config #3), and
the full noise suppressor (gain -> S_hat -> ISTFT -> y).

Pipeline shape (the production design):
  host: MARK container bytes -> ``parse_mark_audio_file`` (the real container
        decode: header parse + payload alignment + PCM or libavcodec-ALAC
        decode) -> int16 batch
  device: int16->float scaling (decode tail), prefilter, STFT, detector
          noise normalization, rain-frame classification, clip aggregates.

Transfers ship int16 (half the bytes of float32) and are double-buffered:
batch k+1 is decoded on the host and placed on device while batch k
computes; only small per-clip outputs (frame classes + counts) come back.

Timing contract (VERDICT r2 item 4): the headline value is the BEST of
``--repeats`` pipelined runs (the tunnel adds +-20% run-to-run noise; best-of
is the stable estimator of pipeline capability), and the JSON carries a
per-stage breakdown (``decode_ms`` / ``h2d_ms`` / ``compute_ms`` per batch,
measured unpipelined on warm buffers) so any regression is attributable.

On TPU the run also records Pallas-vs-XLA spectrogram parity
(``pallas_max_rel_dev`` in the JSON) and asserts the <1e-5 BASELINE bound.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
``--quick`` runs a small CPU smoke version.
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def _hbm_program_bytes(compiled) -> int | None:
    """Static HBM footprint of a compiled program (arguments + outputs +
    temps + code), from XLA's compile-time memory analysis.  The axon
    backend's runtime ``memory_stats()`` returns nothing, so this is the
    memory number the bench contract carries."""
    try:
        ma = compiled.memory_analysis()
        return int(ma.argument_size_in_bytes + ma.output_size_in_bytes
                   + ma.temp_size_in_bytes + ma.generated_code_size_in_bytes)
    except Exception:
        return None


# v5e HBM bandwidth (public spec); the roofline denominator
_V5E_HBM_GBPS = 819.0

# Fields the FULL-run artifact must carry non-null (VERDICT r3 item 8: a
# silent sub-bench regression — e.g. a missing ALAC shim nulling alac_value —
# must FAIL the artifact, not produce a "valid" one).  TPU runs additionally
# require every hardware canary to have fired.
FULL_RUN_REQUIRED = (
    "value", "mulaw_value", "p50_file_latency_ms", "decode_ms", "h2d_ms",
    "compute_ms", "device_loop_audio_sec_per_sec", "hbm_program_bytes",
    "alac_value", "suppress_value", "suppress_p50_ms", "mel_value",
    "stream_value", "stream_p50_ms", "stream_p99_ms",
    "stream_unbatched_value", "stream_audio_value",
    "roe_loop_audio_sec_per_sec", "band_noise_loop_audio_sec_per_sec",
    "stream_lowlat_p50_ms", "stream_lowlat_p99_ms",
)
TPU_RUN_REQUIRED = (
    "pallas_max_rel_dev", "engine_cpu_tpu_frame_agreement",
    "suppress_cpu_tpu_y_rel_dev", "band_noise_cpu_tpu_frame_agreement",
    "roofline_audio_sec_per_sec_est",
)


def validate_full_artifact(artifact: dict, *, subbench: bool = True) -> None:
    """Assert the non-quick artifact is complete; raises with the missing
    field names.  ``subbench=False`` (the explicit ``--no-subbench`` opt-out)
    relaxes only the sub-measurement fields.

    On TPU the artifact must also carry the full on-chip verification
    results (``tpu_checks`` from ``tools/tpu_checks.py``) with every bound
    passing — the on-chip numerics suite is part of the number of record,
    not a manual side script (VERDICT r4 item 1)."""
    sub = {"alac_value", "suppress_value", "suppress_p50_ms", "mel_value",
           "stream_value", "stream_p50_ms", "stream_p99_ms",
           "stream_unbatched_value", "stream_audio_value",
           "roe_loop_audio_sec_per_sec", "band_noise_loop_audio_sec_per_sec",
           "stream_lowlat_p50_ms", "stream_lowlat_p99_ms"}
    required = [k for k in FULL_RUN_REQUIRED if subbench or k not in sub]
    if artifact.get("backend") == "tpu":
        required += list(TPU_RUN_REQUIRED)
    missing = [k for k in required if artifact.get(k) is None]
    assert not missing, (
        f"bench artifact incomplete: null/missing fields {missing} "
        f"(a sub-bench or canary silently did not run)"
    )
    if artifact.get("backend") == "tpu":
        checks = artifact.get("tpu_checks")
        assert isinstance(checks, dict), (
            "bench artifact incomplete: tpu_checks sub-object missing "
            "(tools/tpu_checks.py did not run)"
        )
        assert checks.get("ok") is True, (
            f"on-chip verification failed: tpu_checks.failures="
            f"{checks.get('failures')}"
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small CPU smoke run")
    ap.add_argument("--batch", type=int, default=0,
                    help="fixed batch size (0 = measured default)")
    ap.add_argument("--clip-sec", type=float, default=10.0)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=3,
                    help="pipelined runs; headline = best")
    ap.add_argument("--no-subbench", action="store_true",
                    help="skip ALAC / suppressor / mel sub-measurements")
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

    from audio_processing_tools_tpu.ops.wire import mulaw_decode, mulaw_encode

    def make_step(wire):
        def step_fn(pcm):
            if wire == "mulaw":
                # device-side expansion of the 1-byte/sample companded wire
                xb = mulaw_decode(pcm) * (32768.0 / 32767.0)
            else:
                # device-side decode tail: int16 -> float32 [-1, 1]
                xb = pcm.astype(jnp.float32) / 32767.0
            out = jax.vmap(lambda x: eng._trace_single(x, FS))(xb)
            fc = out["frame_class"]
            return {
                "rain_frame_count": jnp.sum(
                    fc == jnp.int8(FrameClass.RAIN), axis=-1
                ).astype(jnp.int32),
                "mean_rain_conf": jnp.mean(out["rain_conf"], axis=-1),
            }
        return step_fn

    step_fn = make_step("int16")
    step = jax.jit(step_fn)

    def make_mark_batch(B, file_version=0):
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

    def run_pipelined(B, iters, step_fn_jit, file_version=0,
                      fetch_key="rain_frame_count", wire="int16"):
        """One pipelined run; returns audio-sec/sec."""
        from concurrent.futures import ThreadPoolExecutor

        mark_batches = [make_mark_batch(B, file_version) for _ in range(2)]
        # preallocated decode buffers (first-touch page faults on this host
        # cost seconds per 28 MB; reuse keeps decode at ~35 ms)
        mats = [np.empty((B, clip_len), np.int16) for _ in range(DEPTH + 1)]
        enc = ([np.empty((B, clip_len), np.int8) for _ in range(DEPTH + 1)]
               if wire == "mulaw" else None)

        def host_prep(files, j):
            """Container decode (+ optional wire companding) into buffer j."""
            decode_batch(files, mats[j])
            if enc is None:
                return mats[j]
            mulaw_encode(mats[j], enc[j])
            return enc[j]

        # warm-up: compile + touch every buffer and both file sets
        for j in range(len(mats)):
            r = step_fn_jit(jax.device_put(host_prep(mark_batches[j % 2], j)))
        np.asarray(r[fetch_key])

        # decode + device_put both live on the worker thread: the main
        # thread's result fetches (D2H) then overlap the next batch's H2D —
        # measured +22% over main-thread puts on the tunnel.  Buffer safety:
        # mats[j] is reused only after the batch that used it has been
        # fetched (DEPTH=2 < len(mats)), which forces its transfer complete.
        def decode_put(files, j):
            return jax.device_put(host_prep(files, j))

        pool = ThreadPoolExecutor(1)
        t0 = time.perf_counter()
        fut = pool.submit(decode_put, mark_batches[0], 0)
        inflight = []
        for i in range(iters):
            d = fut.result()
            if i + 1 < iters:
                fut = pool.submit(
                    decode_put, mark_batches[(i + 1) % 2],
                    (i + 1) % len(mats),
                )
            inflight.append(step_fn_jit(d))
            while len(inflight) > DEPTH:
                np.asarray(inflight.pop(0)[fetch_key])
        for out in inflight:
            np.asarray(out[fetch_key])
        dt = (time.perf_counter() - t0) / iters
        pool.shutdown()
        return B * args.clip_sec / dt

    def stage_breakdown(B, file_version=0):
        """Unpipelined per-stage times (ms per batch) on warm buffers."""
        files = make_mark_batch(B, file_version)
        mat = np.empty((B, clip_len), np.int16)
        decode_batch(files, mat)            # warm pages
        d = jax.device_put(mat)
        np.asarray(step(d)["rain_frame_count"])  # warm compile + device

        def best_of(f, n=3):
            ts = []
            for _ in range(n):
                t0 = time.perf_counter()
                f()
                ts.append(time.perf_counter() - t0)
            return min(ts) * 1000.0

        decode_ms = best_of(lambda: decode_batch(files, mat))
        # axon's device_put returns asynchronously; fetching one element
        # forces the whole transfer (block_until_ready does NOT, per the
        # backend's lazy-execution contract)
        h2d_ms = best_of(lambda: np.asarray(jax.device_put(mat)[0, 0]))
        d = jax.device_put(mat)
        np.asarray(d[0, 0])  # make sure the operand is resident
        # fetching the (small) output is what forces compute, so compute_ms
        # includes the tiny D2H of per-clip scalars
        compute_ms = best_of(lambda: np.asarray(step(d)["rain_frame_count"]))
        # dispatch+fetch round trip for a trivial kernel on the same operand:
        # on the tunneled dev host this floor is ~27 ms, so real engine
        # compute is compute_ms - dispatch_floor_ms
        triv = jax.jit(lambda v: jnp.sum(v, axis=-1))
        np.asarray(triv(d).ravel()[0])
        floor_ms = best_of(lambda: np.asarray(triv(d).ravel()[0]))
        return {
            "decode_ms": round(decode_ms, 1),
            "h2d_ms": round(h2d_ms, 1),
            "compute_ms": round(compute_ms, 1),
            "dispatch_floor_ms": round(floor_ms, 1),
            "device_audio_sec_per_sec": round(
                B * args.clip_sec / (compute_ms / 1000.0), 1),
        }

    def device_loop(B, K=16, trials=5):
        """Pure device throughput with the dispatch floor amortized away
        (VERDICT r3 item 2: the old compute_ms - floor_ms subtraction had a
        3x spread across rounds).  K engine steps are CHAINED in one
        ``lax.scan`` — each step's input is perturbed by the previous
        step's output, so XLA cannot hoist or parallelize the body — and
        one dispatch+fetch covers all K, leaving <=floor/K (~0.4 ms at
        K=64) of host overhead per step.  Also returns the compiled program's static HBM
        footprint and a bandwidth roofline estimate (bytes = arguments +
        2x temps at v5e's 819 GB/s; an upper bound — the engine's scans
        serialize, so it is not expected to be reached)."""
        files = make_mark_batch(B)
        mat = np.empty((B, clip_len), np.int16)
        decode_batch(files, mat)
        d = jax.device_put(mat)
        np.asarray(d[0, 0])  # resident

        def loop_fn(pcm):
            def body(seed, _):
                out = step_fn(pcm + (seed % 3).astype(jnp.int16))
                return jnp.sum(out["rain_frame_count"]), ()

            final, _ = jax.lax.scan(body, jnp.int32(0), None, length=K)
            return final

        lowered = jax.jit(loop_fn).lower(d)
        compiled = lowered.compile()
        np.asarray(compiled(d))  # warm
        rates = []
        for _ in range(trials):
            t0 = time.perf_counter()
            np.asarray(compiled(d))
            dt = time.perf_counter() - t0
            rates.append(K * B * args.clip_sec / dt)
        rates.sort()
        med = rates[len(rates) // 2]
        spread = (rates[-1] - rates[0]) / med
        # memory + roofline from the SINGLE-step program's footprint (args
        # read once, temps written + read), independent of K
        one = jax.jit(step_fn).lower(d).compile()
        hbm_one = _hbm_program_bytes(one)
        roofline = None
        if hbm_one is not None and jax.default_backend() == "tpu":
            ma = one.memory_analysis()
            step_bytes = (ma.argument_size_in_bytes
                          + 2 * ma.temp_size_in_bytes
                          + ma.output_size_in_bytes)
            roofline = round(
                B * args.clip_sec / (step_bytes / (_V5E_HBM_GBPS * 1e9)), 1)
        return {
            "device_loop_audio_sec_per_sec": round(med, 1),
            "device_loop_spread": round(spread, 3),
            "device_loop_iters": K,
            "hbm_program_bytes": (hbm_one if hbm_one is not None
                                  else _hbm_program_bytes(compiled)),
            "roofline_audio_sec_per_sec_est": roofline,
        }

    if args.quick:
        B, iters, repeats = (args.batch or 4), 2, 1
    else:
        # measured sweet spot on v5e through the axon tunnel: B=128
        B, iters, repeats = (args.batch or 128), args.iters, args.repeats

    # int16 and the opt-in mu-law int8 wire (half the H2D bytes, device-side
    # expansion; host pays a slabbed LUT gather — ~50 ms/batch overlapped on
    # the worker thread; see ops/wire.py for why the slabbing is what makes
    # the encode overlap at all on this 1-core host) are measured INTERLEAVED
    # per repeat: the tunnel drifts 10-50 MB/s over minutes, so back-to-back
    # blocks of one wire then the other would compare two different link
    # states, not two wire formats. Detection parity vs int16 is pinned
    # corpus-wide in tests/test_wire.py (identical clip decisions on easy,
    # 31/32 on hard: one near-threshold wind_gusty clip flips).
    mulaw_step = jax.jit(make_step("mulaw"))
    runs = []
    mulaw_runs = []
    for r in range(repeats):
        rate = run_pipelined(B, iters, step)
        runs.append(round(rate, 1))
        print(f"# run {r}: batch={B}: {rate:.0f} audio-sec/sec", file=sys.stderr)
        if not args.quick or r == 0:
            mrate = run_pipelined(B, iters, mulaw_step, wire="mulaw")
            mulaw_runs.append(round(mrate, 1))
            print(f"# mulaw run {r}: batch={B}: {mrate:.0f} audio-sec/sec",
                  file=sys.stderr)
    best_rate = max(runs)
    mulaw_rate = max(mulaw_runs)

    stages = stage_breakdown(B)
    print(f"# stages per batch: {stages}", file=sys.stderr)

    # K=64: at the engine's ~6 ms/step the ~27 ms dispatch floor leaks
    # floor/K into every step — 28% at K=16, ~3% at K=64
    loop_stats = device_loop(B, K=2 if args.quick else 64,
                             trials=2 if args.quick else 5)
    print(f"# device loop: {loop_stats}", file=sys.stderr)

    # RoE engine device capability, same chained-scan amortization (the
    # legacy classifier family; pins the gather-free peaks/local-average
    # rework per round instead of only in docs).  K=64 per the project's
    # own dispatch-floor rule (VERDICT r4 weak item 1: the old K=16 leaked
    # ~1.7 ms/step of the ~27 ms floor into a ~4.5 ms step measurement).
    roe_loop_rate = None
    roe_loop_spread = None
    if not args.no_subbench:
        from audio_processing_tools_tpu.models.roe import (
            _roe_traced,
            build_roe_config,
        )

        roe_cfg = build_roe_config(sample_rate=FS, check_duration=3)
        Br, Kr = (2, 2) if args.quick else (32, 64)
        Nr = FS * 3
        roe_mat = (rng.standard_normal((Br, Nr)) * 0.05).astype(np.float32)
        roe_d = jax.device_put(roe_mat)
        np.asarray(roe_d[0, 0])

        def roe_loop(p):
            def body(seed, _):
                out = jax.vmap(lambda v: _roe_traced(v, roe_cfg, Nr))(
                    p + (seed % 3.0) * 1e-6
                )
                s = (jnp.sum(out["rain_drop_count"]).astype(jnp.float32)
                     + jnp.sum(out["frain_mean"]))
                return s % 7.0, ()
            f, _ = jax.lax.scan(body, jnp.float32(0), None, length=Kr)
            return f

        roe_c = jax.jit(roe_loop).lower(roe_d).compile()
        np.asarray(roe_c(roe_d))
        roe_rates = []
        for _ in range(2 if args.quick else 5):
            t0 = time.perf_counter()
            np.asarray(roe_c(roe_d))
            roe_rates.append(Kr * Br * 3.0 / (time.perf_counter() - t0))
        roe_rates.sort()
        roe_loop_rate = round(roe_rates[len(roe_rates) // 2], 1)
        roe_loop_spread = round(
            (roe_rates[-1] - roe_rates[0]) / roe_rates[len(roe_rates) // 2], 3)
        print(f"# roe device loop (K={Kr}): {roe_loop_rate:.0f} "
              f"audio-sec/sec, spread {roe_loop_spread}", file=sys.stderr)

    # Band-noise estimator device capability, same chained-scan
    # amortization (the third engine family; pins the r5 scan slimming —
    # rank-selection quantile + one-hot ring-buffer pushes — per round).
    bn_loop_rate = None
    bn_loop_spread = None
    if not args.no_subbench:
        from audio_processing_tools_tpu.models.band_noise import (
            BandNoiseEstimatorConfig,
            band_noise_process,
        )

        bn_cfg = BandNoiseEstimatorConfig()
        Bb, Kb = (2, 2) if args.quick else (32, 64)
        Nb = bn_cfg.fs * 10
        bn_mat = (rng.standard_normal((Bb, Nb)) * 0.05).astype(np.float32)
        bn_d = jax.device_put(bn_mat)
        np.asarray(bn_d[0, 0])

        def bn_loop(p):
            def body(seed, _):
                out = jax.vmap(lambda v: band_noise_process(v, bn_cfg))(
                    p + (seed % 3.0) * 1e-6
                )
                s = (jnp.sum(out["rain_frame_count"][:, -1]).astype(jnp.float32)
                     + jnp.sum(out["N_E"]))
                return s % 7.0, ()
            f, _ = jax.lax.scan(body, jnp.float32(0), None, length=Kb)
            return f

        bn_c = jax.jit(bn_loop).lower(bn_d).compile()
        np.asarray(bn_c(bn_d))
        bn_rates = []
        for _ in range(2 if args.quick else 5):
            t0 = time.perf_counter()
            np.asarray(bn_c(bn_d))
            bn_rates.append(Kb * Bb * 10.0 / (time.perf_counter() - t0))
        bn_rates.sort()
        bn_loop_rate = round(bn_rates[len(bn_rates) // 2], 1)
        bn_loop_spread = round(
            (bn_rates[-1] - bn_rates[0]) / bn_rates[len(bn_rates) // 2], 3)
        print(f"# band-noise device loop (K={Kb}): {bn_loop_rate:.0f} "
              f"audio-sec/sec, spread {bn_loop_spread}", file=sys.stderr)

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

    # ---------------- sub-measurements (one JSON line, extra keys) --------
    alac_rate = None
    suppress_rate = None
    suppress_p50_ms = None
    mel_rate = None
    stream_rate = None
    stream_p50_ms = None
    stream_p99_ms = None
    stream_unbatched_rate = None
    stream_audio_rate = None
    stream_lowlat_p50_ms = None
    stream_lowlat_p99_ms = None
    stream_lowlat_profile = None
    if not args.no_subbench:
        # BASELINE config #2: real ALAC payloads; host decode = the fast
        # native decoder (libalac_fast.so) inside parse_mark_audio_file,
        # libavcodec shim fallback (reference: parse.py:373-472). Note the
        # encoder that builds the fixture batch still needs the shim.
        try:
            from audio_processing_tools_tpu.io.alac_native import have_alac_shim
            alac_ok = have_alac_shim()  # encoder (fixtures) needs the shim;
            # decode auto-routes to libalac_fast.so when present
        except Exception:
            alac_ok = False
        if alac_ok:
            Ba, ia = (4, 2) if args.quick else (64, 4)
            reps = 1 if args.quick else 2
            alac_rate = round(max(
                run_pipelined(Ba, ia, step, file_version=1)
                for _ in range(reps)
            ), 1)
            print(f"# alac batch={Ba}: {alac_rate:.0f} audio-sec/sec",
                  file=sys.stderr)
        else:
            print("# alac shim unavailable; alac_value=null", file=sys.stderr)

        # full suppressor: gain -> S_hat -> ISTFT -> y on device
        # (reference: edge/rain_signal_processor.py:1085-1125); per-clip
        # output-RMS reduction is fetched to force execution without paying
        # a 28 MB/clip D2H through the tunnel for audio nobody consumes here
        sup_cfg = build_noise_config(FS, {
            "detector": {"mode_bands": list(DEFAULT_MODE_BANDS)},
            "compute_output_audio": True,
        })
        sup_eng = SpectralNoiseEngine(sup_cfg)

        def suppress_fn(pcm_i16):
            xb = pcm_i16.astype(jnp.float32) / 32767.0
            out = jax.vmap(lambda x: sup_eng._trace_single(x, FS))(xb)
            fc = out["frame_class"]
            return {
                "rain_frame_count": jnp.sum(
                    fc == jnp.int8(FrameClass.RAIN), axis=-1
                ).astype(jnp.int32),
                "y_rms": jnp.sqrt(jnp.mean(out["y"] ** 2, axis=-1)),
            }

        suppress = jax.jit(suppress_fn)
        Bs, isu = (4, 2) if args.quick else (64, 4)
        reps = 1 if args.quick else 2
        suppress_rate = round(max(
            run_pipelined(Bs, isu, suppress, fetch_key="y_rms")
            for _ in range(reps)
        ), 1)
        print(f"# suppressor batch={Bs}: {suppress_rate:.0f} audio-sec/sec",
              file=sys.stderr)
        m1 = decode_batch(make_mark_batch(1))
        np.asarray(suppress(jax.device_put(m1))["y_rms"])
        lat_s = []
        for _ in range(5 if not args.quick else 2):
            t0 = time.perf_counter()
            np.asarray(suppress(jax.device_put(m1))["y_rms"])
            lat_s.append(time.perf_counter() - t0)
        suppress_p50_ms = round(float(np.median(lat_s) * 1000), 1)
        print(f"# suppressor p50: {suppress_p50_ms:.1f} ms", file=sys.stderr)

        # BASELINE config #3: mel band-energy features -> rain/no-rain
        from audio_processing_tools_tpu.models.mel_classifier import (
            MelRainClassifier,
        )

        mel_eng = MelRainClassifier()
        mel_eng.setup({"sample_rate": FS})

        def mel_fn(pcm_i16):
            xb = pcm_i16.astype(jnp.float32) / 32767.0
            out = mel_eng._traced(xb)
            return {
                "rain_frame_count": jnp.sum(
                    out["frame_is_rain"], axis=-1).astype(jnp.int32),
                "clip_score_db": out["clip_score_db"],
            }

        mel_step = jax.jit(mel_fn)
        Bm, im = (4, 2) if args.quick else (B, 4)
        mel_rate = round(max(
            run_pipelined(Bm, im, mel_step)
            for _ in range(1 if args.quick else 2)
        ), 1)
        print(f"# mel batch={Bm}: {mel_rate:.0f} audio-sec/sec", file=sys.stderr)

        # live multi-stream serving fast path: B_s concurrent causal
        # streams, lockstep 2 s chunks, one vmapped program per step
        # (models/streaming.py process_chunk_batch; per-stream results are
        # bit-identical to single-stream process_chunk). The measured rate
        # includes the per-step H2D of every stream's chunk — i.e. it is
        # the deliverable streaming throughput through this link, not a
        # device-only number.
        from audio_processing_tools_tpu.models.streaming import (
            StreamingRainDetector,
        )

        sdet = StreamingRainDetector()
        sdet.setup({
            "sample_rate": FS,
            "detector": {"mode_bands": list(DEFAULT_MODE_BANDS)},
        })
        Bst = 8 if args.quick else 64
        s_chunk = FS * 2 // sdet.cfg.hop * sdet.cfg.hop
        # ship int16 like the live wire protocol (cli/serve.py) and the
        # headline pipeline; cast to float on device (halves H2D bytes —
        # measured 994 -> 1728 audio-s/s through the tunnel)
        s_pcm = (rng.standard_normal((Bst, s_chunk)) * 3000).astype(np.int16)
        s_state = sdet.init_state_batch(Bst)
        s_step = jax.jit(lambda st, p: jax.vmap(sdet._trace_chunk)(
            st, p.astype(jnp.float32) / 32767.0))
        s_state, s_out = s_step(s_state, jax.device_put(s_pcm))
        np.asarray(s_out["frame_class"][0, 0])
        s_lats = []
        for _ in range(4 if args.quick else 30):
            t0 = time.perf_counter()
            s_state, s_out = s_step(s_state, jax.device_put(s_pcm))
            np.asarray(s_out["frame_class"][0, 0])
            s_lats.append(time.perf_counter() - t0)
        s_best = min(s_lats)
        stream_rate = round(Bst * (s_chunk / FS) / s_best, 1)
        # serving SLOs (VERDICT r3 item 7): per-step latency percentiles
        # for the batched (vmapped) path — what the dynamic batcher
        # (--batch-window-ms) dispatches per window
        stream_p50_ms = round(float(np.percentile(s_lats, 50)) * 1e3, 1)
        stream_p99_ms = round(float(np.percentile(s_lats, 99)) * 1e3, 1)
        print(f"# multi-stream: {Bst} live streams x 2s chunk: "
              f"{s_best * 1e3:.1f} ms/step best, p50 {stream_p50_ms} ms, "
              f"p99 {stream_p99_ms} ms -> {stream_rate:.0f} audio-sec/sec",
              file=sys.stderr)

        # WITHOUT batching: each stream is its own device dispatch (the
        # per-connection path when no --batch-window-ms is set).  Measured
        # on a subset and reported as audio-s/s so the batching win is on
        # the record.
        Bu = 2 if args.quick else 8
        u_states = [sdet.init_state() for _ in range(Bu)]
        u_step = jax.jit(lambda st, p: sdet._trace_chunk(
            st, p.astype(jnp.float32) / 32767.0))
        for i in range(Bu):
            u_states[i], uo = u_step(u_states[i], jax.device_put(s_pcm[i]))
        np.asarray(uo["frame_class"][0])
        t0 = time.perf_counter()
        reps_u = 1 if args.quick else 3
        for _ in range(reps_u):
            for i in range(Bu):
                u_states[i], uo = u_step(
                    u_states[i], jax.device_put(s_pcm[i]))
                np.asarray(uo["frame_class"][0])
        u_dt = (time.perf_counter() - t0) / reps_u
        stream_unbatched_rate = round(Bu * (s_chunk / FS) / u_dt, 1)
        print(f"# multi-stream unbatched: {Bu} sequential streams: "
              f"{u_dt / Bu * 1e3:.1f} ms/stream-step -> "
              f"{stream_unbatched_rate:.0f} audio-sec/sec", file=sys.stderr)

        # stream-in -> denoised-audio-out (serve --emit-audio): the same
        # lockstep batch with the causal suppressor engaged and the
        # denoised int16 PCM fetched back per step (full wire cost)
        adet = StreamingRainDetector()
        adet.setup({
            "sample_rate": FS,
            "detector": {"mode_bands": list(DEFAULT_MODE_BANDS)},
            "compute_output_audio": True,
        })
        a_state = adet.init_state_batch(Bst)

        def a_fn(st, p):
            st, out = jax.vmap(adet._trace_chunk)(
                st, p.astype(jnp.float32) / 32767.0)
            y16 = jnp.clip(out["y"] * 32767.0, -32768, 32767
                           ).astype(jnp.int16)
            return st, y16, out["frame_class"]

        a_step = jax.jit(a_fn)
        a_state, a_y, a_fc = a_step(a_state, jax.device_put(s_pcm))
        np.asarray(a_y)
        a_best = float("inf")
        for _ in range(2 if args.quick else 5):
            t0 = time.perf_counter()
            a_state, a_y, a_fc = a_step(a_state, jax.device_put(s_pcm))
            np.asarray(a_y)  # full denoised PCM comes back every step
            a_best = min(a_best, time.perf_counter() - t0)
        stream_audio_rate = round(Bst * (s_chunk / FS) / a_best, 1)
        print(f"# multi-stream denoised audio out: {Bst} streams: "
              f"{a_best * 1e3:.1f} ms/step -> {stream_audio_rate:.0f} "
              f"audio-sec/sec", file=sys.stderr)

        # Low-latency serving profile (VERDICT r4 item 5): the edge
        # product's defining constraint is causal LOW latency
        # (reference edge/README), and one 2 s lockstep point does not
        # characterize it.  Same server fast path, small chunks (4 and 8
        # hops = 512/1024 samples ~= 46/92 ms of audio), 16 streams;
        # per-step p50/p99 plus the end-to-end audio delay (chunk
        # accumulation + compute p50 — detection has no OLA look-back).
        Blo = 4 if args.quick else 16
        stream_lowlat_profile = []
        for n_hops in (4, 8):
            lo_chunk = sdet.cfg.hop * n_hops
            lo_pcm = (rng.standard_normal((Blo, lo_chunk)) * 3000
                      ).astype(np.int16)
            lo_state = sdet.init_state_batch(Blo)
            lo_state, lo_out = s_step(lo_state, jax.device_put(lo_pcm))
            np.asarray(lo_out["frame_class"][0, 0])
            lo_lats = []
            for _ in range(6 if args.quick else 50):
                t0 = time.perf_counter()
                lo_state, lo_out = s_step(lo_state, jax.device_put(lo_pcm))
                np.asarray(lo_out["frame_class"][0, 0])
                lo_lats.append(time.perf_counter() - t0)
            p50 = round(float(np.percentile(lo_lats, 50)) * 1e3, 1)
            p99 = round(float(np.percentile(lo_lats, 99)) * 1e3, 1)
            chunk_ms = round(lo_chunk / FS * 1e3, 1)
            stream_lowlat_profile.append({
                "chunk_samples": lo_chunk, "chunk_ms": chunk_ms,
                "streams": Blo, "p50_ms": p50, "p99_ms": p99,
                "e2e_audio_delay_p50_ms": round(chunk_ms + p50, 1),
            })
            print(f"# lowlat serving: {Blo} streams x {lo_chunk} samples "
                  f"({chunk_ms} ms audio): p50 {p50} ms, p99 {p99} ms, "
                  f"e2e {chunk_ms + p50:.1f} ms", file=sys.stderr)
        stream_lowlat_p50_ms = stream_lowlat_profile[0]["p50_ms"]
        stream_lowlat_p99_ms = stream_lowlat_profile[0]["p99_ms"]

    # Hardware-numerics canary: the same jitted engine on TPU vs the CPU
    # backend must agree on every frame decision. TPU-only numerics bugs
    # (e.g. the bf16 default matmul precision that poisoned the IIR scans
    # in r1-r2) are invisible to the CPU test suite; this check runs on
    # real hardware every bench and lands in the driver artifact.
    engine_cpu_tpu_agreement = None
    if jax.default_backend() == "tpu":
        small = np.stack([
            (rng.standard_normal(clip_len) * 2000).astype(np.int16)
            for _ in range(4)
        ])
        fc_tpu = np.asarray(step(jax.device_put(small))["rain_frame_count"])
        cpu_dev = jax.devices("cpu")[0]
        with jax.default_device(cpu_dev):
            fc_cpu = np.asarray(
                jax.jit(step_fn, backend="cpu")(jnp.asarray(small))
                ["rain_frame_count"]
            )
        engine_cpu_tpu_agreement = float((fc_tpu == fc_cpu).mean())
        print(f"# engine cpu/tpu frame agreement: "
              f"{engine_cpu_tpu_agreement:.3f}", file=sys.stderr)
        assert engine_cpu_tpu_agreement == 1.0, (
            f"TPU-only numerics drift: rain_frame_count agreement "
            f"{engine_cpu_tpu_agreement} (cpu {fc_cpu} vs tpu {fc_tpu})"
        )

    # The headline canary covers the classifier config only; the bf16 class
    # of bug could still hide in the non-headline engines (VERDICT r3 item
    # 8).  Two more small CPU<->TPU checks: the full suppressor (gain ->
    # S_hat -> ISTFT -> y exercises the gain EMA scan + complex STFT) and
    # the firmware band-noise estimator (IIR prefilters + TTL ring scan).
    suppress_cpu_tpu_dev = None
    band_noise_cpu_tpu_agreement = None
    if jax.default_backend() == "tpu":
        sup_canary_cfg = build_noise_config(FS, {
            "detector": {"mode_bands": list(DEFAULT_MODE_BANDS)},
            "compute_output_audio": True,
        })
        sup_canary = SpectralNoiseEngine(sup_canary_cfg)

        def sup_fn(xb):
            out = jax.vmap(lambda x: sup_canary._trace_single(x, FS))(xb)
            return out["y"], out["frame_class"]

        xs = jnp.asarray((rng.standard_normal((2, FS)) * 0.05
                          ).astype(np.float32))
        y_t, fc_t = (np.asarray(a) for a in jax.jit(sup_fn)(xs))
        with jax.default_device(jax.devices("cpu")[0]):
            y_c, fc_c = (np.asarray(a) for a in
                         jax.jit(sup_fn, backend="cpu")(xs))
        suppress_cpu_tpu_dev = float(
            np.max(np.abs(y_t - y_c)) / max(float(np.abs(y_c).max()), 1e-30))
        fc_agree = float((fc_t == fc_c).mean())
        print(f"# suppressor cpu/tpu: y rel dev {suppress_cpu_tpu_dev:.2e}, "
              f"frame agreement {fc_agree:.4f}", file=sys.stderr)
        assert suppress_cpu_tpu_dev < 1e-3 and fc_agree >= 0.99, (
            f"suppressor TPU numerics drift: y dev {suppress_cpu_tpu_dev:.2e}"
            f", frame agreement {fc_agree}"
        )

        from audio_processing_tools_tpu.models.band_noise import (
            BandNoiseEstimatorConfig,
            band_noise_process,
        )

        bn_cfg = BandNoiseEstimatorConfig()
        bn_x = jnp.asarray((rng.standard_normal(FS * 2) * 0.05
                            ).astype(np.float32))
        bn_fn = lambda v: band_noise_process(v, bn_cfg)["fft_rain_frame"]
        bn_t = np.asarray(jax.jit(bn_fn)(bn_x))
        with jax.default_device(jax.devices("cpu")[0]):
            bn_c = np.asarray(jax.jit(bn_fn, backend="cpu")(bn_x))
        band_noise_cpu_tpu_agreement = float(
            (bn_t.astype(bool) == bn_c.astype(bool)).mean())
        print(f"# band-noise cpu/tpu frame agreement: "
              f"{band_noise_cpu_tpu_agreement:.4f}", file=sys.stderr)
        assert band_noise_cpu_tpu_agreement >= 0.99, (
            f"band-noise TPU numerics drift: agreement "
            f"{band_noise_cpu_tpu_agreement}"
        )

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

    # Full on-chip verification suite as part of the number of record
    # (VERDICT r4 item 1): every TPU-only numerics surface the four inline
    # canaries above skip (filters, TD features, RoE, streaming, classifier
    # config variants, mel) runs on every hardware bench; the artifact
    # validator refuses a run where any bound failed or the suite did not
    # run at all.
    tpu_checks = None
    if jax.default_backend() == "tpu":
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "tpu_checks",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "tools", "tpu_checks.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        tpu_checks = mod.run_checks()
        print(f"# tpu_checks: ok={tpu_checks['ok']} "
              f"failures={tpu_checks['failures']}", file=sys.stderr)

    artifact = {
        "metric": "audio-hours/hour/chip (decode->STFT->rain features)",
        "value": best_rate,
        "unit": "audio-hours/hour",
        "vs_baseline": round(best_rate / 500.0, 3),
        "runs": runs,
        "mulaw_value": mulaw_rate,
        "mulaw_vs_int16": round(mulaw_rate / best_rate, 3),
        "batch": B,
        "clip_sec": args.clip_sec,
        "p50_file_latency_ms": round(p50_ms, 1),
        **stages,
        **loop_stats,
        "roe_loop_audio_sec_per_sec": roe_loop_rate,
        "roe_loop_spread": roe_loop_spread,
        "roe_loop_iters": 2 if args.quick else 64,
        "band_noise_loop_audio_sec_per_sec": bn_loop_rate,
        "band_noise_loop_spread": bn_loop_spread,
        "band_noise_loop_iters": 2 if args.quick else 64,
        "alac_value": alac_rate,
        "alac_vs_baseline": (round(alac_rate / 500.0, 3)
                             if alac_rate is not None else None),
        "suppress_value": suppress_rate,
        "suppress_p50_ms": suppress_p50_ms,
        "mel_value": mel_rate,
        "stream_value": stream_rate,
        "stream_p50_ms": stream_p50_ms,
        "stream_p99_ms": stream_p99_ms,
        "stream_unbatched_value": stream_unbatched_rate,
        "stream_audio_value": stream_audio_rate,
        "stream_lowlat_p50_ms": stream_lowlat_p50_ms,
        "stream_lowlat_p99_ms": stream_lowlat_p99_ms,
        "stream_lowlat_profile": stream_lowlat_profile,
        "pallas_max_rel_dev": pallas_dev,
        "engine_cpu_tpu_frame_agreement": engine_cpu_tpu_agreement,
        "suppress_cpu_tpu_y_rel_dev": suppress_cpu_tpu_dev,
        "band_noise_cpu_tpu_frame_agreement": band_noise_cpu_tpu_agreement,
        "tpu_checks": tpu_checks,
        "codec": "pcm+alac" if alac_rate is not None else "pcm",
        "backend": jax.default_backend(),
    }
    if not args.quick:
        validate_full_artifact(artifact, subbench=not args.no_subbench)
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
