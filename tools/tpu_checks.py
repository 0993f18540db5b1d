"""TPU-tier hardware numerics checks (the paths bench.py's canaries skip).

The pytest suite runs on a forced-CPU mesh (tests/conftest.py), so TPU-only
numerics bugs (the bf16-default-matmul class, Mosaic lowering differences)
can only be caught on the chip.  bench.py asserts four canaries every run
(Pallas parity, flagship engine, suppressor, band-noise); this script covers
the rest of the compute surface:

  * sosfilt / sosfiltfilt (cascade-matmul path) vs scipy float64 on TPU
  * TD features TPU vs CPU (same jitted program, both backends)
  * RoE engine drop counts TPU vs CPU
  * streaming detector chunked-on-TPU vs offline-on-CPU frame agreement
  * flagship classifier over CONFIG VARIANTS (peak gate, td_soft, winsor)
    TPU vs CPU — bench pins only the headline config

Usage: python tools/tpu_checks.py   (needs the axon TPU; ~2-4 min incl.
compiles).  Prints one JSON line; exit 1 on any failed bound.

Since r5 these checks are also part of the round's number of record:
``bench.py`` imports :func:`run_checks` on every TPU run and embeds the
results as a ``tpu_checks`` sub-object in the artifact;
``validate_full_artifact`` fails the run if any bound failed or the
sub-object is missing (VERDICT r4 item 1).
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

# runnable as `python tools/tpu_checks.py` from anywhere: the package lives
# at the repo root, one level up from this file
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def run_checks(smoke: bool = False) -> dict:
    """Run every check; returns the results dict (``ok``/``failures`` keys).

    ``smoke=True`` forces the CPU platform so the script *logic* can run in
    the CPU test suite (both "sides" on CPU, bounds trivially met).
    """
    import jax

    if smoke:  # script-logic smoke: both "sides" on CPU, bounds trivially met
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from scipy import signal

    if not smoke:
        assert jax.default_backend() == "tpu", (
            f"tpu_checks needs the TPU backend, got {jax.default_backend()!r}"
            " (do not force JAX_PLATFORMS=cpu)"
        )
    cpu = jax.devices("cpu")[0]

    from audio_processing_tools_tpu.config import (
        DEFAULT_MODE_BANDS,
        build_noise_config,
    )

    FS = 11162
    rng = np.random.default_rng(42)
    results: dict = {"backend": jax.default_backend()}
    failures: list[str] = []

    def check(name: str, value: float, bound: float, larger_ok: bool = False):
        results[name] = float(value)
        ok = value >= bound if larger_ok else value <= bound
        if not ok:
            failures.append(f"{name}={value:.3e} vs bound {bound:.3e}")
        print(f"# {name}: {value:.3e} (bound {'>=' if larger_ok else '<='} "
              f"{bound:.1e}) {'OK' if ok else 'FAIL'}", file=sys.stderr)

    # ---- 1. IIR cascade (the HIGHEST-precision matmul path) vs scipy -----
    from audio_processing_tools_tpu.ops.filters import sosfilt, sosfiltfilt

    sos = signal.butter(4, [2 * 400.0 / FS, 2 * 3500.0 / FS],
                        btype="band", output="sos")
    x = rng.standard_normal((4, FS * 2)).astype(np.float32)
    ref = signal.sosfilt(sos, x.astype(np.float64), axis=-1)
    got = np.asarray(jax.jit(lambda v: sosfilt(sos, v))(jnp.asarray(x)))
    check("sosfilt_tpu_vs_scipy_rel", np.abs(got - ref).max() / np.abs(ref).max(),
          1e-5)
    reff = signal.sosfiltfilt(sos, x.astype(np.float64), axis=-1)
    gotf = np.asarray(jax.jit(lambda v: sosfiltfilt(sos, v))(jnp.asarray(x)))
    check("sosfiltfilt_tpu_vs_scipy_rel",
          np.abs(gotf - reff).max() / np.abs(reff).max(), 1e-5)

    # ---- 2. TD features: same program, TPU vs CPU -------------------------
    from audio_processing_tools_tpu.ops.features_td import extract_td_features

    def td_fn(v):
        return extract_td_features(
            v, fs=FS, frame_len=256, hop=128,
            operating_band=(400.0, 3500.0),
            mode_bands=tuple(DEFAULT_MODE_BANDS),
            td_input_mode="comb_filter",
        )

    xt = (0.1 * rng.standard_normal(FS * 2)).astype(np.float32)
    td_t = jax.jit(td_fn)(jnp.asarray(xt))
    with jax.default_device(cpu):
        td_c = jax.jit(td_fn, backend="cpu")(jnp.asarray(xt))
    dev = 0.0
    for k in td_t:
        a, b = np.asarray(td_t[k]), np.asarray(td_c[k])
        denom = max(np.abs(b).max(), 1e-6)
        dev = max(dev, np.abs(a - b).max() / denom)
    check("td_features_tpu_vs_cpu_rel", dev, 1e-4)

    # ---- synthetic rain clip shared by the engine checks ------------------
    def rain_clip(seconds: float, seed: int, *, decay: float = 55.0,
                  amp: float = 0.5, gap: int = FS // 5,
                  f0: float = 523.0) -> np.ndarray:
        r = np.random.default_rng(seed)
        n = int(FS * seconds)
        y = (0.01 * r.standard_normal(n)).astype(np.float32)
        k = np.arange(1400)
        ping = np.exp(-k / decay) * np.sin(2 * np.pi * f0 * k / FS)
        for s in range(300, n - 1500, gap):
            y[s:s + 1400] += amp * ping.astype(np.float32)
        return y

    # ---- 3. RoE drop counts TPU vs CPU ------------------------------------
    from audio_processing_tools_tpu.models.roe import rain_detection_algo

    # 700 Hz / decay-40 pings land in RoE's harmonic bands (523 Hz does not
    # fire it); 6 drops on CPU — the check is only meaningful when nonzero
    xr = rain_clip(3.0, 7, decay=40.0, amp=0.9, gap=FS // 3, f0=700.0)
    drops_t, frain_t, _ = rain_detection_algo(
        xr, sample_rate=FS, check_duration=3)
    with jax.default_device(cpu):
        drops_c, frain_c, _ = rain_detection_algo(
            xr, sample_rate=FS, check_duration=3)
    results["roe_drops_tpu"] = int(drops_t)
    results["roe_drops_cpu"] = int(drops_c)
    check("roe_drops_cpu_nonzero", float(int(drops_c) > 0), 1.0,
          larger_ok=True)
    check("roe_drop_count_abs_diff", abs(int(drops_t) - int(drops_c)), 0)
    check("roe_frain_mean_abs_diff", abs(float(frain_t) - float(frain_c)),
          1e-3)

    # ---- 4. streaming chunked on TPU vs offline ---------------------------
    from audio_processing_tools_tpu.models.streaming import StreamingRainDetector

    s_cfg = build_noise_config(FS, {
        "detector": {"mode_bands": list(DEFAULT_MODE_BANDS)},
        "classifier_only_mode": True,
    })
    det = StreamingRainDetector(s_cfg)
    xs = rain_clip(2.0, 11)
    n_hop = 128
    usable = (len(xs) // n_hop) * n_hop
    xs = xs[:usable]
    state = det.init_state()
    classes = []
    chunk = n_hop * 32
    for s in range(0, usable, chunk):
        state, out = det.process_chunk(state, jnp.asarray(xs[s:s + chunk]))
        classes.append(np.asarray(out["frame_class"]))
    fc_stream = np.concatenate(classes)
    with jax.default_device(cpu):
        det_c = StreamingRainDetector(s_cfg)
        st_c = det_c.init_state()
        cl_c = []
        for s in range(0, usable, chunk):
            st_c, out_c2 = det_c.process_chunk(st_c, jnp.asarray(xs[s:s + chunk]))
            cl_c.append(np.asarray(out_c2["frame_class"]))
    fc_cpu = np.concatenate(cl_c)
    check("streaming_tpu_vs_cpu_frame_agreement",
          float((fc_stream == fc_cpu).mean()), 0.99, larger_ok=True)

    # ---- 5. classifier config variants TPU vs CPU -------------------------
    from audio_processing_tools_tpu.models.spectral_noise import SpectralNoiseEngine

    variants = {
        "peak_gate": {"peak_features_enable": True},
        "td_soft": {"td_soft_enable": True},
        "winsor": {"flux_modes_winsor_enable": True},
    }
    xv = rain_clip(2.0, 23)
    for name, extra in variants.items():
        v_cfg = build_noise_config(FS, {
            "detector": {"mode_bands": list(DEFAULT_MODE_BANDS), **extra},
            "classifier_only_mode": True,
        })
        eng = SpectralNoiseEngine(v_cfg)
        fc_t = np.asarray(eng.process(jnp.asarray(xv), FS)["frame_class"])
        with jax.default_device(cpu):
            eng_c = SpectralNoiseEngine(v_cfg)
            fc_c = np.asarray(eng_c.process(jnp.asarray(xv), FS)["frame_class"])
        check(f"engine_{name}_tpu_vs_cpu_frame_agreement",
              float((fc_t == fc_c).mean()), 0.99, larger_ok=True)

    # ---- 6. mel classifier TPU vs CPU (Pallas front-end since late r4) ----
    from audio_processing_tools_tpu.models.mel_classifier import (
        MelRainClassifier,
    )

    mel_t_eng = MelRainClassifier()
    mel_t_eng.setup({"sample_rate": FS})
    xm = np.stack([rain_clip(2.0, 31 + i) for i in range(4)])
    out_mt = mel_t_eng.process_batch(xm)
    with jax.default_device(cpu):
        mel_c_eng = MelRainClassifier()
        mel_c_eng.setup({"sample_rate": FS})
        out_mc = mel_c_eng.process_batch(xm)
    fr_t = np.asarray(out_mt["frame_is_rain"])
    fr_c = np.asarray(out_mc["frame_is_rain"])
    check("mel_tpu_vs_cpu_frame_agreement", float((fr_t == fr_c).mean()),
          0.99, larger_ok=True)
    check("mel_tpu_vs_cpu_clip_decisions_equal",
          float(np.array_equal(np.asarray(out_mt["clip_is_rain"]),
                               np.asarray(out_mc["clip_is_rain"]))),
          1.0, larger_ok=True)

    results["failures"] = failures
    results["ok"] = not failures
    return results


def main() -> int:
    results = run_checks(smoke="--smoke-cpu" in sys.argv)
    print(json.dumps(results))
    return 0 if results["ok"] else 1


if __name__ == "__main__":
    code = main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(code)  # axon exit hang workaround (see .claude/skills/verify)
