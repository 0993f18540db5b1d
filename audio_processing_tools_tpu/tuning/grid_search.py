"""Grid search with resume semantics (parity with reference
``edge/parameter_tuning/grid_search.py``).

The reference parallelizes over parameter combos with a ProcessPool; here
the default execution is serial host-loop (combos usually differ in
trace-time constants, so each is its own compiled program), with
``grid_search_parallel`` kept as a thread-based API twin, and
:func:`grid_search_vmapped` for grids whose knobs are *traced* values
(pure thresholds): those sweep as a single ``vmap`` over combos on device.
"""

from __future__ import annotations

import datetime as dt
import glob
import hashlib
import json
import os
import time
from concurrent.futures import ThreadPoolExecutor, as_completed
from itertools import product
from typing import Any, Callable, Dict, List

import numpy as np


def generate_param_combinations(param_grid: Dict[str, list]) -> List[Dict[str, Any]]:
    return [dict(zip(param_grid.keys(), c)) for c in product(*param_grid.values())]


def replace_callables(obj):
    """Replace callables by their names for JSON serialization."""
    if isinstance(obj, dict):
        return {k: replace_callables(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [replace_callables(v) for v in obj]
    if isinstance(obj, tuple):
        return tuple(replace_callables(v) for v in obj)
    if callable(obj):
        return obj.__name__
    return obj


def load_processed_param_ids(pattern: str) -> List[str]:
    """Hash keys of already-saved results (resume support)."""
    ids = []
    for filename in glob.glob(pattern):
        with open(filename, "r") as f:
            result = json.load(f)
        ids.append(str(tuple(result["parameters"].items())))
    return ids


def save_result_to_disk(result: Dict[str, Any], filename: str) -> None:
    result = replace_callables(result)
    with open(filename, "w") as f:
        json.dump(result, f, indent=4)


def params_to_filename(params_key: str, alg_identifier: str) -> str:
    params_hash = hashlib.sha256(params_key.encode()).hexdigest()
    stamp = dt.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    return f"{alg_identifier}_{params_hash}_{stamp}.json"


def _run_and_save(params_key, audio_df, params, identifier, results_dir,
                  custom_alg) -> None:
    result_tuple = custom_alg(audio_df, **params)
    result = {
        "test_name": identifier,
        "parameters": params,
        "overall_accuracy": result_tuple[0],
        "tp_classifications": result_tuple[1],
        "tn_classifications": result_tuple[2],
        "fp_classifications": result_tuple[3],
        "fn_classifications": result_tuple[4],
    }
    save_result_to_disk(
        result, os.path.join(results_dir, params_to_filename(params_key, identifier))
    )


# name parity with the reference's per-combo runner (``grid_search.py:120``)
execute_algorithm = _run_and_save


def grid_search(audio_df, custom_alg: Callable, param_grid: Dict[str, list],
                test_name: str, results_dir: str) -> None:
    """Serial cartesian sweep with JSON resume (``grid_search.py:51-117``)."""
    os.makedirs(results_dir, exist_ok=True)
    existing = load_processed_param_ids(
        os.path.join(results_dir, f"{test_name}_*.json")
    )
    for params in generate_param_combinations(param_grid):
        params_key = str(tuple(params.items()))
        if str(replace_callables(tuple(params.items()))) in existing or params_key in existing:
            print(f"Skipping already processed combination: {params}")
            continue
        _run_and_save(params_key, audio_df, params, test_name, results_dir,
                      custom_alg)
        print(f"Processed and saved: {params}")


def grid_search_parallel(audio_df, custom_alg: Callable,
                         param_grid: Dict[str, list],
                         experiment_identifier: str,
                         results_dir: str = "./parameter_search_results/",
                         max_workers: int | None = None) -> None:
    """Parallel sweep (thread pool — device work releases the GIL) with the
    reference's resume semantics (``grid_search.py:153-225``)."""
    os.makedirs(results_dir, exist_ok=True)
    existing = load_processed_param_ids(
        os.path.join(results_dir, f"{experiment_identifier}_*.json")
    )
    tasks = []
    for params in generate_param_combinations(param_grid):
        key_for_check = str(replace_callables(tuple(params.items())))
        params_key = str(tuple(params.items()))
        if key_for_check in existing:
            print(f"Already Processed {params}, skipping")
            continue
        tasks.append((params_key, params))

    t0 = time.time()
    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        futures = {
            ex.submit(_run_and_save, pk, audio_df, p, experiment_identifier,
                      results_dir, custom_alg): p
            for pk, p in tasks
        }
        for fut in as_completed(futures):
            params = futures[fut]
            try:
                fut.result()
            except Exception as e:
                print(f"Error processing parameter combination {params}: {e}")
                raise
    print(f"Grid search completed in {time.time() - t0:.2f} seconds.")


def spectral_threshold_features(clips: np.ndarray,
                                base_params: Dict[str, Any] | None = None):
    """Run the threshold-independent front-end once; return flux features.

    Shared by :func:`grid_search_vmapped` and
    :func:`audio_processing_tools_tpu.tuning.gradient.gradient_tune_thresholds`:
    the expensive part (prefilter, STFT, PSD tracking, flux normalization)
    does not depend on the decision thresholds, so both sweep styles reuse
    one engine pass. Returns ``(feats, base)`` where ``feats`` holds
    ``primary``/``s1``/``s2``/``s3``/``td_crest`` arrays of shape ``(B, T)``.
    """
    import jax.numpy as jnp

    from audio_processing_tools_tpu.config import build_noise_config, DEFAULT_MODE_BANDS
    from audio_processing_tools_tpu.models.spectral_noise import SpectralNoiseEngine

    base = dict(base_params or {})
    base.setdefault("detector", {"mode_bands": list(DEFAULT_MODE_BANDS)})
    base.setdefault("classifier_only_mode", True)
    base.setdefault("return_detector_debug", True)
    sr = int(base.get("sample_rate", 11162))

    eng = SpectralNoiseEngine(build_noise_config(sr, base))
    out = eng.process_batch(np.asarray(clips, np.float32), sr=sr)
    dd = out["det_debug"]
    feats = {
        "primary": jnp.asarray(dd["primary_mode_flux"]),
        "s1": jnp.asarray(dd["support_mode_flux_1"]),
        "s2": jnp.asarray(dd["support_mode_flux_2"]),
        "s3": jnp.asarray(dd["support_mode_flux_3"]),
        "td_crest": jnp.asarray(dd["td_crest_factor"]),
    }
    return feats, base


def grid_search_vmapped(clips: np.ndarray, labels: np.ndarray,
                        threshold_grid: Dict[str, list],
                        base_params: Dict[str, Any] | None = None,
                        mesh=None) -> List[Dict[str, Any]]:
    """Device-vectorized sweep of the spectral detector's decision thresholds.

    For grids over *decision thresholds only* (the expensive front-end —
    prefilter, STFT, PSD tracking, flux normalization — is
    threshold-independent), compute features once per clip, then evaluate
    every combo as pure elementwise math on device.

    Supported knobs: ``new_rain_primary_flux_min``, ``new_rain_mode1/2/3_
    flux_min``, ``new_rain_min_support_count``, ``td_gate_threshold``,
    ``clip_rain_min_frames``.

    Boundary: STRUCTURAL parameters (``mode_bands``, ``n_fft``, ``hop``,
    prefilter settings, anything that changes the front-end computation) are
    NOT part of the vmapped sweep — put those in ``base_params`` (one
    front-end compile per structural setting) or use :func:`grid_search` /
    :func:`grid_search_parallel`, which recompile per combo.

    ``mesh``: optional ``jax.sharding.Mesh`` (e.g.
    :func:`audio_processing_tools_tpu.parallel.make_mesh`).  When given, the
    combo axis is sharded over the mesh's first axis (features replicate;
    combos are independent, so the sweep scales linearly over chips with no
    collectives — padded to a device multiple, pad rows dropped).

    Returns one result dict (accuracy + confusion counts) per combo.
    """
    import jax
    import jax.numpy as jnp

    feats, base = spectral_threshold_features(clips, base_params)

    combos = generate_param_combinations(threshold_grid)
    n_combos = len(combos)

    pad = 0
    if mesh is not None:
        n_dev = int(np.prod(list(mesh.shape.values())))
        pad = (-n_combos) % n_dev
    combos_p = combos + [combos[-1]] * pad if combos else combos

    def get(c, k, d):
        return float(c.get(k, base.get(k, d)))

    arr = lambda k, d: jnp.asarray([get(c, k, d) for c in combos_p])
    p_min = arr("new_rain_primary_flux_min", 1.8)
    m1 = arr("new_rain_mode1_flux_min", 2.6)
    m2 = arr("new_rain_mode2_flux_min", 2.6)
    m3 = arr("new_rain_mode3_flux_min", 3.0)
    msc = jnp.asarray([int(get(c, "new_rain_min_support_count", 2)) for c in combos_p])
    tdg = arr("td_gate_threshold", 2.5)
    cmin = jnp.asarray([max(1, int(get(c, "clip_rain_min_frames", 1))) for c in combos_p])

    def eval_combo(pm, m1v, m2v, m3v, mscv, tdgv, cminv):
        gate = (feats["td_crest"] > tdgv).astype(jnp.float32)
        f0 = jnp.log1p(jnp.maximum(feats["primary"] * gate, 0.0))
        f1 = jnp.log1p(jnp.maximum(feats["s1"] * gate, 0.0))
        f2 = jnp.log1p(jnp.maximum(feats["s2"] * gate, 0.0))
        f3 = jnp.log1p(jnp.maximum(feats["s3"] * gate, 0.0))
        hits = ((f1 >= m1v).astype(jnp.int32) + (f2 >= m2v).astype(jnp.int32)
                + (f3 >= m3v).astype(jnp.int32))
        is_rain = (f0 >= pm) & (hits >= mscv)
        counts = jnp.sum(is_rain, axis=-1)
        return counts >= cminv  # (B,) predicted

    combo_args = (p_min, m1, m2, m3, msc, tdg, cmin)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis0 = list(mesh.shape)[0]
        sh = NamedSharding(mesh, P(axis0))
        combo_args = tuple(jax.device_put(a, sh) for a in combo_args)

    predicted = jax.jit(jax.vmap(eval_combo))(*combo_args)
    predicted = np.asarray(predicted)[:n_combos]  # (n_combos, B)
    labels = np.asarray(labels, bool)

    results = []
    for i, combo in enumerate(combos):
        pred = predicted[i]
        tp = np.flatnonzero(pred & labels).tolist()
        tn = np.flatnonzero(~pred & ~labels).tolist()
        fp = np.flatnonzero(pred & ~labels).tolist()
        fn = np.flatnonzero(~pred & labels).tolist()
        acc = 1 - (len(fp) + len(fn)) / max(len(labels), 1)
        results.append({
            "parameters": combo, "overall_accuracy": acc,
            "tp_classifications": tp, "tn_classifications": tn,
            "fp_classifications": fp, "fn_classifications": fn,
        })
    return results


def roe_grid_search_vmapped(clips: np.ndarray, labels: np.ndarray,
                            threshold_grid: Dict[str, list],
                            base_params: Dict[str, Any] | None = None
                            ) -> List[Dict[str, Any]]:
    """Device-vectorized threshold sweep for the legacy RoE classifier.

    The expensive front-end (bandpass, STFT, SNR novelties, peak search, TD
    pulse features) runs once per clip (``roe_sweep_features``); every
    threshold combo is then re-evaluated as elementwise math
    (``roe_apply_thresholds``) vmapped over the grid.

    Sweepable knobs: ``harmonic_threshold`` (length-6 lists),
    ``kurtosis_thr``, ``crest_thr``, ``diff_energy_thr``, ``min_drop_count``,
    ``rain_drop_min_thr``, ``rain_drop_max_thr``, ``rain_peaks_min_thr``,
    ``rain_peaks_max_thr``. Structural parameters (bands, sample rate,
    handle_fp/fn) belong in ``base_params``.
    """
    import jax
    import jax.numpy as jnp

    from audio_processing_tools_tpu.models.roe import (
        build_roe_config,
        roe_apply_thresholds,
        roe_sweep_features,
    )

    base = dict(base_params or {})
    cfg = build_roe_config(**base)
    feats = roe_sweep_features(np.asarray(clips, np.float32), **base)

    combos = generate_param_combinations(threshold_grid)

    def get(c, name):
        v = c.get(name, base.get(name, getattr(cfg, name)))
        return v

    harm = jnp.asarray(
        [np.asarray(get(c, "harmonic_threshold"), np.float32) for c in combos]
    )
    scalars = {
        name: jnp.asarray([float(get(c, name)) for c in combos], jnp.float32)
        for name in ("kurtosis_thr", "crest_thr", "diff_energy_thr",
                     "min_drop_count", "rain_drop_min_thr",
                     "rain_drop_max_thr", "rain_peaks_min_thr",
                     "rain_peaks_max_thr")
    }

    def eval_combo(h6, k, cr, de, mdc, rdmin, rdmax, rpmin, rpmax):
        return roe_apply_thresholds(
            feats, harmonic_threshold=h6, kurtosis_thr=k, crest_thr=cr,
            diff_energy_thr=de, min_drop_count=mdc, rain_drop_min_thr=rdmin,
            rain_drop_max_thr=rdmax, rain_peaks_min_thr=rpmin,
            rain_peaks_max_thr=rpmax,
        )

    mods = jax.jit(jax.vmap(eval_combo))(
        harm, scalars["kurtosis_thr"], scalars["crest_thr"],
        scalars["diff_energy_thr"], scalars["min_drop_count"],
        scalars["rain_drop_min_thr"], scalars["rain_drop_max_thr"],
        scalars["rain_peaks_min_thr"], scalars["rain_peaks_max_thr"],
    )
    predicted = np.asarray(mods) > 0       # (n_combos, B)
    labels = np.asarray(labels, bool)

    results = []
    for i, combo in enumerate(combos):
        pred = predicted[i]
        tp = np.flatnonzero(pred & labels).tolist()
        tn = np.flatnonzero(~pred & ~labels).tolist()
        fp = np.flatnonzero(pred & ~labels).tolist()
        fn = np.flatnonzero(~pred & labels).tolist()
        results.append({
            "parameters": combo,
            "overall_accuracy": 1 - (len(fp) + len(fn)) / max(len(labels), 1),
            "tp_classifications": tp, "tn_classifications": tn,
            "fp_classifications": fp, "fn_classifications": fn,
            "rain_drop_count_mod": np.asarray(mods)[i].tolist(),
        })
    return results
