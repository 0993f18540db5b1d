"""Differential tests executing the reference FRAMEWORK tier.

Beyond the scipy-only edge modules (tests/test_reference_differential.py),
several more reference modules run here once their *import-time-only*
dependencies are stubbed (librosa / kaitaistruct / boto3 / sqlalchemy are
imported at module top but unused on the exercised paths):

  * ``parse.py`` — MARK header + PCM decode (kaitaistruct stream stubbed
    with a real byte reader, so the reference's actual parsing code runs)
  * ``alac_utils.rearrange`` — byte-for-byte CAF container equality
  * ``host_analysis/device_dsd_processing_emulator.py`` — the REAL firmware
    emulator as the oracle for both my emulator twin and the device path
  * ``processors.py`` / ``postprocess/`` / ``grid_search.py`` — adapter,
    legacy-table, and sweep/resume semantics
  * ``audio_processing_framework.py`` — the orchestrator itself, driven
    with identical injected loaders/processors on both sides

Skipped automatically when /root/reference is not mounted.
"""

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

REF_ROOT = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not REF_ROOT.is_dir(), reason="reference repo not mounted"
)
if REF_ROOT.is_dir() and str(REF_ROOT) not in sys.path:
    sys.path.insert(0, str(REF_ROOT))


# import-time stubs + faithful mini-shims (kaitai stream, numpy librosa)
if REF_ROOT.is_dir():
    from tests import ref_shims  # noqa: F401  (importing installs everything)

ref_parse = pytest.importorskip("audio_processing_tools.parse")
ref_alac = pytest.importorskip("audio_processing_tools.alac_utils")
ref_emu = pytest.importorskip(
    "audio_processing_tools.host_analysis.device_dsd_processing_emulator"
)
ref_procs = pytest.importorskip("audio_processing_tools.processors")
ref_pp_rain = pytest.importorskip("audio_processing_tools.postprocess.rain")
ref_pp_noise = pytest.importorskip("audio_processing_tools.postprocess.noise")
ref_gs = pytest.importorskip(
    "audio_processing_tools.edge.parameter_tuning.grid_search"
)
ref_fw = pytest.importorskip(
    "audio_processing_tools.audio_processing_framework"
)

from audio_processing_tools_tpu.io.mark import (  # noqa: E402
    create_dict_by_kaitai,
    parse_mark_audio_file,
    write_mark_audio_file,
)

FS = 11162


# ---------------------------------------------------------------------------
# parse.py — MARK header + PCM decode (reference parse.py:29-289)
# ---------------------------------------------------------------------------

def _mark_bytes(rng, n=FS, **kw):
    pcm = (rng.standard_normal(n) * 3000).astype(np.int16)
    return pcm, write_mark_audio_file(pcm, sample_rate=FS, timestamp=1712345678,
                                      device_id="DEVXY12345", **kw)


def test_parse_header_matches_reference(rng):
    _, blob = _mark_bytes(rng)
    ref_d = ref_parse.create_dict_by_kaitai(blob)
    got_d = create_dict_by_kaitai(blob)
    for key in ("sample_rate", "channels", "bit_depth", "endianness",
                "audio_file_version", "device", "ts"):
        assert got_d[key] == ref_d[key], key
    assert got_d["gps"] == ref_d["gps"]
    assert got_d["audio"] == ref_d["audio"]


def test_parse_pcm_matches_reference(rng):
    pcm, blob = _mark_bytes(rng)
    ref_sig, ref_meta = ref_parse.parse_mark_audio_file(blob)
    got_sig, got_meta = parse_mark_audio_file(blob)
    np.testing.assert_array_equal(got_sig, ref_sig)
    np.testing.assert_array_equal(ref_sig, pcm)
    for key in ("sample_rate", "channels", "bit_depth", "endianness",
                "device_id", "time", "duration", "audio_file_version",
                "format"):
        assert got_meta[key] == ref_meta[key], key


def test_parse_headerless_fallback_matches_reference(rng):
    """Corrupt magic -> both sides fall back to raw-PCM defaults
    (parse.py:202-215)."""
    pcm, blob = _mark_bytes(rng)
    corrupt = b"\x00\x00\x00\x00" + blob[4:]
    ref_sig, ref_meta = ref_parse.parse_mark_audio_file(corrupt)
    got_sig, got_meta = parse_mark_audio_file(corrupt)
    np.testing.assert_array_equal(got_sig, ref_sig)
    assert got_meta["sample_rate"] == ref_meta["sample_rate"] == 11162
    assert got_meta["format"] == ref_meta["format"] == "pcm"


def test_parse_misaligned_payload_matches_reference(rng):
    _, blob = _mark_bytes(rng)
    ref_sig, _ = ref_parse.parse_mark_audio_file(blob + b"\x07")  # odd byte
    got_sig, _ = parse_mark_audio_file(blob + b"\x07")
    np.testing.assert_array_equal(got_sig, ref_sig)


def test_pcm_to_float_matches_reference(rng):
    from audio_processing_tools_tpu.io.audio import pcm_to_float

    pcm = rng.integers(-32768, 32768, 1024, dtype=np.int16)
    np.testing.assert_array_equal(
        np.asarray(ref_parse.pcm_to_float(pcm)), np.asarray(pcm_to_float(pcm))
    )


# ---------------------------------------------------------------------------
# alac_utils.rearrange — byte-for-byte CAF equality (alac_utils.py:306-426)
# ---------------------------------------------------------------------------

def test_rearrange_matches_reference_bytes(tmp_path):
    golden = Path(__file__).parent / "fixtures" / "alac_golden.bin"
    if not golden.exists():
        pytest.skip("alac golden fixture missing")
    blob = golden.read_bytes()
    payload = blob[40:]  # raw ALAC stream after the 40-byte MARK header

    src = tmp_path / "raw.alac"
    src.write_bytes(payload)
    ref_out = tmp_path / "ref.caf"
    got_out = tmp_path / "got.caf"
    ref_alac.rearrange(str(src), str(ref_out))

    from audio_processing_tools_tpu.io.caf import rearrange
    rearrange(str(src), str(got_out))

    assert got_out.read_bytes() == ref_out.read_bytes(), (
        "CAF output differs from the reference re-containerizer"
    )


# ---------------------------------------------------------------------------
# DSD firmware emulator — the REAL reference emulator as oracle
# ---------------------------------------------------------------------------

def _rainish(rng, n):
    x = 0.0005 * rng.standard_normal(n)
    k = np.arange(800)
    ping = np.exp(-k / 60.0) * sum(
        a * np.sin(2 * np.pi * f * k / FS) for f, a in [(520, 1.0), (900, 0.5)]
    )
    for t0 in rng.integers(FS // 4, min(n - 1000, FS * 50), 25):
        x[t0 : t0 + 800] += 0.5 * ping
    return np.clip(x, -1, 1)


def test_dsd_emulator_twin_matches_reference(rng):
    """My emulator twin vs the ACTUAL reference firmware emulator,
    bit-for-bit, with duty cycling engaged (rain stops after minute 0)."""
    from audio_processing_tools_tpu.host_analysis.dsd_emulator import (
        DsdProcessingEmulator,
    )

    x = _rainish(rng, FS * 150)
    ref = ref_emu.DsdProcessingEmualtor(FS, 512, 512, False, 0)
    ref_out = ref.process_audio_data(x.astype(np.float64), 0)
    mine = DsdProcessingEmulator(FS, 512, 512, False, 0)
    got_out = mine.process_audio_data(x.astype(np.float64), 0)
    assert len(ref_out) == len(got_out) >= 2
    for m, (r, g) in enumerate(zip(ref_out, got_out)):
        np.testing.assert_array_equal(g, r, err_msg=f"minute {m}")


def test_dsd_device_path_matches_reference_emulator(rng):
    """The device duty-cycled path vs the ACTUAL reference emulator."""
    from audio_processing_tools_tpu.host_analysis.dsd_device import (
        dsd_minutes_device_duty_cycled,
    )

    x = _rainish(rng, FS * 150)
    ref = ref_emu.DsdProcessingEmualtor(FS, 512, 512, False, 0)
    ref_out = ref.process_audio_data(x.astype(np.float64), 0)
    got_out = dsd_minutes_device_duty_cycled(x.astype(np.float32), FS, 512)
    assert len(ref_out) == len(got_out) >= 2
    for m, (r, g) in enumerate(zip(ref_out, got_out)):
        np.testing.assert_array_equal(np.asarray(g), r, err_msg=f"minute {m}")


@pytest.mark.parametrize("draw", range(3))
def test_dsd_duty_cycle_pattern_fuzz_matches_reference(draw):
    """Seeded fuzz over rain-minute PATTERNS: duty cycling's skip/resume
    decisions depend on each minute's own output, so random on/off
    patterns walk different branches of the firmware schedule
    (``device_dsd_processing_emulator.py:256-314``). Bit-parity of both
    the emulator twin and the device path vs the actual reference."""
    from audio_processing_tools_tpu.host_analysis.dsd_device import (
        dsd_minutes_device_duty_cycled,
    )
    from audio_processing_tools_tpu.host_analysis.dsd_emulator import (
        DsdProcessingEmulator,
    )

    prng = np.random.default_rng(500 + draw)
    minutes = 4
    # half-minute tail: the emulator only emits COMPLETED minutes
    n = FS * 60 * minutes + FS * 30
    x = 0.0005 * prng.standard_normal(n)
    rain_minutes = [m for m in range(minutes) if prng.integers(0, 2)]
    k = np.arange(800)
    ping = np.exp(-k / 60.0) * sum(
        a * np.sin(2 * np.pi * f * k / FS)
        for f, a in [(520, 1.0), (900, 0.5)]
    )
    for m in rain_minutes:
        lo, hi = m * FS * 60, (m + 1) * FS * 60 - 1000
        for t0 in prng.integers(lo, hi, 25):
            x[t0 : t0 + 800] += 0.5 * ping
    x = np.clip(x, -1, 1)

    ref = ref_emu.DsdProcessingEmualtor(FS, 512, 512, False, 0)
    ref_out = ref.process_audio_data(x.astype(np.float64), 0)
    twin_out = DsdProcessingEmulator(FS, 512, 512, False, 0)\
        .process_audio_data(x.astype(np.float64), 0)
    dev_out = dsd_minutes_device_duty_cycled(x.astype(np.float32), FS, 512)
    assert len(ref_out) == len(twin_out) == len(dev_out) >= minutes
    for m, (r, t, d) in enumerate(zip(ref_out, twin_out, dev_out)):
        np.testing.assert_array_equal(
            t, r, err_msg=f"twin minute {m} (draw {draw}, rain {rain_minutes})"
        )
        np.testing.assert_array_equal(
            np.asarray(d), r,
            err_msg=f"device minute {m} (draw {draw}, rain {rain_minutes})",
        )


# ---------------------------------------------------------------------------
# processors.py adapter semantics
# ---------------------------------------------------------------------------

def _dummy_algo(audio, **params):
    drops = int((np.abs(audio) > 0.5).sum())
    state = {"rain_drop_count": drops, "rain_peaks_count": drops + 1,
             "note": "x"}
    return drops, 521.5, state


def test_rain_processor_adapter_matches_reference(rng):
    from audio_processing_tools_tpu.framework.processor import RainProcessor

    x = np.clip(0.3 * rng.standard_normal(FS), -1, 1).astype(np.float32)
    x[100:120] = 0.9
    params = {"sample_rate": FS, "check_duration": 0.5}
    ref_r, ref_s = ref_procs.RainProcessor(name="rain", fn=_dummy_algo).run(
        x, params)
    got_r, got_s = RainProcessor(name="rain", fn=_dummy_algo).run(x, params)
    for key in set(ref_r) - {"latency_s"}:
        assert got_r[key] == ref_r[key], key
    assert set(ref_r) == set(got_r)
    for key in set(ref_s) - {"latency_s"}:
        assert got_s[key] == ref_s[key], key


def test_processor_validation_matches_reference():
    from audio_processing_tools_tpu.framework.processor import RainProcessor

    params = {"sample_rate": FS, "check_duration": 10.0}
    short = np.zeros(100, np.float32)
    with pytest.raises(ValueError):
        ref_procs.RainProcessor(name="rain", fn=_dummy_algo).run(short, params)
    with pytest.raises(ValueError):
        RainProcessor(name="rain", fn=_dummy_algo).run(short, params)


# ---------------------------------------------------------------------------
# postprocess legacy tables
# ---------------------------------------------------------------------------

def _fake_frames():
    results = pd.DataFrame({
        "file_key": ["a.bin", "b.bin"],
        "rain_actual": [True, False],
        "rain__rain_drops": [7, 0],
        "rain__frain_mean": [520.0, 0.0],
        "rain__rain_drop_count": [7, 0],
        "rain__rain_peaks_count": [8, 1],
        "rain__latency_s": [0.01, 0.02],
    })
    states = pd.DataFrame({
        "file_key": ["a.bin", "b.bin"],
        "nov": [np.arange(4.0), np.zeros(4)],
        "kurtosis": [np.full(4, 3.0), np.zeros(4)],
        "crest_factor": [np.full(4, 4.0), np.zeros(4)],
        "diff_energy": [np.full(4, 7.0), np.zeros(4)],
        "latency_s": [0.01, 0.02],
    })
    return results, states


def test_postprocess_rain_matches_reference():
    from audio_processing_tools_tpu.postprocess.rain import postprocess_rain

    results, states = _fake_frames()
    params = {"rain_drop_min_thr": 3}
    ref_tr, ref_feat = ref_pp_rain.postprocess_rain(
        results.copy(), states.copy(), params)
    got_tr, got_feat = postprocess_rain(results.copy(), states.copy(), params)
    assert list(got_tr.columns) == list(ref_tr.columns)
    pd.testing.assert_frame_equal(
        got_tr.reset_index(drop=True), ref_tr.reset_index(drop=True),
        check_dtype=False,
    )
    assert list(got_feat.columns) == list(ref_feat.columns)


def test_postprocess_noise_matches_reference():
    from audio_processing_tools_tpu.postprocess.noise import postprocess_noise

    results = pd.DataFrame({
        "file_key": ["a.bin"],
        "rain_actual": [True],
        "noise__noise_snr_db": [12.5],
        "noise__noise_floor_db": [-61.0],
    })
    states = pd.DataFrame({"file_key": ["a.bin"]})
    ref_df = ref_pp_noise.postprocess_noise(results.copy(), states.copy(), {})
    got_df = postprocess_noise(results.copy(), states.copy(), {})
    assert list(got_df.columns) == list(ref_df.columns)
    pd.testing.assert_frame_equal(got_df, ref_df, check_dtype=False)


# ---------------------------------------------------------------------------
# grid search: combo generation + hash-file resume
# ---------------------------------------------------------------------------

def test_grid_combos_match_reference_order():
    """My generate_param_combinations must enumerate in the reference's
    itertools.product order (grid_search.py:84-86), so hash-file resume is
    interoperable between implementations."""
    from itertools import product

    from audio_processing_tools_tpu.tuning.grid_search import (
        generate_param_combinations,
    )

    grid = {"a": [1, 2], "b": ["x", "y"], "c": [0.5]}
    ref_combos = [dict(zip(grid.keys(), vals))
                  for vals in product(*grid.values())]
    assert generate_param_combinations(grid) == ref_combos


def test_grid_resume_interop_with_reference(tmp_path):
    """Resume interop both ways: a result saved by the REFERENCE's
    save_result_to_disk is recognized by my load_processed_param_ids (and
    vice versa), and both hash a combo's params_key identically."""
    from audio_processing_tools_tpu.tuning.grid_search import (
        load_processed_param_ids,
        params_to_filename,
        save_result_to_disk,
    )

    combo = {"thr": 1.8, "min_frames": 3, "fn": test_pcm_to_float_matches_reference}
    params_key = str(tuple(ref_gs.replace_callables(combo).items()))
    # identical hash segment (timestamp suffix intentionally differs)
    ref_name = ref_gs.params_to_filename(params_key, "alg")
    got_name = params_to_filename(params_key, "alg")
    assert ref_name.split("_")[1] == got_name.split("_")[1]

    result = {"parameters": ref_gs.replace_callables(combo),
              "overall_accuracy": 0.9}
    ref_gs.save_result_to_disk(result, str(tmp_path / ref_name))
    got_ids = load_processed_param_ids(str(tmp_path / "alg_*.json"))
    ref_ids = ref_gs.load_processed_param_ids(str(tmp_path / "alg_*.json"))
    assert got_ids == ref_ids and params_key in got_ids

    save_result_to_disk(result, str(tmp_path / got_name))
    assert params_key in ref_gs.load_processed_param_ids(
        str(tmp_path / "alg_*.json"))


# ---------------------------------------------------------------------------
# the orchestrator itself
# ---------------------------------------------------------------------------

def _keys_fn(InputType=None, **kw):
    return [
        {"file_key": "clip_true.bin", "raining": True},
        {"file_key": "quiet_false.bin", "raining": False},
        {"file_key": "mid.bin", "raining": False},
    ]


def _loader_fn(keys, *args, **kw):
    rng = np.random.default_rng(99)
    out = {}
    for k in keys:
        x = 0.05 * rng.standard_normal(FS).astype(np.float32)
        if k["raining"]:
            x[200:400] = 0.9
        out[k["file_key"]] = {
            "file_contents": x, "raining": k["raining"],
        }
    return out


def _run_both_frameworks(processors_ref, processors_got, **kw):
    from audio_processing_tools_tpu.framework.batch import (
        process_audio_batches_v2 as got_fw,
    )

    common = dict(
        params_global={"sample_rate": FS, "check_duration": 0.5},
        get_keys_fn=_keys_fn,
        get_input_data_fn=_loader_fn,
        batch_save_dir=None,
        debug_params={"rain_drop_min_thr": 3},
        **kw,
    )
    ref_res, ref_states = ref_fw.process_audio_batches_v2(
        processors=processors_ref, **common)
    got_res, got_states = got_fw(processors=processors_got, **common)
    return ref_res, ref_states, got_res, got_states


def test_orchestrator_matches_reference(rng):
    from audio_processing_tools_tpu.framework.processor import RainProcessor

    ref_res, ref_states, got_res, got_states = _run_both_frameworks(
        [ref_procs.RainProcessor(name="rain", fn=_dummy_algo)],
        [RainProcessor(name="rain", fn=_dummy_algo)],
    )
    # identical row set and namespaced columns
    assert set(got_res.columns) == set(ref_res.columns)
    ref_res = ref_res.sort_values("file_key").reset_index(drop=True)
    got_res = got_res.sort_values("file_key").reset_index(drop=True)
    for col in ref_res.columns:
        if col.endswith("latency_s"):
            continue
        pd.testing.assert_series_equal(
            got_res[col], ref_res[col], check_dtype=False,
            obj=f"results[{col}]",
        )
    # rain__predicted / rain__mismatch semantics
    assert "rain__predicted" in ref_res.columns
    assert (got_res["rain__predicted"] == ref_res["rain__predicted"]).all()
    assert (got_res["rain__mismatch"] == ref_res["rain__mismatch"]).all()
    # states carry the same keys
    assert set(got_states) == set(ref_states)
    assert set(got_states["rain"].columns) == set(ref_states["rain"].columns)


class _ParamEmitter:
    """Processor that emits a `_param_updates` chain update
    (audio_processing_framework.py:102-115)."""

    name = "emitter"

    def run(self, audio, params):
        return ({"val": 1.0, "_param_updates": {"injected_thr": 42}},
                {"note": "emitter"})


class _ParamConsumer:
    name = "consumer"

    def run(self, audio, params):
        return ({"saw_injected": params.get("injected_thr", -1)}, {})


def test_param_updates_chain_matches_reference():
    ref_res, _, got_res, _ = _run_both_frameworks(
        [_ParamEmitter(), _ParamConsumer()],
        [_ParamEmitter(), _ParamConsumer()],
    )
    assert (ref_res["consumer__saw_injected"] == 42).all()
    assert (got_res["consumer__saw_injected"] == 42).all()
    assert set(got_res.columns) == set(ref_res.columns)


# ---------------------------------------------------------------------------
# fetch.py on a shared fake boto session (fetch.py:52-170)
# ---------------------------------------------------------------------------

def test_fetch_matches_reference(tmp_path):
    from tests.test_fetch import FakeSession

    import audio_processing_tools_tpu.io.fetch as got_fetch
    ref_fetch = pytest.importorskip("audio_processing_tools.fetch")

    store = {"bkt": {"audio/DEV1/f/1700000000": b"\xAD\xFB\xCA\xDE" + b"X" * 96}}
    key = "audio/DEV1/f/1700000000"

    ref_s, got_s = FakeSession(store), FakeSession(store)
    ref_b = ref_fetch.fetch_raw_audio_from_s3(key, "bkt", boto_session=ref_s)
    got_b = got_fetch.fetch_raw_audio_from_s3(key, "bkt", boto_session=got_s)
    assert got_b == ref_b

    # header-only fetch must issue the same Range request
    ref_h = ref_fetch.fetch_raw_audio_from_s3(key, "bkt", boto_session=ref_s,
                                              header_only=True)
    got_h = got_fetch.fetch_raw_audio_from_s3(key, "bkt", boto_session=got_s,
                                              header_only=True)
    assert got_h == ref_h
    assert got_s.calls[-1]["range"] == ref_s.calls[-1]["range"] is not None

    ref_l = ref_fetch.list_audio_keys("audio/DEV1", "bkt", boto_session=ref_s)
    got_l = got_fetch.list_audio_keys("audio/DEV1", "bkt", boto_session=got_s)
    assert list(got_l) == list(ref_l)

    # cached fetch: same bytes, second call served without a new GET
    ref_cache = tmp_path / "ref_cache"
    got_cache = tmp_path / "got_cache"
    kw = dict(bucket="bkt", redownload=False, use_caching=True)
    r1 = ref_fetch.get_raw_audio_data(key, boto_session=ref_s,
                                      local_cache_location=str(ref_cache), **kw)
    g1 = got_fetch.get_raw_audio_data(key, boto_session=got_s,
                                      local_cache_location=str(got_cache), **kw)
    n_ref, n_got = len(ref_s.calls), len(got_s.calls)
    r2 = ref_fetch.get_raw_audio_data(key, boto_session=ref_s,
                                      local_cache_location=str(ref_cache), **kw)
    g2 = got_fetch.get_raw_audio_data(key, boto_session=got_s,
                                      local_cache_location=str(got_cache), **kw)
    assert r1 == r2 == g1 == g2
    assert len(ref_s.calls) == n_ref and len(got_s.calls) == n_got


# ---------------------------------------------------------------------------
# audio_io normalization + local key discovery (audio_io.py:34-225)
# ---------------------------------------------------------------------------

def test_audio_io_normalization_matches_reference(rng):
    ref_io = pytest.importorskip("audio_processing_tools.audio_io")
    from audio_processing_tools_tpu.io.audio import (
        ensure_mono_len_sr,
        safe_to_float,
    )

    pcm = rng.integers(-32768, 32768, 2048, dtype=np.int16)
    np.testing.assert_array_equal(
        safe_to_float(pcm), ref_io.safe_to_float(pcm))
    np.testing.assert_array_equal(
        safe_to_float(pcm.tobytes()), ref_io.safe_to_float(pcm.tobytes()))
    f32 = (0.3 * rng.standard_normal(512)).astype(np.float32)
    np.testing.assert_array_equal(
        safe_to_float(f32), ref_io.safe_to_float(f32))

    # stereo -> mono + trim (same sr: the librosa resample path stays cold)
    y = rng.standard_normal((2, FS * 2)).astype(np.float32)
    ref_y = ref_io.ensure_mono_len_sr(y, FS, FS, 1.0)
    got_y = ensure_mono_len_sr(y, FS, FS, 1.0)
    np.testing.assert_allclose(got_y, ref_y, atol=1e-7)
    # too-short input behaves identically
    short = np.zeros(100, np.float32)
    assert (ensure_mono_len_sr(short, FS, FS, 1.0) is None) == \
        (ref_io.ensure_mono_len_sr(short, FS, FS, 1.0) is None)


def test_local_file_list_matches_reference(tmp_path, rng):
    ref_io = pytest.importorskip("audio_processing_tools.audio_io")
    from audio_processing_tools_tpu.io.audio import get_local_file_list

    d = tmp_path / "vecs"
    d.mkdir()
    for name in ("a_True.bin", "b_False.bin", "c_true.wav", "nolabel.bin"):
        (d / name).write_bytes(b"\x00" * 64)
    ref_keys = ref_io.get_local_file_list(
        d, file_path=str(tmp_path / "ref.csv"), localStatus=True)
    got_keys = get_local_file_list(
        d, file_path=str(tmp_path / "got.csv"), localStatus=True)
    norm = lambda rows: sorted(
        (Path(r["source_file"]).name, bool(r["raining"])) for r in rows
    )
    assert norm(got_keys) == norm(ref_keys)


# ---------------------------------------------------------------------------
# NoiseProcessor + RainDetectorProcessor + BandNoiseEstimatorProcessor
# (noise_processor.py:15-129, rain_signal_processor.py:1205-1344,
#  edge/band_noise_processor.py:14-280)
# ---------------------------------------------------------------------------

def _rain_clip2(seed=77, seconds=2.0):
    rng = np.random.default_rng(seed)
    n = int(FS * seconds)
    x = 0.005 * rng.standard_normal(n)
    k = np.arange(800)
    ping = np.exp(-k / 60.0) * sum(
        a * np.sin(2 * np.pi * f * k / FS)
        for f, a in [(520, 1.0), (900, 0.5), (1600, 0.35), (2450, 0.25)]
    )
    for t0 in rng.integers(FS // 4, n - 1000, 20):
        x[t0 : t0 + 800] += 0.5 * ping
    return np.clip(x, -1, 1).astype(np.float32)


def _mode_bands():
    from audio_processing_tools_tpu.config import DEFAULT_MODE_BANDS
    return [list(b) for b in DEFAULT_MODE_BANDS]


def test_noise_processor_reference_is_broken_and_ours_fixes_it():
    """The reference NoiseProcessor cannot run against its own engine: it
    reads out["is_rain"] / out["x_hp"], keys SpectralNoiseProcessor never
    returns at the top level (noise_processor.py:96-105 vs
    rain_signal_processor.py:1175-1198 — they live inside `features`).
    SURVEY flagged this as a defect to fix, not replicate: pin the
    reference's failure and our adapter's working metrics."""
    ref_np_mod = pytest.importorskip("audio_processing_tools.noise_processor")
    from audio_processing_tools_tpu.framework.processor import NoiseProcessor

    x = _rain_clip2()
    params = {"sample_rate": FS, "check_duration": 1.0,
              "detector": {"mode_bands": _mode_bands()},
              "compute_output_audio": True, "return_spectra": True,
              "return_noise_psd": True, "return_filtered_audio": True}
    with pytest.raises(KeyError):
        ref_np_mod.NoiseProcessor(name="noise").run(x, params)
    got_m, got_s = NoiseProcessor(name="noise").run(x, params)
    assert np.isfinite(float(got_m["mean_noise_floor_db"]))
    assert 0.0 <= float(got_m["rain_frame_fraction"]) <= 1.0
    assert "is_rain" in got_s and "noise_psd" in got_s  # the fixed payload


def test_rain_detector_processor_clip_aggregation_matches_reference():
    from audio_processing_tools_tpu.models.spectral_noise import (
        RainDetectorProcessor,
    )

    x = _rain_clip2()
    params = {"sample_rate": FS, "check_duration": 1.0,
              "detector": {"mode_bands": _mode_bands()},
              "clip_rain_min_frames": 3}
    ref_m, ref_s = ref_rsp_proc().run(x, params)
    got_m, got_s = RainDetectorProcessor(name="rain_detector").run(x, params)
    shared = (set(ref_m) & set(got_m)) - {"latency_s"}
    assert {"clip_is_rain", "rain_frame_count"} <= shared
    assert bool(got_m["clip_is_rain"]) == bool(ref_m["clip_is_rain"])
    assert abs(int(got_m["rain_frame_count"]) - int(ref_m["rain_frame_count"])) <= 2
    for key in sorted(shared - {"clip_is_rain", "rain_frame_count"}):
        np.testing.assert_allclose(
            float(got_m[key]), float(ref_m[key]), rtol=5e-3, atol=5e-3,
            err_msg=f"clip metric {key!r} diverges from reference",
        )


def ref_rsp_proc():
    ref_rsp = pytest.importorskip(
        "audio_processing_tools.edge.rain_signal_processor")
    return ref_rsp.RainDetectorProcessor(name="rain_detector")


def test_band_noise_processor_matches_reference():
    ref_bnp = pytest.importorskip(
        "audio_processing_tools.edge.band_noise_processor")
    from audio_processing_tools_tpu.models.band_noise import (
        BandNoiseEstimatorProcessor,
    )

    x = _rain_clip2(seed=88)
    params = {"sample_rate": FS}
    ref_m, ref_s = ref_bnp.BandNoiseEstimatorProcessor(name="bn").run(x, params)
    got_m, got_s = BandNoiseEstimatorProcessor(name="bn").run(x, params)
    shared = (set(ref_m) & set(got_m)) - {"latency_s"}
    assert len(shared) >= 4, (set(ref_m), set(got_m))
    for key in sorted(shared):
        rv, gv = ref_m[key], got_m[key]
        if isinstance(rv, str) or isinstance(gv, str):
            assert str(gv) == str(rv), key
        elif isinstance(rv, (bool, np.bool_)):
            assert bool(gv) == bool(rv), key
        else:
            np.testing.assert_allclose(
                float(gv), float(rv), rtol=1e-3, atol=1e-6,
                err_msg=f"band-noise metric {key!r} diverges from reference",
            )
    # per-frame state arrays
    for key in ("N_E", "G_mag", "M_clean"):
        if key in ref_s and key in got_s:
            np.testing.assert_allclose(
                np.asarray(got_s[key], np.float64),
                np.asarray(ref_s[key], np.float64),
                rtol=5e-4, atol=1e-8,
                err_msg=f"band-noise state {key!r} diverges from reference",
            )


# ---------------------------------------------------------------------------
# dsp_integ two-pass confirm wrapper (dsp_integ.py:1309-1373)
# ---------------------------------------------------------------------------

def test_dsp_integ_two_pass_matches_reference():
    ref_di = pytest.importorskip(
        "audio_processing_tools.edge.parameter_tuning.dsp_integ")
    from audio_processing_tools_tpu.tuning.dsp_integ import (
        sample_classifier_to_evaluate,
    )

    x_rain = _rain_clip2(seed=91, seconds=6.0)
    rng = np.random.default_rng(92)
    x_none = (0.004 * rng.standard_normal(FS * 6)).astype(np.float32)
    assert bool(ref_di.sample_classifier_to_evaluate(x_rain)) == \
        bool(sample_classifier_to_evaluate(x_rain))
    assert bool(ref_di.sample_classifier_to_evaluate(x_none)) == \
        bool(sample_classifier_to_evaluate(x_none)) is False


# ---------------------------------------------------------------------------
# transform.py pure functions + parse tabular helpers
# ---------------------------------------------------------------------------

def _import_ref_transform():
    """transform.py imports the emulator by a path that does not exist in
    the packaged layout (`edge.device_dsd_processing_emulator`,
    transform.py:25 — SURVEY's documented reference defect). Alias the real
    module so the rest of transform.py can execute."""
    real = pytest.importorskip(
        "audio_processing_tools.host_analysis.device_dsd_processing_emulator"
    )
    sys.modules.setdefault(
        "audio_processing_tools.edge.device_dsd_processing_emulator", real
    )
    return pytest.importorskip("audio_processing_tools.transform")


def test_reference_transform_import_is_broken():
    """Pin the defect itself: the reference's import path fails unless the
    alias workaround is applied (this framework fixes the path for real)."""
    import importlib

    assert not (REF_ROOT / "audio_processing_tools" / "edge" /
                "device_dsd_processing_emulator.py").exists()
    if "audio_processing_tools.edge.device_dsd_processing_emulator" \
            not in sys.modules:
        with pytest.raises(ModuleNotFoundError):
            importlib.import_module(
                "audio_processing_tools.edge.device_dsd_processing_emulator")


def test_transform_functions_match_reference(rng):
    import datetime as dt

    ref_tr = _import_ref_transform()
    from audio_processing_tools_tpu.transform import (
        add_weighted_dsd_data,
        emulator_output_to_df,
        reverse_binning_func,
    )

    bins = np.arange(32, dtype=np.float64)
    np.testing.assert_allclose(
        reverse_binning_func(bins), ref_tr.reverse_binning_func(bins),
        rtol=1e-12,
    )

    vectors = [rng.integers(0, 9, 100).astype(np.float64) for _ in range(3)]
    t0 = dt.datetime(2024, 3, 1, 10, 0, 0)
    ref_df = ref_tr.emulator_output_to_df(vectors, "DEV42", t0)
    got_df = emulator_output_to_df(vectors, "DEV42", t0)
    assert list(got_df.columns) == list(ref_df.columns)
    pd.testing.assert_frame_equal(got_df, ref_df, check_dtype=False)

    ref_w = ref_tr.add_weighted_dsd_data(ref_df.copy(),
                                         add_weighted_dsd_sum=True)
    got_w = add_weighted_dsd_data(got_df.copy(), add_weighted_dsd_sum=True)
    assert list(got_w.columns) == list(ref_w.columns)
    pd.testing.assert_frame_equal(got_w, ref_w, check_dtype=False)


def test_tabularize_audio_data_matches_reference(rng):
    from audio_processing_tools_tpu.io.tabular import tabularize_audio_data

    key = ("raw_audio/DEV99/2024/03/01/"
           "20240301_10_00_00_000000_rain_001")
    pcm, blob = _mark_bytes(rng)
    raw = {key: blob}
    ref_df = ref_parse.tabularize_audio_data(raw)
    got_df = tabularize_audio_data(raw)
    assert set(ref_df.columns) <= set(got_df.columns) | {"signal"}
    np.testing.assert_array_equal(
        got_df.loc[key, "signal"].contents, ref_df.loc[key, "signal"].contents
    )
    for col in ref_df.columns:
        if col == "signal":
            continue
        assert got_df.loc[key, col] == ref_df.loc[key, col], col


def test_parse_s3_audio_key_matches_reference():
    from audio_processing_tools_tpu.io.mark import parse_s3_audio_key

    keys = [
        "raw_audio/DEV99/2024/03/01/20240301_10_00_00_000000_rain_001",
        "audio/DEVOLD/field/1700000000",
    ]
    for key in keys:
        ref_d = ref_parse.parse_s3_audio_key(key)
        got_d = parse_s3_audio_key(key)
        assert set(ref_d) <= set(got_d), (key, set(ref_d) - set(got_d))
        for k in ref_d:
            assert got_d[k] == ref_d[k], (key, k, got_d[k], ref_d[k])


# ---------------------------------------------------------------------------
# db_tools upsert flow (db_tools.py:44-139) on shared fake engines
# ---------------------------------------------------------------------------

def _norm_sql(s):
    return " ".join(str(s).split())


def test_db_upsert_flow_matches_reference(monkeypatch):
    ref_db = pytest.importorskip("audio_processing_tools.db_tools")
    from audio_processing_tools_tpu.io.db import upsert_df

    from tests.test_db import FakeEngine

    calls = []

    def fake_to_sql(self, name, conn, **kw):
        calls.append(name)

    monkeypatch.setattr(pd.DataFrame, "to_sql", fake_to_sql)

    df = pd.DataFrame(
        {"key": ["a", "b"], "time": [1, 2], "v": [0.5, 1.5]}
    ).set_index(["key", "time"])

    for exists in (False, True):
        ref_eng, got_eng = FakeEngine(exists), FakeEngine(exists)
        calls.clear()
        assert ref_db.upsert_df(df.copy(), "dsd_from_raw_audio", ref_eng)
        ref_to_sql = list(calls)
        calls.clear()
        assert upsert_df(df.copy(), "dsd_from_raw_audio", got_eng)
        got_to_sql = list(calls)

        ref_stmts = [_norm_sql(s) for s, _ in ref_eng.conn.executed]
        got_stmts = [_norm_sql(s) for s, _ in got_eng.conn.executed]

        # same write targets (temp tables carry a random suffix)
        assert len(got_to_sql) == len(ref_to_sql)
        for g, r in zip(got_to_sql, ref_to_sql):
            assert g.split("_")[:2] == r.split("_")[:2] or g == r

        if not exists:
            # create + unique constraint, NO upsert
            assert any("ADD CONSTRAINT uq_upsert_dsd_from_raw_audio_key_time"
                       in s for s in ref_stmts)
            assert any("ADD CONSTRAINT uq_upsert_dsd_from_raw_audio_key_time"
                       in s for s in got_stmts)
            assert not any("ON CONFLICT" in s for s in ref_stmts)
            assert not any("ON CONFLICT" in s for s in got_stmts)
        else:
            # identical conflict-key and EXCLUDED-update clauses
            ref_up = [s for s in ref_stmts if "ON CONFLICT" in s]
            got_up = [s for s in got_stmts if "ON CONFLICT" in s]
            assert len(ref_up) == len(got_up) == 1
            for frag in ('INSERT INTO "public"."dsd_from_raw_audio"',
                         'ON CONFLICT ("key", "time") DO UPDATE SET '
                         '"v" = EXCLUDED."v"'):
                assert frag in ref_up[0], frag
                assert frag in got_up[0], frag
            assert any(s.startswith('DROP TABLE "public"."tmp_')
                       for s in ref_stmts)
            assert any(s.startswith('DROP TABLE "public"."tmp_')
                       for s in got_stmts)


def test_get_db_data_sort_matches_reference(monkeypatch):
    ref_db = pytest.importorskip("audio_processing_tools.db_tools")
    from audio_processing_tools_tpu.io.db import get_db_data

    from tests.test_db import FakeEngine

    out = pd.DataFrame({"time": [3, 1, 2], "v": [30, 10, 20]})
    monkeypatch.setattr(pd, "read_sql_query",
                        lambda q, conn, params=None: out.copy())
    ref_df = ref_db.get_db_data("SELECT 1", FakeEngine(True))
    got_df = get_db_data("SELECT 1", FakeEngine(True))
    pd.testing.assert_frame_equal(got_df, ref_df)
    assert list(ref_df["time"]) == [1, 2, 3]
