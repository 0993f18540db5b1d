"""Tests for the MARK container, audio normalization, and key discovery."""

import numpy as np
import pytest

from audio_processing_tools_tpu.io.mark import (
    parse_mark_audio_file,
    parse_mark_header,
    write_mark_audio_file,
    parse_s3_audio_key,
    MarkHeaderError,
    HEADER_SIZE,
)
from audio_processing_tools_tpu.io.audio import (
    safe_to_float,
    ensure_mono_len_sr,
    pcm_to_float,
    get_keys,
    get_input_data,
    load_wav,
    write_wav,
)
from audio_processing_tools_tpu.io.caf import rearrange_bytes, read_ber_integer

FS = 11162


def test_mark_roundtrip(rng):
    pcm = (rng.standard_normal(FS) * 1000).astype(np.int16)
    blob = write_mark_audio_file(
        pcm, sample_rate=FS, timestamp=1700000000, device_id="DEV1234",
        lat=37.5, lon=-122.1, alt=12.0,
    )
    assert len(blob) == HEADER_SIZE + 2 * FS
    sig, meta = parse_mark_audio_file(blob)
    np.testing.assert_array_equal(sig, pcm)
    assert meta["sample_rate"] == FS
    assert meta["device_id"] == "DEV1234"
    assert meta["time"] == 1700000000
    assert abs(meta["lat"] - 37.5) < 1e-5
    assert meta["format"] == "pcm"
    assert meta["duration"] == round(FS / FS, 2)


def test_mark_header_only(rng):
    blob = write_mark_audio_file(np.zeros(10, np.int16), sample_rate=FS)
    hdr = parse_mark_header(blob[:HEADER_SIZE] + b"")
    assert hdr["sample_rate"] == FS
    with pytest.raises(MarkHeaderError):
        parse_mark_header(b"\x00" * 40)


def test_mark_headerless_fallback(rng, capsys):
    """No magic -> raw PCM defaults (reference parse.py:202-215)."""
    pcm = (rng.standard_normal(500) * 100).astype(np.int16)
    sig, meta = parse_mark_audio_file(pcm.tobytes())
    np.testing.assert_array_equal(sig, pcm)
    assert meta["sample_rate"] == 11162 and meta["bit_depth"] == 16


def test_mark_odd_payload_aligned(rng):
    pcm = (rng.standard_normal(100)).astype(np.int16)
    blob = write_mark_audio_file(pcm, sample_rate=FS) + b"\x55"  # stray byte
    sig, _ = parse_mark_audio_file(blob)
    assert sig.size == 100


def test_mark_big_endian(rng):
    pcm = (rng.standard_normal(64) * 3000).astype(np.int16)
    blob = write_mark_audio_file(pcm, sample_rate=FS, endianness=1)
    sig, meta = parse_mark_audio_file(blob)
    np.testing.assert_array_equal(sig, pcm)
    assert meta["endianness"] == 1


def test_safe_to_float(rng):
    i16 = np.array([-32767, 0, 32767], np.int16)
    out = safe_to_float(i16)
    np.testing.assert_allclose(out, [-1.0, 0.0, 1.0], atol=1e-6)
    out2 = safe_to_float(i16.tobytes())
    np.testing.assert_allclose(out2, [-1.0, 0.0, 1.0], atol=1e-6)
    f = np.array([-2.0, 0.5, 2.0], np.float64)
    np.testing.assert_allclose(safe_to_float(f), [-1.0, 0.5, 1.0])
    with pytest.raises(ValueError):
        safe_to_float(np.zeros(3, np.int32))
    assert pcm_to_float(np.int16(16384)) == 16384 / 32768


def test_ensure_mono_len_sr(rng):
    y = rng.standard_normal((2, FS * 2)).astype(np.float32) * 0.1
    out = ensure_mono_len_sr(y, FS, FS, 1.0)
    assert out.shape == (FS,)
    np.testing.assert_allclose(out, y.mean(axis=0)[:FS], atol=1e-6)
    # resample path
    out2 = ensure_mono_len_sr(rng.standard_normal(44100).astype(np.float32), 44100, FS, 0.5)
    assert out2.shape == (FS // 2,)
    # too short -> None
    assert ensure_mono_len_sr(np.zeros(100, np.float32), FS, FS, 1.0) is None


def test_wav_roundtrip(tmp_path, rng):
    y = (0.5 * np.sin(2 * np.pi * 440 * np.arange(FS) / FS)).astype(np.float32)
    path = str(tmp_path / "t.wav")
    write_wav(path, y, FS)
    y2, sr = load_wav(path)
    assert sr == FS
    np.testing.assert_allclose(y2, y, atol=1e-4)


def test_parse_s3_audio_key():
    info = parse_s3_audio_key("audio/DEV1/loc-a/1678743960")
    assert info["device_id"] == "DEV1"
    assert info["time"].year >= 2023
    info2 = parse_s3_audio_key(
        "raw_audio/DEV2/a/b/c/20240105_12_30_00_000000_rain_007"
    )
    assert info2["device_id"] == "DEV2"
    assert (info2["time"].month, info2["time"].day) == (1, 5)
    with pytest.raises(ValueError):
        parse_s3_audio_key("other/DEV1/x/1")


def test_get_keys_local(tmp_path, rng):
    d = tmp_path / "vecs"
    (d / "sub").mkdir(parents=True)
    for name, label in [("a_true.bin", True), ("b_false.bin", False),
                        ("sub/c.wav", None)]:
        blob = write_mark_audio_file(np.zeros(100, np.int16), sample_rate=FS)
        (d / name).write_bytes(blob)
    keys = get_keys("LocalPath", test_vector_path=str(d), localStatus=True)
    by_name = {k["source_file"].split("/")[-1]: k["raining"] for k in keys}
    assert by_name["a_true.bin"] is True
    assert by_name["b_false.bin"] is False
    assert by_name["c.wav"] is True  # falls back to localStatus
    with pytest.raises(ValueError):
        get_keys("Bogus")


def test_get_input_data_local(tmp_path, rng):
    d = tmp_path / "corpus"
    d.mkdir()
    pcm = (rng.standard_normal(FS * 2) * 1000).astype(np.int16)
    (d / "x_true.bin").write_bytes(write_mark_audio_file(pcm, sample_rate=FS))
    write_wav(str(d / "y_false.wav"), rng.standard_normal(FS * 2).astype(np.float32) * 0.1, FS)
    (d / "short.bin").write_bytes(
        write_mark_audio_file(np.zeros(10, np.int16), sample_rate=FS)
    )
    keys = get_keys("LocalPath", test_vector_path=str(d))
    data = get_input_data(keys, "LocalPath", FS, 1.0, True, None, None, 2)
    assert len(data) == 2  # short file skipped
    for k, v in data.items():
        assert v["file_contents"].shape == (FS,)
        assert v["file_contents"].dtype == np.float32


def test_get_input_data_augmentation(tmp_path, rng):
    d = tmp_path / "c2"
    d.mkdir()
    pcm = (rng.standard_normal(FS) * 1000).astype(np.int16)
    (d / "x_true.bin").write_bytes(write_mark_audio_file(pcm, sample_rate=FS))
    keys = get_keys("LocalPath", test_vector_path=str(d))

    def injector(key, y):
        return y + 0.01, {"kind": "offset"}

    data = get_input_data(
        keys, "LocalPath", FS, 0.5, True, None, None, 2, noise_injector=injector
    )
    (entry,) = data.values()
    assert entry["synthetic_noise_info"] == {"kind": "offset"}


def test_ber_integer():
    assert read_ber_integer(bytes([0x05]), 2) == (5, 1)
    assert read_ber_integer(bytes([0x81, 0x02]), 2) == (0x82, 2)
    assert read_ber_integer(bytes([0x7F, 0xFF]), 2) == (0x7F, 1)


def test_caf_container_structure():
    """CAF writer emits the expected chunk sequence and copies packets."""
    # two fake BER-framed packets: sizes 3 and 2, table-entry length 1
    payload = bytes([3, 0, 1]) + b"abc" + bytes([2, 0, 1]) + b"de"
    caf = rearrange_bytes(payload)
    assert caf[:8] == b"caff\x00\x01\x00\x00"
    assert b"desc" in caf and b"kuki" in caf and b"pakt" in caf and b"data" in caf
    didx = caf.index(b"data")
    # data chunk header is 16 bytes; payloads copied consecutively after it
    assert caf[didx + 16 : didx + 16 + 5] == b"abcde"
    # leading MARK magic is skipped (magic stored LE in the stream)
    caf2 = rearrange_bytes(b"\xAD\xFB\xCA\xDE" + b"\x00" * 36 + payload)
    didx2 = caf2.index(b"data")
    assert caf2[didx2 + 16 : didx2 + 16 + 5] == b"abcde"


# ---------------------------------------------------------------------------
# remote input types on fakes (RemotePath / CsvInput / KeyList, remote loader)


def test_get_keys_remote_types(tmp_path, monkeypatch, rng):
    import pandas as pd

    import audio_processing_tools_tpu.io.db as db

    labels = pd.DataFrame({
        "source_file": ["audio/D1/f/100", "audio/D2/f/200"],
        "raining": [True, False],
    })
    queries = []

    def fake_get_db_data(q, engine, **kw):
        queries.append(q)
        return labels

    monkeypatch.setattr(db, "get_db_data", fake_get_db_data)
    monkeypatch.chdir(tmp_path)  # avoid the db_keys.csv cwd cache

    # RemotePath
    keys = get_keys("RemotePath", query="SELECT 1", adse_engine=object())
    assert keys == labels.to_dict(orient="records")

    # KeyList: hydrates labels from the classification table
    keys = get_keys("KeyList", key_list=["audio/D1/f/100", "audio/D2/f/200"],
                    adse_engine=object())
    assert {k["source_file"] for k in keys} == set(labels["source_file"])
    assert "device_audio_rain_classification" in queries[-1]

    # CsvInput
    csv = tmp_path / "keys.csv"
    pd.DataFrame({"source_file": labels["source_file"]}).to_csv(csv, index=False)
    keys = get_keys("CsvInput", csv_inp_file=str(csv), adse_engine=object())
    assert len(keys) == 2

    # validation errors
    with pytest.raises(ValueError, match="query"):
        get_keys("RemotePath", adse_engine=object())
    with pytest.raises(ValueError, match="key_list"):
        get_keys("KeyList", adse_engine=object())
    with pytest.raises(ValueError, match="csv_inp_file"):
        get_keys("CsvInput", adse_engine=object())


def test_get_input_data_remote(monkeypatch, rng):
    import audio_processing_tools_tpu.io.fetch as fetch
    from audio_processing_tools_tpu.io.mark import write_mark_audio_file

    pcm = (rng.standard_normal(FS * 2) * 3000).astype(np.int16)
    blob = write_mark_audio_file(pcm, sample_rate=FS, device_id="R1")
    short = write_mark_audio_file(pcm[: FS // 2], sample_rate=FS)

    def fake_fetch(keys=(), **kw):
        m = {"audio/D1/f/100": blob, "audio/D1/f/200": short}
        return {k: m[k] for k in keys if k in m}

    monkeypatch.setattr(fetch, "get_device_raw_audio_data", fake_fetch)

    batch = [
        {"source_file": "audio/D1/f/100", "raining": True},
        {"source_file": "audio/D1/f/200", "raining": False},  # too short
        {"source_file": "audio/D1/f/300", "raining": False},  # missing
    ]
    data = get_input_data(batch, "RemotePath", FS, 1.0, False, None, None, 2)
    assert set(data) == {"audio/D1/f/100"}
    entry = data["audio/D1/f/100"]
    assert entry["raining"] is True
    y = entry["file_contents"]
    assert y.dtype == np.float32 and y.shape == (FS,)
    assert np.abs(y).max() <= 1.0


def test_audio_metadata_handler_fake_backend(monkeypatch, rng):
    """AudioMetadataHandler (reference parse.py:674-757): fetch headers,
    batch rows, upsert to audio_metadata."""
    import audio_processing_tools_tpu.io.fetch as fetch
    import audio_processing_tools_tpu.io.db as db
    from audio_processing_tools_tpu.io.tabular import AudioMetadataHandler
    from audio_processing_tools_tpu.io.mark import write_mark_audio_file

    keys = [f"audio/D{i}/f/{1700000000 + i}" for i in range(5)]
    blobs = {
        k: write_mark_audio_file(
            (rng.standard_normal(FS) * 500).astype(np.int16),
            sample_rate=FS, timestamp=1700000000 + i, device_id=f"D{i}",
        )
        for i, k in enumerate(keys)
    }
    monkeypatch.setattr(fetch, "get_device_raw_audio_data",
                        lambda keys=(), **kw: {k: blobs[k] for k in keys
                                               if k in blobs})
    upserts = []
    monkeypatch.setattr(db, "upsert_df",
                        lambda df, table, eng, **kw: upserts.append((table, df)))

    h = AudioMetadataHandler(keys + ["audio/MISSING/f/0"], object(),
                             batch_size=2)
    h.fetch_and_store_metadata()
    assert sum(len(df) for _, df in upserts) == 5  # missing key skipped
    assert all(t == "audio_metadata" for t, _ in upserts)
    first = upserts[0][1]
    assert first.index.name == "source_key"
    for col in ("device_id", "time", "sample_rate", "lat", "long", "duration"):
        assert col in first.columns, col
    assert list(first["device_id"]) == ["D0", "D1"]  # batch_size=2 flushes


def test_mark_parser_fuzz_random_bytes(rng):
    """Random bytes never crash the parser: bad magic falls back to raw-PCM
    defaults (reference parse.py:202-215)."""
    from audio_processing_tools_tpu.io.mark import parse_mark_audio_file

    for n in (0, 1, 39, 40, 41, 100, 4096):
        blob = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        if blob[:4] == b"\xAD\xFB\xCA\xDE":  # astronomically unlikely
            continue
        sig, meta = parse_mark_audio_file(blob)
        assert meta["sample_rate"] == 11162 and meta["format"] == "pcm"
        assert sig.dtype == np.int16 and len(sig) == n // 2


def test_mark_parser_fuzz_corrupt_headers(rng):
    """Valid magic + garbage header fields parse without crashing."""
    from audio_processing_tools_tpu.io.mark import (
        MARK_MAGIC,
        parse_mark_audio_file,
    )

    for _ in range(20):
        body = rng.integers(0, 256, 36, dtype=np.uint8).tobytes()
        payload = rng.integers(0, 256, 200, dtype=np.uint8).tobytes()
        blob = MARK_MAGIC + body + payload
        ver = blob[15]
        if ver >= 1:
            continue  # garbage ALAC payloads legitimately error
        bits = blob[13]
        if bits != 0 and (bits % 8 != 0):
            with pytest.raises(ValueError, match="bit depth"):
                parse_mark_audio_file(blob)
            continue
        sig, meta = parse_mark_audio_file(blob)
        assert sig.dtype == np.int16


def test_ber_integer_properties():
    from audio_processing_tools_tpu.io.caf import read_ber_integer

    # canonical encodings round-trip
    for v in (0, 1, 127, 128, 255, 16383):
        if v < 0x80:
            enc = bytes([v])
        else:
            enc = bytes([0x80 | (v >> 7), v & 0x7F])
        got, used = read_ber_integer(enc + b"\xff", len(enc))
        assert (got, used) == (v, len(enc))
    # runaway continuation bytes terminate safely
    v, used = read_ber_integer(b"\xff" * 10, 10)
    assert v == 0 and used == 6


def test_mark_parser_fuzz_garbage_alac_payloads_fail_cleanly(rng):
    """file_version>=1 routes random payloads into the IN-PROCESS native
    ALAC decoder: they must raise a clean Python error (or, rarely,
    decode as far as the payload allows) — never crash the process. This
    is the memory-safety fuzz for native/alac_decode.cpp's input
    validation."""
    from audio_processing_tools_tpu.io.mark import (
        MARK_MAGIC,
        parse_mark_audio_file,
    )

    survived = 0
    for i in range(30):
        body = bytearray(rng.integers(0, 256, 36, dtype=np.uint8).tobytes())
        body[11] = 1 + int(rng.integers(0, 3))     # file_version 1-3 -> ALAC
        n_payload = int(rng.integers(0, 4000))
        payload = rng.integers(0, 256, n_payload, dtype=np.uint8).tobytes()
        blob = MARK_MAGIC + bytes(body) + payload
        try:
            sig, meta = parse_mark_audio_file(blob)
            assert sig.dtype == np.int16
            survived += 1
        except Exception as e:
            assert not isinstance(e, (MemoryError, SystemError)), e
    # the point is the loop FINISHED (no segfault/abort); a few blobs
    # decoding by luck is fine
    assert survived >= 0
