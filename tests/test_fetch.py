"""S3 fetch layer on a fake boto session: cache, Range reads, bucket
fallback, threaded multi-key fetch, key-layout date filtering.

The reference's L0 behaviors (``fetch.py:52-353``) exercised without
boto3/network: a fake session implements just the client/resource surface
the code touches.
"""

import datetime as dt
import types

import pytest

import audio_processing_tools_tpu.io.fetch as fetch


class FakeBody:
    def __init__(self, data):
        self._data = data

    def read(self):
        return self._data


class FakeS3Client:
    def __init__(self, store, calls):
        self.store = store
        self.calls = calls

    def get_object(self, Bucket, Key, Range=None):
        self.calls.append({"bucket": Bucket, "key": Key, "range": Range})
        if Bucket not in self.store or Key not in self.store[Bucket]:
            raise KeyError(f"NoSuchKey: {Bucket}/{Key}")
        data = self.store[Bucket][Key]
        if Range is not None:
            assert Range.startswith("bytes=")
            lo, hi = (int(v) for v in Range[6:].split("-"))
            data = data[lo : hi + 1]
        return {"Body": FakeBody(data)}


class FakeSession:
    def __init__(self, store):
        self.store = store
        self.calls = []

    def client(self, name):
        assert name == "s3"
        return FakeS3Client(self.store, self.calls)

    def resource(self, name):
        assert name == "s3"
        store = self.store

        class _Objects:
            def __init__(self, bucket):
                self.bucket = bucket

            def filter(self, Prefix):
                return [
                    types.SimpleNamespace(key=k)
                    for k in sorted(store.get(self.bucket, {}))
                    if k.startswith(Prefix)
                ]

        class _Bucket:
            def __init__(self, name):
                self.objects = _Objects(name)

        return types.SimpleNamespace(Bucket=_Bucket)


@pytest.fixture()
def fake_s3():
    ts = 1700000000
    store = {
        "arable-device-data": {
            f"audio/DEV1/field/{ts}": b"\xAD\xFB\xCA\xDE" + b"P" * 100,
            f"audio/DEV1/field/{ts + 3600}": b"\xAD\xFB\xCA\xDE" + b"Q" * 100,
            "raw_audio/DEV1/x/y/z/20240103_10_00_00_000000_rain_001": b"R" * 50,
        },
        "arable-device-data-test": {
            "audio/DEV2/field/123": b"onlyintest",
        },
    }
    return FakeSession(store), ts


def test_header_only_range_read(fake_s3, tmp_path):
    sess, ts = fake_s3
    data = fetch.fetch_raw_audio_from_s3(
        f"audio/DEV1/field/{ts}", "arable-device-data", boto_session=sess,
        header_only=True,
    )
    assert len(data) == 40
    assert sess.calls[-1]["range"] == "bytes=0-39"


def test_cached_fetch_hits_s3_once(fake_s3, tmp_path):
    sess, ts = fake_s3
    key = f"audio/DEV1/field/{ts}"
    a = fetch.get_raw_audio_data(key, "arable-device-data", boto_session=sess,
                                 local_cache_location=str(tmp_path))
    n_calls = len(sess.calls)
    b = fetch.get_raw_audio_data(key, "arable-device-data", boto_session=sess,
                                 local_cache_location=str(tmp_path))
    assert a == b
    assert len(sess.calls) == n_calls  # second read came from disk
    # redownload forces a new request
    fetch.get_raw_audio_data(key, "arable-device-data", boto_session=sess,
                             local_cache_location=str(tmp_path),
                             redownload=True)
    assert len(sess.calls) == n_calls + 1


def test_bucket_fallback(fake_s3, tmp_path):
    sess, _ = fake_s3
    out = fetch.get_device_raw_audio_data(
        keys=["audio/DEV2/field/123"], boto_session=sess,
        local_cache_location=str(tmp_path), max_threads=2,
    )
    assert out["audio/DEV2/field/123"] == b"onlyintest"
    # first bucket (test) was tried first per DEFAULT_BUCKETS order
    tried = [c["bucket"] for c in sess.calls if c["key"] == "audio/DEV2/field/123"]
    assert tried[0] == "arable-device-data-test"


def test_threaded_multikey_fetch(fake_s3, tmp_path):
    sess, ts = fake_s3
    keys = [f"audio/DEV1/field/{ts}", f"audio/DEV1/field/{ts + 3600}",
            "audio/MISSING/field/0"]
    out = fetch.get_device_raw_audio_data(
        keys=keys, boto_session=sess, local_cache_location=str(tmp_path),
        max_threads=3,
    )
    assert set(out) == set(keys[:2])  # missing key skipped, not fatal


def test_device_audio_keys_date_filtering(fake_s3):
    sess, ts = fake_s3
    t0 = dt.datetime.fromtimestamp(ts)
    keys = fetch.get_device_audio_keys(
        "DEV1", t0 - dt.timedelta(minutes=1), t0 + dt.timedelta(minutes=1),
        "arable-device-data", "audio", boto_session=sess,
    )
    assert keys == [f"audio/DEV1/field/{ts}"]
    keys2 = fetch.get_device_audio_keys(
        "DEV1", dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 5),
        "arable-device-data", "raw_audio", boto_session=sess,
    )
    assert keys2 == ["raw_audio/DEV1/x/y/z/20240103_10_00_00_000000_rain_001"]
    with pytest.raises(ValueError, match="parent folder"):
        fetch.get_device_audio_keys("DEV1", t0, t0, "arable-device-data",
                                    "bogus", boto_session=sess)


def test_date_range_discovery_fetch(fake_s3, tmp_path):
    sess, ts = fake_s3
    t0 = dt.datetime.fromtimestamp(ts)
    out = fetch.get_device_raw_audio_data(
        device="DEV1", start_date=t0 - dt.timedelta(hours=2),
        end_date=t0 + dt.timedelta(hours=2), boto_session=sess,
        local_cache_location=str(tmp_path), max_threads=2,
    )
    assert len(out) == 2  # both legacy-layout recordings in range


def test_cached_fetch_needs_no_session(fake_s3, tmp_path, monkeypatch):
    """Fully-cached multi-key fetch never builds a boto session (works on
    hosts without boto3)."""
    sess, ts = fake_s3
    key = f"audio/DEV1/field/{ts}"
    fetch.get_device_raw_audio_data(keys=[key], boto_session=sess,
                                    local_cache_location=str(tmp_path))

    def boom(*a, **k):
        raise AssertionError("session built for a cached read")

    monkeypatch.setattr(fetch, "get_prod_boto_session", boom)
    out = fetch.get_device_raw_audio_data(
        keys=[key], boto_session=None, local_cache_location=str(tmp_path),
    )
    assert out[key].startswith(b"\xAD\xFB\xCA\xDE")
