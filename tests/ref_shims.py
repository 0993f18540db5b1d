"""Dependency shims that let REFERENCE modules execute in this container.

Two kinds:

* **Inert stubs** for deps the exercised reference paths never call
  (boto3 / sqlalchemy / plotly / IPython-display glue): importing succeeds,
  calling raises.
* **Faithful mini-implementations** for deps the exercised paths DO call:
  a real Kaitai byte stream, and a NumPy `librosa` shim implementing
  ``stft`` / ``istft`` / ``fft_frequencies`` / ``frames_to_time`` /
  ``amplitude_to_db`` with librosa>=0.10 semantics (hann ``fftbins`` window,
  ``center=True`` constant padding of ``n_fft//2``, squared-window
  overlap-add normalization in istft).  The shim is what makes the
  reference's ``SpectralNoiseProcessor`` and legacy RoE pipeline runnable
  as differential oracles; its own fidelity is pinned by
  ``test_reference_differential_engine.py::test_librosa_shim_selfchecks``.

Import this module BEFORE importing any ``audio_processing_tools`` module
that needs the stubs (simply importing it installs everything once).
"""

from __future__ import annotations

import struct
import sys
import types

import numpy as np
import scipy.signal as spsig


def _unused(*_a, **_k):
    raise NotImplementedError("stubbed dependency was called by the test path")


def _module(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


# ---------------------------------------------------------------------------
# faithful librosa mini-shim
# ---------------------------------------------------------------------------

def _hann(win_length: int) -> np.ndarray:
    return spsig.get_window("hann", win_length, fftbins=True)


def _get_window(window, win_length):
    if isinstance(window, str):
        return spsig.get_window(window, win_length, fftbins=True)
    w = np.asarray(window, dtype=np.float64)
    if w.size != win_length:
        raise ValueError("window length mismatch")
    return w


def shim_stft(y, n_fft=2048, hop_length=None, win_length=None, window="hann",
              center=True, pad_mode="constant", dtype=None):
    y = np.asarray(y, dtype=np.float64).reshape(-1)
    if win_length is None:
        win_length = n_fft
    if hop_length is None:
        hop_length = win_length // 4
    w = _get_window(window, win_length)
    if win_length < n_fft:  # pad window to n_fft, centered
        lpad = (n_fft - win_length) // 2
        w = np.pad(w, (lpad, n_fft - win_length - lpad))
    if center:
        mode = "constant" if pad_mode == "constant" else pad_mode
        y = np.pad(y, n_fft // 2, mode=mode)
    if len(y) < n_fft:
        raise ValueError("input too short for n_fft")
    T = 1 + (len(y) - n_fft) // hop_length
    idx = np.arange(T)[:, None] * hop_length + np.arange(n_fft)[None, :]
    frames = y[idx] * w[None, :]
    return np.fft.rfft(frames, axis=-1).T.astype(np.complex64
                                                 if dtype is None else dtype)


def shim_istft(S, hop_length=None, win_length=None, window="hann",
               center=True, length=None, dtype=None):
    S = np.asarray(S)
    n_fft = 2 * (S.shape[0] - 1)
    if win_length is None:
        win_length = n_fft
    if hop_length is None:
        hop_length = win_length // 4
    w = _get_window(window, win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        w = np.pad(w, (lpad, n_fft - win_length - lpad))
    T = S.shape[1]
    n = n_fft + hop_length * (T - 1)
    y = np.zeros(n, np.float64)
    wss = np.zeros(n, np.float64)
    frames = np.fft.irfft(S.T, n=n_fft, axis=-1)
    for t in range(T):
        sl = slice(t * hop_length, t * hop_length + n_fft)
        y[sl] += frames[t] * w
        wss[sl] += w ** 2
    good = wss > np.finfo(np.float64).tiny
    y[good] /= wss[good]
    if center:
        y = y[n_fft // 2 :]
        if length is None:
            y = y[: max(0, n - n_fft)]
    if length is not None:
        if len(y) >= length:
            y = y[:length]
        else:
            y = np.pad(y, (0, length - len(y)))
    return y.astype(np.float32 if dtype is None else dtype)


def shim_fft_frequencies(*, sr=22050, n_fft=2048):
    return np.fft.rfftfreq(n=n_fft, d=1.0 / sr)


def shim_frames_to_time(frames, *, sr=22050, hop_length=512, n_fft=None):
    frames = np.asarray(frames)
    offset = (n_fft // 2) if n_fft is not None else 0
    return (frames * hop_length + offset) / float(sr)


def shim_power_to_db(S, ref=1.0, amin=1e-10, top_db=80.0):
    S = np.asarray(S, dtype=np.float64)
    ref_value = np.abs(ref(S)) if callable(ref) else np.abs(ref)
    log_spec = 10.0 * np.log10(np.maximum(amin, S))
    log_spec -= 10.0 * np.log10(np.maximum(amin, ref_value))
    if top_db is not None:
        log_spec = np.maximum(log_spec, log_spec.max() - top_db)
    return log_spec


def shim_amplitude_to_db(S, ref=1.0, amin=1e-5, top_db=80.0):
    magnitude = np.abs(np.asarray(S, dtype=np.float64))
    ref_value = np.abs(ref(magnitude)) if callable(ref) else np.abs(ref)
    return shim_power_to_db(magnitude ** 2, ref=ref_value ** 2,
                            amin=amin ** 2, top_db=top_db)


# ---------------------------------------------------------------------------
# kaitai byte stream (real reader: reference parse.py:29-54 uses these)
# ---------------------------------------------------------------------------

class KaitaiValidationNotEqualError(Exception):
    def __init__(self, expected=None, actual=None, io=None, src_path=None):
        super().__init__(f"expected {expected!r}, got {actual!r}")


class KaitaiStream:
    def __init__(self, data: bytes):
        self._b = bytes(data)
        self._p = 0

    def read_bytes(self, n):
        r = self._b[self._p : self._p + n]
        self._p += n
        return r

    def read_bytes_full(self):
        r = self._b[self._p :]
        self._p = len(self._b)
        return r

    def read_u4le(self):
        return struct.unpack("<I", self.read_bytes(4))[0]

    def read_u1(self):
        return self.read_bytes(1)[0]

    def read_f4le(self):
        return struct.unpack("<f", self.read_bytes(4))[0]


class KaitaiStructBase:
    def __init__(self, _io_):
        self._io = _io_

    @classmethod
    def from_bytes(cls, data):
        return cls(KaitaiStream(data))


def install() -> None:
    """Register every shim into sys.modules (idempotent)."""
    _module("kaitaistruct", KaitaiStruct=KaitaiStructBase,
            ValidationNotEqualError=KaitaiValidationNotEqualError,
            KaitaiStream=KaitaiStream)

    if "librosa" not in sys.modules:
        lib = _module(
            "librosa",
            stft=shim_stft, istft=shim_istft,
            fft_frequencies=shim_fft_frequencies,
            frames_to_time=shim_frames_to_time,
            amplitude_to_db=shim_amplitude_to_db,
            power_to_db=shim_power_to_db,
            load=_unused, resample=_unused,
        )
        disp = _module("librosa.display", specshow=_unused)
        lib.display = disp

    b3 = _module("boto3", Session=_unused, client=_unused)
    b3.session = _module("boto3.session", Session=_unused)
    bc = _module("botocore")
    bc.exceptions = _module(
        "botocore.exceptions",
        NoCredentialsError=type("NoCredentialsError", (Exception,), {}),
        ProfileNotFound=type("ProfileNotFound", (Exception,), {}),
        ClientError=type("ClientError", (Exception,), {}),
    )
    sa = _module("sqlalchemy", text=lambda s: s)
    pg = _module("sqlalchemy.dialects.postgresql", JSONB=object)
    sa.dialects = _module("sqlalchemy.dialects", postgresql=pg)
    sa.dialects.postgresql = pg
    sa.engine = _module("sqlalchemy.engine", Engine=object)

    go = _module("plotly.graph_objects", Figure=_unused, Scatter=_unused,
                 Heatmap=_unused)
    pl = _module("plotly", graph_objects=go)
    pl.graph_objects = go
    sub = _module("plotly.subplots", make_subplots=_unused)
    pl.subplots = sub

    _module("tabulate", tabulate=_unused)


install()
