"""In-process ALAC codec: fast native decoder + libavcodec shim.

The reference decodes firmware ALAC payloads by shelling out to the ffmpeg
binary (reference ``parse.py:422-446``). This binding offers two in-process
routes:

  * **fast** (``native/alac_decode.cpp`` -> ``libalac_fast.so``): a
    dependency-free from-scratch ALAC bitstream decoder for the firmware's
    subset (mono, 16-bit). It decodes a whole BER-framed payload in ONE C
    call — no per-packet AVPacket round trips, no Python packet loop — and
    is validated bit-exactly against libavcodec on randomized corpora
    (``tests/test_alac.py``).
  * **avcodec** (``native/alac_shim.cpp`` -> ``libalac_shim.so``): the same
    decoder the ffmpeg binary uses (libavcodec's ALAC), linked in-process.
    It is the differential oracle for the fast decoder and the fallback for
    anything outside the fast subset (stereo, >16-bit).

Route selection: ``decode_alac_payload``/``decode_alac_packets`` try the
fast decoder first and fall back to the shim; set ``APT_ALAC_DECODER`` to
``fast`` or ``avcodec`` to force one (tests use this to differential-check
the two).

The module also provides the inverse — ``encode_alac_payload`` produces a
firmware-geometry payload (128-sample ALAC packets, each prefixed by the
3-byte BER size header the firmware writes — see ``io/caf.py``), which the
test suite and synthetic-corpus tools use to exercise the real
``file_version >= 1`` ingest branch end to end. Encoding always uses
libavcodec (it only serves fixtures/tooling; decode is the hot path).
"""

from __future__ import annotations

import ctypes
import io as _io
import os
import subprocess
from ctypes import CDLL, POINTER, c_int16, c_int32, c_int64, c_uint8
from typing import Optional, Tuple

import numpy as np

from audio_processing_tools_tpu.io.caf import (
    ALAC_DEFAULT_FRAMES_PER_PACKET,
    FIRMWARE_MAGIC_COOKIE,
    read_ber_integer,
)

_SHIM_NAME = "libalac_shim.so"


def _native_dir() -> str:
    """The packaged ``native/`` directory (inside the wheel; prebuilt
    ``.so``s load directly, sources + Makefile cover the rebuild path)."""
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "native",
    )


_lib: Optional[CDLL] = None
_lib_checked = False


def load_alac_shim(so_path: Optional[str] = None) -> CDLL:
    """Load (building on demand) the libavcodec ALAC shim."""
    path = so_path or os.environ.get("ALAC_SHIM_LIB") or os.path.join(
        _native_dir(), _SHIM_NAME
    )
    if not os.path.exists(path):
        subprocess.run(
            ["make", "-C", _native_dir()], check=True, capture_output=True
        )
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{_SHIM_NAME} not built (libavcodec dev libraries absent?)"
        )
    lib = CDLL(path)
    lib.apt_alac_last_error.restype = ctypes.c_char_p
    lib.apt_alac_version.restype = ctypes.c_uint32
    lib.apt_alac_decode.restype = c_int64
    lib.apt_alac_decode.argtypes = [
        POINTER(c_uint8), c_int32, POINTER(c_uint8), POINTER(c_int32),
        c_int32, POINTER(c_int16), c_int64,
    ]
    lib.apt_alac_encode_frame.restype = c_int64
    lib.apt_alac_encode_frame.argtypes = [
        POINTER(c_int16), c_int32, c_int32, POINTER(c_uint8), c_int64,
        POINTER(c_uint8),
    ]
    return lib


def have_alac_shim() -> bool:
    """True when the in-process ALAC codec is available."""
    global _lib, _lib_checked
    if not _lib_checked:
        _lib_checked = True
        try:
            _lib = load_alac_shim()
        except (OSError, FileNotFoundError, subprocess.CalledProcessError):
            _lib = None
    return _lib is not None


_FAST_NAME = "libalac_fast.so"
_fast: Optional[CDLL] = None
_fast_checked = False


def load_alac_fast(so_path: Optional[str] = None) -> CDLL:
    """Load (building on demand) the dependency-free fast ALAC decoder."""
    path = so_path or os.environ.get("ALAC_FAST_LIB") or os.path.join(
        _native_dir(), _FAST_NAME
    )
    if not os.path.exists(path):
        subprocess.run(
            ["make", "-C", _native_dir()], check=True, capture_output=True
        )
    lib = CDLL(path)
    lib.apt_alac_fast_last_error.restype = ctypes.c_char_p
    lib.apt_alac_fast_version.restype = ctypes.c_uint32
    lib.apt_alac_fast_decode.restype = c_int64
    lib.apt_alac_fast_decode.argtypes = [
        ctypes.c_char_p, c_int32, ctypes.c_char_p, POINTER(c_int32),
        c_int32, POINTER(c_int16), c_int64,
    ]
    lib.apt_alac_fast_decode_payload.restype = c_int64
    lib.apt_alac_fast_decode_payload.argtypes = [
        ctypes.c_char_p, c_int32, ctypes.c_char_p, c_int64,
        POINTER(c_int16), c_int64,
    ]
    return lib


def have_fast_decoder() -> bool:
    """True when ``libalac_fast.so`` is available (it has no external deps,
    so this is false only when the native toolchain is missing)."""
    global _fast, _fast_checked
    if not _fast_checked:
        _fast_checked = True
        try:
            _fast = load_alac_fast()
        except (OSError, FileNotFoundError, subprocess.CalledProcessError):
            _fast = None
    return _fast is not None


def _fast_supports(cookie: bytes) -> bool:
    """The fast decoder's subset: mono, 16-bit (the firmware's format)."""
    return len(cookie) >= 24 and cookie[5] == 16 and cookie[9] == 1


def _decoder_route() -> str:
    route = os.environ.get("APT_ALAC_DECODER", "auto")
    if route not in ("auto", "fast", "avcodec"):
        raise ValueError(f"APT_ALAC_DECODER must be auto/fast/avcodec, got {route!r}")
    return route


def _shim() -> CDLL:
    if not have_alac_shim():
        raise RuntimeError(
            "libalac_shim.so unavailable: build it with `make -C audio_processing_tools_tpu/native` "
            "(requires the libavcodec development libraries)"
        )
    assert _lib is not None
    return _lib


# ---------------------------------------------------------------------------
# firmware BER packet framing (the stream layout ``io/caf.py`` re-containers)


def split_ber_packets(payload: bytes) -> list[bytes]:
    """Split a firmware ALAC stream into raw ALAC packets.

    Each packet is framed as 3 header bytes — a BER size (canonical bytes
    first, padded to 2) plus one byte giving the canonical BER length — then
    the packet payload. A leading duplicated MARK header (magic + 36 bytes)
    is skipped, mirroring ``caf.rearrange_bytes``.
    """
    src = _io.BytesIO(payload)
    head = src.read(4)
    if len(head) < 4:
        return []
    if head == b"\xAD\xFB\xCA\xDE":
        src.seek(36, 1)
    else:
        src.seek(0)
    packets = []
    while True:
        hdr = src.read(3)
        if len(hdr) < 3:
            break
        size, _ = read_ber_integer(hdr, 2)
        body = src.read(size)
        if len(body) < size:
            break
        packets.append(body)
    return packets


def _ber_frame_header(size: int) -> bytes:
    """3-byte firmware packet header for a packet of ``size`` bytes."""
    if size < 0x80:
        ber = bytes([size])
    elif size < 0x4000:
        ber = bytes([0x80 | (size >> 7), size & 0x7F])
    else:
        raise ValueError(f"packet too large for 2-byte BER: {size}")
    return ber.ljust(2, b"\x00") + bytes([len(ber)])


# ---------------------------------------------------------------------------
# codec entry points


def _avcodec_decode_packets(packets: list[bytes], cookie: bytes) -> np.ndarray:
    if not packets:
        return np.zeros(0, np.int16)
    lib = _shim()
    data = b"".join(packets)
    sizes = (c_int32 * len(packets))(*[len(p) for p in packets])
    # capacity: every packet carries at most frameLength samples (the
    # firmware default) or its explicit partial-frame count; cookie byte
    # 0-3 is the big-endian frame length
    frame_len = int.from_bytes(cookie[:4], "big") or ALAC_DEFAULT_FRAMES_PER_PACKET
    cap = frame_len * len(packets)
    out = np.zeros(cap, np.int16)
    n = lib.apt_alac_decode(
        (c_uint8 * len(cookie)).from_buffer_copy(cookie), len(cookie),
        (c_uint8 * len(data)).from_buffer_copy(data), sizes, len(packets),
        out.ctypes.data_as(POINTER(c_int16)), cap,
    )
    if n < 0:
        raise RuntimeError(
            f"ALAC decode failed: {lib.apt_alac_last_error().decode()}"
        )
    if n > cap:
        raise RuntimeError(f"ALAC decode overflow: {n} samples > cap {cap}")
    return out[:n]


def _fast_decode_packets(packets: list[bytes], cookie: bytes) -> np.ndarray:
    assert _fast is not None
    data = b"".join(packets)
    sizes = (c_int32 * len(packets))(*[len(p) for p in packets])
    frame_len = int.from_bytes(cookie[:4], "big") or ALAC_DEFAULT_FRAMES_PER_PACKET
    cap = frame_len * len(packets)  # exact bound: <= frame_len samples/packet
    out = np.empty(cap, np.int16)
    n = _fast.apt_alac_fast_decode(
        cookie, len(cookie), data, sizes, len(packets),
        out.ctypes.data_as(POINTER(c_int16)), cap,
    )
    if n < 0:
        raise RuntimeError(
            f"ALAC decode failed: {_fast.apt_alac_fast_last_error().decode()}"
        )
    if n > cap:
        raise RuntimeError(f"ALAC decode overflow: {n} samples > cap {cap}")
    return out[:n]


def _fast_decode_payload(payload: bytes, cookie: bytes) -> np.ndarray:
    assert _fast is not None
    frame_len = int.from_bytes(cookie[:4], "big") or ALAC_DEFAULT_FRAMES_PER_PACKET
    # every BER-framed packet occupies >= 4 payload bytes (3-byte header +
    # body); if a degenerate stream still overflows, retry with the exact
    # count the decoder reports (it never writes past out_cap)
    cap = frame_len * (len(payload) // 4 + 1)
    while True:
        out = np.empty(cap, np.int16)
        n = _fast.apt_alac_fast_decode_payload(
            cookie, len(cookie), payload, len(payload),
            out.ctypes.data_as(POINTER(c_int16)), cap,
        )
        if n < 0:
            raise RuntimeError(
                f"ALAC decode failed: "
                f"{_fast.apt_alac_fast_last_error().decode()}"
            )
        if n <= cap:
            return out[:n]
        cap = int(n)


def decode_alac_packets(
    packets: list[bytes], cookie: bytes = FIRMWARE_MAGIC_COOKIE
) -> np.ndarray:
    """Decode raw ALAC packets to int16 PCM (fast decoder, avcodec fallback)."""
    if not packets:
        return np.zeros(0, np.int16)
    route = _decoder_route()
    if route in ("auto", "fast") and _fast_supports(cookie) and have_fast_decoder():
        try:
            return _fast_decode_packets(packets, cookie)
        except RuntimeError:
            if route == "fast":
                raise
    if route == "fast":
        raise RuntimeError(
            "fast ALAC decode requested but libalac_fast.so is unavailable "
            "or the stream is outside its mono/16-bit subset"
        )
    return _avcodec_decode_packets(packets, cookie)


def decode_alac_payload(payload: bytes,
                        cookie: bytes = FIRMWARE_MAGIC_COOKIE) -> np.ndarray:
    """Decode a BER-framed firmware ALAC payload to int16 PCM.

    The preferred route decodes the whole payload — BER packet walk
    included — in a single call into ``libalac_fast.so``; the libavcodec
    shim route (Python packet split + per-packet AVPacket) is the fallback
    and the differential oracle.
    """
    route = _decoder_route()
    if route in ("auto", "fast") and _fast_supports(cookie) and have_fast_decoder():
        try:
            return _fast_decode_payload(payload, cookie)
        except RuntimeError:
            if route == "fast":
                raise
    if route == "fast":
        raise RuntimeError(
            "fast ALAC decode requested but libalac_fast.so is unavailable "
            "or the stream is outside its mono/16-bit subset"
        )
    return _avcodec_decode_packets(split_ber_packets(payload), cookie)


def encode_alac_frames(
    pcm: np.ndarray, sample_rate: int = 11162,
    frames_per_packet: int = ALAC_DEFAULT_FRAMES_PER_PACKET,
) -> Tuple[list[bytes], bytes]:
    """Encode int16 mono PCM into ALAC packets of ``frames_per_packet``.

    Returns ``(packets, cookie)``. Each packet is encoded by a fresh
    libavcodec encoder instance (ALAC frames are independent) and carries an
    explicit sample count, so the packets decode correctly under any
    compatible cookie — including the firmware's fixed 24-byte cookie.
    """
    lib = _shim()
    pcm = np.ascontiguousarray(np.asarray(pcm, np.int16))
    if pcm.ndim != 1:
        raise ValueError("expected 1-D mono PCM")
    packets = []
    cookie_buf = (c_uint8 * 24)()
    cap = frames_per_packet * 2 + 64
    out = (c_uint8 * cap)()
    for start in range(0, len(pcm), frames_per_packet):
        chunk = pcm[start : start + frames_per_packet]
        n = lib.apt_alac_encode_frame(
            chunk.ctypes.data_as(POINTER(c_int16)), len(chunk),
            int(sample_rate), out, cap, cookie_buf,
        )
        if n < 0:
            raise RuntimeError(
                f"ALAC encode failed: {lib.apt_alac_last_error().decode()}"
            )
        packets.append(bytes(out[: int(n)]))
    return packets, bytes(cookie_buf)


def encode_alac_payload(pcm: np.ndarray, sample_rate: int = 11162) -> bytes:
    """Encode int16 mono PCM into a firmware-geometry BER-framed payload.

    The payload round-trips through the whole reference ingest path: it is
    accepted by ``caf.rearrange_bytes`` (CAF re-containerization for the
    ffmpeg-binary route) and by :func:`decode_alac_payload` (in-process
    route), and decodes losslessly to the input.
    """
    packets, _cookie = encode_alac_frames(pcm, sample_rate)
    buf = _io.BytesIO()
    for p in packets:
        buf.write(_ber_frame_header(len(p)))
        buf.write(p)
    payload = buf.getvalue()
    if len(payload) % 2:
        # the MARK parser aligns payloads down to whole int16 samples
        # (reference parse.py:234-236); pad so no packet byte is dropped —
        # a single trailing byte is ignored by the packet reader
        payload += b"\x00"
    return payload
