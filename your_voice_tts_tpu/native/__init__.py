"""Native (C++) data-loader ops: WAV codec + scipy-parity resampler.

The reference delegates host-side audio IO to native dependencies
(librosa/audioread, scipy.io.wavfile, libsndfile).  This package is the
framework's own native equivalent: `wavio.cpp` compiled on first use with the
system g++ and bound through ctypes (no pybind11 in this environment).

Capabilities over the pure-Python fallback in `audio.py`:
  - 24-bit PCM and IEEE float32/float64 WAVs (VCTK-style corpora) decode;
    the stdlib `wave` module cannot represent them.
  - `decode_batch` fans out across C++ threads (no GIL), so dataset cache
    builds decode in parallel on the host.
  - `resample_poly` replicates scipy.signal.resample_poly's filter design
    (Kaiser-5.0, half_len = 10*max_rate) so both paths agree numerically.

If no compiler is present or the build fails, `available()` returns False and
callers fall back to the Python implementations — behaviour, not performance,
is identical.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "wavio.cpp")
_LIB_PATH = os.path.join(_DIR, "_wavio.so")

_lock = threading.Lock()
_lib = None
_build_error: str | None = None

# decode error codes (keep in sync with wavio.cpp)
ERR_NAMES = {
    -1: "cannot open file",
    -2: "not a RIFF/WAVE file",
    -3: "missing/unsupported fmt chunk",
    -4: "missing data chunk",
    -5: "truncated data chunk",
    -6: "output buffer too small",
    -7: "bad argument",
}


def _build() -> str | None:
    """Compile wavio.cpp -> _wavio.so if stale. Returns error string or None."""
    try:
        if (os.path.exists(_LIB_PATH)
                and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)):
            return None
        # per-pid temp name: concurrent builders (multi-process launch on
        # a shared filesystem) must not os.replace a half-written .so
        tmp = f"{_LIB_PATH}.{os.getpid()}.tmp"
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
               _SRC, "-o", tmp]
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if proc.returncode != 0:
            return f"g++ failed: {proc.stderr[-500:]}"
        os.replace(tmp, _LIB_PATH)
        return None
    except FileNotFoundError:
        return "g++ not found"
    except Exception as e:  # noqa: BLE001 — any build failure just disables us
        return f"{type(e).__name__}: {e}"


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        _build_error = _build()
        if _build_error is not None:
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            # a corrupt .so (e.g. lost a concurrent-build race on older
            # revisions) must disable the native path, not crash callers
            # whose contract is available() -> False
            _build_error = f"CDLL failed: {e}"
            return None
        i64, i32 = ctypes.c_int64, ctypes.c_int32
        fp = ctypes.POINTER(ctypes.c_float)
        lib.yv_wav_info.restype = i64
        lib.yv_wav_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(i32),
                                    ctypes.POINTER(i32), ctypes.POINTER(i32),
                                    ctypes.POINTER(i32), ctypes.POINTER(i64)]
        lib.yv_wav_decode.restype = i64
        lib.yv_wav_decode.argtypes = [ctypes.c_char_p, fp, i64,
                                      ctypes.POINTER(i32)]
        lib.yv_resample_poly.restype = i64
        lib.yv_resample_poly.argtypes = [fp, i64, i32, i32, fp, i64]
        lib.yv_wav_encode16.restype = i64
        lib.yv_wav_encode16.argtypes = [ctypes.c_char_p, fp, i64, i32]
        lib.yv_wav_decode_batch.restype = i64
        lib.yv_wav_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), i32, i32, fp, i64,
            ctypes.POINTER(i64), ctypes.POINTER(i32), i32]
        _lib = lib
        return _lib


def available() -> bool:
    """True when the native library compiled and loaded on this host."""
    return _load() is not None


def build_error() -> str | None:
    _load()
    return _build_error


class NativeWavError(RuntimeError):
    def __init__(self, code: int, path: str = ""):
        self.code = int(code)
        what = ERR_NAMES.get(self.code, f"error {self.code}")
        super().__init__(f"native wav: {what}" + (f" ({path})" if path else ""))


def wav_info(path: str) -> dict:
    """Header probe: dict(sample_rate, channels, bits, fmt, n_frames)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    i32, i64 = ctypes.c_int32, ctypes.c_int64
    sr, ch, bits, fmt, nf = i32(), i32(), i32(), i32(), i64()
    rc = lib.yv_wav_info(path.encode(), ctypes.byref(sr), ctypes.byref(ch),
                         ctypes.byref(bits), ctypes.byref(fmt),
                         ctypes.byref(nf))
    if rc != 0:
        raise NativeWavError(rc, path)
    return {"sample_rate": sr.value, "channels": ch.value, "bits": bits.value,
            "fmt": fmt.value, "n_frames": nf.value}


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def decode(path: str) -> tuple[np.ndarray, int]:
    """Decode a WAV to (mono float32 array, native sample rate)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    info = wav_info(path)
    out = np.empty(info["n_frames"], np.float32)
    sr = ctypes.c_int32()
    rc = lib.yv_wav_decode(path.encode(), _fp(out), out.size,
                           ctypes.byref(sr))
    if rc < 0:
        raise NativeWavError(rc, path)
    return out[: int(rc)], sr.value


def resample_poly(x: np.ndarray, up: int, down: int) -> np.ndarray:
    """scipy.signal.resample_poly(x, up, down) on the native path."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    x = np.ascontiguousarray(x, np.float32)
    n_out = -(-x.size * up // down)  # ceil
    out = np.empty(max(n_out, 1), np.float32)
    rc = lib.yv_resample_poly(_fp(x), x.size, up, down, _fp(out), out.size)
    if rc < 0:
        raise NativeWavError(rc)
    return out[: int(rc)]


def encode16(path: str, x: np.ndarray, sample_rate: int) -> None:
    """Write mono PCM16 (values clipped to [-1, 1]; caller pre-scales)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    x = np.ascontiguousarray(x, np.float32)
    rc = lib.yv_wav_encode16(path.encode(), _fp(x), x.size, sample_rate)
    if rc != 0:
        raise NativeWavError(rc, path)


def decode_batch(paths: list[str], target_sr: int = 0,
                 n_threads: int | None = None
                 ) -> tuple[list[np.ndarray | None], list[int]]:
    """Threaded batch decode (+ resample when target_sr > 0).

    Returns (waves, rates): waves[i] is a mono float32 array at target_sr
    (or native rate when target_sr == 0), or None for a row that failed;
    rates[i] is the file's native sample rate (0 when unreadable).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    if not paths:
        return [], []
    # One info pass sizes the dense buffer; unreadable files get a 0 slot.
    max_frames = 1
    per_file = []
    for p in paths:
        try:
            info = wav_info(p)
            nf = info["n_frames"]
            if target_sr > 0 and info["sample_rate"] != target_sr:
                nf = -(-nf * target_sr // info["sample_rate"]) + 8
            per_file.append(nf)
            max_frames = max(max_frames, nf)
        except (NativeWavError, RuntimeError):
            per_file.append(0)
    out = np.zeros((len(paths), max_frames), np.float32)
    lens = np.zeros(len(paths), np.int64)
    rates = np.zeros(len(paths), np.int32)
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    if n_threads is None:
        n_threads = min(8, os.cpu_count() or 1)
    lib.yv_wav_decode_batch(
        arr, len(paths), target_sr, _fp(out), max_frames,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n_threads)
    waves: list[np.ndarray | None] = []
    for i in range(len(paths)):
        waves.append(out[i, : lens[i]].copy() if lens[i] >= 0 else None)
    return waves, [int(r) for r in rates]
