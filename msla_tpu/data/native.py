"""ctypes bindings for the C++ IO library (native/msla_io.cpp).

Accelerates the offline dataset cleaning pass (WAV decode, polyphase
resampling, frame-index scan). Auto-builds the shared library with `make` on
first use when a toolchain is available; every entry point degrades to the
pure-numpy implementations in msla_tpu.data.{wavio,resample} when it is not.
"""
from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

log = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libmsla_io.so"
_lib = None
_tried = False


class _WavInfo(ctypes.Structure):
    _fields_ = [("channels", ctypes.c_int32),
                ("sample_rate", ctypes.c_int32),
                ("frames", ctypes.c_int64)]


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True, timeout=120)
        return _LIB_PATH.exists()
    except Exception as err:
        log.info("native IO build unavailable (%s) — using numpy fallbacks", err)
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.msla_wav_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(_WavInfo)]
        lib.msla_wav_info.restype = ctypes.c_int
        lib.msla_decode_wav.argtypes = [ctypes.c_char_p,
                                        np.ctypeslib.ndpointer(np.float32),
                                        ctypes.c_int64, ctypes.POINTER(_WavInfo)]
        lib.msla_decode_wav.restype = ctypes.c_int
        lib.msla_resample_poly.argtypes = [np.ctypeslib.ndpointer(np.float32),
                                           ctypes.c_int64, ctypes.c_int64,
                                           ctypes.c_int64,
                                           np.ctypeslib.ndpointer(np.float32),
                                           ctypes.c_int64,
                                           ctypes.POINTER(ctypes.c_int64)]
        lib.msla_resample_poly.restype = ctypes.c_int
        lib.msla_frame_index.argtypes = [np.ctypeslib.ndpointer(np.float32),
                                         ctypes.c_int64, ctypes.c_int64,
                                         ctypes.c_int64, ctypes.c_int64,
                                         ctypes.c_int64,
                                         np.ctypeslib.ndpointer(np.int64)]
        lib.msla_frame_index.restype = ctypes.c_int64
        _lib = lib
    except Exception as err:
        log.info("native IO load failed (%s) — using numpy fallbacks", err)
        _lib = None
    return _lib


def read_wav(path) -> tuple[np.ndarray, int]:
    """Native WAV decode; numpy fallback on any failure."""
    lib = get_lib()
    if lib is not None:
        info = _WavInfo()
        rc = lib.msla_wav_info(str(path).encode(), ctypes.byref(info))
        if rc == 0 and info.frames > 0:
            out = np.empty(int(info.channels) * int(info.frames), np.float32)
            rc = lib.msla_decode_wav(str(path).encode(), out, info.frames,
                                     ctypes.byref(info))
            if rc == 0:
                return out.reshape(int(info.channels), int(info.frames)), \
                    int(info.sample_rate)
    from msla_tpu.data.wavio import read_wav as np_read_wav

    return np_read_wav(path)


def resample(audio: np.ndarray, orig_freq: int, new_freq: int) -> np.ndarray:
    """Native polyphase resample over the gcd-reduced ratio; scipy fallback."""
    from math import gcd

    if orig_freq == new_freq:
        return np.asarray(audio, dtype=np.float32)
    lib = get_lib()
    if lib is None:
        from msla_tpu.data.resample import resample as np_resample

        return np_resample(audio, orig_freq, new_freq)

    g = gcd(int(orig_freq), int(new_freq))
    up, down = new_freq // g, orig_freq // g
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    squeeze = audio.ndim == 1
    rows = audio[None] if squeeze else audio
    outs = []
    for row in rows:
        cap = (row.shape[-1] * up) // down + 2
        out = np.empty(cap, np.float32)
        n_out = ctypes.c_int64()
        rc = lib.msla_resample_poly(row, row.shape[-1], up, down, out, cap,
                                    ctypes.byref(n_out))
        if rc != 0:
            from msla_tpu.data.resample import resample as np_resample

            return np_resample(audio[0] if squeeze else audio, orig_freq, new_freq)
        outs.append(out[: n_out.value])
    result = np.stack(outs)
    return result[0] if squeeze else result


def frame_index(stems: np.ndarray, sample_rate: int, frame_len: int,
                max_duration: int) -> np.ndarray:
    """Native non-silent/complete frame scan; numpy fallback."""
    lib = get_lib()
    stems = np.ascontiguousarray(stems, dtype=np.float32)
    if lib is not None:
        starts = np.empty(max_duration, np.int64)
        n = lib.msla_frame_index(stems, stems.shape[0], stems.shape[1],
                                 sample_rate, frame_len, max_duration, starts)
        return starts[: int(n)]
    out = []
    for sub in range(max_duration):
        start = sub * sample_rate
        end = start + frame_len
        if end > stems.shape[1]:
            continue
        if int(stems[:, start:end].sum()) == 0:
            continue
        out.append(start)
    return np.asarray(out, np.int64)
