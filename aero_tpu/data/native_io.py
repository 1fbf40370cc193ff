"""ctypes binding to the native IO library (native/lib/libaeroio.so).

Used by the data pipeline when built (``make -C native``); falls back to
the pure-numpy codec transparently. The native path decodes WAV segments
and resamples without holding the GIL, so loader worker threads scale.
"""

from __future__ import annotations

import ctypes
import os
import typing as tp

import numpy as np

_LIB = None
_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def get_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.environ.get(
        "AERO_NATIVE_LIB",
        os.path.join(_repo_root(), "native", "lib", "libaeroio.so"))
    if os.path.exists(path):
        try:
            lib = ctypes.CDLL(path)
            lib.aeroio_info.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_longlong)]
            lib.aeroio_info.restype = ctypes.c_int
            lib.aeroio_read.argtypes = [
                ctypes.c_char_p, ctypes.c_longlong, ctypes.c_longlong,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_longlong)]
            lib.aeroio_read.restype = ctypes.c_int
            lib.aeroio_resample.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_longlong]
            lib.aeroio_resample.restype = ctypes.c_longlong
            _LIB = lib
        except OSError:
            _LIB = None
    return _LIB


def available() -> bool:
    return get_lib() is not None


def info(path: str) -> tp.Tuple[int, int, int]:
    """(sample_rate, channels, num_frames)."""
    lib = get_lib()
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    frames = ctypes.c_longlong()
    if lib.aeroio_info(path.encode(), ctypes.byref(sr), ctypes.byref(ch),
                       ctypes.byref(frames)) != 0:
        raise IOError(f"aeroio: cannot read {path}")
    return sr.value, ch.value, frames.value


def load(path: str, frame_offset: int = 0,
         num_frames: int = -1) -> tp.Tuple[np.ndarray, int]:
    """Returns ([channels, frames] float32, sample_rate). Short reads
    (EOF inside the requested window) are TRUNCATED to the frames
    actually read — same contract as the numpy codec ``audio_io.load``;
    callers needing fixed-length segments pad themselves (as
    ``Audioset.__getitem__`` does)."""
    lib = get_lib()
    sr, ch, total = info(path)
    if num_frames is None or num_frames < 0:
        num_frames = max(0, total - frame_offset)
    out = np.zeros((ch, num_frames), np.float32)
    got = ctypes.c_longlong()
    rc = lib.aeroio_read(path.encode(), frame_offset, num_frames,
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                         ctypes.byref(got))
    if rc != 0:
        raise IOError(f"aeroio: read failed for {path}")
    return out[:, :got.value], sr
