"""Native (C++) runtime components with ctypes bindings.

Builds `libttsking_native.so` from the in-tree C++ sources on first use
(g++ -O3, cached next to the sources). Everything degrades gracefully: when
the toolchain or .so is unavailable, callers fall back to the pure
numpy/XLA implementations.

Components:
  * yin_f0 / yin_f0_batch — native YIN F0 (pyworld dio+stonemask replacement
    for the offline pipeline, same algorithm as ops/f0.py);
  * load_npy_batch — threaded .npy batch loader (native equivalent of the
    reference's DataLoader worker processes, train.py:93-99).
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "libttsking_native.so")
_SOURCES = [os.path.join(_HERE, "f0.cpp"), os.path.join(_HERE, "dio.cpp"),
            os.path.join(_HERE, "npy_loader.cpp")]

_lib = None
_lock = threading.Lock()
_build_error = None


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _SO_PATH,
           *_SOURCES, "-lpthread"]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def get_lib():
    """Load (building if needed) the native library, or None if unavailable."""
    global _lib, _build_error
    if _lib is not None:
        return _lib
    if _build_error is not None:
        return None
    with _lock:
        if _lib is not None:
            return _lib
        try:
            srcs_mtime = max(os.path.getmtime(s) for s in _SOURCES)
            if (not os.path.exists(_SO_PATH)
                    or os.path.getmtime(_SO_PATH) < srcs_mtime):
                _build()
            lib = ctypes.CDLL(_SO_PATH)
        except Exception as e:  # toolchain missing, build failed, ...
            _build_error = e
            return None

        lib.yin_f0_native.restype = ctypes.c_int
        lib.yin_f0_native.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.yin_f0_batch.restype = None
        lib.yin_f0_batch.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        lib.dio_f0_native.restype = ctypes.c_int
        lib.dio_f0_native.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.dio_f0_batch.restype = None
        lib.dio_f0_batch.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        lib.load_npy_batch.restype = None
        lib.load_npy_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_long), ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def yin_f0(wav, sampling_rate=22050, hop_length=256, frame_length=2048,
           f0_floor=71.0, f0_ceil=800.0, threshold=0.15):
    """Native YIN for one utterance. wav: (T,) float32 -> (T//hop+1,) f0."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_build_error}")
    wav = np.ascontiguousarray(wav, np.float32)
    max_frames = len(wav) // hop_length + 1
    out = np.zeros(max_frames, np.float32)
    n = lib.yin_f0_native(
        wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(wav),
        sampling_rate, hop_length, frame_length, f0_floor, f0_ceil, threshold,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_frames)
    return out[:n]


def yin_f0_batch(wavs, sampling_rate=22050, hop_length=256, frame_length=2048,
                 f0_floor=71.0, f0_ceil=800.0, threshold=0.15,
                 n_threads=None):
    """Native YIN over a list of utterances with a thread pool.

    Returns a list of per-utterance f0 arrays.
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_build_error}")
    wavs = [np.ascontiguousarray(w, np.float32) for w in wavs]
    n = len(wavs)
    lens = np.asarray([len(w) for w in wavs], np.int32)
    max_frames = int(lens.max()) // hop_length + 1 if n else 0
    out = np.zeros((n, max_frames), np.float32)
    n_frames = np.zeros(n, np.int32)
    ptrs = (ctypes.POINTER(ctypes.c_float) * n)(
        *[w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for w in wavs])
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 8)
    lib.yin_f0_batch(
        ptrs, lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n,
        sampling_rate, hop_length, frame_length,
        ctypes.c_float(f0_floor), ctypes.c_float(f0_ceil),
        ctypes.c_float(threshold),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_frames,
        n_frames.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n_threads)
    return [out[i, : n_frames[i]].copy() for i in range(n)]


def dio_f0(wav, sampling_rate=22050, hop_length=256, f0_floor=71.0,
           f0_ceil=800.0, channels_in_octave=2.0, allowed_range=0.1):
    """DIO-style multiband F0 + StoneMask-style refinement for one utterance
    (the reference's pyworld dio+stonemask equivalent, preprocessor.py:207-213).
    wav: (T,) float32 -> (T//hop+1,) f0 in Hz, 0 where unvoiced."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_build_error}")
    wav = np.ascontiguousarray(wav, np.float32)
    max_frames = len(wav) // hop_length + 1
    out = np.zeros(max_frames, np.float32)
    n = lib.dio_f0_native(
        wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(wav),
        sampling_rate, hop_length, ctypes.c_float(f0_floor),
        ctypes.c_float(f0_ceil), ctypes.c_float(channels_in_octave),
        ctypes.c_float(allowed_range),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_frames)
    return out[:n]


def dio_f0_batch(wavs, sampling_rate=22050, hop_length=256, f0_floor=71.0,
                 f0_ceil=800.0, channels_in_octave=2.0, allowed_range=0.1,
                 n_threads=None):
    """Threaded DIO over a list of utterances -> list of f0 arrays."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_build_error}")
    wavs = [np.ascontiguousarray(w, np.float32) for w in wavs]
    n = len(wavs)
    lens = np.asarray([len(w) for w in wavs], np.int32)
    max_frames = int(lens.max()) // hop_length + 1 if n else 0
    out = np.zeros((n, max_frames), np.float32)
    n_frames = np.zeros(n, np.int32)
    ptrs = (ctypes.POINTER(ctypes.c_float) * n)(
        *[w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for w in wavs])
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 8)
    lib.dio_f0_batch(
        ptrs, lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n,
        sampling_rate, hop_length, ctypes.c_float(f0_floor),
        ctypes.c_float(f0_ceil), ctypes.c_float(channels_in_octave),
        ctypes.c_float(allowed_range),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_frames,
        n_frames.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n_threads)
    return [out[i, : n_frames[i]].copy() for i in range(n)]


def load_npy_batch(paths, max_rows, cols, n_threads=None):
    """Threaded load of .npy files into one zero-padded float32 batch.

    Returns (batch (n, max_rows, cols) float32, lengths (n,) int64; -1 marks
    a failed load).
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_build_error}")
    n = len(paths)
    batch = np.zeros((n, max_rows, cols), np.float32)
    lengths = np.zeros(n, np.int64)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 8)
    lib.load_npy_batch(
        c_paths, n, batch.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_rows, cols, lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        n_threads)
    return batch, lengths
