"""ctypes bindings for the native C++ DSP engine (dvc_dsp.cpp).

Auto-builds `libdvc_dsp.so` with g++ on first import if missing (no build
step required); every entry point has a pure-JAX equivalent in ops/, so the
framework works without a C++ toolchain — `available()` reports which path
is active.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libdvc_dsp.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    from dvc_tpu.native._build import load_or_build
    lib = load_or_build(os.path.join(_DIR, "dvc_dsp.cpp"), _SO)
    if lib is None:
        return None
    lib.dvc_melspectrogram.restype = ctypes.c_int
    lib.dvc_melspectrogram.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double]
    lib.dvc_num_frames.restype = ctypes.c_int
    lib.dvc_num_frames.argtypes = [ctypes.c_long, ctypes.c_int, ctypes.c_int]
    lib.dvc_resample.restype = ctypes.c_long
    lib.dvc_resample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int]
    lib.dvc_energy_vad.restype = ctypes.c_long
    lib.dvc_energy_vad.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_double]
    lib.dvc_dtw_path.restype = ctypes.c_long
    lib.dvc_dtw_path.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.dvc_melspectrogram_batch.restype = ctypes.c_int
    lib.dvc_melspectrogram_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def melspectrogram(wav: np.ndarray, sample_rate: int = 16_000,
                   fft_size: int = 1024, hop_size: int = 256,
                   num_mels: int = 80, fmin: float = 90.0, fmax: float = 7600.0,
                   min_level_db: float = -100.0,
                   ref_level_db: float = 16.0) -> np.ndarray:
    """(T,) float wav -> (num_mels, frames) normalized mel, C++ path."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native DSP library unavailable")
    wav = np.ascontiguousarray(wav, np.float32)
    m = lib.dvc_num_frames(len(wav), fft_size, hop_size)
    out = np.empty((num_mels, m), np.float32)
    got = lib.dvc_melspectrogram(_fp(wav), len(wav), _fp(out), sample_rate,
                                 fft_size, hop_size, num_mels, fmin, fmax,
                                 min_level_db, ref_level_db)
    if got != m:
        raise RuntimeError(f"native melspectrogram failed ({got})")
    return out


def melspectrogram_batch(wavs: list[np.ndarray], n_threads: int = 0,
                         **kw) -> list[np.ndarray]:
    """Thread-pooled batched mel extraction (one C call for the whole list)."""
    if not wavs:
        return []
    lib = _load()
    if lib is None:
        raise RuntimeError("native DSP library unavailable")
    p = dict(sample_rate=16_000, fft_size=1024, hop_size=256, num_mels=80,
             fmin=90.0, fmax=7600.0, min_level_db=-100.0, ref_level_db=16.0)
    p.update(kw)
    n_threads = n_threads or (os.cpu_count() or 1)

    lengths = np.array([len(w) for w in wavs], np.int64)
    offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int64)
    concat = np.ascontiguousarray(np.concatenate(
        [np.asarray(w, np.float32) for w in wavs]))
    frames = np.array([lib.dvc_num_frames(int(l), p["fft_size"], p["hop_size"])
                       for l in lengths], np.int32)
    sizes = frames.astype(np.int64) * p["num_mels"]
    out_offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int64)
    out = np.empty(int(sizes.sum()), np.float32)
    frames_out = np.zeros(len(wavs), np.int32)

    ret = lib.dvc_melspectrogram_batch(
        _fp(concat), offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_long)), len(wavs),
        _fp(out), out_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        frames_out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n_threads,
        p["sample_rate"], p["fft_size"], p["hop_size"], p["num_mels"],
        p["fmin"], p["fmax"], p["min_level_db"], p["ref_level_db"])
    if ret != 0:
        raise RuntimeError("native batch melspectrogram failed")
    return [out[o:o + s].reshape(p["num_mels"], f)
            for o, s, f in zip(out_offsets, sizes, frames_out)]


def resample(wav: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native DSP library unavailable")
    wav = np.ascontiguousarray(wav, np.float32)
    out_len = int(np.ceil(len(wav) * target_sr / orig_sr))
    out = np.empty(out_len + 8, np.float32)
    got = lib.dvc_resample(_fp(wav), len(wav), _fp(out), orig_sr, target_sr)
    if got < 0:
        raise RuntimeError("native resample failed")
    return out[:out_len]


def dtw_path(dist: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact DTW path over a dense (n, m) distance matrix (C-speed twin of
    eval/mcd.dtw_path's accumulation + backtrack)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native DSP library unavailable")
    dist = np.ascontiguousarray(dist, np.float64)
    n, m = dist.shape
    px = np.empty(n + m, np.int32)
    py = np.empty(n + m, np.int32)
    got = lib.dvc_dtw_path(
        dist.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, m,
        px.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        py.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    if got < 0:
        raise RuntimeError("native DTW failed")
    return px[:got].astype(np.int64), py[:got].astype(np.int64)


def energy_vad(wav: np.ndarray, sample_rate: int = 16_000, window_ms: int = 30,
               threshold_db: float = -48.0) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native DSP library unavailable")
    wav = np.ascontiguousarray(wav, np.float32)
    spw = window_ms * sample_rate // 1000
    mask = np.zeros(len(wav) // spw, np.uint8)
    lib.dvc_energy_vad(_fp(wav), len(wav),
                       mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                       sample_rate, window_ms, threshold_db)
    return mask.astype(bool)
