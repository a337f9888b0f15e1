"""ctypes bindings for the native WORLD-analysis engine (dvc_world.cpp).

harvest() / d4c() are the algorithm-faithful equivalents of pyworld.harvest
and pyworld.d4c (reference preprocessing/WORLD_processing.py:33-35),
implemented from the published Morise papers.  Auto-builds
`libdvc_world.so` with g++ on first use; `available()` reports whether the
native path is active (ops/world.py falls back to the batched JAX NCCF
tracker otherwise).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libdvc_world.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    from dvc_tpu.native._build import load_or_build
    lib = load_or_build(os.path.join(_DIR, "dvc_world.cpp"), _SO)
    if lib is None:
        return None
    lib.dvc_harvest_frames.restype = ctypes.c_int
    lib.dvc_harvest_frames.argtypes = [ctypes.c_long, ctypes.c_int,
                                       ctypes.c_double]
    lib.dvc_harvest.restype = ctypes.c_int
    lib.dvc_harvest.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double)]
    lib.dvc_dio.restype = ctypes.c_int
    lib.dvc_dio.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.POINTER(ctypes.c_double)]
    lib.dvc_d4c.restype = ctypes.c_int
    lib.dvc_d4c.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_double,
        ctypes.c_int, ctypes.c_double, ctypes.POINTER(ctypes.c_double)]
    lib.dvc_synthesis.restype = ctypes.c_int
    lib.dvc_synthesis.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_long,
        ctypes.c_ulonglong, ctypes.POINTER(ctypes.c_double)]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def harvest(wav: np.ndarray, fs: int, frame_period: float = 5.0,
            f0_floor: float = 71.0, f0_ceil: float = 800.0
            ) -> tuple[np.ndarray, np.ndarray]:
    """(T,) waveform -> (f0, timeaxis), both (N,) float64 at frame_period ms
    (pyworld.harvest contract: f0 == 0 for unvoiced frames)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native WORLD library unavailable")
    if not (frame_period > 0.0 and 0.0 < f0_floor < f0_ceil):
        raise RuntimeError(
            f"invalid harvest parameters: frame_period={frame_period}, "
            f"f0 band [{f0_floor}, {f0_ceil}]")
    wav = np.ascontiguousarray(wav, np.float32)
    n_out = lib.dvc_harvest_frames(len(wav), fs, frame_period)
    f0 = np.zeros(n_out, np.float64)
    got = lib.dvc_harvest(
        wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(wav), fs,
        frame_period, f0_floor, f0_ceil,
        f0.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if got != n_out:
        raise RuntimeError(f"native harvest failed ({got})")
    timeaxis = np.arange(n_out, dtype=np.float64) * frame_period / 1000.0
    return f0, timeaxis


def dio(wav: np.ndarray, fs: int, frame_period: float = 5.0,
        f0_floor: float = 71.0, f0_ceil: float = 800.0,
        channels_in_octave: float = 2.0, allowed_range: float = 0.1
        ) -> tuple[np.ndarray, np.ndarray]:
    """(T,) waveform -> (f0, timeaxis) at frame_period ms — the DIO method
    behind pyworld.dio (the reference's pitch extractor,
    preprocessing/utils.py:183-192; pyworld defaults: channels_in_octave
    2.0, allowed_range 0.1).  Implemented from the Morise DIO papers in
    native/dvc_world.cpp:dvc_dio; pyworld bit-agreement is golden-gated
    when fixtures land (tools/gen_dio_golden.py)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native WORLD library unavailable")
    if not (frame_period > 0.0 and 0.0 < f0_floor < f0_ceil
            and channels_in_octave > 0.0 and allowed_range > 0.0):
        raise RuntimeError(
            f"invalid dio parameters: frame_period={frame_period}, "
            f"f0 band [{f0_floor}, {f0_ceil}], cio={channels_in_octave}, "
            f"allowed_range={allowed_range}")
    wav = np.ascontiguousarray(wav, np.float32)
    n_out = lib.dvc_harvest_frames(len(wav), fs, frame_period)
    f0 = np.zeros(n_out, np.float64)
    got = lib.dvc_dio(
        wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(wav), fs,
        frame_period, f0_floor, f0_ceil, channels_in_octave, allowed_range,
        f0.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if got != n_out:
        raise RuntimeError(f"native dio failed ({got})")
    timeaxis = np.arange(n_out, dtype=np.float64) * frame_period / 1000.0
    return f0, timeaxis


def d4c(wav: np.ndarray, f0: np.ndarray, fs: int, frame_period: float = 5.0,
        fft_size: int | None = None, threshold: float = 0.85) -> np.ndarray:
    """Band aperiodicity (N, fft_size//2+1) on the CheapTrick spectral grid
    (pyworld.d4c contract).  `threshold` is the LoveTrain voicing cutoff
    (pyworld's D4COption.threshold, default 0.85): voiced frames whose
    0.1-4 kHz share of 0.1-7.9 kHz power is at or below it are forced fully
    aperiodic.  Pass threshold=0 to disable the override."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native WORLD library unavailable")
    if fft_size is None:
        from dvc_tpu.ops.world import cheaptrick_fft_size
        fft_size = cheaptrick_fft_size(fs)
    wav = np.ascontiguousarray(wav, np.float32)
    f0 = np.ascontiguousarray(f0, np.float64)
    n_frames = len(f0)
    out = np.zeros((n_frames, fft_size // 2 + 1), np.float64)
    got = lib.dvc_d4c(
        wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(wav), fs,
        f0.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n_frames,
        frame_period, fft_size, threshold,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if got != 0:
        raise RuntimeError(f"native d4c failed ({got})")
    return out


def synthesize(f0: np.ndarray, sp: np.ndarray, ap: np.ndarray, fs: int,
               frame_period: float = 5.0, y_length: int | None = None,
               seed: int = 0) -> np.ndarray:
    """WORLD-faithful synthesis (pyworld.synthesize contract, reference
    WORLD_processing.py:99-106): f0 (N,), sp/ap (N, fft_size//2+1) CheapTrick
    power envelope / D4C aperiodicity -> waveform.  Minimum-phase responses
    per glottal pulse with fractional-pitch placement and per-bin
    aperiodicity-weighted periodic/noise mixing; deterministic for a given
    seed at any thread count."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native WORLD library unavailable")
    sp = np.ascontiguousarray(sp, np.float64)
    ap = np.ascontiguousarray(ap, np.float64)
    f0 = np.ascontiguousarray(f0, np.float64)
    n_frames, n_freq = sp.shape
    if ap.shape != sp.shape or len(f0) != n_frames:
        raise ValueError(f"shape mismatch: f0 {f0.shape}, sp {sp.shape}, "
                         f"ap {ap.shape}")
    fft_size = 2 * (n_freq - 1)
    if y_length is None:
        # pyworld rule: one frame_period of audio per frame
        y_length = int(n_frames * frame_period * fs / 1000.0)
    y = np.zeros(y_length, np.float64)
    got = lib.dvc_synthesis(
        f0.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n_frames,
        sp.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ap.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        fft_size, fs, frame_period, y_length, seed,
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if got != 0:
        raise RuntimeError(f"native synthesis failed ({got})")
    return y.astype(np.float32)
