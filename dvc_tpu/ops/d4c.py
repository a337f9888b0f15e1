"""Batched D4C band-aperiodicity estimation, resident on the accelerator.

TPU port of the native D4C engine (native/dvc_world.cpp:dvc_d4c) — the same
algorithm the reference gets from pyworld.d4c at
/root/reference/preprocessing/WORLD_processing.py:35 — reformulated so a
whole BATCH of utterances runs as one XLA program.

Unlike the Harvest port (ops/harvest.py), nothing here needs bucketing: every
data-dependent window length (the 4*T0 centroid/power windows, the 1.5*T0
LoveTrain window) is realized EXACTLY as a masked window on a fixed
max-length array — the gather indices are data-dependent but every shape is
static, and the FFT sizes (fft_d4c, fft_lt) are already f0-independent in
the native engine.  Per frame:

  * LoveTrain voicing override — Blackman-windowed power ratio
    [0.1,4] kHz / [0.1,7.9] kHz; frames at or below `threshold` are forced
    fully aperiodic (Morise 2016 §2.2, pyworld D4COption.threshold)
  * static centroid — two Blackman 4*T0 windows at +-T0/4, Re{S* St} with
    the time-weighted pair spectrum
  * smoothed power — Hanning 4*T0 window, width-F0 rectangular smoothing
    (cumsum + fractional-position gathers)
  * static group delay — centroid/power, high-passed by subtracting its
    width-F0/2 smoothing
  * coarse band aperiodicity — Nuttall-windowed 3 kHz group-delay slice,
    FFT, SORTED power cumsum, share outside the coherent main lobe
  * anchors (0 Hz, -60 dB) .. (fs/2, 0 dB) linearly interpolated onto the
    CheapTrick output grid, clamped to [0.001, 1-1e-12]

The native engine computes in float64; this path runs float32 on the
accelerator, so parity with native dvc_d4c is gated by TOLERANCE tests
(tests/test_d4c_tpu.py), not bit-equality.  The native engine remains the
default single-utterance path; this module is the corpus-scale batch path
used by ops/world.py:world_decompose_batch.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_EPS = 1e-12
_FLOOR_F0 = 47.0
_LOWEST_F0 = 40.0       # LoveTrain analysis floor
_FREQ_INTERVAL = 3000.0


def _next_pow2(n: int) -> int:
    return 1 << int(n - 1).bit_length()


def _trunc_round(x: jax.Array) -> jax.Array:
    """static_cast<long>(x + 0.5) — truncation toward zero, not floor."""
    return jnp.trunc(x + 0.5).astype(jnp.int32)


@dataclass(frozen=True)
class _Plan:
    fs: int
    fft_d4c: int
    n_freq: int
    n_bands: int
    fft_size_out: int
    n_out: int
    seg_half: int
    seg_win: np.ndarray
    boundary: int
    band_centers: np.ndarray   # (n_bands,) static bin centers
    fft_lt: int
    lt_b0: int
    lt_b1: int
    lt_b2: int
    max_half_c: int            # centroid/power window max half-length
    max_half_lt: int           # LoveTrain window max half-length
    ax: np.ndarray             # (n_bands+2,) anchor frequencies


@functools.lru_cache(maxsize=8)
def _plan(fs: int, fft_size_out: int) -> _Plan:
    fft_d4c = 1 << (1 + int(np.ceil(np.log2(4.0 * fs / _FLOOR_F0 + 1.0))))
    n_freq = fft_d4c // 2 + 1
    n_bands = max(1, int(min(15000.0, fs / 2.0 - _FREQ_INTERVAL)
                         / _FREQ_INTERVAL))
    seg_half = int(_FREQ_INTERVAL * fft_d4c / fs)
    seg_len = 2 * seg_half + 1
    i = np.arange(seg_len)
    seg_win = (0.355768 - 0.487396 * np.cos(2 * np.pi * i / (seg_len - 1))
               + 0.144232 * np.cos(4 * np.pi * i / (seg_len - 1))
               - 0.012604 * np.cos(6 * np.pi * i / (seg_len - 1)))
    boundary = int(fft_d4c * 8.0 / seg_len + 0.5)
    band_centers = np.array(
        [int(_FREQ_INTERVAL * (b + 1) * fft_d4c / fs + 0.5)
         for b in range(n_bands)], np.int64)
    fft_lt = _next_pow2(int(3.0 * fs / _LOWEST_F0 + 1.0))
    ax = np.concatenate([[0.0], _FREQ_INTERVAL * (np.arange(n_bands) + 1),
                         [fs / 2.0]])
    return _Plan(
        fs=fs, fft_d4c=fft_d4c, n_freq=n_freq, n_bands=n_bands,
        fft_size_out=fft_size_out, n_out=fft_size_out // 2 + 1,
        seg_half=seg_half, seg_win=seg_win.astype(np.float32),
        boundary=boundary, band_centers=band_centers, fft_lt=fft_lt,
        lt_b0=int(np.ceil(100.0 * fft_lt / fs)),
        lt_b1=int(np.ceil(4000.0 * fft_lt / fs)),
        lt_b2=int(np.ceil(7900.0 * fft_lt / fs)),
        max_half_c=int(2.0 * fs / _FLOOR_F0 + 0.5),
        max_half_lt=int(1.5 * fs / _LOWEST_F0 + 0.5),
        ax=ax.astype(np.float64))


def _masked_window_gather(wav: jax.Array, centers: jax.Array,
                          halves: jax.Array, max_half: int):
    """(F,) centers/halves -> (F, 2*max_half+1) samples and window position.

    Sample j = center - half + i for i in [0, 2*half], zero outside the
    waveform and outside each frame's own window (native sample()).
    Returns (values, i_grid, wlen) with i_grid the intra-window index.

    This is the general-stride fallback; when frame centers are uniformly
    spaced, _masked_window_patches below extracts the same rows without a
    random gather (TPU gathers are the d4c hot spot).
    """
    max_wlen = 2 * max_half + 1
    i = jnp.arange(max_wlen, dtype=jnp.int32)[None, :]
    wlen = (2 * halves + 1)[:, None]
    j = centers[:, None] - halves[:, None] + i
    in_wav = (j >= 0) & (j < wav.shape[0])
    v = jnp.where(in_wav & (i < wlen),
                  wav[jnp.clip(j, 0, wav.shape[0] - 1)], 0.0)
    return v, i, wlen


def _masked_window_patches(wav: jax.Array, n_frames: int, stride: int,
                           first_center: int, deltas: jax.Array,
                           halves: jax.Array, max_half: int, max_delta: int):
    """Gather-free _masked_window_gather for UNIFORM frame centers.

    Frame f's center is first_center + f*stride + deltas[f] with
    |deltas| <= max_delta (the centroid's data-dependent +-T0/4 shift).
    Strided patches of width 2*(max_half+max_delta)+1 are extracted at the
    static centers (an im2col the TPU executes as coalesced copies), then
    each frame's window is a per-frame dynamic-slice into its own patch —
    no random gather anywhere.  Output contract identical to
    _masked_window_gather."""
    max_wlen = 2 * max_half + 1
    lead = max_half + max_delta
    wide = 2 * lead + 1
    pad_l = lead - first_center
    need = (n_frames - 1) * stride + wide
    w = jnp.pad(wav, (pad_l, max(0, need - wav.shape[0] - pad_l)))
    patches = lax.conv_general_dilated_patches(
        w[None, None, :], filter_shape=(wide,), window_strides=(stride,),
        padding=[(0, 0)])[0]                       # (wide, F_out)
    patches = jnp.moveaxis(patches, 0, -1)[:n_frames]          # (F, wide)
    # right-pad so a short window at a far-right delta never clamps the slice
    patches = jnp.pad(patches, ((0, 0), (0, max_wlen)))
    start = lead + deltas - halves                             # >= 0
    rows = jax.vmap(
        lambda p, s: lax.dynamic_slice(p, (s,), (max_wlen,)))(patches, start)
    i = jnp.arange(max_wlen, dtype=jnp.int32)[None, :]
    wlen = (2 * halves + 1)[:, None]
    return jnp.where(i < wlen, rows, 0.0), i, wlen


def _blackman_masked(i: jax.Array, wlen: jax.Array) -> jax.Array:
    x = i / jnp.maximum(wlen - 1, 1).astype(jnp.float32)
    w = 0.42 - 0.5 * jnp.cos(2 * np.pi * x) + 0.08 * jnp.cos(4 * np.pi * x)
    return jnp.where(i < wlen, w, 0.0)


_SMOOTH_BLOCK = 256  # > max window span (f0_ceil=800 Hz -> ~205 bins)


def _linear_smooth(arr: jax.Array, w_hz: jax.Array, fs: int,
                   fft_d4c: int) -> jax.Array:
    """Width-w_hz rectangular smoothing across frequency with fractional
    endpoint interpolation (native linear_smooth).

    The native engine differences a GLOBAL float64 cumulative sum; in
    float32 that is catastrophic — the cumsum's absolute error scales with
    the whole-spectrum total, and windows sitting in low-power regions
    difference to pure noise (measured: coarse-band dB collapsing from
    -10.45 to -0.43 on a clean vowel).  Here the cumsum is BLOCK-LOCAL: the
    two window endpoints land in the same or adjacent 256-bin block, so
    every difference is formed from within-block partial sums whose error
    scales with local (not global) magnitudes.  This restores float64-level
    agreement (tests/test_d4c_tpu.py).

    arr: (F, nf), w_hz: (F,) -> (F, nf).  Window widths are clamped to one
    block (f0 > ~1560 Hz at 16 kHz — far outside the WORLD pitch range).

    Implementation is GATHER-FREE (TPU gathers measured ~2 ms per call here
    while the whole d4c budget is a few ms): because the query positions
    are `arange(nf) + c` with c constant per frame, every cumsum read is a
    per-frame dynamic-slice SHIFT of a contiguous array, and the fractional
    endpoint weight is a per-frame scalar.  The edge clamp of the native
    at() is reproduced exactly by zero-padding one block on each side (the
    clamped cumsum is constant in the padding).  Precision-wise each read
    is base(block) + within-block prefix; the base terms cancel down to at
    most two single-block totals, keeping every difference local.
    """
    f_dim, nf = arr.shape
    bsz = _SMOOTH_BLOCK
    res = fs / fft_d4c
    w_bins = jnp.clip(w_hz / res, 1.0, float(bsz - 1))      # (F,)

    n_blocks = -(-(nf + 2 * bsz) // bsz)
    ext_len = n_blocks * bsz
    ext = jnp.pad(arr, ((0, 0), (bsz, ext_len - nf - bsz)))  # zero blocks
    blocks = ext.reshape(f_dim, n_blocks, bsz)
    btot = jnp.sum(blocks, axis=-1)                          # (F, nB)
    # exclusive within-block prefix sums, flattened back to (F, ext_len)
    cs2 = (jnp.cumsum(blocks, axis=-1) - blocks).reshape(f_dim, ext_len)
    # btot_exp[j] = total of j's block; shifted reads give btot[block(j)+k]
    btot_exp = jnp.repeat(btot, bsz, axis=-1)                # (F, ext_len)

    # global_cs(j) = cs2[j] + base(j // bsz); queries are j = i + k with k
    # per-frame, so cs2/btot_exp reads are dynamic-slice shifts and the
    # base() combination reduces to block totals between the endpoints.
    half = w_bins / 2.0
    k_hi = jnp.floor(half).astype(jnp.int32)
    fr_hi = half - k_hi
    k_lo = jnp.floor(-half).astype(jnp.int32)
    fr_lo = -half - k_lo

    def shift(a, k):
        """(F, ext_len) array, (F,) offsets -> (F, nf) rows a[f, i+k[f]]."""
        return jax.vmap(
            lambda row, s: lax.dynamic_slice(row, (s,), (nf,)))(a, bsz + k)

    # four prefix reads (two per endpoint for the fractional interpolation)
    c_lo0 = shift(cs2, k_lo)
    c_lo1 = shift(cs2, k_lo + 1)
    c_hi0 = shift(cs2, k_hi)
    c_hi1 = shift(cs2, k_hi + 1)

    # block indices of each read position, from static arange + per-frame k
    i = jnp.arange(nf, dtype=jnp.int32)[None, :]
    b_of = lambda k: (i + k[:, None] + bsz) // bsz
    b_lo0 = b_of(k_lo)
    # block totals needed for the base() deltas: at most two blocks up
    t0 = shift(btot_exp, k_lo)                     # btot[b_lo0]
    t1 = shift(btot_exp, k_lo + bsz)               # btot[b_lo0 + 1]

    def delta(b):  # base(b) - base(b_lo0) for b - b_lo0 in {0, 1, 2}
        d = b - b_lo0
        return jnp.where(d >= 1, t0, 0.0) + jnp.where(d >= 2, t1, 0.0)

    fr_l = fr_lo[:, None]
    fr_h = fr_hi[:, None]
    lo = (c_lo0 + delta(b_lo0)) * (1.0 - fr_l) \
        + (c_lo1 + delta(b_of(k_lo + 1))) * fr_l
    hi = (c_hi0 + delta(b_of(k_hi))) * (1.0 - fr_h) \
        + (c_hi1 + delta(b_of(k_hi + 1))) * fr_h
    return (hi - lo) / jnp.maximum(w_bins[:, None], 1e-9)


def _love_train(plan: _Plan, wav: jax.Array, f0: jax.Array,
                windows_lt) -> jax.Array:
    """(F,) LoveTrain low-band power-ratio score per frame
    (native love_train_frame)."""
    f0v = jnp.maximum(f0, _LOWEST_F0)
    halves = (1.5 * plan.fs / f0v + 0.5).astype(jnp.int32)
    v, i, wlen = windows_lt(halves)
    w = _blackman_masked(i, wlen)
    re = v * w
    dc = jnp.sum(re, axis=-1) / jnp.maximum(jnp.sum(w, axis=-1), _EPS)
    re = re - dc[:, None] * w
    spec = jnp.fft.rfft(re, n=plan.fft_lt, axis=-1)
    p = spec.real ** 2 + spec.imag ** 2
    n_half = plan.fft_lt // 2
    k = jnp.arange(p.shape[-1])
    band = (k >= plan.lt_b0 + 1) & (k <= min(plan.lt_b2, n_half))
    low = jnp.sum(jnp.where(band & (k <= plan.lt_b1), p, 0.0), axis=-1)
    full = jnp.sum(jnp.where(band, p, 0.0), axis=-1)
    score = low / jnp.maximum(full, _EPS)
    return jnp.where(2 * halves + 1 > plan.fft_lt, 0.0, score)


def _one_utterance(plan: _Plan, frame_period_ms: float, threshold: float,
                   wav: jax.Array, f0: jax.Array) -> jax.Array:
    """(N,), (F,) -> (F, n_out) aperiodicity (native dvc_d4c frame loop)."""
    n_frames = f0.shape[0]
    # frame centers tpos*fs are static (double-precision on host, like the
    # native engine); only the +-T0/4 centroid offsets are data-dependent
    tpos_fs_np = (np.arange(n_frames, dtype=np.float64)
                  * (frame_period_ms / 1000.0) * plan.fs)
    c_static_np = np.trunc(tpos_fs_np + 0.5).astype(np.int32)
    c_static = jnp.asarray(c_static_np)
    tpos_fs = jnp.asarray(tpos_fs_np, jnp.float32)

    # gather-free window extraction when frame centers are uniformly spaced
    # (integer samples-per-frame — the production 16 kHz / 5 ms case)
    stride = int(c_static_np[1] - c_static_np[0]) if n_frames > 1 else 1
    uniform = n_frames > 1 and bool(
        np.all(np.diff(c_static_np) == stride)) and stride > 0
    zero_d = jnp.zeros((n_frames,), jnp.int32)

    def windows(deltas, halves, max_half, max_delta):
        if uniform:
            return _masked_window_patches(
                wav, n_frames, stride, int(c_static_np[0]), deltas, halves,
                max_half, max_delta)
        return _masked_window_gather(wav, c_static + deltas, halves, max_half)

    if threshold > 0.0:
        score = _love_train(
            plan, wav, f0,
            lambda halves: windows(zero_d, halves, plan.max_half_lt, 0))
        cf0 = jnp.where((f0 > 0.0) & (score <= threshold), 0.0, f0)
    else:
        cf0 = f0
    voiced = cf0 >= _FLOOR_F0
    safe_f0 = jnp.where(voiced, cf0, 100.0)  # keep window math non-degenerate
    t0s = plan.fs / safe_f0

    halves = (2.0 * t0s + 0.5).astype(jnp.int32)

    # ---- static centroid: Blackman 4*T0 windows at +-T0/4 ------------------
    centroid = jnp.zeros((n_frames, plan.n_freq), jnp.float32)
    max_delta = int(plan.fs / (4.0 * _FLOOR_F0)) + 2  # |T0/4| shift bound
    for off in (-1.0, 1.0):
        deltas = _trunc_round(tpos_fs + off * t0s / 4.0) - c_static
        v, i, wlen = windows(deltas, halves, plan.max_half_c, max_delta)
        wave = v * _blackman_masked(i, wlen)
        norm = 1.0 / jnp.sqrt(jnp.maximum(
            jnp.sum(wave * wave, axis=-1, keepdims=True), _EPS))
        re = wave * norm
        re_t = re * (i + 1.0) / plan.fs
        s = jnp.fft.rfft(re, n=plan.fft_d4c, axis=-1)
        st = jnp.fft.rfft(re_t, n=plan.fft_d4c, axis=-1)
        centroid = centroid + (s.real * st.real + s.imag * st.imag)

    # ---- smoothed power: Hanning 4*T0, width-F0 smoothing ------------------
    v, i, wlen = windows(zero_d, halves, plan.max_half_c, 0)
    han = 0.5 - 0.5 * jnp.cos(
        2 * np.pi * i / jnp.maximum(wlen - 1, 1).astype(jnp.float32))
    re = v * jnp.where(i < wlen, han, 0.0)
    spec = jnp.fft.rfft(re, n=plan.fft_d4c, axis=-1)
    power = _linear_smooth(spec.real ** 2 + spec.imag ** 2,
                           safe_f0.astype(jnp.float32), plan.fs, plan.fft_d4c)

    # ---- static group delay, high-passed across frequency ------------------
    gd = centroid / jnp.maximum(power, _EPS)
    gd = gd - _linear_smooth(gd, safe_f0.astype(jnp.float32) / 2.0,
                             plan.fs, plan.fft_d4c)

    # ---- coarse aperiodicity per 3 kHz band (static centers) ---------------
    coarse_db = []
    cut = max(0, plan.n_freq - 1 - plan.boundary)
    for b in range(plan.n_bands):
        center = int(plan.band_centers[b])
        k = np.arange(center - plan.seg_half, center + plan.seg_half + 1)
        valid = (k >= 0) & (k < plan.n_freq)
        kc = np.clip(k, 0, plan.n_freq - 1)
        seg = jnp.where(jnp.asarray(valid), gd[:, kc], 0.0) \
            * jnp.asarray(plan.seg_win)
        spec_b = jnp.fft.rfft(seg, n=plan.fft_d4c, axis=-1)
        p = jnp.sort(spec_b.real ** 2 + spec_b.imag ** 2, axis=-1)
        csum = jnp.cumsum(p, axis=-1)
        apw = csum[:, cut] / jnp.maximum(csum[:, -1], _EPS)
        db = 10.0 * jnp.log10(jnp.maximum(apw, 1e-12))
        coarse_db.append(jnp.clip(db, -60.0, 0.0))

    # ---- interpolate the coarse dB anchors onto the output grid ------------
    av = jnp.stack([jnp.full((n_frames,), -60.0, jnp.float32)]
                   + coarse_db
                   + [jnp.full((n_frames,), -1e-12, jnp.float32)], axis=-1)
    f_out = np.arange(plan.n_out, dtype=np.float64) * plan.fs \
        / plan.fft_size_out
    seg_idx = np.clip(np.searchsorted(plan.ax, f_out, side="right") - 1,
                      0, plan.n_bands)
    dx = plan.ax[seg_idx + 1] - plan.ax[seg_idx]
    a = np.clip((f_out - plan.ax[seg_idx]) / np.maximum(dx, _EPS), 0.0, 1.0)
    db_row = av[:, seg_idx] * jnp.asarray(1.0 - a, jnp.float32) \
        + av[:, seg_idx + 1] * jnp.asarray(a, jnp.float32)
    # native caps at 1-1e-12 (double); the largest float32 below 1 plays
    # the same role here: strictly < 1, so 1-ap^2 stays non-negative
    cap = np.float32(np.nextafter(np.float32(1.0), np.float32(0.0)))
    ap = jnp.clip(10.0 ** (db_row / 20.0), 0.001, cap)
    return jnp.where(voiced[:, None], ap, cap)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _d4c_jit(wavs, f0s, fs, frame_period_ms, fft_size_out, threshold):
    plan = _plan(fs, fft_size_out)
    fn = functools.partial(_one_utterance, plan, frame_period_ms, threshold)
    return jax.vmap(fn)(wavs, f0s)


def d4c_batch(wavs, f0s, fs: int = 16_000, frame_period_ms: float = 5.0,
              fft_size: int | None = None,
              threshold: float = 0.85) -> jax.Array:
    """Batched D4C aperiodicity for (B, N) waveforms + (B, F) F0 tracks.

    Same per-frame output contract as native dvc_d4c / pyworld.d4c
    (/root/reference/preprocessing/WORLD_processing.py:35): (B, F,
    fft_size//2+1) aperiodicity in [0.001, 1); unvoiced frames (f0 = 0, or
    voiced frames failing the LoveTrain check at `threshold`) are fully
    aperiodic.  Rows may be zero-padded: padded samples read as silence and
    padded frames (f0 = 0) come back fully aperiodic, exactly as the native
    engine treats out-of-range samples.
    """
    wavs = jnp.asarray(wavs, jnp.float32)
    f0s = jnp.asarray(f0s, jnp.float32)
    if wavs.ndim == 1:
        wavs = wavs[None]
    if f0s.ndim == 1:
        f0s = f0s[None]
    if wavs.shape[0] != f0s.shape[0]:
        raise ValueError(f"batch mismatch: {wavs.shape[0]} wavs vs "
                         f"{f0s.shape[0]} f0 tracks")
    if fft_size is None:
        from dvc_tpu.ops.world import cheaptrick_fft_size
        fft_size = cheaptrick_fft_size(fs)
    return _d4c_jit(wavs, f0s, int(fs), float(frame_period_ms),
                    int(fft_size), float(threshold))
