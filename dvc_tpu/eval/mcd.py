"""Mel-cepstral distortion (MCD) evaluation.

Parity with reference preprocessing/MCD_calculate.py:54-98: WORLD-extract
MCCs of source & converted wavs, drop unvoiced (f0 == 0) frames, DTW-align
on the first 24 MCCs, then
    MCD = mean( 10/ln10 * sqrt(2 * sum(diff^2)) )            (:92-93).

Deviation (documented): the reference aligns with `fastdtw` (an approximate
O(N) DTW); here the alignment is EXACT dynamic-programming DTW with the same
euclidean metric — at these lengths (<= a few thousand frames) exact DTW is
cheap, and its cost is <= fastdtw's by construction.  A batched
Sakoe-Chiba-banded JAX DTW (`dtw_cost_banded`) is provided for on-device
sweeps where only the distortion (not the path) is needed.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def dtw_path(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact DTW alignment path between (N, D) and (M, D) under euclidean
    distance.  Returns (path_x, path_y) index arrays.

    The distance matrix is vectorized numpy; the O(N*M) accumulation +
    backtrack runs in the native engine when available (the pure-Python
    recurrence holds the GIL for millions of interpreter steps on long
    utterances, serializing evaluate_mcd_wav's thread pool) with the
    Python loop as the engine-free fallback."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    n, m = len(x), len(y)
    dist = np.sqrt(
        np.maximum(0.0, (x**2).sum(1)[:, None] + (y**2).sum(1)[None, :]
                   - 2.0 * x @ y.T))
    try:
        from dvc_tpu import native
        if native.available():
            return native.dtw_path(dist)
    except Exception:
        pass
    acc = np.full((n + 1, m + 1), np.inf)
    acc[0, 0] = 0.0
    for i in range(1, n + 1):
        row_prev = acc[i - 1]
        row = acc[i]
        d_row = dist[i - 1]
        for j in range(1, m + 1):
            row[j] = d_row[j - 1] + min(row_prev[j], row[j - 1], row_prev[j - 1])
    # backtrack
    path = []
    i, j = n, m
    while i > 0 or j > 0:
        path.append((i - 1, j - 1))
        moves = []
        if i > 0 and j > 0:
            moves.append((acc[i - 1, j - 1], i - 1, j - 1))
        if i > 0:
            moves.append((acc[i - 1, j], i - 1, j))
        if j > 0:
            moves.append((acc[i, j - 1], i, j - 1))
        _, i, j = min(moves)
        if i == 0 and j == 0:
            break
    path.reverse()
    p = np.array(path)
    return p[:, 0], p[:, 1]


def mcd_from_mcc(src_mcc: np.ndarray, trg_mcc: np.ndarray,
                 src_f0: np.ndarray | None = None,
                 trg_f0: np.ndarray | None = None,
                 num_coeffs: int = 24) -> float:
    """MCD between two MCC sequences, exactly the reference math (:79-93):
    voiced-only frames (f0 > 0), first `num_coeffs` coefficients, DTW align,
    10/ln10 * sqrt(2 * sum diff^2) averaged over the path."""
    src_v = src_mcc[np.where(src_f0 > 0)[0]] if src_f0 is not None else src_mcc
    trg_v = trg_mcc[np.where(trg_f0 > 0)[0]] if trg_f0 is not None else trg_mcc
    if len(src_v) == 0 or len(trg_v) == 0:
        # Degenerate case the reference leaves undefined (fastdtw crashes on
        # an empty sequence, MCD_calculate.py:86): one side has no voiced
        # frames.  Fall back to all frames so eval stays total; nan only if
        # a wav produced no frames at all.
        src_v, trg_v = src_mcc, trg_mcc
        if len(src_v) == 0 or len(trg_v) == 0:
            return float("nan")
    src_mcc = src_v[:, :num_coeffs]
    trg_mcc = trg_v[:, :num_coeffs]
    px, py = dtw_path(src_mcc, trg_mcc)
    diff2sum = np.sum((src_mcc[px] - trg_mcc[py]) ** 2, axis=1)
    return float(np.mean(10.0 / np.log(10.0) * np.sqrt(2.0 * diff2sum)))


def evaluate_mcd_wav(src_wavs: list[np.ndarray], trg_wavs: list[np.ndarray],
                     fs: int = 16_000, analysis: str = "native"
                     ) -> list[float]:
    """Waveform-level MCD list (reference evaluate_mcd_wav :54-98): extract
    f0 + MCC with the WORLD analysis chain (ops/world.py) per wav pair and
    compute per-utterance MCD.

    analysis="native" (default): per-wav analysis on a thread pool (the
    native Harvest/D4C stages release the GIL).  analysis="device": the
    whole corpus analyzes in accelerator batches (ops/world.
    world_decompose_batch, ~78x realtime per chip vs ~7x per host core) —
    f0/MCC are tolerance-level equal to native, so MCDs agree within a few
    percent (gated at 5% relative in tests/test_eval.py; voiced/unvoiced
    flips at segment edges move DTW paths slightly, so the agreement is
    tolerance-level, not bit-level).  The exact DP DTW stays serial per
    pair (ms each).
    """
    if analysis == "device":
        from dvc_tpu.ops.world import world_decompose_batch

        res = world_decompose_batch(list(src_wavs) + list(trg_wavs), fs,
                                    keep_sp_ap=False)
        feats = [(f0, mc) for (f0, _t, _sp, _ap, mc) in res]
    else:
        from concurrent.futures import ThreadPoolExecutor

        from dvc_tpu.ops.world import world_encode_data

        def analyze(wav):
            f0, _, _, _, mc = world_encode_data(wav, fs)
            return f0, mc

        wavs = list(src_wavs) + list(trg_wavs)
        workers = min(8, max(1, len(wavs)))
        if workers > 1:
            with ThreadPoolExecutor(workers) as pool:
                feats = list(pool.map(analyze, wavs))
        else:
            feats = [analyze(w) for w in wavs]
    n = len(src_wavs)
    out = []
    for (f0_s, mc_s), (f0_t, mc_t) in zip(feats[:n], feats[n:]):
        out.append(mcd_from_mcc(mc_s, mc_t, f0_s, f0_t))
    return out


# --- batched banded DTW cost (device-side, no path) --------------------------

def dtw_cost_banded(x: jax.Array, y: jax.Array, band: int = 64) -> jax.Array:
    """Sakoe-Chiba banded DTW cost between equal-length (T, D) sequences,
    scan over anti-diagonals — batched/jittable for on-device eval sweeps."""
    t = x.shape[0]
    dist = jnp.sqrt(jnp.maximum(
        0.0, (x**2).sum(1)[:, None] + (y**2).sum(1)[None, :] - 2.0 * x @ y.T))
    big = jnp.float32(1e30)
    band_mask = jnp.abs(jnp.arange(t)[:, None] - jnp.arange(t)[None, :]) > band
    dist = jnp.where(band_mask, big, dist)

    def row_step(prev_row, d_row):
        # prev_row: accumulated costs of row i-1 (length T)
        def cell(carry, inp):
            left = carry
            d, up, diag = inp
            best = jnp.minimum(jnp.minimum(up, left), diag)
            cost = d + best
            return cost, cost

        diag = jnp.concatenate([jnp.array([big]), prev_row[:-1]])
        # first cell has no left; emulate with big as init carry
        _, row = jax.lax.scan(cell, big, (d_row, prev_row, diag))
        return row, None

    init = jnp.minimum(jnp.cumsum(dist[0]), big)  # acc[0, j] = sum of row-0 costs
    row, _ = jax.lax.scan(row_step, init, dist[1:])
    return row[-1]
