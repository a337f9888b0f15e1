"""Pitch helpers (reference preprocessing/utils.py:146-204).

The reference's pitch utilities wrap pyworld.dio and librosa.piptrack:
  * estimate_pitch (utils.py:183-192): dio F0, min-max normalized, scaled to
    ceil(f0 * 256) bins;
  * get_batch_pitch (utils.py:194-204): per-item Python loop over a batch.

Here the F0 tracker is ops/world.estimate_f0 (same floor/ceil contract) and
the batch path is a vmap — one device program for the whole batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dvc_tpu.ops.world import estimate_f0


def estimate_pitch(segment: jax.Array, sr: int = 16_000,
                   fmin: float = 50.0, fmax: float = 2000.0) -> jax.Array:
    """Quantized pitch contour (reference utils.py:183-192): F0 shifted by
    its min, then divided by its MAX — the reference's exact formula
    ((f0-min)/max, NOT true min-max (f0-min)/(max-min); for fully voiced
    segments the values compress below 1 — a reference quirk reproduced) —
    and scaled to ceil(x * 256)."""
    f0, _ = estimate_f0(jnp.asarray(segment, jnp.float32), sr,
                        f0_floor=fmin, f0_ceil=fmax)
    f0_min = jnp.min(f0)
    f0_max = jnp.maximum(jnp.max(f0), 1e-6)
    norm = (f0 - f0_min) / f0_max
    return jnp.ceil(norm * 256.0)


def get_batch_pitch(batch: jax.Array, sr: int = 16_000) -> jax.Array:
    """(B, T) waveforms -> (B, n_frames) quantized pitch, batched via vmap
    (replaces the reference's per-item loop at utils.py:194-204)."""
    return jax.vmap(lambda w: estimate_pitch(w, sr))(jnp.asarray(batch))


def quantized_pitch_onehot(pitch: jax.Array, bins: int = 257) -> jax.Array:
    """One-hot pitch conditioning (the 205/257-dim f0 feature consumed by the
    F0-conditioned AutoVC decoder, autovc_replicate/original_autovc.py:228)."""
    idx = jnp.clip(pitch.astype(jnp.int32), 0, bins - 1)
    return jax.nn.one_hot(idx, bins)
