"""Fixed-length chunking of arbitrary-length mels.

Reference semantics (model/variational_base_vae.py:335-348): split (80, T)
into ceil-ish blocks of 64 frames, zero-padding the last chunk; NOTE the
reference always emits ``T//64 + 1`` chunks, so when T is an exact multiple
of 64 the final chunk is all zeros — reproduced bit-for-bit here because
conversion statistics (style averaging over chunks at
variational_base_vae.py:281-282) depend on it.

TPU-native: a pad + reshape instead of a Python loop, so the chunk axis is a
batch axis that shards over the data mesh axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def num_chunks(t: int, frames: int = 64) -> int:
    """The reference chunk count for a T-frame mel: T//frames + 1 (an
    all-zero final chunk when T divides exactly — see module docstring).
    Shared by chunk_mel and every consumer that budgets by chunks."""
    return t // frames + 1


def chunk_mel(mel: jax.Array, frames: int = 64) -> jax.Array:
    """(n_mels, T) -> (num_chunks(T), n_mels, frames)."""
    n_mels, t = mel.shape
    n = num_chunks(t, frames)
    padded = jnp.pad(mel, ((0, 0), (0, n * frames - t)))
    # (n_mels, C, frames) -> (C, n_mels, frames)
    return padded.reshape(n_mels, n, frames).transpose(1, 0, 2)


def unchunk_mel(chunks: jax.Array, total_frames: int | None = None) -> jax.Array:
    """(num_chunks, n_mels, frames) -> (n_mels, num_chunks*frames), optionally cropped.

    Mirrors the torch.cat over the time axis at variational_base_vae.py:288-298
    (the reference does NOT crop the zero-padded tail before vocoding; pass
    total_frames=None for parity, or a frame count to crop).
    """
    c, n_mels, f = chunks.shape
    out = chunks.transpose(1, 0, 2).reshape(n_mels, c * f)
    if total_frames is not None:
        out = out[:, :total_frames]
    return out
