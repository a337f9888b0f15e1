"""PRNG helpers."""

from __future__ import annotations

import jax


def key_seq(seed: int):
    """Infinite stream of fresh PRNG keys."""
    key = jax.random.PRNGKey(seed)
    while True:
        key, sub = jax.random.split(key)
        yield sub
