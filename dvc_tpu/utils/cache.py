"""Persistent-compile-cache housekeeping.

The XLA compilation cache (.jax_cache/) grows without bound — every new
shape/config signature adds an executable.  `prune_compile_cache` evicts
least-recently-used entries once the directory exceeds a size budget; it is
called from the cache-enabling hooks (tests/conftest.py, __graft_entry__.py)
so long-lived checkouts stay bounded without a cron job.
"""

from __future__ import annotations

import os


def enable_compile_cache(repo_root: str | None = None) -> None:
    """Point JAX's persistent compilation cache at <repo>/.jax_cache (and
    prune it past budget).  Safe to call repeatedly; silently no-ops if the
    config knobs are unavailable.  Every entry point should call this —
    without it each process pays the full XLA compile (measured 296 s cold
    for the corpus WORLD-analysis program on this 1-core host, <2 s warm).
    """
    import jax

    root = repo_root or os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    cache_dir = os.path.join(root, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        return
    prune_compile_cache(cache_dir)


def cache_size_bytes(cache_dir: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(cache_dir):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def prune_compile_cache(cache_dir: str, max_bytes: int = 4 << 30,
                        target_bytes: int = 3 << 30) -> int:
    """Evict oldest-accessed cache files until under target; returns bytes
    freed.  No-ops when the directory is missing or under budget."""
    if not os.path.isdir(cache_dir):
        return 0
    if cache_size_bytes(cache_dir) <= max_bytes:
        return 0
    entries = []
    for root, _dirs, files in os.walk(cache_dir):
        for f in files:
            fp = os.path.join(root, f)
            try:
                st = os.stat(fp)
                entries.append((st.st_atime, st.st_size, fp))
            except OSError:
                pass
    entries.sort()  # oldest access first
    total = sum(s for _, s, _ in entries)
    freed = 0
    for _atime, size, fp in entries:
        if total - freed <= target_bytes:
            break
        try:
            os.unlink(fp)
            freed += size
        except OSError:
            pass
    return freed
