"""Checkpoint save / latest-wins discovery.

Mirrors reference model/variational_base_vae.py:127-149,199-201: checkpoints
are files named `{run_name}_{epoch}` in a flat directory; resume globs the
directory, parses the epoch out of each filename, and loads the max.

Unlike the reference (which drops optimizer state for the VAE — a resume bug
noted in SURVEY.md §5), the full TrainState (params, batch_stats, opt_state,
step) is serialized via flax msgpack.
"""

from __future__ import annotations

import os
from glob import glob
from typing import Any

from flax import serialization

SUFFIX = ".msgpack"


def save_checkpoint(checkpoints_path: str, run_name: str, epoch: int,
                    state: Any) -> str:
    os.makedirs(checkpoints_path, exist_ok=True)
    path = os.path.join(checkpoints_path, f"{run_name}_{epoch}{SUFFIX}")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))
    return path


def latest_checkpoint_step(checkpoints_path: str) -> tuple[int, str] | None:
    """Parse `<name>_<epoch>` filenames, return (max_epoch, path) or None."""
    candidates = []
    for f in glob(os.path.join(checkpoints_path, f"*{SUFFIX}")):
        stem = os.path.splitext(os.path.basename(f))[0]
        epoch_str = stem.rsplit("_", 1)[-1]
        if epoch_str.isdigit():
            candidates.append((int(epoch_str), f))
    if not candidates:
        return None
    return max(candidates, key=lambda item: item[0])


def load_last_checkpoint(checkpoints_path: str, target: Any) -> tuple[int, Any] | None:
    """Load the highest-epoch checkpoint into `target`'s structure."""
    found = latest_checkpoint_step(checkpoints_path)
    if found is None:
        return None
    epoch, path = found
    with open(path, "rb") as f:
        state = serialization.from_bytes(target, f.read())
    return epoch, state
