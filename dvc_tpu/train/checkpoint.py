"""Checkpoint save / latest-wins discovery.

Mirrors reference model/variational_base_vae.py:127-149,199-201: checkpoints
are named `{run_name}_{epoch}` in a flat directory; resume globs the
directory, parses the epoch out of each filename, and loads the max.

Unlike the reference (which drops optimizer state for the VAE — a resume bug
noted in SURVEY.md §5), the full TrainState (params, batch_stats, opt_state,
step) is persisted.  Two interchangeable formats share the same naming /
latest-wins discovery:

  * msgpack (default): single-host flax serialization — one file, every
    array gathered to host 0.  Right for single-chip / data-parallel runs
    where the state fits one host.
  * orbax: sharded directory checkpoints — every host writes only its
    addressable shards and restore places shards directly onto the target's
    shardings, so multi-host / ZeRO-sharded state never gathers anywhere
    (the multi-slice story msgpack cannot provide).

`load_last_checkpoint` auto-detects the format per checkpoint, so a run can
switch formats mid-training and resume still picks the newest of either.
"""

from __future__ import annotations

import os
from glob import glob
from typing import Any

import jax
from flax import serialization

SUFFIX = ".msgpack"
ORBAX_SUFFIX = ".orbax"


def save_checkpoint(checkpoints_path: str, run_name: str, epoch: int,
                    state: Any, fmt: str = "msgpack") -> str:
    os.makedirs(checkpoints_path, exist_ok=True)
    if fmt == "orbax":
        return save_checkpoint_sharded(checkpoints_path, run_name, epoch, state)
    path = os.path.join(checkpoints_path, f"{run_name}_{epoch}{SUFFIX}")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))
    return path


def save_checkpoint_sharded(checkpoints_path: str, run_name: str, epoch: int,
                            state: Any) -> str:
    """Orbax sharded save: `{run_name}_{epoch}.orbax/` directory; each
    process writes its own shards (no host-0 gather)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(
        os.path.join(checkpoints_path, f"{run_name}_{epoch}{ORBAX_SUFFIX}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    ckptr.close()
    return path


def _epoch_of(path: str) -> int | None:
    stem = os.path.basename(path)
    for sfx in (SUFFIX, ORBAX_SUFFIX):
        if stem.endswith(sfx):
            stem = stem[: -len(sfx)]
            break
    epoch_str = stem.rsplit("_", 1)[-1]
    return int(epoch_str) if epoch_str.isdigit() else None


def latest_checkpoint_step(checkpoints_path: str) -> tuple[int, str] | None:
    """Parse `<name>_<epoch>` names (both formats), return (max_epoch, path)."""
    candidates = []
    for f in (glob(os.path.join(checkpoints_path, f"*{SUFFIX}"))
              + glob(os.path.join(checkpoints_path, f"*{ORBAX_SUFFIX}"))):
        epoch = _epoch_of(f)
        if epoch is not None:
            candidates.append((epoch, f))
    if not candidates:
        return None
    return max(candidates, key=lambda item: item[0])


def _restore_orbax(path: str, target: Any, shardings: Any | None) -> Any:
    import orbax.checkpoint as ocp

    def abstract(x, sh):
        if hasattr(x, "shape") and hasattr(x, "dtype"):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh)
        return x

    if shardings is not None:
        tgt = jax.tree_util.tree_map(abstract, target, shardings)
    else:
        tgt = jax.tree_util.tree_map(lambda x: abstract(x, None), target)
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(os.path.abspath(path), tgt)
    ckptr.close()
    return state


def load_last_checkpoint(checkpoints_path: str, target: Any,
                         shardings: Any | None = None
                         ) -> tuple[int, Any] | None:
    """Load the highest-epoch checkpoint into `target`'s structure.

    `shardings` (a pytree of jax.sharding.Sharding matching target) makes an
    orbax restore place every shard directly on its devices — required for
    state larger than one host; msgpack checkpoints load to host and the
    caller re-places them."""
    found = latest_checkpoint_step(checkpoints_path)
    if found is None:
        return None
    epoch, path = found
    if path.endswith(ORBAX_SUFFIX):
        return epoch, _restore_orbax(path, target, shardings)
    with open(path, "rb") as f:
        state = serialization.from_bytes(target, f.read())
    return epoch, state
