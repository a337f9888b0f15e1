"""Reference-checkpoint parity harness.

BASELINE.md gates output fidelity on the PUBLISHED reference checkpoints
(reference README.md:13-14): mel-reconstruction error and converted-utterance
MCD within 0.1 dB.  This module is the measurement machinery: load a torch
`DisentangledVAE_VCTK_*.pth` through the converter, reconstruct a held-out
mel set, and report the error statistics; the same entry point doubles as a
self-parity check between two checkpoints of this framework.

(The published checkpoints are not redistributable inside this repo; run
`parity_report` once they are on disk.)
"""

from __future__ import annotations

import glob
import os

import jax.numpy as jnp
import numpy as np

from dvc_tpu.config import Config, VAEConfig
from dvc_tpu.models.disentangled_vae import DisentangledVAE


def load_reference_checkpoint(pth_path: str, cfg: VAEConfig = VAEConfig()
                              ) -> tuple[DisentangledVAE, dict]:
    """torch .pth state_dict -> (model, variables) via the converter."""
    from dvc_tpu.utils.torch_convert import (
        convert_disentangled_vae, load_torch_state_dict)

    sd = load_torch_state_dict(pth_path)
    params, batch_stats = convert_disentangled_vae(sd)
    model = DisentangledVAE(cfg)
    return model, {"params": params, "batch_stats": batch_stats}


def mel_reconstruction_error(model: DisentangledVAE, variables: dict,
                             mels: list[np.ndarray], frames: int = 64
                             ) -> dict[str, float]:
    """Eval-mode reconstruction error over 64-frame crops of `mels`
    ((80, T) arrays).  Returns per-frame L1/L2 statistics."""
    crops = []
    for mel in mels:
        t = mel.shape[1]
        if t < frames:
            mel = np.pad(mel, ((0, 0), (0, frames - t)))
            t = frames
        for s in range(0, t - frames + 1, frames):
            crops.append(mel[:, s:s + frames])
    x = jnp.asarray(np.stack(crops), jnp.float32)

    smu, _, cmu, _ = model.apply(variables, x, method="encode")
    z = jnp.concatenate([smu, cmu], axis=-1)
    recons = model.apply(variables, z, method="decode")
    diff = np.abs(np.asarray(recons) - np.asarray(x))
    return {
        "n_crops": len(crops),
        "l1_per_frame": float(diff.mean()),
        "l2_per_frame": float(np.sqrt((diff**2).mean())),
        "max_abs": float(diff.max()),
    }


def parity_report(pth_path: str, mel_dir: str, cfg: Config = Config(),
                  max_utterances: int = 32) -> dict:
    """End-to-end parity numbers for a reference checkpoint against a mel
    directory (speaker subdirs of .npy files, the preprocessing layout)."""
    model, variables = load_reference_checkpoint(pth_path, cfg.vae)
    fps = sorted(glob.glob(os.path.join(mel_dir, "*", "*.npy")))[:max_utterances]
    mels = [np.load(fp) for fp in fps]
    report = mel_reconstruction_error(model, variables, mels, cfg.vae.frames)
    report["checkpoint"] = os.path.basename(pth_path)
    report["n_utterances"] = len(mels)
    return report
