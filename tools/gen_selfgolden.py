#!/usr/bin/env python
"""Regenerate tests/fixtures/dsp_selfgolden.npz (the self-golden DSP
regression fixture).  Run ONLY when a numeric change is intentional, and
say why in the commit message.

    DVC_TPU_PLATFORM=cpu python tools/gen_selfgolden.py
"""

import os
import sys

os.environ.setdefault("DVC_TPU_PLATFORM", "cpu")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    fs = 16000
    rng = np.random.RandomState(1234)
    t = np.arange(fs) / fs
    f0c = 180 * (1 + 0.08 * np.sin(2 * np.pi * 1.1 * t))
    phase = np.cumsum(2 * np.pi * f0c / fs)
    wav = (0.5 * np.sin(phase) + 0.25 * np.sin(2 * phase)
           + 0.12 * np.sin(3 * phase)
           + 0.01 * rng.randn(fs)).astype(np.float32)

    from dvc_tpu.config import AudioConfig
    from dvc_tpu.ops.mel import melspectrogram
    from dvc_tpu.ops.world import world_encode_data

    mel = np.asarray(melspectrogram(jnp.asarray(wav), AudioConfig()))
    f0, _, sp, ap, mc = world_encode_data(wav, fs)
    out = os.path.join(REPO, "tests", "fixtures", "dsp_selfgolden.npz")
    np.savez_compressed(out, wav=wav, mel=mel.astype(np.float32),
                        f0=np.asarray(f0, np.float32),
                        sp=np.asarray(sp, np.float32)[:, :64],
                        ap=np.asarray(ap, np.float32)[:, ::8],
                        mc=np.asarray(mc, np.float32))
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")


if __name__ == "__main__":
    main()
