"""WaveNet vocoder training (teacher-forced, MoL NLL, EMA weights).

The reference never trains the vocoder in-repo — it consumes r9y9's published
EMA checkpoint (model/variational_base_vae.py:254) whose training recipe is
in preprocessing/hparams.py:129-151 (Adam 1e-3 beta(0.9,0.999) eps 1e-8,
max_time_steps 8000, exponential_moving_average decay 0.9999).  A complete
framework must be able to reproduce that checkpoint, so this trainer
implements the same recipe: one jitted step of teacher-forced forward + MoL
NLL + Adam, with an EMA parameter trail updated on device.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from dvc_tpu.config import VocoderConfig
from dvc_tpu.models.wavenet import WaveNet, discretized_mix_logistic_loss


class WaveNetState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    ema_params: Any
    opt_state: Any


def create_wavenet_state(rng: jax.Array, cfg: VocoderConfig,
                         lr: float = 1e-3, max_time_steps: int = 8000):
    model = WaveNet(cfg)
    hop = int(np.prod(cfg.upsample_scales))
    frames = max(4, max_time_steps // hop)
    c = jnp.zeros((1, frames, cfg.cin_channels))
    x = jnp.zeros((1, frames * hop, 1))
    params = model.init(rng, x, c)["params"]
    optimizer = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    # the EMA trail must be a distinct buffer tree: aliasing `params` makes
    # the donated first step hand the same buffer to XLA twice
    ema = jax.tree_util.tree_map(jnp.array, params)
    return model, WaveNetState(step=jnp.zeros((), jnp.int32), params=params,
                               ema_params=ema,
                               opt_state=optimizer.init(params)), optimizer


def make_wavenet_step(model: WaveNet, optimizer, cfg: VocoderConfig,
                      ema_decay: float = 0.9999,
                      ema_warmup: bool = True) -> Callable:
    """ema_warmup ramps the decay as min(ema_decay, (1+t)/(10+t)) — the
    classic num_updates schedule.  Without it, a run of N steps leaves
    ema_decay^N of the INITIAL weights in the trail (0.9999^1500 = 86%),
    which made short-run EMA generation measure the init, not the model
    (the round-4 flat holdout trajectory).  The asymptote is unchanged, so
    a reference-scale 1M-step run (preprocessing/hparams.py:150) still
    matches the reference recipe's effective decay."""
    def loss_fn(params, x, c, rng):
        y_hat = model.apply({"params": params}, x, c, train=True,
                            rngs={"dropout": rng})
        # predict x[t] from x[<t]: shift target left by one
        return discretized_mix_logistic_loss(
            y_hat[:, :-1], x[:, 1:], log_scale_min=cfg.log_scale_min)

    def step(state: WaveNetState, x, c, rng):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, x, c, rng)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        if ema_warmup:
            t = state.step.astype(jnp.float32)
            d = jnp.minimum(ema_decay, (1.0 + t) / (10.0 + t))
        else:
            d = ema_decay
        new_ema = jax.tree_util.tree_map(
            lambda e, p: d * e + (1.0 - d) * p,
            state.ema_params, new_params)
        return WaveNetState(step=state.step + 1, params=new_params,
                            ema_params=new_ema, opt_state=new_opt), loss

    return jax.jit(step, donate_argnums=(0,))


@dataclass
class VocoderTrainer:
    cfg: VocoderConfig = VocoderConfig()
    lr: float = 1e-3
    max_time_steps: int = 8000

    def __post_init__(self):
        self.model, self.state, self.optimizer = create_wavenet_state(
            jax.random.PRNGKey(0), self.cfg, self.lr, self.max_time_steps)
        self.step_fn = make_wavenet_step(self.model, self.optimizer, self.cfg)
        self._rng = jax.random.PRNGKey(1)

    def train_steps(self, batches, n_steps: int, logging_func=print) -> list[float]:
        """batches yields (x (B, T, 1) in [-1,1], c (B, T//hop, n_mels))."""
        losses = []
        it = iter(batches)
        for i in range(n_steps):
            x, c = next(it)
            self.state, loss = self.step_fn(self.state, jnp.asarray(x),
                                            jnp.asarray(c), self._rng)
            losses.append(float(loss))
            if i % 50 == 0:
                logging_func(f"vocoder step {int(self.state.step)}: "
                             f"nll {losses[-1]:.4f}")
        return losses

    def save(self, models_dir: str, run_id: str = "wavenet") -> str:
        """Persist the EMA parameters (the weights generation consumes — the
        reference's published checkpoint is likewise the EMA trail) in the
        msgpack layout convert/vocode.load_vocoder_params reads."""
        from flax import serialization

        os.makedirs(models_dir, exist_ok=True)
        path = os.path.join(models_dir,
                            f"{run_id}_step{int(self.state.step):09d}.msgpack")
        with open(path, "wb") as f:
            f.write(serialization.to_bytes({"params": self.state.ema_params}))
        return path


def wav_batches(wav_dir: str, batch_size: int, max_time_steps: int,
                cfg: VocoderConfig, seed: int = 0, audio_cfg=None):
    """Infinite (x, c) teacher-forcing batches from a directory of wavs.

    Each draw picks random wavs and random hop-aligned crops of
    max_time_steps samples (reference hparams.py:141), computes their mel
    conditioning with the framework's batched mel op, and aligns c to
    exactly T//hop frames (the upsampler's contract)."""
    import glob as _glob

    from dvc_tpu.config import AudioConfig
    from dvc_tpu.ops.mel import melspectrogram

    audio_cfg = audio_cfg or AudioConfig()
    hop = int(np.prod(cfg.upsample_scales))
    t = (max_time_steps // hop) * hop
    frames = t // hop

    from dvc_tpu.utils.wavio import read_audio
    fps = sorted(_glob.glob(os.path.join(wav_dir, "**", "*.wav"),
                            recursive=True))
    assert fps, f"no wavs under {wav_dir}"
    rng = np.random.RandomState(seed)
    wavs = []
    for fp in fps:
        w, sr = read_audio(fp)
        if sr != audio_cfg.sample_rate:
            from dvc_tpu.ops.audio import resample_poly
            w = np.asarray(resample_poly(jnp.asarray(w), sr,
                                         audio_cfg.sample_rate))
        if len(w) >= t:
            wavs.append(np.asarray(w, np.float32))
    assert wavs, f"no wav under {wav_dir} is >= {t} samples"

    while True:
        xs = np.zeros((batch_size, t, 1), np.float32)
        for b in range(batch_size):
            w = wavs[rng.randint(len(wavs))]
            start = rng.randint(0, len(w) - t + 1) // hop * hop
            xs[b, :, 0] = w[start:start + t]
        mel = np.asarray(melspectrogram(jnp.asarray(xs[..., 0]), audio_cfg))
        c = np.swapaxes(mel, 1, 2)[:, :frames]  # (B, frames, n_mels)
        yield xs, c

