"""Training for the non-autoregressive iSTFT vocoder.

Objective (the standard GAN-free core of the FreeV / Autovocoder recipe,
PAPERS.md): multi-resolution STFT loss (spectral convergence + log-magnitude
L1 over three framing grids) + a waveform L1 term.  Everything — framing,
rFFTs at three resolutions, the iSTFT — is inside one jitted step.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from dvc_tpu.config import AudioConfig, ISTFTVocoderConfig
from dvc_tpu.models.istft_vocoder import ISTFTVocoder
from dvc_tpu.ops.stft import _window, frame_signal

# (fft, hop) grids of the multi-resolution loss
RESOLUTIONS = ((512, 128), (1024, 256), (2048, 512))


def _stft_mag(wav: jax.Array, fft: int, hop: int) -> jax.Array:
    frames = frame_signal(wav, fft, hop)
    win = jnp.asarray(_window("hann", fft))
    return jnp.abs(jnp.fft.rfft(frames * win, n=fft, axis=-1)) + 1e-7


def multi_resolution_stft_loss(pred: jax.Array, target: jax.Array
                               ) -> jax.Array:
    """Mean over RESOLUTIONS of spectral convergence + log-mag L1."""
    total = 0.0
    for fft, hop in RESOLUTIONS:
        p = _stft_mag(pred, fft, hop)
        t = _stft_mag(target, fft, hop)
        sc = jnp.linalg.norm(t - p) / jnp.maximum(jnp.linalg.norm(t), 1e-6)
        logmag = jnp.mean(jnp.abs(jnp.log(t) - jnp.log(p)))
        total = total + sc + logmag
    return total / len(RESOLUTIONS)


class ISTFTVocState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any


def create_istft_state(rng: jax.Array,
                       cfg: ISTFTVocoderConfig = ISTFTVocoderConfig(),
                       audio: AudioConfig = AudioConfig(),
                       lr: float = 2e-4, frames: int = 32):
    model = ISTFTVocoder(cfg, audio)
    mel = jnp.zeros((1, audio.num_mels, frames))
    variables = model.init(rng, mel)
    # global-norm clipping: the spectral-convergence term spikes hard when
    # the phase field reorganizes early in training (measured: loss 3.5 ->
    # 27 in the first 50 unclipped steps before slowly recovering)
    optimizer = optax.chain(optax.clip_by_global_norm(1.0),
                            optax.adamw(lr, weight_decay=1e-5))
    return model, ISTFTVocState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        opt_state=optimizer.init(variables["params"])), optimizer


def make_istft_step(model: ISTFTVocoder, optimizer,
                    wav_l1_weight: float = 0.1) -> Callable:
    from dvc_tpu.convert.griffinlim import istft

    audio = model.audio

    def loss_fn(params, mel, wav):
        spec = model.apply({"params": params}, mel)
        pred = istft(spec, wav.shape[-1], audio)
        mrstft = multi_resolution_stft_loss(pred, wav)
        l1 = jnp.mean(jnp.abs(pred - wav))
        return mrstft + wav_l1_weight * l1, (mrstft, l1)

    def step(state: ISTFTVocState, mel, wav):
        (total, (mrstft, l1)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, mel, wav)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        return (ISTFTVocState(step=state.step + 1,
                              params=optax.apply_updates(state.params,
                                                         updates),
                              opt_state=new_opt),
                total, mrstft, l1)

    return jax.jit(step, donate_argnums=(0,))


@dataclass
class ISTFTVocoderTrainer:
    cfg: ISTFTVocoderConfig = ISTFTVocoderConfig()
    audio: AudioConfig = field(default_factory=AudioConfig)
    lr: float = 2e-4
    seed: int = 0

    def __post_init__(self):
        self.model, self.state, self.optimizer = create_istft_state(
            jax.random.PRNGKey(self.seed), self.cfg, self.audio, self.lr)
        self.step_fn = make_istft_step(self.model, self.optimizer)

    def train_steps(self, batches, n_steps: int,
                    logging_func=print) -> list[float]:
        """batches yields (mel (B, n_mels, T), wav (B, T*hop-ish)) pairs
        (the hop-aligned crops of train/vocoder_trainer.wav_batches work:
        pass its (x, c) as (c.T-per-batch, x[..., 0]))."""
        losses = []
        for i, (mel, wav) in enumerate(batches):
            if i >= n_steps:
                break
            self.state, total, mrstft, l1 = self.step_fn(
                self.state, jnp.asarray(mel), jnp.asarray(wav))
            if (i + 1) % 50 == 0 or i == 0:
                logging_func(f"istft-voc step {int(self.state.step)}: "
                             f"loss {float(total):.4f} "
                             f"(mrstft {float(mrstft):.4f} l1 {float(l1):.4f})")
            losses.append(float(total))
        return losses

    def save(self, models_dir: str, run_id: str = "istft_voc") -> str:
        from flax import serialization

        os.makedirs(models_dir, exist_ok=True)
        path = os.path.join(models_dir,
                            f"{run_id}_step{int(self.state.step):09d}.msgpack")
        with open(path, "wb") as f:
            f.write(serialization.to_bytes({"params": self.state.params}))
        return path


def mel_wav_batches(wav_dir: str, batch_size: int, crop_frames: int,
                    audio: AudioConfig = AudioConfig(), seed: int = 0):
    """Infinite (mel (B, n_mels, T), wav (B, T*hop)) pairs — a thin adapter
    over train/vocoder_trainer.wav_batches (the same load/resample/filter/
    crop/mel pipeline; one implementation to maintain)."""
    from dvc_tpu.config import VocoderConfig
    from dvc_tpu.train.vocoder_trainer import wav_batches

    # VocoderConfig's hop (prod of upsample scales) must equal the mel hop
    # for the crops to align; the default stacks (4,4,4,4) == hop 256
    vcfg = VocoderConfig()
    assert int(np.prod(vcfg.upsample_scales)) == audio.hop_size
    for x, c in wav_batches(wav_dir, batch_size,
                            crop_frames * audio.hop_size, vcfg, seed=seed,
                            audio_cfg=audio):
        # wav_batches yields x (B, T*hop, 1), c (B, T, n_mels)
        yield np.transpose(c, (0, 2, 1)), x[..., 0]
