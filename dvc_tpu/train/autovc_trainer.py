"""AutoVC baseline training step.

The reference ships the AutoVC models (autovc_replicate/) but no in-repo
trainer for them; this provides the standard AutoVC objective so the
baselines are runnable end-to-end: reconstruction L2 (pre- and post-postnet)
plus the content consistency term
    L = ||x - x̂||² + ||x - x̂_post||² + λ ||C(x) - C(x̂_post)||₁
with λ = 1 (Qian et al. 2019), conditioning on GE2E speaker embeddings from
models.speaker_inference.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from dvc_tpu.config import AutoVCConfig
from dvc_tpu.models.autovc import AutoVC


class AutoVCState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def create_autovc_state(rng: jax.Array, cfg: AutoVCConfig = AutoVCConfig(),
                        lr: float = 1e-4, frames: int = 64):
    model = AutoVC(cfg)
    x = jnp.zeros((2, frames, cfg.num_mels))
    c = jnp.zeros((2, cfg.dim_emb))
    variables = model.init(rng, x, c, c, train=True)
    optimizer = optax.adam(lr)
    return model, AutoVCState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(variables["params"])), optimizer


def make_autovc_step(model: AutoVC, optimizer,
                     lambda_content: float = 1.0) -> Callable:
    def loss_fn(params, batch_stats, x, emb):
        (mel, mel_post, codes), mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x, emb, emb, train=True, mutable=["batch_stats"])
        l_recon = jnp.mean((x - mel) ** 2)
        l_recon0 = jnp.mean((x - mel_post) ** 2)
        codes_recon = model.apply(
            {"params": params, "batch_stats": mut["batch_stats"]},
            mel_post, emb, None, train=False)
        l_content = jnp.mean(jnp.abs(codes - codes_recon))
        total = l_recon + l_recon0 + lambda_content * l_content
        return total, (mut["batch_stats"], l_recon, l_content)

    def step(state: AutoVCState, x, emb):
        (total, (new_bs, l_recon, l_content)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, x, emb)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        return (AutoVCState(step=state.step + 1,
                            params=optax.apply_updates(state.params, updates),
                            batch_stats=new_bs, opt_state=new_opt),
                total, l_recon, l_content)

    return jax.jit(step, donate_argnums=(0,))
