"""Adversarial content regularization for the disentangled VAE (additive).

The group-VAE objective (train/losses.py, reference
model/disentangled_vae.py:309-327) only *prefers* that pair-constant
(speaker) information land in the style dims; nothing stops identity from
leaking into the 28 content dims, and at sub-VCTK training scale it does —
measured in docs/measurements/quality_full_size_20spk_latent32*_r5.json
(the reference counters with brute scale: 200k epochs x VCTK,
/root/reference/training.sh:1-13, which no bench-scale run reproduces).

This module adds the standard explicit counter — an adversarial speaker
classifier on the CONTENT posterior mean.  Two formulations are provided:

- ``mode="confusion"`` (default, Tzeng et al. 2015): the classifier
  trains on STOP-GRADIENT latents; the encoder minimises CE against the
  UNIFORM distribution through stop-gradient classifier params.  The
  uniform target keeps the encoder gradient alive even when the
  classifier is confident.
- ``mode="grl"`` (Ganin & Lempitsky 2015): one CE, classifier gradient
  straight, encoder gradient sign-flipped by ``grad_reverse``.

Three failure modes were MEASURED on a tiny CPU probe (2 speakers with a
blatant constant mel offset) while building this, and each shaped the
design:

1. **GRL saturation**: the classifier reaches CE ~= 0 within ~100 steps,
   the softmax gradient through the latent vanishes, and the reversed
   signal does nothing — content-latent speaker separability *rose* with
   adv_cof (Fisher ratio 55k -> 108k at cof=3e4).  Hence confusion is
   the default; GRL stays available as ``mode="grl"``.
2. **Scale cheat**: with raw latents, the encoder minimises confusion by
   shrinking the WHOLE content latent (total variance 15.3 -> 0.7 at
   cof=100) — normalised separability was bit-identical (4.03 at every
   cof).  Hence the adversary sees a per-batch Z-SCORED latent
   (differentiable, so shrinking is gradient-free) in confusion mode.
3. **Reconstruction dominance**: at toy scale, with the speaker offset
   carrying most of the input energy, the recon loss (~700 vs the O(1)
   confusion term) pins identity in the content dims and normalised
   separability does not move at any adv_cof, while MSE stays intact.
   So this regularizer is NOT claimed to disentangle at toy scale; its
   effect is measured at training scale on the chip
   (docs/measurements/quality_full_size_20spk_latent32_*_r5.json).
tests/test_adversarial.py pins the mechanics and the no-cheat behavior.

Either way both nets train from ONE backward pass of one combined loss,
so the whole thing stays a single jitted XLA program per step.

Flag-gated and additive: LossConfig.adv_cof = 0 (the default) keeps the
reference objective bit-identical, and the adversary's params/optimizer
state live OUTSIDE the VAE TrainState so checkpoint files remain
interchangeable with the reference's (the adversary re-warms within a few
epochs after a resume; it is a training-time regularizer with no
inference-time role).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from dvc_tpu.models.disentangled_vae import DisentangledVAE
from dvc_tpu.train.losses import gvae_pair_loss


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def grad_reverse(x: jax.Array, lam: float = 1.0) -> jax.Array:
    """Identity forward; backward multiplies the cotangent by -lam
    (Ganin & Lempitsky 2015).  lam is static (baked into the jitted
    program)."""
    return x


def _gr_fwd(x, lam):
    return x, None


def _gr_bwd(lam, _res, g):
    return (-lam * g,)


grad_reverse.defvjp(_gr_fwd, _gr_bwd)


class SpeakerAdversary(nn.Module):
    """Small MLP speaker classifier over the content latent.  Capacity is
    deliberately modest — it must be strong enough to FIND leaked identity
    (so the reversed gradient can remove it) but it trains on every step,
    so depth buys little."""

    n_speakers: int
    hidden: int = 256

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        x = nn.relu(nn.Dense(self.hidden, name="fc0")(z))
        x = nn.relu(nn.Dense(self.hidden, name="fc1")(x))
        return nn.Dense(self.n_speakers, name="out")(x)


class AdvState(struct.PyTreeNode):
    params: Any
    opt_state: Any


def create_adv_state(rng: jax.Array, content_size: int, n_speakers: int,
                     learning_rate: float = 1e-3, hidden: int = 256
                     ) -> tuple[SpeakerAdversary, AdvState,
                                optax.GradientTransformation]:
    adv_model = SpeakerAdversary(n_speakers=n_speakers, hidden=hidden)
    params = adv_model.init(rng, jnp.zeros((1, content_size), jnp.float32)
                            )["params"]
    adv_optimizer = optax.adam(learning_rate)
    return adv_model, AdvState(params=params,
                               opt_state=adv_optimizer.init(params)), \
        adv_optimizer


def make_adv_train_step(model: DisentangledVAE,
                        optimizer: optax.GradientTransformation,
                        adv_model: SpeakerAdversary,
                        adv_optimizer: optax.GradientTransformation,
                        mse_cof: float = 10.0, kl_cof: float = 10.0,
                        adv_cof: float = 10.0, mode: str = "confusion",
                        compute_dtype: str = "float32",
                        donate: bool = True, jit: bool = True,
                        remat: bool = False) -> Callable:
    """Build (state, adv_state, x1, x2, spk, rng) ->
    (state, adv_state, LossTerms, {"adv_ce", "adv_acc"}).

    Same contract as train/trainer.make_train_step plus the speaker-id
    batch and the adversary state.  One value_and_grad over
    (vae_params, adv_params) carries both players (module docstring for
    the two modes); the classifier CE always reaches adv_params
    un-reversed, and the encoder sees either the uniform-target
    confusion gradient (default) or the sign-flipped CE gradient."""
    if mode not in ("confusion", "grl"):
        raise ValueError(f"mode must be 'confusion' or 'grl', got {mode!r}")
    from dvc_tpu.train.trainer import TrainState

    cast = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    s = model.cfg.speaker_size

    def forward(params, batch_stats, x1, x2, rng):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            x1.astype(cast), x2.astype(cast), train=True,
            rngs={"reparam": rng}, mutable=["batch_stats"])

    if remat:
        forward = jax.checkpoint(forward)

    def loss_fn(params, adv_params, batch_stats, x1, x2, spk, rng):
        outs, mutated = forward(params, batch_stats, x1, x2, rng)
        (rx1, rx2, rx1h, rx2h, q1m, q1l, q2m, q2l, smu, slv) = [
            o.astype(jnp.float32) for o in outs]
        terms = gvae_pair_loss(x1, x2, rx1, rx2, rx1h, rx2h,
                               q1m, q1l, q2m, q2l, smu, slv,
                               mse_cof=mse_cof, kl_cof=kl_cof)
        # content posterior means of BOTH utterances of the pair
        # (q_z*_mu = concat[style_mu, content_mu], models/disentangled_vae.py)
        zc = jnp.concatenate([q1m[:, s:], q2m[:, s:]], axis=0)
        labels = jnp.concatenate([spk, spk], axis=0)
        if mode == "grl":
            logits = adv_model.apply({"params": adv_params},
                                     grad_reverse(zc, 1.0))
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
            adv_term = ce
        else:  # confusion
            # per-batch z-score (differentiable): shrinking the latent no
            # longer reduces confusion (measured scale cheat, docstring #2)
            zc = (zc - zc.mean(0, keepdims=True)) / (
                zc.std(0, keepdims=True) + 1e-5)
            # classifier branch: latents frozen, learn the speaker
            logits = adv_model.apply({"params": adv_params},
                                     jax.lax.stop_gradient(zc))
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
            # encoder branch: classifier frozen, target = uniform —
            # CE(p, uniform) = -mean(log p); non-saturating
            frozen = jax.tree_util.tree_map(jax.lax.stop_gradient,
                                            adv_params)
            logits_enc = adv_model.apply({"params": frozen}, zc)
            confusion = -jax.nn.log_softmax(logits_enc).mean()
            adv_term = ce + confusion
        acc = jnp.mean((jnp.argmax(logits, axis=-1) == labels
                        ).astype(jnp.float32))
        total = terms.total + adv_cof * adv_term
        return total, (terms, mutated["batch_stats"], ce, acc)

    def adv_train_step(state: TrainState, adv_state: AdvState,
                       x1, x2, spk, rng):
        rng = jax.random.fold_in(rng, state.step)
        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
        (_, (terms, new_bs, ce, acc)), (g_vae, g_adv) = grad_fn(
            state.params, adv_state.params, state.batch_stats,
            x1, x2, spk, rng)
        updates, new_opt = optimizer.update(g_vae, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        a_updates, a_new_opt = adv_optimizer.update(
            g_adv, adv_state.opt_state, adv_state.params)
        a_new_params = optax.apply_updates(adv_state.params, a_updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_bs, opt_state=new_opt)
        new_adv = AdvState(params=a_new_params, opt_state=a_new_opt)
        return new_state, new_adv, terms, {"adv_ce": ce, "adv_acc": acc}

    if not jit:
        return adv_train_step
    return jax.jit(adv_train_step,
                   donate_argnums=(0, 1) if donate else ())
