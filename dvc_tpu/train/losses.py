"""Loss functions for the disentangled VAE.

Bit-parity with reference model/disentangled_vae.py:309-327 (the
"Weakly-Supervised Disentanglement Without Compromises" group-VAE objective),
including its quirks, which materially shape training:
  * four L1 reconstruction terms are SUMS over all elements divided by the
    configured batch size (:314-318);
  * the two z-KL terms are per-sample sums over latent dims, then batch MEAN
    (:320-321);
  * the style KL uses factor -1 (not -0.5) and a sum-over-everything / batch
    (:323) — and is computed but EXCLUDED from the total (:325);
  * total = mse_cof * (4 L1 terms) + kl_cof * (2 KL terms).
The reference's permanent torch.autograd.set_detect_anomaly(True) (:313) is
a debugging slowdown, deliberately not reproduced (see SURVEY.md §3.1).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LossTerms(NamedTuple):
    total: jax.Array
    mse_x1: jax.Array
    mse_x2: jax.Array
    mse_x1_hat: jax.Array
    mse_x2_hat: jax.Array
    z1_kl: jax.Array
    z2_kl: jax.Array
    z_style_kl: jax.Array


def _l1_sum_over_batch(x: jax.Array, y: jax.Array, batch_size: int) -> jax.Array:
    return jnp.sum(jnp.abs(x - y)).astype(jnp.float32) / batch_size


def gvae_pair_loss(x1, x2, recons_x1, recons_x2, recons_x1_hat, recons_x2_hat,
                   q_z1_mu, q_z1_logvar, q_z2_mu, q_z2_logvar,
                   style_mu, style_logvar,
                   mse_cof: float = 10.0, kl_cof: float = 10.0) -> LossTerms:
    """loss_functionGVAE2 (reference model/disentangled_vae.py:310-327)."""
    b = x1.shape[0]
    mse_x1 = _l1_sum_over_batch(x1, recons_x1, b)
    mse_x2 = _l1_sum_over_batch(x2, recons_x2, b)
    mse_x1_hat = _l1_sum_over_batch(x1, recons_x1_hat, b)
    mse_x2_hat = _l1_sum_over_batch(x2, recons_x2_hat, b)

    z1_kl = (-0.5) * jnp.mean(
        jnp.sum(1 + q_z1_logvar - q_z1_mu**2 - jnp.exp(q_z1_logvar), axis=-1))
    z2_kl = (-0.5) * jnp.mean(
        jnp.sum(1 + q_z2_logvar - q_z2_mu**2 - jnp.exp(q_z2_logvar), axis=-1))
    # factor -1 and excluded from the total, as in the reference (:323-325)
    z_style_kl = (-1.0) * jnp.sum(
        1 + style_logvar - style_mu**2 - jnp.exp(style_logvar)) / b

    total = mse_cof * (mse_x1 + mse_x2 + mse_x1_hat + mse_x2_hat) \
        + kl_cof * (z1_kl + z2_kl)
    return LossTerms(total, mse_x1, mse_x2, mse_x1_hat, mse_x2_hat,
                     z1_kl, z2_kl, z_style_kl)


def kl_delta_vae(mu: jax.Array, logvar: jax.Array, alpha: float = 0.95) -> jax.Array:
    """δ-VAE KL variant (reference model/disentangled_vae.py:334-345,353-354),
    vectorized over latent dims instead of the reference's Python loop."""

    def f(x, coef=1.0):
        return coef * x - jnp.log(x) - 1.0

    var = jnp.exp(logvar)
    first = f(var[:, 0]) + mu[:, 0] ** 2
    a2 = alpha * alpha
    rest = f(var[:, 1:] / (1 - a2)) \
        + ((mu[:, 1:] - alpha * mu[:, :-1]) ** 2 + a2 * logvar[:, :-1]) / (1 - a2)
    kl = first + jnp.sum(rest, axis=-1)
    return (-0.5) * jnp.sum(kl)
