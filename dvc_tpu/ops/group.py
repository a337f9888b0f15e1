"""Group-evidence accumulation utilities (ML-VAE / FactorVAE support ops).

Parity with reference model/utils.py:13-128 — available to the training
objective though (like the reference) unused by the main GVAE path:
  * accumulate_group_evidence: precision-weighted pooling of per-sample
    Gaussian posteriors into one posterior per group label;
  * group_wise_reparameterize: one shared eps draw per group;
  * permute_dims: FactorVAE's per-dimension batch shuffle.

TPU-native: the reference's per-sample Python dict loops (utils.py:29-72)
become `jax.ops.segment_sum` over a dense label -> group mapping, so the op
is O(1) dispatches and jittable/shardable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def accumulate_group_evidence(class_mu: jax.Array, class_logvar: jax.Array,
                              labels: jax.Array, num_groups: int
                              ) -> tuple[jax.Array, jax.Array]:
    """Precision-weighted per-group posterior, broadcast back per sample.

    labels: int array (B,) with values < num_groups (static upper bound —
    pass batch size for fully dynamic labels).
    Returns (group_mu (B, D), group_logvar (B, D)) like utils.py:13-75.
    """
    var = jnp.maximum(jnp.exp(class_logvar), 1e-6)
    inv_var = 1.0 / var
    group_inv_var = jax.ops.segment_sum(inv_var, labels, num_segments=num_groups)
    group_var = 1.0 / jnp.maximum(group_inv_var, 1e-6)
    weighted_mu = jax.ops.segment_sum(class_mu * inv_var, labels,
                                      num_segments=num_groups)
    group_mu = weighted_mu * group_var
    return group_mu[labels], jnp.log(jnp.maximum(group_var, 1e-6))[labels]


def group_wise_reparameterize(rng: jax.Array, mu: jax.Array, logvar: jax.Array,
                              labels: jax.Array, num_groups: int,
                              train: bool = True, eps_std: float = 0.1) -> jax.Array:
    """One eps draw per group label (reference utils.py:95-116, which draws
    eps ~ N(0, 0.1) per group)."""
    if not train:
        return mu
    eps_groups = eps_std * jax.random.normal(
        rng, (num_groups, logvar.shape[-1]), mu.dtype)
    eps = eps_groups[labels]
    return eps * jnp.exp(0.5 * logvar) + mu


def permute_dims(rng: jax.Array, z: jax.Array) -> jax.Array:
    """Independent batch permutation per latent dim (utils.py:118-128)."""
    b, d = z.shape
    perms = jax.vmap(lambda k: jax.random.permutation(k, b))(
        jax.random.split(rng, d))  # (D, B)
    return z[perms.T, jnp.arange(d)[None, :]]
