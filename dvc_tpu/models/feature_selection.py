"""Speaker-discriminative latent-dimension selector.

Parity with reference model/feature_selection.py:5-43: an MLP producing a
sigmoid mask over latent dims plus a speaker classifier, trained with
cross-entropy on frozen-VAE latents (model/train_feature_selection.py:10-61)
to find which latent dims carry speaker identity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class FeatureSelection(nn.Module):
    input_size: int
    num_spk: int

    def setup(self):
        self.ln1 = nn.Dense(1024, name="ln1")
        self.ln2 = nn.Dense(1024, name="ln2")
        self.weight = nn.Dense(self.input_size, name="weight")
        self.cls_linear = nn.Dense(1024, name="cls_linear")
        self.prediction = nn.Dense(self.num_spk, name="prediction")

    def __call__(self, x: jax.Array) -> jax.Array:
        """Latents (B, D) -> sigmoid feature mask (B, D)."""
        out = nn.relu(self.ln1(x))
        out = nn.relu(self.ln2(out))
        return nn.sigmoid(self.weight(out))

    def classify(self, x: jax.Array) -> jax.Array:
        """Masked latents -> speaker probabilities (softmaxed, as the
        reference's classify does — feature_selection.py:32-37)."""
        p = nn.relu(self.cls_linear(x))
        return jax.nn.softmax(self.prediction(p), axis=-1)


def feature_selection_loss(prediction: jax.Array, label: jax.Array) -> jax.Array:
    """CE on (already softmaxed) predictions — the reference applies
    F.cross_entropy to softmax outputs (train via feature_selection.py:39-43);
    the equivalent log-softmax-of-softmax composition is kept for parity."""
    logprob = jax.nn.log_softmax(prediction, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logprob, label[:, None], axis=1))
