"""Feature-selection training on frozen-VAE latents.

Parity with reference model/train_feature_selection.py:10-79: encode every
utterance with the trained (frozen) VAE, train the FeatureSelection MLP with
cross-entropy so the sigmoid mask keeps speaker-discriminative latent dims.
(The reference script as shipped is broken — it imports the dead
`sparse_encoding` package and calls a 3-output encode; this is the working
equivalent wired to the current DisentangledVAE latents, as SURVEY.md §2 C21
prescribes.)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from dvc_tpu.models.feature_selection import FeatureSelection


class FSState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any


def create_fs_state(rng: jax.Array, input_size: int, num_spk: int,
                    lr: float = 1e-3):
    model = FeatureSelection(input_size=input_size, num_spk=num_spk)
    x = jnp.zeros((2, input_size))
    params = model.init(rng, x,
                        method=lambda m, x: (m(x), m.classify(x)))["params"]
    optimizer = optax.adam(lr)
    return model, FSState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=optimizer.init(params)), optimizer


def make_fs_step(model: FeatureSelection, optimizer) -> Callable:
    def loss_fn(params, latents, labels):
        mask = model.apply({"params": params}, latents)
        pred = model.apply({"params": params}, latents * mask,
                           method="classify")
        # reference quirk: F.cross_entropy applied to ALREADY-SOFTMAXED
        # outputs (log_softmax of probabilities -> squashed gradients, NOT
        # plain CE) — feature_selection_loss reproduces the composition
        from dvc_tpu.models.feature_selection import feature_selection_loss
        ce = feature_selection_loss(pred, labels)
        acc = jnp.mean((jnp.argmax(pred, -1) == labels).astype(jnp.float32))
        return ce, (mask, acc)

    def step(state: FSState, latents, labels):
        (loss, (mask, acc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, latents, labels)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        return (FSState(step=state.step + 1,
                        params=optax.apply_updates(state.params, updates),
                        opt_state=new_opt), loss, acc)

    return jax.jit(step, donate_argnums=(0,))


@dataclass
class FeatureSelectionTrainer:
    input_size: int
    num_spk: int
    lr: float = 1e-3

    def __post_init__(self):
        self.model, self.state, self.optimizer = create_fs_state(
            jax.random.PRNGKey(0), self.input_size, self.num_spk, self.lr)
        self.step_fn = make_fs_step(self.model, self.optimizer)

    def encode_latents(self, vae_model, vae_variables, mels: np.ndarray
                       ) -> np.ndarray:
        """Frozen-VAE latents [style_mu, content_mu] for (B, 80, T) mels."""
        smu, _, cmu, _ = vae_model.apply(vae_variables, jnp.asarray(mels),
                                         method="encode")
        return np.asarray(jnp.concatenate([smu, cmu], axis=-1))

    def train(self, latents: np.ndarray, labels: np.ndarray, epochs: int = 10,
              batch_size: int = 64, logging_func=print) -> dict:
        latents = np.asarray(latents, np.float32)
        labels = np.asarray(labels, np.int32)
        n = len(latents)
        batch_size = min(batch_size, n)
        assert batch_size > 0, "no latents to train on"
        rng = np.random.RandomState(0)
        last = {}
        for epoch in range(epochs):
            order = rng.permutation(n)
            losses, accs = [], []
            for b in range(0, n - batch_size + 1, batch_size):
                idx = order[b:b + batch_size]
                self.state, loss, acc = self.step_fn(
                    self.state, jnp.asarray(latents[idx]), jnp.asarray(labels[idx]))
                losses.append(float(loss))
                accs.append(float(acc))
            last = {"epoch": epoch, "loss": float(np.mean(losses)),
                    "acc": float(np.mean(accs))}
            logging_func(f"fs epoch {epoch}: loss {last['loss']:.4f} "
                         f"acc {last['acc']:.3f}")
        return last

    def feature_mask(self, latents: np.ndarray) -> np.ndarray:
        """Mean sigmoid mask — which latent dims carry speaker identity."""
        mask = self.model.apply({"params": self.state.params},
                                jnp.asarray(latents, jnp.float32))
        return np.asarray(jnp.mean(mask, axis=0))
