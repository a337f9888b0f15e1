"""GE2E speaker encoder.

Parity with reference preprocessing/encoder/model.py:12-138:
  3-layer LSTM(80 -> 256), last layer's final hidden state -> Linear -> ReLU
  -> L2 normalize (embedding 256); GE2E similarity matrix with
  inclusive/exclusive centroids scaled by learned (weight=10, bias=-5);
  softmax loss over speakers.

TPU-native: the similarity matrix replaces the reference's per-speaker Python
loop (encoder/model.py:89-92) with masked einsums — one fused program.  EER
is computed host-side in eval/eer.py (sklearn-free ROC), as in the reference
it is never backpropagated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from dvc_tpu.config import SpeakerEncoderConfig
from dvc_tpu.models.layers import LSTM


def _safe_l2_normalize(x: jax.Array, axis: int) -> jax.Array:
    """x / ||x|| with finite FORWARD AND BACKWARD at x == 0: rsqrt of the
    epsilon-shifted sum of squares (a post-hoc maximum on the norm keeps the
    forward finite but its VJP still multiplies 0 * inf -> NaN gradients)."""
    sumsq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(sumsq + 1e-24)


class SpeakerEncoder(nn.Module):
    cfg: SpeakerEncoderConfig = SpeakerEncoderConfig()
    dtype: jnp.dtype | None = None

    def setup(self):
        # explicit scan unroll: at this batch (64 spk x 10 utts = 640) a fully
        # unrolled T=63 LSTM measured 9x SLOWER (1630 vs 184 ms/step on v5e) —
        # the straight-line program spills; the layers.py full-unroll
        # heuristic is tuned for the VAE's smaller per-call batches
        self.lstm = LSTM(self.cfg.hidden_size, num_layers=self.cfg.num_layers,
                         unroll=8, dtype=self.dtype, name="lstm")
        self.linear = nn.Dense(self.cfg.embedding_size, name="linear")
        self.similarity_weight = self.param(
            "similarity_weight", lambda k, s: jnp.full(s, 10.0), (1,))
        self.similarity_bias = self.param(
            "similarity_bias", lambda k, s: jnp.full(s, -5.0), (1,))

    def __call__(self, utterances: jax.Array) -> jax.Array:
        """(B, n_frames, n_mels) -> L2-normalized embeddings (B, E)."""
        _, (h, _) = self.lstm(utterances)
        embeds_raw = nn.relu(self.linear(h[-1]))
        return _safe_l2_normalize(embeds_raw, axis=1)

    def similarity_matrix(self, embeds: jax.Array) -> jax.Array:
        """(S, U, E) -> (S, U, S) GE2E similarities (encoder/model.py:63-105)."""
        s, u, _ = embeds.shape
        # epsilon-regularized norms (robustness addition: the reference
        # divides by the raw norm at encoder/model.py:76,81, so an all-zero
        # centroid — ReLU-dead embeddings early in training — NaNs the run)
        centroids_incl = jnp.mean(embeds, axis=1, keepdims=True)  # (S,1,E)
        centroids_incl = _safe_l2_normalize(centroids_incl, axis=2)
        centroids_excl = (jnp.sum(embeds, axis=1, keepdims=True) - embeds) / (u - 1)
        centroids_excl = _safe_l2_normalize(centroids_excl, axis=2)

        # off-diagonal: embed[s,u] . centroid_incl[j];  diagonal: . centroid_excl[s,u]
        sim_incl = jnp.einsum("sue,je->suj", embeds, centroids_incl[:, 0, :],
                              preferred_element_type=jnp.float32)
        sim_excl = jnp.einsum("sue,sue->su", embeds, centroids_excl,
                              preferred_element_type=jnp.float32)
        eye = jnp.eye(s, dtype=bool)[:, None, :]  # (S,1,S)
        sim = jnp.where(eye, sim_excl[:, :, None], sim_incl)
        return sim * self.similarity_weight + self.similarity_bias

    def loss(self, embeds: jax.Array) -> tuple[jax.Array, jax.Array]:
        """GE2E softmax loss (encoder/model.py:107-123).  Returns
        (scalar loss, (S*U, S) similarity matrix for host-side EER)."""
        s, u, _ = embeds.shape
        sim = self.similarity_matrix(embeds).reshape(s * u, s)
        target = jnp.repeat(jnp.arange(s), u)
        logprobs = jax.nn.log_softmax(sim, axis=-1)
        loss = -jnp.mean(jnp.take_along_axis(logprobs, target[:, None], axis=1))
        return loss, sim
