"""GE2E speaker-encoder training.

Parity with reference preprocessing/encoder/train.py:18-133: step-based loop
over (64 speakers x 10 utterances) batches; Adam(1e-4); the reference's
`do_gradient_ops` (encoder/model.py:33-39) — similarity weight/bias gradients
scaled by 0.01, then global-norm clipping at 3 — is reproduced as an optax
chain inside ONE jitted step.  Resume loads `{step, model_state,
optimizer_state}`; periodic save with immutable backups
(encoder/train.py:105-131).  EER is computed host-side from the returned
similarity matrix (eval/eer.py), never backpropagated.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization, struct

from dvc_tpu.config import SpeakerEncoderConfig
from dvc_tpu.eval.eer import ge2e_eer
from dvc_tpu.models.speaker_encoder import SpeakerEncoder


class GE2EState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any


def _scale_similarity_grads(scale: float = 0.01) -> optax.GradientTransformation:
    """Reference encoder/model.py:33-36: similarity params' grads x 0.01."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        def scale_leaf(path, g):
            name = "/".join(str(p.key) if hasattr(p, "key") else str(p)
                            for p in path)
            if "similarity_weight" in name or "similarity_bias" in name:
                return g * scale
            return g

        return jax.tree_util.tree_map_with_path(scale_leaf, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_ge2e_optimizer(lr: float = 1e-4) -> optax.GradientTransformation:
    return optax.chain(
        _scale_similarity_grads(0.01),
        optax.clip_by_global_norm(3.0),   # encoder/model.py:39
        optax.adam(lr),
    )


def create_ge2e_state(rng: jax.Array, cfg: SpeakerEncoderConfig
                      ) -> tuple[SpeakerEncoder, GE2EState, optax.GradientTransformation]:
    model = SpeakerEncoder(cfg)
    dummy = jnp.zeros((2, cfg.partials_n_frames, cfg.mel_n_channels))
    params = model.init(rng, dummy)["params"]
    optimizer = make_ge2e_optimizer(cfg.learning_rate)
    return model, GE2EState(step=jnp.zeros((), jnp.int32), params=params,
                            opt_state=optimizer.init(params)), optimizer


def make_ge2e_step(model: SpeakerEncoder, optimizer: optax.GradientTransformation,
                   cfg: SpeakerEncoderConfig, with_sim: bool = True,
                   mesh=None) -> Callable:
    """with_sim=False omits the similarity matrix from the outputs: a fresh
    unconsumed (S*U, S) device buffer per step measured 726 vs 34 ms/step on
    the remote-TPU runtime (buffers piling up between fetches stall the
    dispatch stream), so the training loop uses the light step on non-logging
    steps and this full step only where the EER is actually computed.

    With a `mesh`, the SPEAKER axis of the (S, U, T, M) batch is sharded
    over the mesh's first axis and the state replicated: the LSTM-heavy
    embedding forward/backward runs data-parallel, and GSPMD inserts one
    small all-gather of the (S, U, E) embeddings (~640 KB at the reference
    geometry) where the GE2E loss needs every speaker's centroids, plus the
    gradient all-reduce — both on ICI."""
    s, u = cfg.speakers_per_batch, cfg.utterances_per_speaker

    def loss_fn(params, batch):
        flat = batch.reshape(-1, batch.shape[-2], batch.shape[-1])
        embeds = model.apply({"params": params}, flat)
        embeds = embeds.reshape(batch.shape[0], batch.shape[1], -1)
        loss, sim = model.apply({"params": params}, embeds, method="loss")
        return loss, sim

    def step(state: GE2EState, batch: jax.Array):
        (loss, sim), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = GE2EState(step=state.step + 1, params=new_params,
                              opt_state=new_opt)
        if with_sim:
            return new_state, loss, sim
        return new_state, loss

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    from jax.sharding import NamedSharding, PartitionSpec as P
    rep = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(mesh.axis_names[0]))
    return jax.jit(step, donate_argnums=(0,),
                   in_shardings=(rep, batch_sh), out_shardings=rep)


def ge2e_batch_sharding(mesh):
    """NamedSharding placing the speaker axis of a (S, U, T, M) batch over
    the mesh's first axis (for device_put ahead of the sharded step)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    return NamedSharding(mesh, P(mesh.axis_names[0]))


@dataclass
class SpeakerEncoderTrainer:
    cfg: SpeakerEncoderConfig
    run_id: str = "ge2e"
    models_dir: str = ""
    # data-parallel over all visible devices when the speaker axis divides
    # (adaptive, like train.Trainer): single-device behavior is unchanged
    use_mesh: bool = True

    def __post_init__(self):
        self.model, self.state, self.optimizer = create_ge2e_state(
            jax.random.PRNGKey(0), self.cfg)
        self.mesh = None
        if self.use_mesh and len(jax.devices()) > 1 \
                and self.cfg.speakers_per_batch % len(jax.devices()) == 0:
            from dvc_tpu.config import MeshConfig
            from dvc_tpu.parallel.mesh import make_mesh
            self.mesh = make_mesh(MeshConfig(
                data_parallel=len(jax.devices()), model_parallel=1))
        self.step_fn = make_ge2e_step(self.model, self.optimizer, self.cfg,
                                      mesh=self.mesh)
        self.step_fn_light = make_ge2e_step(self.model, self.optimizer,
                                            self.cfg, with_sim=False,
                                            mesh=self.mesh)
        self._embed_jit = None  # lazily-built jitted forward for projections

    # -- persistence ({step, model_state, optimizer_state}, train.py:47-54) --

    @property
    def _state_path(self) -> str:
        return os.path.join(self.models_dir, f"{self.run_id}.msgpack")

    def save(self, backup: bool = False) -> None:
        os.makedirs(self.models_dir, exist_ok=True)
        data = serialization.to_bytes(self.state)
        with open(self._state_path, "wb") as f:
            f.write(data)
        if backup:
            step = int(self.state.step)
            with open(os.path.join(
                    self.models_dir, f"{self.run_id}_bak_{step:06d}.msgpack"),
                    "wb") as f:
                f.write(data)

    def resume(self) -> bool:
        if not os.path.exists(self._state_path):
            return False
        with open(self._state_path, "rb") as f:
            self.state = serialization.from_bytes(self.state, f.read())
        # pin on device: from_bytes yields host numpy arrays, which the
        # donated step (and any per-call jit consumer) would otherwise
        # re-upload every invocation
        self.state = jax.device_put(self.state)
        return True

    # -- loop ---------------------------------------------------------------

    def train(self, sampler, n_steps: int, save_every: int = 500,
              backup_every: int = 3000, log_every: int = 10,
              vis=None, projection_every: int = 0,
              logging_func=print) -> list[dict]:
        """`vis` (utils.visualizations.Visualizations) streams loss/EER/
        step-time curves and, every `projection_every` steps, an embedding-
        projection png — the reference's visdom + periodic UMAP loop
        (encoder/train.py:102-111)."""
        from dvc_tpu.data.dataset import prefetch as _prefetch

        history = []
        t_last = time.time()
        # background thread assembles batches AND issues the (async)
        # host->device transfer one step ahead, so the 64x10x63x80 upload
        # overlaps the previous step's compute (the role of the reference's
        # DataLoader workers, encoder/train.py:27)
        batch_sharding = ge2e_batch_sharding(self.mesh) \
            if self.mesh is not None else None

        def _device_batches():
            for b in sampler:
                yield jax.device_put(jnp.asarray(b), batch_sharding)

        it = _prefetch(iter(_device_batches()), depth=2)
        # host-side step mirror: int(self.state.step) per iteration would
        # fetch a donated device scalar every step (a full link round trip)
        step = int(self.state.step)
        for i in range(n_steps):
            batch = next(it)
            # the sim matrix is only consumed on logging steps; the light
            # step avoids per-step unconsumed device buffers (see
            # make_ge2e_step) — 834 -> ~38 ms/step measured on v5e
            log_this = (step + 1) % log_every == 0
            if log_this:
                self.state, loss, sim = self.step_fn(self.state, batch)
            else:
                self.state, loss = self.step_fn_light(self.state, batch)
            step += 1
            if log_this:
                loss_f = float(loss)
                eer = ge2e_eer(np.asarray(sim), batch.shape[0], batch.shape[1])
                dt = (time.time() - t_last) / log_every
                t_last = time.time()
                history.append({"step": step, "loss": loss_f, "eer": eer,
                                "step_time_s": dt})
                logging_func(f"step {step}: loss {loss_f:.4f} EER {eer:.4f} "
                             f"({dt * 1000:.0f} ms/step)")
                if vis is not None:
                    vis.update(loss_f, eer, dt, step)
            if vis is not None and projection_every \
                    and step % projection_every == 0:
                if self._embed_jit is None:
                    # cached jit: an eager apply here would dispatch the
                    # 3-layer LSTM over (S*U, T, M) op-by-op every
                    # projection, stalling the loop for seconds
                    self._embed_jit = jax.jit(
                        lambda p, x: self.model.apply({"params": p}, x))
                flat = jnp.asarray(batch).reshape(-1, batch.shape[-2],
                                                  batch.shape[-1])
                embeds = np.asarray(
                    self._embed_jit(self.state.params, flat))
                vis.draw_projections(embeds, batch.shape[1], step)
            if self.models_dir and save_every and step % save_every == 0:
                self.save()
            if self.models_dir and backup_every and step % backup_every == 0:
                self.save(backup=True)
        if vis is not None:
            vis.save()
        return history
