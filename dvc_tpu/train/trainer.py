"""Jitted training runtime for the disentangled VAE.

Replaces the eager per-batch loop of reference
model/variational_base_vae.py:58-101 (host->device copy, forward, loss,
backward, Adam step — all separate CUDA launches) with ONE compiled XLA
program per step: forward(pair) + loss + grad + Adam fused, parameters
donated, batch sharded over the mesh's data axis so gradients all-reduce on
ICI automatically.

Epoch/checkpoint semantics mirror run_training
(model/variational_base_vae.py:156-203): epoch-indexed loop, per-epoch
re-pairing of utterances, TensorBoard scalars with the same names, a
checkpoint every report_interval epochs named `DisentangledVAE_VCTK_{epoch}`
discovered latest-wins by parsing the epoch from the filename (:127-149).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from dvc_tpu.config import Config
from dvc_tpu.models.disentangled_vae import DisentangledVAE
from dvc_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    replicated,
    shard_batch,
    train_state_shardings,
)
from dvc_tpu.train.losses import LossTerms, gvae_pair_loss
from dvc_tpu.train import checkpoint as ckpt_lib


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(rng: jax.Array, cfg: Config,
                       optimizer: optax.GradientTransformation | None = None
                       ) -> tuple[DisentangledVAE, TrainState, optax.GradientTransformation]:
    model = DisentangledVAE(cfg.vae, pair_fused=cfg.vae.pair_fused)
    dummy = jnp.zeros((2, cfg.vae.num_mels, cfg.vae.frames), jnp.float32)
    variables = model.init({"params": rng, "reparam": rng}, dummy, dummy, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    if optimizer is None:
        # torch.optim.Adam defaults (model/disentangled_vae.py:304)
        optimizer = optax.adam(cfg.train.learning_rate, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = optimizer.init(params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=batch_stats, opt_state=opt_state)
    return model, state, optimizer


def make_train_step(model: DisentangledVAE, optimizer: optax.GradientTransformation,
                    mse_cof: float = 10.0, kl_cof: float = 10.0,
                    compute_dtype: str = "float32",
                    donate: bool = True, jit: bool = True,
                    remat: bool = False) -> Callable:
    """Build the (state, x1, x2, rng) -> (state, LossTerms) step.

    jit=False returns the raw traceable function (for callers that jit with
    explicit in_shardings/out_shardings over a mesh).  remat=True wraps the
    pair forward in jax.checkpoint — activations are recomputed in the
    backward pass instead of stored, trading ~1 extra forward of FLOPs for
    the activation memory (useful for very large batches; gradients are
    bitwise unchanged)."""

    cast = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

    def forward(params, batch_stats, x1, x2, rng):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            x1.astype(cast), x2.astype(cast), train=True,
            rngs={"reparam": rng}, mutable=["batch_stats"])

    if remat:
        forward = jax.checkpoint(forward)

    def loss_fn(params, batch_stats, x1, x2, rng):
        outs, mutated = forward(params, batch_stats, x1, x2, rng)
        (rx1, rx2, rx1h, rx2h, q1m, q1l, q2m, q2l, smu, slv) = [
            o.astype(jnp.float32) for o in outs]
        terms = gvae_pair_loss(x1, x2, rx1, rx2, rx1h, rx2h,
                               q1m, q1l, q2m, q2l, smu, slv,
                               mse_cof=mse_cof, kl_cof=kl_cof)
        return terms.total, (terms, mutated["batch_stats"])

    def train_step(state: TrainState, x1, x2, rng):
        rng = jax.random.fold_in(rng, state.step)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (terms, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, x1, x2, rng)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=new_params,
                          batch_stats=new_bs, opt_state=new_opt), terms

    if not jit:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model: DisentangledVAE, mse_cof: float = 10.0,
                   kl_cof: float = 10.0) -> Callable:
    """Eval-mode step: running BN stats, no reparam noise (reference test()
    path, model/variational_base_vae.py:105-123)."""

    def eval_step(state: TrainState, x1, x2):
        # the style latent is sampled even in eval (reference quirk,
        # model/disentangled_vae.py:261) — a fixed key keeps eval deterministic
        outs = model.apply({"params": state.params, "batch_stats": state.batch_stats},
                           x1, x2, train=False,
                           rngs={"reparam": jax.random.PRNGKey(0)})
        (rx1, rx2, rx1h, rx2h, q1m, q1l, q2m, q2l, smu, slv) = outs
        return gvae_pair_loss(x1, x2, rx1, rx2, rx1h, rx2h,
                              q1m, q1l, q2m, q2l, smu, slv,
                              mse_cof=mse_cof, kl_cof=kl_cof)

    return jax.jit(eval_step)


@dataclass
class Trainer:
    """Host-side training driver (mirrors run_training,
    model/variational_base_vae.py:156-203)."""

    cfg: Config
    checkpoints_path: str = ""
    logs_path: str = ""
    estimation_dir: str = ""
    run_name: str = "DisentangledVAE_VCTK"
    use_mesh: bool = True

    def __post_init__(self):
        if self.use_mesh:
            # the data axis must divide the batch; use the largest divisor of
            # batch_size that fits the available devices (e.g. batch 2 on an
            # 8-device mesh -> dp=2) so small-batch runs work everywhere
            import dataclasses as _dc
            import jax as _jax
            mesh_cfg = self.cfg.mesh
            n = len(_jax.devices())
            dp = mesh_cfg.data_parallel if mesh_cfg.data_parallel > 0 else \
                n // max(1, mesh_cfg.model_parallel)
            b = self.cfg.train.batch_size
            while dp > 1 and b % dp != 0:
                dp -= 1
            mesh_cfg = _dc.replace(mesh_cfg, data_parallel=dp)
            self.mesh = make_mesh(mesh_cfg)
        else:
            self.mesh = None
        rng = jax.random.PRNGKey(self.cfg.train.seed)
        self.model, self.state, self.optimizer = create_train_state(rng, self.cfg)
        # adversarial content regularization (additive, train/adversarial.py):
        # LossConfig.adv_cof > 0 swaps the step for the DANN variant.  The
        # adversary's state lives beside (not inside) the VAE TrainState so
        # checkpoints stay reference-interchangeable; it is not checkpointed
        # (re-warms within a few epochs after a resume).
        self._adv_model = self._adv_state = self._adv_opt = None
        if self.cfg.loss.adv_cof > 0:
            if self.cfg.loss.adv_speakers <= 0:
                raise ValueError("LossConfig.adv_cof > 0 requires "
                                 "adv_speakers (the corpus speaker count)")
            from dvc_tpu.train.adversarial import create_adv_state
            self._adv_model, self._adv_state, self._adv_opt = \
                create_adv_state(jax.random.PRNGKey(self.cfg.train.seed + 2),
                                 self.cfg.vae.content_size,
                                 self.cfg.loss.adv_speakers,
                                 learning_rate=self.cfg.loss.adv_lr)
        if self.mesh is not None:
            # explicit in/out shardings: tensor-parallel params over 'model'
            # (replicated when model_parallel=1, the designed default for
            # this ~50M-param model), ZeRO opt state over 'data' when
            # MeshConfig.shard_opt_state, batch over 'data'
            self._state_shardings = train_state_shardings(
                self.state, self.mesh, self.cfg.mesh.shard_opt_state)
            batch_sh = data_sharding(self.mesh, ndim=3)
            rep = replicated(self.mesh)
            donate_state = self.cfg.train.donate_state
            if self._adv_model is not None:
                from dvc_tpu.train.adversarial import make_adv_train_step
                raw_step = make_adv_train_step(
                    self.model, self.optimizer, self._adv_model,
                    self._adv_opt,
                    mse_cof=self.cfg.loss.mse_cof,
                    kl_cof=self.cfg.loss.kl_cof,
                    adv_cof=self.cfg.loss.adv_cof,
                    mode=self.cfg.loss.adv_mode,
                    compute_dtype=self.cfg.train.compute_dtype,
                    jit=False, remat=self.cfg.train.remat)
                spk_sh = data_sharding(self.mesh, ndim=1)
                self.train_step = jax.jit(
                    raw_step,
                    in_shardings=(self._state_shardings, rep,
                                  batch_sh, batch_sh, spk_sh, rep),
                    out_shardings=(self._state_shardings, rep, rep, rep),
                    donate_argnums=(0, 1) if donate_state else ())
                self._adv_state = jax.device_put(self._adv_state, rep)
            else:
                raw_step = make_train_step(
                    self.model, self.optimizer,
                    mse_cof=self.cfg.loss.mse_cof,
                    kl_cof=self.cfg.loss.kl_cof,
                    compute_dtype=self.cfg.train.compute_dtype,
                    jit=False, remat=self.cfg.train.remat)
                self.train_step = jax.jit(
                    raw_step,
                    in_shardings=(self._state_shardings, batch_sh, batch_sh,
                                  rep),
                    out_shardings=(self._state_shardings, rep),
                    donate_argnums=(0,) if donate_state else ())
            self.state = jax.device_put(self.state, self._state_shardings)
        else:
            self._state_shardings = None
            if self._adv_model is not None:
                from dvc_tpu.train.adversarial import make_adv_train_step
                self.train_step = make_adv_train_step(
                    self.model, self.optimizer, self._adv_model,
                    self._adv_opt,
                    mse_cof=self.cfg.loss.mse_cof,
                    kl_cof=self.cfg.loss.kl_cof,
                    adv_cof=self.cfg.loss.adv_cof,
                    mode=self.cfg.loss.adv_mode,
                    compute_dtype=self.cfg.train.compute_dtype,
                    donate=self.cfg.train.donate_state,
                    remat=self.cfg.train.remat)
            else:
                self.train_step = make_train_step(
                    self.model, self.optimizer,
                    mse_cof=self.cfg.loss.mse_cof, kl_cof=self.cfg.loss.kl_cof,
                    compute_dtype=self.cfg.train.compute_dtype,
                    donate=self.cfg.train.donate_state,
                    remat=self.cfg.train.remat)
        self._rng = jax.random.PRNGKey(self.cfg.train.seed + 1)
        self._writer = None
        self._eval_step = None

    # -- checkpointing (latest-wins by epoch parsed from the filename) ------

    def load_last(self, require: bool = False) -> int:
        """Resume from the newest checkpoint; returns the next epoch (1 when
        none found).  require=True raises instead — for consumers like
        `convert` where silently proceeding with random weights would write
        garbage output."""
        if not self.checkpoints_path:
            if require:
                raise FileNotFoundError("no checkpoints_path configured")
            return 1
        loaded = ckpt_lib.load_last_checkpoint(self.checkpoints_path, self.state,
                                               shardings=self._state_shardings)
        if loaded is None:
            if require:
                raise FileNotFoundError(
                    f"no checkpoint found under {self.checkpoints_path!r} — "
                    "train first, or check --log_dir")
            return 1
        epoch, self.state = loaded
        if self._state_shardings is not None:
            # restore the explicit placement (ZeRO shards, TP shards); a
            # no-op for orbax restores, which already placed every shard
            self.state = jax.device_put(self.state, self._state_shardings)
        else:
            # meshless path: pin the host numpy tree on device once, or
            # every consumer call re-uploads it
            self.state = jax.device_put(self.state)
        return epoch + 1

    def save(self, epoch: int) -> str:
        return ckpt_lib.save_checkpoint(self.checkpoints_path, self.run_name,
                                        epoch, self.state,
                                        fmt=self.cfg.train.checkpoint_format)

    # -- epoch loops ---------------------------------------------------------

    def _effective_batch_size(self, dataset, logging_func=print) -> int:
        """Static-shape batch sizing.  Partial batches are dropped (one
        compiled shape — a deliberate TPU-first deviation from the
        reference DataLoader's drop_last=False), so a dataset SMALLER than
        the configured batch would silently train zero batches per epoch;
        clamp to the pair count (kept divisible by the data-mesh axis) so
        tiny corpora still train, and fail loudly when nothing can."""
        bs = self.cfg.train.batch_size
        n_pairs = len(dataset)
        if n_pairs >= bs:
            return bs
        dp = self.mesh.shape[self.mesh.axis_names[0]] \
            if self.mesh is not None else 1
        eff = (n_pairs // dp) * dp
        if eff <= 0:
            raise ValueError(
                f"dataset yields only {n_pairs} same-speaker pairs — fewer "
                f"than the {dp}-way data-parallel mesh needs; reduce "
                "devices or add data")
        if not getattr(self, "_clamp_logged", False):
            logging_func(f"batch_size {bs} > {n_pairs} available pairs; "
                         f"training with batch {eff}")
            self._clamp_logged = True
        return eff

    def train_epoch(self, dataset, epoch: int) -> dict[str, float]:
        """One pass over the paired dataset; returns summed loss terms."""
        from dvc_tpu.data.dataset import prefetch

        totals = np.zeros(8, np.float64)
        adv_totals = np.zeros(2, np.float64)
        n_batches = 0
        for x1, x2, spk in prefetch(
                dataset.batches(self._effective_batch_size(dataset))):
            if self._adv_model is not None:
                if self.mesh is not None:
                    x1, x2, spk = shard_batch((x1, x2, spk), self.mesh)
                self.state, self._adv_state, terms, adv_m = self.train_step(
                    self.state, self._adv_state, x1, x2, spk, self._rng)
                adv_totals += [float(adv_m["adv_ce"]),
                               float(adv_m["adv_acc"])]
            else:
                if self.mesh is not None:
                    x1, x2 = shard_batch((x1, x2), self.mesh)
                self.state, terms = self.train_step(self.state, x1, x2,
                                                    self._rng)
            totals += np.asarray(jax.device_get(terms), np.float64)
            n_batches += 1
        dataset.shuffle_data()  # re-pair utterances (reference :96)
        keys = LossTerms._fields
        out = {k: float(v) for k, v in zip(keys, totals)}
        if self._adv_model is not None:
            out["adv_ce"], out["adv_acc"] = adv_totals
        out["n_batches"] = n_batches
        return out

    def run_training(self, dataset, epochs: int, report_interval: int | None = None,
                     reload_model: bool = True, logging_func=print):
        report_interval = report_interval or self.cfg.train.report_interval
        start_epoch = self.load_last() if reload_model else 1
        writer = self._get_writer()
        # surface the tiny-corpus clamp notice through the caller's sink
        self._effective_batch_size(dataset, logging_func=logging_func)
        # `epochs` counts ADDITIONAL epochs from the resume point — the
        # reference's exact semantics (variational_base_vae.py:175 loops
        # range(start_epoch, start_epoch + epochs)), not a total cap
        for epoch in range(start_epoch, start_epoch + epochs):
            t0 = time.time()
            totals = self.train_epoch(dataset, epoch)
            n = max(totals.pop("n_batches"), 1)
            logging_func(
                f"====> Epoch: {epoch} loss {totals['total'] / n:.4f} "
                f"({time.time() - t0:.2f}s)")
            if writer is not None:
                # same scalar names as reference :187-191
                writer.add_scalar("Loss\\Reconstruction Loss1", totals["mse_x1"] / n, epoch)
                writer.add_scalar("Loss\\Reconstruction Loss2", totals["mse_x2"] / n, epoch)
                writer.add_scalar("Loss\\Z1 KL Loss", totals["z1_kl"] / n, epoch)
                writer.add_scalar("Loss\\Z2 KL Loss", totals["z2_kl"] / n, epoch)
                writer.add_scalar("Loss\\Z KL Style", totals["z_style_kl"] / n, epoch)
                if "adv_ce" in totals:  # adversarial content regularizer
                    writer.add_scalar("Loss\\Adversary CE", totals["adv_ce"] / n, epoch)
                    writer.add_scalar("Loss\\Adversary Acc", totals["adv_acc"] / n, epoch)
            if self.checkpoints_path and epoch % report_interval == 0:
                self.save(epoch)
                # reference also dumps reconstruction pngs each interval
                # (variational_base_vae.py:199-202)
                if self.estimation_dir:
                    try:
                        self.estimate_trained_model(dataset, self.estimation_dir,
                                                    logging_func=logging_func)
                    except Exception as e:  # plotting is best-effort
                        logging_func(
                            f"estimation dump failed: {type(e).__name__}: {e}")
        return self.state

    def evaluate(self, dataset, logging_func=print) -> dict[str, float]:
        """Eval-mode pass (reference test(), variational_base_vae.py:105-123):
        running BN stats, no sampling noise, mean loss terms."""
        if self._eval_step is None:  # build once — jit caches by closure id
            self._eval_step = make_eval_step(self.model, self.cfg.loss.mse_cof,
                                             self.cfg.loss.kl_cof)
        eval_step = self._eval_step
        totals = np.zeros(8, np.float64)
        n = 0
        for x1, x2, _spk in dataset.batches(
                self._effective_batch_size(dataset), shuffle=False):
            terms = eval_step(self.state, jnp.asarray(x1), jnp.asarray(x2))
            totals += np.asarray(jax.device_get(terms), np.float64)
            n += 1
        out = {k: float(v / max(n, 1))
               for k, v in zip(LossTerms._fields, totals)}
        logging_func(f"====> Test recons loss: {out['mse_x1']:.4f} - "
                     f"VLB: {out['total']:.4f}")
        return out

    def estimate_trained_model(self, dataset, estimation_dir: str,
                               n_images: int = 5,
                               logging_func=print) -> int:
        """Reload the latest checkpoint, reconstruct one batch in eval mode,
        and dump original/reconstructed mel pngs (parity with reference
        estimate_trained_model, model/variational_base_vae.py:205-239)."""
        import os
        epoch = self.load_last() - 1
        os.makedirs(estimation_dir, exist_ok=True)
        bs = self._effective_batch_size(dataset)
        x1, x2, _ = next(iter(dataset.batches(bs, shuffle=False)))
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        outs = self.model.apply(variables, jnp.asarray(x1), jnp.asarray(x2),
                                train=False,
                                rngs={"reparam": jax.random.PRNGKey(0)})
        # reference takes the POST-postnet reconstructions for the pngs
        # (variational_base_vae.py:218: `_,_,recons_x1, recons_x2, ...`)
        recons_x1 = np.asarray(outs[2])
        from dvc_tpu.utils.plotting import save_mel_png
        failures = 0
        for i in range(min(n_images, len(x1))):
            # one bad png (matplotlib backend, disk) must not abort the rest;
            # report the count once instead of silently swallowing
            try:
                save_mel_png(recons_x1[i],
                             os.path.join(estimation_dir,
                                          f"{epoch}_recons_mel_{i}.png"),
                             "reconstructed mel spectrogram")
                save_mel_png(x1[i],
                             os.path.join(estimation_dir,
                                          f"{epoch}_original_mel_{i}.png"),
                             "original mel spectrogram")
            except Exception as e:
                failures += 1
                if failures == 1:
                    logging_func(f"estimation png dump failed: "
                                 f"{type(e).__name__}: {e}")
        if failures > 1:
            logging_func(f"estimation png dump: {failures} images failed")
        return epoch

    def _get_writer(self):
        if self._writer is None and self.logs_path:
            try:
                from tensorboardX import SummaryWriter
                self._writer = SummaryWriter(f"{self.logs_path}/{self.run_name}")
            except Exception:
                self._writer = None
        return self._writer
