"""WaveNet vocoder tests: module shapes, MoL math, and — crucially — parity
between the teacher-forced forward and the ring-buffer AR sampler."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvc_tpu.config import VocoderConfig
from dvc_tpu.models.wavenet import (
    WaveNet,
    discretized_mix_logistic_loss,
    fast_generate,
    sample_from_mol,
)

TINY = VocoderConfig(layers=4, stacks=2, residual_channels=16, gate_channels=16,
                     skip_out_channels=8, cin_channels=4,
                     upsample_scales=(2, 2), out_channels=6)


@pytest.fixture(scope="module")
def tiny_wavenet():
    model = WaveNet(TINY)
    hop = 4  # prod(upsample_scales)
    c = jnp.ones((2, 3, TINY.cin_channels))
    x = jnp.zeros((2, 3 * hop, 1))
    variables = model.init(jax.random.PRNGKey(0), x, c)
    return model, variables


class TestWaveNetModule:
    def test_forward_shapes(self, tiny_wavenet):
        model, variables = tiny_wavenet
        c = jnp.ones((2, 3, TINY.cin_channels))
        x = jnp.zeros((2, 12, 1))
        y = model.apply(variables, x, c)
        assert y.shape == (2, 12, TINY.out_channels)

    def test_upsample_length(self, tiny_wavenet):
        model, variables = tiny_wavenet
        c = jnp.ones((2, 5, TINY.cin_channels))
        up = model.apply(variables, c, method="upsample")
        assert up.shape == (2, 20, TINY.cin_channels)

    def test_receptive_field(self):
        cfg = VocoderConfig()  # 24 layers, 4 stacks, k=3
        # sum of dilations 4*(1+2+4+8+16+32) = 252; rf = 252*2 + 1
        assert cfg.receptive_field == 505

    def test_causality(self, tiny_wavenet):
        """Output at t must not depend on inputs > t."""
        model, variables = tiny_wavenet
        c = jnp.zeros((1, 3, TINY.cin_channels))
        rng = np.random.RandomState(0)
        x1 = jnp.asarray(rng.rand(1, 12, 1), jnp.float32)
        x2 = x1.at[0, 8:, 0].set(9.0)  # change the future
        y1 = model.apply(variables, x1, c)
        y2 = model.apply(variables, x2, c)
        np.testing.assert_allclose(np.asarray(y1[0, :8]), np.asarray(y2[0, :8]),
                                   atol=1e-5)
        assert not np.allclose(np.asarray(y1[0, 9:]), np.asarray(y2[0, 9:]))


class TestMoL:
    def test_loss_finite_and_sane(self):
        rng = jax.random.PRNGKey(0)
        y_hat = jax.random.normal(rng, (2, 50, 30))
        y = jax.random.uniform(rng, (2, 50, 1), minval=-1, maxval=1)
        loss = discretized_mix_logistic_loss(y_hat, y)
        assert np.isfinite(float(loss))

    def test_loss_decreases_with_concentration(self):
        """A mixture concentrated at the target scores better than a flat one."""
        y = jnp.full((1, 10, 1), 0.3)
        good = jnp.concatenate([jnp.zeros((1, 10, 10)),
                                jnp.full((1, 10, 10), 0.3),
                                jnp.full((1, 10, 10), -7.0)], -1)
        bad = jnp.concatenate([jnp.zeros((1, 10, 10)),
                               jnp.zeros((1, 10, 10)),
                               jnp.zeros((1, 10, 10))], -1)
        assert float(discretized_mix_logistic_loss(good, y)) < \
            float(discretized_mix_logistic_loss(bad, y))

    def test_sample_concentrated(self):
        """Sampling from a near-deterministic MoL returns ~the mean."""
        y_hat = jnp.concatenate([
            jnp.array([[10.0] + [-10.0] * 9]),     # mixture 0 dominates
            jnp.full((1, 10), 0.25),               # means
            jnp.full((1, 10), -20.0)], -1)         # tiny scales
        x = sample_from_mol(y_hat, jax.random.PRNGKey(1))
        assert float(x[0]) == pytest.approx(0.25, abs=1e-3)

    def test_sample_in_range(self):
        y_hat = jax.random.normal(jax.random.PRNGKey(2), (100, 30))
        x = sample_from_mol(y_hat, jax.random.PRNGKey(3))
        assert float(x.min()) >= -1.0 and float(x.max()) <= 1.0


class TestFastGenerate:
    def test_shapes_and_range(self, tiny_wavenet):
        model, variables = tiny_wavenet
        c = jnp.asarray(np.random.RandomState(0).rand(2, 3, TINY.cin_channels),
                        jnp.float32)
        wav = fast_generate(variables, c, jax.random.PRNGKey(0), TINY)
        assert wav.shape == (2, 12)
        assert float(jnp.max(jnp.abs(wav))) <= 1.0

    def test_ar_matches_teacher_forced(self, tiny_wavenet):
        """The ring-buffer incremental step must produce the SAME logits as
        the teacher-forced conv forward when fed the same history.  We check
        it end-to-end: run fast_generate, then re-score the generated signal
        with the conv forward and regenerate with near-deterministic sampling
        — distributions must match step by step."""
        model, variables = tiny_wavenet
        cfg = TINY
        b, tf = 1, 4
        c = jnp.asarray(np.random.RandomState(1).rand(b, tf, cfg.cin_channels),
                        jnp.float32)

        # deterministic variant: force scales tiny so sampling == mean of the
        # argmax mixture; then AR output must satisfy x_t == mean(logits(x_<t))
        wav = fast_generate(variables, c, jax.random.PRNGKey(0), cfg)
        t = wav.shape[1]
        # teacher-forced re-scoring of the sampled sequence (shifted input)
        x_in = jnp.concatenate([jnp.zeros((b, 1)), wav[:, :-1]], axis=1)[..., None]
        y_hat = model.apply(variables, x_in, c)
        assert y_hat.shape == (b, t, cfg.out_channels)
        # consistency: sampling from y_hat with the same per-step rngs
        # reproduces the AR output exactly
        rngs = jax.random.split(jax.random.PRNGKey(0), t)
        resampled = jax.vmap(
            lambda yh, r: sample_from_mol(yh, r, cfg.log_scale_min),
            in_axes=(1, 0), out_axes=1)(y_hat, rngs)
        np.testing.assert_allclose(np.asarray(resampled), np.asarray(wav),
                                   rtol=1e-4, atol=1e-4)


class TestEMAWarmup:
    def test_short_run_ema_tracks_params(self):
        """With the num_updates warm-up schedule, a short run's EMA trail
        follows the trained params instead of retaining the init (at decay
        0.9999 a 1500-step run keeps 86% init weight — the round-4 flat
        holdout trajectory); without it, it must match the closed form."""
        from dvc_tpu.train.vocoder_trainer import (
            create_wavenet_state,
            make_wavenet_step,
        )

        hop = 4
        model, state0, opt = create_wavenet_state(
            jax.random.PRNGKey(0), TINY, lr=1e-2, max_time_steps=4 * hop)
        x = jnp.asarray(np.random.RandomState(0).rand(2, 4 * hop, 1) * 2 - 1,
                        jnp.float32)
        c = jnp.asarray(np.random.RandomState(1).rand(2, 4, TINY.cin_channels),
                        jnp.float32)
        rng = jax.random.PRNGKey(2)

        def leaf(tree):
            return np.asarray(
                tree["first_conv"]["kernel"]
                if "first_conv" in tree else
                jax.tree_util.tree_leaves(tree)[0])

        init_leaf = leaf(jax.tree_util.tree_map(np.asarray, state0.params))

        n = 30
        step_w = make_wavenet_step(model, opt, TINY, ema_warmup=True)
        s = state0  # donated by the first step — init_leaf snapshotted above
        for _ in range(n):
            s, _ = step_w(s, x, c, rng)
        # warm-up decay at t<=30 is <= 31/40: the trail is mostly params
        gap_w = np.abs(leaf(s.ema_params) - leaf(s.params)).max()
        drift = np.abs(leaf(s.params) - init_leaf).max()
        assert gap_w < 0.5 * drift, (gap_w, drift)

        model2, s2, opt2 = create_wavenet_state(
            jax.random.PRNGKey(0), TINY, lr=1e-2, max_time_steps=4 * hop)
        step_f = make_wavenet_step(model2, opt2, TINY, ema_warmup=False)
        for _ in range(n):
            s2, _ = step_f(s2, x, c, rng)
        # fixed 0.9999 decay keeps ~0.997 of the INIT after 30 steps
        gap_f = np.abs(leaf(s2.ema_params) - init_leaf).max()
        assert gap_f < 0.01 * drift, (gap_f, drift)
