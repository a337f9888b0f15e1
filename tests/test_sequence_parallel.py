"""Frame-axis (sequence) parallelism tests on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvc_tpu.config import MeshConfig
from dvc_tpu.parallel.mesh import make_mesh
from dvc_tpu.parallel.sequence import sequence_sharded_conv1d


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig())


class TestSequenceShardedConv:
    @pytest.mark.parametrize("k", [1, 3, 5])
    def test_matches_unsharded_same_conv(self, mesh, k):
        rng = np.random.RandomState(k)
        x = jnp.asarray(rng.rand(2, 64, 16), jnp.float32)   # T=64 over 8 devs
        kern = jnp.asarray(rng.rand(k, 16, 24) - 0.5, jnp.float32)
        bias = jnp.asarray(rng.rand(24), jnp.float32)

        got = sequence_sharded_conv1d(x, kern, bias, mesh)
        pad = (k - 1) // 2
        want = jax.lax.conv_general_dilated(
            x, kern, (1,), [(pad, pad)],
            dimension_numbers=("NHC", "HIO", "NHC")) + bias
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_long_sequence(self, mesh):
        """A 1024-frame sequence convolves identically when frame-sharded —
        the capability the reference's 64-frame chunking lacks."""
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(1, 1024, 8), jnp.float32)
        kern = jnp.asarray(rng.rand(5, 8, 8) - 0.5, jnp.float32)
        got = sequence_sharded_conv1d(x, kern, None, mesh)
        want = jax.lax.conv_general_dilated(
            x, kern, (1,), [(2, 2)], dimension_numbers=("NHC", "HIO", "NHC"))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_frame_sharded_encoder_stack(self, mesh):
        """The VAE encoder's conv stack under frame sharding == the eval-mode
        unsharded encoder conv stack."""
        import jax.numpy as jnp
        from dvc_tpu.config import VAEConfig
        from dvc_tpu.models.disentangled_vae import DisentangledVAE
        from dvc_tpu.parallel.sequence import frame_sharded_encode_conv_stack

        cfg = VAEConfig(frames=16, dim_neck=8, enc_channels=32, dim_pre=32,
                        dec_lstm2_hidden=32, postnet_channels=32)
        model = DisentangledVAE(cfg)
        rng = jax.random.PRNGKey(0)
        x0 = jnp.zeros((2, 80, 16))
        variables = model.init({"params": rng, "reparam": rng}, x0, x0,
                               train=True)
        enc = {"params": variables["params"]["encoder"],
               "batch_stats": variables["batch_stats"]["encoder"]}

        x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 80), jnp.float32)
        got = frame_sharded_encode_conv_stack(x, enc, mesh)

        # unsharded reference: conv+BN(running stats)+relu chain
        h = x
        for i in range(3):
            kern = enc["params"][f"conv{i}"]["conv"]["kernel"]
            bias = enc["params"][f"conv{i}"]["conv"]["bias"]
            h = jax.lax.conv_general_dilated(
                h, kern, (1,), [(2, 2)],
                dimension_numbers=("NHC", "HIO", "NHC")) + bias
            bn_p = enc["params"][f"bn{i}"]["bn"]
            bn_s = enc["batch_stats"][f"bn{i}"]["bn"]
            h = (h - bn_s["mean"]) / jnp.sqrt(bn_s["var"] + 1e-5) \
                * bn_p["scale"] + bn_p["bias"]
            h = jax.nn.relu(h)
        np.testing.assert_allclose(np.asarray(got), np.asarray(h),
                                   rtol=2e-4, atol=2e-5)

    def test_stacked_convs_compose(self, mesh):
        """Two sharded convs in sequence == two unsharded convs (halo
        correctness is load-bearing at the seams)."""
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.rand(2, 32, 8), jnp.float32)
        k1 = jnp.asarray(rng.rand(5, 8, 8) - 0.5, jnp.float32)
        k2 = jnp.asarray(rng.rand(3, 8, 8) - 0.5, jnp.float32)
        got = sequence_sharded_conv1d(
            sequence_sharded_conv1d(x, k1, None, mesh), k2, None, mesh)
        w = jax.lax.conv_general_dilated(
            x, k1, (1,), [(2, 2)], dimension_numbers=("NHC", "HIO", "NHC"))
        want = jax.lax.conv_general_dilated(
            w, k2, (1,), [(1, 1)], dimension_numbers=("NHC", "HIO", "NHC"))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


class TestSequenceShardedLSTM:
    """Frame-sharded LSTM (ring carry relay) is bit-equal to the serial
    lstm_direction in both directions."""

    def _params(self, in_dim=12, hidden=16, seed=0):
        rng = np.random.RandomState(seed)
        return (rng.randn(4 * hidden, in_dim).astype(np.float32) * 0.2,
                rng.randn(4 * hidden, hidden).astype(np.float32) * 0.2,
                rng.randn(4 * hidden).astype(np.float32) * 0.1,
                rng.randn(4 * hidden).astype(np.float32) * 0.1)

    @pytest.mark.parametrize("reverse", [False, True])
    def test_matches_serial(self, mesh, reverse):
        from dvc_tpu.models.layers import lstm_direction
        from dvc_tpu.parallel.sequence import sequence_sharded_lstm

        w_ih, w_hh, b_ih, b_hh = self._params()
        x = np.random.RandomState(1).randn(3, 32, 12).astype(np.float32)

        want, (h_want, c_want) = lstm_direction(
            jnp.asarray(x), jnp.asarray(w_ih), jnp.asarray(w_hh),
            jnp.asarray(b_ih), jnp.asarray(b_hh), reverse=reverse, unroll=1)
        got, (h_got, c_got) = sequence_sharded_lstm(
            jnp.asarray(x), jnp.asarray(w_ih), jnp.asarray(w_hh),
            jnp.asarray(b_ih), jnp.asarray(b_hh), mesh, reverse=reverse,
            unroll=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(h_got), np.asarray(h_want),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(c_got), np.asarray(c_want),
                                   rtol=1e-5, atol=1e-6)

    def test_bidirectional_composition(self, mesh):
        """fwd+rev sharded passes == the serial bidirectional concat."""
        from dvc_tpu.models.layers import lstm_direction
        from dvc_tpu.parallel.sequence import sequence_sharded_lstm

        x = np.random.RandomState(2).randn(2, 16, 12).astype(np.float32)
        outs_serial, outs_sharded = [], []
        for rev, seed in ((False, 3), (True, 4)):
            w_ih, w_hh, b_ih, b_hh = self._params(seed=seed)
            args = (jnp.asarray(x), jnp.asarray(w_ih), jnp.asarray(w_hh),
                    jnp.asarray(b_ih), jnp.asarray(b_hh))
            outs_serial.append(lstm_direction(*args, reverse=rev, unroll=1)[0])
            outs_sharded.append(sequence_sharded_lstm(
                *args, mesh, reverse=rev, unroll=1)[0])
        want = jnp.concatenate(outs_serial, -1)
        got = jnp.concatenate(outs_sharded, -1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_output_stays_frame_sharded(self, mesh):
        from dvc_tpu.parallel.sequence import sequence_sharded_lstm
        from jax.sharding import PartitionSpec as P

        w_ih, w_hh, b_ih, b_hh = self._params()
        x = jnp.asarray(np.random.RandomState(5).randn(2, 32, 12), jnp.float32)
        got, _ = sequence_sharded_lstm(x, jnp.asarray(w_ih), jnp.asarray(w_hh),
                                       jnp.asarray(b_ih), jnp.asarray(b_hh),
                                       mesh)
        assert got.sharding.spec == P(None, "data", None)
