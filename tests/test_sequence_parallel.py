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
