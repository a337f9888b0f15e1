"""Self-golden DSP regression gate.

tests/fixtures/dsp_selfgolden.npz freezes this repo's OWN outputs (mel
chain + WORLD analysis) on a fixed synthetic utterance.  Unlike the
behavior/property tests, this catches refactors that silently SHIFT the
numerics while keeping every qualitative property intact — exactly the
failure mode of the CheapTrick-lifter sign bug fixed in round 2.

When a numeric change is INTENTIONAL (an algorithm fix), regenerate with
`python tools/gen_selfgolden.py` and say why in the commit message.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures",
                   "dsp_selfgolden.npz")

pytestmark = pytest.mark.skipif(not os.path.exists(FIX),
                                reason="self-golden fixture missing")


@pytest.fixture(scope="module")
def golden():
    return dict(np.load(FIX))


class TestSelfGolden:
    def test_mel_chain(self, golden):
        from dvc_tpu.config import AudioConfig
        from dvc_tpu.ops.mel import melspectrogram
        mel = np.asarray(melspectrogram(jnp.asarray(golden["wav"]),
                                        AudioConfig()))
        np.testing.assert_allclose(mel, golden["mel"], rtol=2e-4, atol=2e-5)

    def test_world_chain(self, golden):
        from dvc_tpu.ops.world import world_encode_data
        f0, _, sp, ap, mc = world_encode_data(golden["wav"], 16000)
        np.testing.assert_allclose(np.asarray(f0, np.float32), golden["f0"],
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(sp, np.float32)[:, :64],
                                   golden["sp"], rtol=2e-3, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ap, np.float32)[:, ::8],
                                   golden["ap"], rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(mc, np.float32), golden["mc"],
                                   rtol=2e-3, atol=2e-4)
