"""Native DIO (native/dvc_world.cpp:dvc_dio) — the method behind
pyworld.dio, the reference's pitch extractor for the AutoVC F0 variant
(/root/reference/preprocessing/utils.py:183-192).

Three gate layers, mirroring the Harvest treatment (VERDICT r3 item 7):
  * truth gates on synthetic tones (sub-percent F0 error, noise unvoiced);
  * cross-estimator consistency: native DIO vs native Harvest and vs the
    device NCCF tracker (ops/world.estimate_f0 — the jittable stand-in
    estimate_pitch uses on the accelerator);
  * pyworld.dio golden fixtures (tests/fixtures/dio_golden.npz from
    tools/gen_dio_golden.py) — skip-gated until the zero-egress
    environment allows generating them.
"""

import os

import numpy as np
import pytest

from dvc_tpu.native import world as native_world

FS = 16_000

pytestmark = pytest.mark.skipif(not native_world.available(),
                                reason="native WORLD engine not built")

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "dio_golden.npz")


def _harm(n, f0_fn, amps=(0.6, 0.25, 0.1), noise=0.01, seed=0):
    r = np.random.RandomState(seed)
    t = np.arange(n) / FS
    f = f0_fn(t)
    ph = 2 * np.pi * np.cumsum(f) / FS
    x = sum(a * np.sin((i + 1) * ph + i) for i, a in enumerate(amps))
    return (x + noise * r.randn(n)).astype(np.float32), f


class TestDioTruth:
    def test_vibrato_tone(self):
        x, _ = _harm(8000, lambda t: 180.0
                     * (1 + 0.04 * np.sin(2 * np.pi * 3 * t)))
        f0, ta = native_world.dio(x, FS)
        v = f0 > 0
        assert v.mean() > 0.85
        truth = 180.0 * (1 + 0.04 * np.sin(2 * np.pi * 3 * ta))
        rel = np.abs(f0[v] - truth[v]) / truth[v]
        assert np.median(rel) < 0.005

    def test_low_and_high_pitch(self):
        for f0c, amps, seed in ((85.0, (0.6, 0.25, 0.1), 1),
                                (500.0, (0.7, 0.2), 3)):
            x, _ = _harm(8000, lambda t: f0c + 0 * t, amps=amps, seed=seed)
            f0, _ = native_world.dio(x, FS)
            v = f0 > 0
            assert v.mean() > 0.7, f0c
            assert np.median(np.abs(f0[v] - f0c) / f0c) < 0.01, f0c

    def test_noise_unvoiced(self):
        noise = (0.3 * np.random.RandomState(7).randn(8000)
                 ).astype(np.float32)
        f0, _ = native_world.dio(noise, FS)
        assert (f0 > 0).mean() < 0.1

    def test_parameter_validation(self):
        with pytest.raises(RuntimeError):
            native_world.dio(np.zeros(8000, np.float32), FS,
                             f0_floor=800.0, f0_ceil=71.0)
        with pytest.raises(RuntimeError):
            native_world.dio(np.zeros(8000, np.float32), FS,
                             allowed_range=0.0)


class TestDioConsistency:
    def test_agrees_with_harvest(self):
        x, _ = _harm(8000, lambda t: 160.0
                     * (1 + 0.05 * np.sin(2 * np.pi * 2 * t)), seed=4)
        f0d, _ = native_world.dio(x, FS)
        f0h, _ = native_world.harvest(x, FS)
        vd, vh = f0d > 0, f0h > 0
        assert (vd == vh).mean() >= 0.9
        both = vd & vh
        assert both.sum() >= 50
        assert np.median(np.abs(f0d[both] - f0h[both]) / f0h[both]) < 0.01

    def test_device_nccf_tolerance_gate(self):
        """The jittable NCCF tracker (the accelerator path of
        estimate_pitch/get_batch_pitch) agrees with native DIO on voiced
        material — the tolerance gate VERDICT r3 item 7 asked for."""
        from dvc_tpu.ops.world import estimate_f0

        x, _ = _harm(8000, lambda t: 200.0
                     * (1 + 0.03 * np.sin(2 * np.pi * 2 * t)), seed=5)
        f0d, _ = native_world.dio(x, FS)
        f0n, _ = estimate_f0(x, FS)
        f0n = np.asarray(f0n)[:len(f0d)]
        vd, vn = f0d > 0, f0n > 0
        assert (vd == vn).mean() >= 0.85
        both = vd & vn
        assert both.sum() >= 50
        assert np.median(np.abs(f0n[both] - f0d[both]) / f0d[both]) < 0.02


@pytest.mark.skipif(not os.path.exists(FIX),
                    reason="pyworld golden fixtures not generated "
                           "(zero-egress; run tools/gen_dio_golden.py "
                           "where pyworld exists)")
class TestPyworldDioGolden:
    def test_matches_pyworld_dio(self):
        z = np.load(FIX)
        names = sorted({k.rsplit("_", 1)[0] for k in z.files})
        for name in names:
            wav = z[f"{name}_wav"]
            ref = z[f"{name}_f0"]
            f0, _ = native_world.dio(wav, FS)
            m = min(len(f0), len(ref))
            f0, ref = f0[:m], ref[:m]
            v, vr = f0 > 0, ref > 0
            assert (v == vr).mean() > 0.90, name
            both = v & vr
            if both.any():
                rel = np.abs(f0[both] - ref[both]) / ref[both]
                assert np.median(rel) < 0.02, name
