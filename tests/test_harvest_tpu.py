"""Batched on-device Harvest (ops/harvest.py) vs the native C++ engine.

The accelerator port quantizes refinement window lengths to half-octave
buckets and runs in float32, so parity with native dvc_harvest (itself
algorithm-faithful to pyworld.harvest, the reference's F0 extractor at
/root/reference/preprocessing/WORLD_processing.py:33) is gated by
TOLERANCE: voiced/unvoiced agreement plus relative-F0 error on commonly
voiced frames."""

import numpy as np
import pytest

from dvc_tpu.native import world as native_world
from dvc_tpu.ops.harvest import harvest_batch

FS = 16_000
N = 8_000  # one plan/compile shared across tests

pytestmark = pytest.mark.skipif(not native_world.available(),
                                reason="native WORLD engine not built")


def _harm(n, f0_fn, amps=(0.6, 0.25, 0.1), noise=0.01, seed=0):
    r = np.random.RandomState(seed)
    t = np.arange(n) / FS
    f = f0_fn(t)
    ph = 2 * np.pi * np.cumsum(f) / FS
    x = sum(a * np.sin((i + 1) * ph + i) for i, a in enumerate(amps))
    return (x + noise * r.randn(n)).astype(np.float32), f


def _compare(x, n_true=None):
    n_true = n_true if n_true is not None else len(x)
    pad = np.zeros(N, np.float32)
    pad[:len(x)] = x
    out = np.asarray(harvest_batch(pad[None], lengths=[n_true], fs=FS))[0]
    f0n, _ = native_world.harvest(x[:n_true].astype(np.float32), FS, 5.0)
    f0j = out[:len(f0n)]
    vj, vn = f0j > 0, f0n > 0
    both = vj & vn
    agree = float((vj == vn).mean())
    err = (np.abs(f0j[both] - f0n[both]) / f0n[both]) if both.any() \
        else np.zeros(0)
    return f0j, f0n, agree, err


class TestHarvestDeviceVsNative:
    def test_vibrato_tone(self):
        x, _ = _harm(N, lambda t: 200.0 * (1 + 0.03 * np.sin(2 * np.pi * 3 * t)))
        f0j, f0n, agree, err = _compare(x)
        assert agree >= 0.97
        assert err.size >= 50
        assert np.median(err) < 0.005
        assert np.percentile(err, 95) < 0.02

    def test_low_and_high_pitch(self):
        for f0c, amps, seed in ((85.0, (0.6, 0.25, 0.1), 1),
                                (600.0, (0.7, 0.2), 3)):
            x, _ = _harm(N, lambda t: f0c * (1 + 0.02 * np.sin(2 * np.pi * 2 * t)),
                         amps=amps, seed=seed)
            _, _, agree, err = _compare(x)
            assert agree >= 0.95, f0c
            assert err.size and np.median(err) < 0.005, f0c

    def test_noise_is_unvoiced(self):
        x = 0.3 * np.random.RandomState(7).randn(N).astype(np.float32)
        f0j, f0n, agree, _ = _compare(x)
        assert float((f0j > 0).mean()) < 0.05
        assert agree >= 0.95

    def test_voiced_silence_voiced(self):
        x1, _ = _harm(3000, lambda t: 150.0 + 0 * t, seed=4)
        x2, _ = _harm(3000, lambda t: 220.0 + 0 * t, seed=5)
        sil = 0.002 * np.random.RandomState(6).randn(2000).astype(np.float32)
        x = np.concatenate([x1, sil, x2])
        _, _, agree, err = _compare(x)
        assert agree >= 0.93
        assert err.size and np.median(err) < 0.01

    def test_truth_tracking(self):
        x, _ = _harm(N, lambda t: 160.0 * (1 + 0.05 * np.sin(2 * np.pi * 2 * t)))
        out = np.asarray(harvest_batch(x[None], fs=FS))[0]
        tt = np.arange(len(out)) * 0.005
        truth = 160.0 * (1 + 0.05 * np.sin(2 * np.pi * 2 * tt))
        v = out > 0
        assert v.mean() > 0.8
        rel = np.abs(out[v] - truth[v]) / truth[v]
        assert np.median(rel) < 0.01


class TestHarvestBatchSemantics:
    def test_rows_independent(self):
        xs = []
        for s in range(3):
            x, _ = _harm(6000, lambda t: (130 + 60 * s)
                         * (1 + 0.02 * np.sin(2 * np.pi * 3 * t)), seed=10 + s)
            p = np.zeros(N, np.float32)
            p[:6000] = x
            xs.append(p)
        batch = np.stack(xs)
        outb = np.asarray(harvest_batch(batch, lengths=[6000] * 3, fs=FS))
        for i in range(3):
            single = np.asarray(
                harvest_batch(batch[i][None], lengths=[6000], fs=FS))[0]
            np.testing.assert_array_equal(outb[i], single)

    def test_length_masking(self):
        x, _ = _harm(5000, lambda t: 180.0 + 0 * t, seed=8)
        pad = np.zeros(N, np.float32)
        pad[:5000] = x
        out = np.asarray(harvest_batch(pad[None], lengths=[5000], fs=FS))[0]
        n_true = int(1000.0 * 5000 / FS / 5.0) + 1
        assert np.all(out[n_true:] == 0.0)
        assert (out[:n_true] > 0).mean() > 0.8

    def test_long_silence_gap_low_floor(self):
        """Event gaps across long silence exceed the tm-lookback window;
        the plan-derived bound (2*afs/f0_floor, advisor r4) plus the
        band/deviation checks must keep gap frames unvoiced and the voiced
        segments native-accurate even at a low f0_floor where the old 256
        constant was insufficient (afs=8000, floor=50 -> bound 320)."""
        x1, _ = _harm(2500, lambda t: 120.0 + 0 * t, seed=60)
        x2, _ = _harm(2500, lambda t: 180.0 + 0 * t, seed=61)
        x = np.concatenate([x1, np.zeros(3000, np.float32), x2])
        pad = np.zeros(N, np.float32)
        pad[:len(x)] = x
        out = np.asarray(harvest_batch(pad[None], lengths=[len(x)], fs=FS,
                                       f0_floor=50.0))[0]
        f0n, _ = native_world.harvest(x, FS, 5.0, f0_floor=50.0)
        f0j = out[:len(f0n)]
        vj, vn = f0j > 0, f0n > 0
        assert float((vj == vn).mean()) >= 0.93
        # the silence gap itself must come out unvoiced, not interpolated
        gap = slice(int(2700 / FS * 200), int(5300 / FS * 200))
        assert (f0j[gap] > 0).mean() < 0.2
        both = vj & vn
        assert both.sum() >= 30
        assert np.median(np.abs(f0j[both] - f0n[both]) / f0n[both]) < 0.01

    def test_merge_slot_high_water(self):
        from dvc_tpu.ops.harvest import _MAX_SLOTS, merge_slot_high_water

        x, _ = _harm(N, lambda t: 200.0 + 0 * t, seed=62)
        harvest_batch(x[None], fs=FS)
        hw = merge_slot_high_water()
        assert hw is not None and 1 <= hw <= _MAX_SLOTS

    def test_parameter_validation(self):
        with pytest.raises(ValueError):
            harvest_batch(np.zeros(32, np.float32), fs=FS)
        with pytest.raises(ValueError):
            harvest_batch(np.zeros((1, N), np.float32), fs=FS,
                          f0_floor=800.0, f0_ceil=71.0)


class TestGridEvalUniform:
    """The gather-free grid bracketing (_grid_eval_uniform) must agree with
    the reference searchsorted implementation (_interval_track +
    _interp_track_grid) wherever event gaps stay under the _LOOKBACK bound
    (always true for in-band signals; longer gaps only bridge silence)."""

    def test_matches_searchsorted_path(self):
        import jax
        import jax.numpy as jnp

        from dvc_tpu.ops.harvest import (
            _grid_eval_uniform,
            _interp_track_grid,
            _interval_track,
            _track_fields,
        )

        rng = np.random.RandomState(0)
        afs, stride, e = 8000.0, 8, 4000
        # band-limited noise rows -> realistic crossing trains
        rows = []
        for r in range(6):
            x = rng.randn(e + 1)
            for _ in range(3):
                x = np.convolve(x, np.ones(9) / 9.0, mode="same")
            rows.append(x[:e + 1])
        s = jnp.asarray(np.stack(rows), jnp.float32)
        a, b = s[..., :-1], s[..., 1:]
        i = jnp.arange(e, dtype=s.dtype)
        cross = (a > 0) & (b <= 0)
        loc = (i + a / jnp.where(a == b, 1.0, a - b)) / afs
        grid = jnp.arange(e // stride + 1, dtype=jnp.float32) \
            * (stride / afs)

        tm, fv = _track_fields(cross, loc)
        fast = np.asarray(_grid_eval_uniform(tm, fv, stride, grid))

        ev, tm_o, fv_o = _interval_track(cross, loc)
        interp = jax.vmap(_interp_track_grid, in_axes=(0, 0, 0, None))
        ref = np.asarray(interp(ev, tm_o, fv_o, grid))

        np.testing.assert_allclose(fast, ref, rtol=1e-4, atol=1e-5)
        assert (np.asarray(fast) > 0).mean() > 0.5  # tracks actually found


class TestWorldDecomposeBatch:
    def test_contract_and_agreement(self, tmp_path):
        from dvc_tpu.ops.world import world_decompose, world_decompose_batch

        wavs = []
        for s, f0c in enumerate((150.0, 230.0)):
            x, _ = _harm(6000 + 1000 * s, lambda t: f0c
                         * (1 + 0.02 * np.sin(2 * np.pi * 2 * t)), seed=20 + s)
            wavs.append(x)
        outs = world_decompose_batch(wavs, FS, keep_sp_ap=True)
        assert len(outs) == 2
        for w, (f0, timeaxis, sp, ap, mc) in zip(wavs, outs):
            n_true = len(w) // 80 + 1
            assert f0.shape == (n_true,) and timeaxis.shape == (n_true,)
            assert sp.shape[0] == n_true and ap.shape == sp.shape
            assert mc.shape == (n_true, 36)
            assert np.isfinite(mc).all() and np.isfinite(sp).all()
            f0n, _, spn, _, mcn = world_decompose(w, FS)
            vj, vn = f0 > 0, f0n > 0
            assert float((vj == vn).mean()) >= 0.93
            both = vj & vn
            assert both.sum() >= 30
            rel = np.abs(f0[both] - f0n[both]) / f0n[both]
            assert np.median(rel) < 0.01
            # envelope from the device f0 stays close to the native-f0 one
            lr = np.abs(np.log(sp[both] + 1e-12) - np.log(spn[both] + 1e-12))
            assert np.median(lr) < 0.35

    def test_skip_sp_ap(self):
        from dvc_tpu.ops.world import world_decompose_batch

        x, _ = _harm(6000, lambda t: 170.0 + 0 * t, seed=30)
        (f0, _, sp, ap, mc), = world_decompose_batch([x], FS,
                                                     keep_sp_ap=False)
        assert sp is None and ap is None
        assert mc.shape[0] == f0.shape[0] == len(x) // 80 + 1

    def test_preprocess_driver_device_mode(self, tmp_path):
        from dvc_tpu.data.world_preprocess import preprocess_world_speaker
        from dvc_tpu.utils.wavio import write_wav

        spk = tmp_path / "p301"
        spk.mkdir()
        for i in range(3):
            x, _ = _harm(6000, lambda t: (150.0 + 20 * i) + 0 * t, seed=40 + i)
            write_wav(str(spk / f"u{i}.wav"),
                      (x / np.abs(x).max() * 20000).astype(np.int16), FS)
        out = tmp_path / "world"
        stats = preprocess_world_speaker(str(spk), str(out), f0_mode="device")
        assert stats["n_files"] == 3
        z = np.load(out / "p301" / "u0.npz")
        assert z["f0"].ndim == 1 and (z["f0"] > 0).any()
        assert z["mcc"].shape[1] == 36
        assert np.isfinite(z["normalized_mc"]).all()
        assert (out / "log_f0_p301.npz").exists()
        assert (out / "mcep_p301.npz").exists()
