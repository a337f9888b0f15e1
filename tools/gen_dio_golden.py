#!/usr/bin/env python
"""Generate pyworld.dio golden vectors for the native-DIO parity test.

Run this on ANY machine where pyworld is installed (it is not installable
in the zero-egress build environment):

    python tools/gen_dio_golden.py

It writes tests/fixtures/dio_golden.npz containing, for each deterministic
synthetic signal, pyworld.dio's F0 at the repo's default parameters
(frame_period 5 ms, f0 band [71, 800], channels_in_octave 2.0,
allowed_range 0.1 — the defaults the reference inherits at
preprocessing/utils.py:183-192).  Once the file is committed,
tests/test_dio.py::TestPyworldDioGolden activates automatically and gates
native/dvc_world.cpp:dvc_dio against real pyworld.dio: voiced/unvoiced
agreement > 90% and voiced-F0 relative error < 2%.
"""

import os

import numpy as np

FS = 16000
FRAME_PERIOD = 5.0


def signals():
    # same deterministic corpus as tools/gen_world_golden.py so one
    # fixture-generation session covers both scaffolds
    rng = np.random.RandomState(0)
    t = np.arange(FS * 2) / FS
    out = {}
    out["tone220"] = sum(0.5 / k * np.sin(2 * np.pi * 220 * k * t)
                         for k in (1, 2, 3)) + 0.01 * rng.randn(len(t))
    inst = 150 * (1 + 0.05 * np.sin(2 * np.pi * 4 * t))
    out["vibrato150"] = 0.5 * np.sin(2 * np.pi * np.cumsum(inst) / FS) \
        + 0.005 * rng.randn(len(t))
    per = FS // 110
    pt = np.zeros(len(t))
    pt[::per] = 1.0
    x = np.zeros(len(t))
    acc = 0.0
    for i, v in enumerate(pt):
        acc = v + 0.97 * acc
        x[i] = acc
    out["pulse110"] = x / np.abs(x).max() + 0.002 * rng.randn(len(t))
    out["noise"] = 0.3 * rng.randn(len(t))
    return {k: v.astype(np.float64) for k, v in out.items()}


def main():
    import pyworld  # noqa: F401 — must run where pyworld exists

    fixture_dir = os.path.join(os.path.dirname(__file__), "..", "tests",
                               "fixtures")
    os.makedirs(fixture_dir, exist_ok=True)
    payload = {}
    for name, wav in signals().items():
        f0, _tpos = pyworld.dio(wav, FS, f0_floor=71.0, f0_ceil=800.0,
                                channels_in_octave=2.0,
                                frame_period=FRAME_PERIOD,
                                allowed_range=0.1)
        payload[f"{name}_wav"] = wav.astype(np.float32)
        payload[f"{name}_f0"] = f0.astype(np.float64)
    out = os.path.join(fixture_dir, "dio_golden.npz")
    np.savez_compressed(out, **payload)
    print(f"wrote {out}: {sorted(payload)}")


if __name__ == "__main__":
    main()
