#!/usr/bin/env python
"""Generate pyworld golden vectors for the Harvest/D4C parity tests.

Run this on ANY machine where pyworld is installed (it is not installable in
the zero-egress build environment):

    python tools/gen_world_golden.py

It writes tests/fixtures/world_golden.npz containing, for each deterministic
synthetic signal, pyworld's harvest F0 and d4c aperiodicity.  Once the file
is committed, tests/test_harvest.py::TestPyworldGolden activates
automatically and gates the native implementations against real WORLD:
voiced/unvoiced agreement > 95% and voiced-F0 relative error < 2%.
"""

import os

import numpy as np

FS = 16000
FRAME_PERIOD = 5.0


def signals():
    rng = np.random.RandomState(0)
    t = np.arange(FS * 2) / FS
    out = {}
    # harmonic tone, constant pitch
    out["tone220"] = sum(0.5 / k * np.sin(2 * np.pi * 220 * k * t)
                         for k in (1, 2, 3)) + 0.01 * rng.randn(len(t))
    # vibrato
    inst = 150 * (1 + 0.05 * np.sin(2 * np.pi * 4 * t))
    out["vibrato150"] = 0.5 * np.sin(2 * np.pi * np.cumsum(inst) / FS) \
        + 0.005 * rng.randn(len(t))
    # low pulse train (male-like)
    per = FS // 110
    pt = np.zeros(len(t))
    pt[::per] = 1.0
    x = np.zeros(len(t))
    acc = 0.0
    for i, v in enumerate(pt):
        acc = v + 0.97 * acc
        x[i] = acc
    out["pulse110"] = x / np.abs(x).max() + 0.002 * rng.randn(len(t))
    # silence / noise
    out["noise"] = 0.3 * rng.randn(len(t))
    return {k: v.astype(np.float64) for k, v in out.items()}


def main():
    import pyworld  # noqa: F401 — must run where pyworld exists

    fixture_dir = os.path.join(os.path.dirname(__file__), "..", "tests",
                               "fixtures")
    os.makedirs(fixture_dir, exist_ok=True)
    payload = {}
    for name, wav in signals().items():
        f0, tpos = pyworld.harvest(wav, FS, frame_period=FRAME_PERIOD)
        ap = pyworld.d4c(wav, f0, tpos, FS)
        payload[f"{name}_wav"] = wav.astype(np.float32)
        payload[f"{name}_f0"] = f0
        payload[f"{name}_ap"] = ap.astype(np.float32)
    out = os.path.join(fixture_dir, "world_golden.npz")
    np.savez_compressed(out, **payload)
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")


if __name__ == "__main__":
    main()
