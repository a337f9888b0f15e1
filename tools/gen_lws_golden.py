#!/usr/bin/env python
"""Record lws STFT golden vectors for the framing/window parity test.

The reference computes its STFT through the native lws package
(preprocessing/utils.py:84-86: lws.lws(1024, 256, mode="speech")); lws is not
installable in the zero-egress build environment, so ops/stft.py's sqrt-hann
analysis window is an assumption.  Run this wherever lws IS installed:

    python tools/gen_lws_golden.py

It writes tests/fixtures/lws_golden.npz with |STFT| of deterministic
signals.  Committing the file auto-activates
tests/test_ops.py-side gate TestLwsGolden, which fails if the window or
framing of ops/stft.stft_magnitude deviates from lws' output (every mel and
every checkpoint-parity number shifts with the window, so this pins it).
"""

import os

import numpy as np

FFT, HOP = 1024, 256


def signals():
    rng = np.random.RandomState(0)
    t = np.arange(16000) / 16000.0
    return {
        "tone": (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float64),
        "noise": (0.25 * rng.randn(16000)).astype(np.float64),
        "chirp": (0.4 * np.sin(2 * np.pi * (100 + 1900 * t) * t)
                  ).astype(np.float64),
        "short": (0.3 * np.sin(2 * np.pi * 200.0 * t[:3000])).astype(np.float64),
    }


def main():
    import lws  # must run where lws exists

    proc = lws.lws(FFT, HOP, mode="speech")
    payload = {}
    for name, x in signals().items():
        payload[f"{name}_wav"] = x.astype(np.float32)
        payload[f"{name}_mag"] = np.abs(proc.stft(x)).astype(np.float32)
    fixture_dir = os.path.join(os.path.dirname(__file__), "..", "tests",
                               "fixtures")
    os.makedirs(fixture_dir, exist_ok=True)
    out = os.path.join(fixture_dir, "lws_golden.npz")
    np.savez_compressed(out, **payload)
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")


if __name__ == "__main__":
    main()
