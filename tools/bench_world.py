"""Multi-utterance WORLD-engine benchmark (VERDICT r2 item 6 tracker).

Measures the native analysis/synthesis stages on a synthetic 12-utterance
corpus and prints one JSON line per stage with seconds-per-audio-second and
realtime factor, so harvest/d4c/synthesis throughput progress is
machine-checkable across rounds.

Round-3 numbers on this 1-core host (best-of-3; all changes bit-identical
to the round-2 implementation):
  harvest  3.3x -> 6.8x realtime  (2.03x: cached-twiddle vectorized FFT,
           cross-utterance filter-bank cache, fused event trains, marching
           interpolation, per-frame refinement FFT sharing)
  d4c      9.7x -> 14.1x realtime (1.44x: shared FFT upgrade)
The further thread-pool fan-out the round-2 verdict proposed multiplies
these by the core count (bit-identical, DVC_WORLD_THREADS); this host has
ONE core, so wall-clock gains here are algorithmic only.

Usage: python tools/bench_world.py [--seconds 2.0] [--n 12]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dvc_tpu.native import world as nw  # noqa: E402
from dvc_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

FS = 16000


def corpus(n: int, seconds: float) -> list[np.ndarray]:
    rng = np.random.RandomState(0)
    utts = []
    for i in range(n):
        t = np.arange(int(seconds * FS)) / FS
        f = 90 + 23 * i
        w = 0.4 * np.sin(2 * np.pi * f * t * (1 + 0.04 * np.sin(2 * np.pi * 3 * t))) \
            + 0.05 * rng.randn(len(t))
        utts.append(w.astype(np.float32))
    return utts


def best_of(fn, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--n", type=int, default=12)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    if not nw.available():
        raise SystemExit("native WORLD engine unavailable")
    utts = corpus(args.n, args.seconds)
    total_sec = sum(len(u) for u in utts) / FS

    f0s = [nw.harvest(u, FS)[0] for u in utts]  # warm + reuse for d4c
    dt = best_of(lambda: [nw.harvest(u, FS) for u in utts], args.reps)
    print(json.dumps({"stage": "harvest", "sec_per_audio_sec":
                      round(dt / total_sec, 4),
                      "realtime_x": round(total_sec / dt, 2)}))

    aps = [nw.d4c(u, f0, FS) for u, f0 in zip(utts, f0s)]  # warm
    dt = best_of(lambda: [nw.d4c(u, f0, FS)
                          for u, f0 in zip(utts, f0s)], args.reps)
    print(json.dumps({"stage": "d4c", "sec_per_audio_sec":
                      round(dt / total_sec, 4),
                      "realtime_x": round(total_sec / dt, 2)}))

    # batched accelerator Harvest (ops/harvest.py): whole corpus, one program
    from dvc_tpu.ops.harvest import harvest_batch
    import jax
    pad = max(len(u) for u in utts)
    batch = np.zeros((len(utts), pad), np.float32)
    lengths = np.empty(len(utts), np.int64)
    for i, u in enumerate(utts):
        batch[i, :len(u)] = u
        lengths[i] = len(u)
    float(harvest_batch(batch, lengths, FS)[0, 0])  # warm/compile
    # timing must end with a value fetch: block_until_ready over the axon
    # tunnel acks before device completion (BASELINE.md)
    dt = best_of(lambda: float(harvest_batch(batch, lengths, FS)[-1, -1]),
                 args.reps)
    print(json.dumps({"stage": "harvest_device_batch", "sec_per_audio_sec":
                      round(dt / total_sec, 4),
                      "realtime_x": round(total_sec / dt, 2),
                      "device": jax.devices()[0].platform}))

    # batched accelerator D4C (ops/d4c.py): whole corpus, one program
    from dvc_tpu.ops.d4c import d4c_batch
    fmax = max(len(f) for f in f0s)
    f0_b = np.zeros((len(utts), fmax), np.float32)
    for i, f in enumerate(f0s):
        f0_b[i, :len(f)] = f
    float(d4c_batch(batch, f0_b, FS)[0, 0, 0])  # warm/compile
    dt = best_of(lambda: float(d4c_batch(batch, f0_b, FS)[-1, -1, -1]),
                 args.reps)
    print(json.dumps({"stage": "d4c_device_batch", "sec_per_audio_sec":
                      round(dt / total_sec, 4),
                      "realtime_x": round(total_sec / dt, 2),
                      "device": jax.devices()[0].platform}))

    sps = [np.full((len(f0), 513), 1e-4) for f0 in f0s]
    freqs = np.arange(513) * FS / 1024
    tilt = 1e-2 / (1.0 + (freqs / 500.0) ** 2)
    for sp in sps:
        sp *= 0  # keep allocation
        sp += tilt[None, :]
    nw.synthesize(f0s[0][:len(sps[0])], sps[0], aps[0][:len(sps[0])], FS)
    dt = best_of(lambda: [nw.synthesize(f0[:len(sp)], sp, ap[:len(sp)], FS)
                          for f0, sp, ap in zip(f0s, sps, aps)], args.reps)
    print(json.dumps({"stage": "synthesis", "sec_per_audio_sec":
                      round(dt / total_sec, 4),
                      "realtime_x": round(total_sec / dt, 2)}))

    # batched accelerator synthesis (ops/world.synthesize_batch): whole
    # corpus in bucketed vmapped programs
    from dvc_tpu.ops.world import synthesize_batch
    f0_list = [f0[:len(sp)].astype(np.float32) for f0, sp in zip(f0s, sps)]
    sp_list = [sp.astype(np.float32) for sp in sps]
    ap_list = [ap[:len(sp)].astype(np.float32)
               for ap, sp in zip(aps, sps)]
    synthesize_batch(f0_list, sp_list, ap_list, FS)  # warm/compile

    def run_synth_batch() -> None:
        outs = synthesize_batch(f0_list, sp_list, ap_list, FS)
        float(outs[-1][-1])  # value fetch closes the timed region

    dt = best_of(run_synth_batch, args.reps)
    print(json.dumps({"stage": "synthesis_device_batch", "sec_per_audio_sec":
                      round(dt / total_sec, 4),
                      "realtime_x": round(total_sec / dt, 2),
                      "device": jax.devices()[0].platform}))

    # end-to-end corpus analysis (harvest + cheaptrick + mcep + d4c), the
    # `preprocess-world --f0 device` payload path
    from dvc_tpu.ops.world import world_decompose_batch

    def run_analysis():
        res = world_decompose_batch(utts, FS, keep_sp_ap=True)
        float(res[-1][4][-1, -1])  # value fetch closes the timed region

    run_analysis()  # warm/compile
    dt = best_of(run_analysis, args.reps)
    # note: includes the sp/ap/mcc downloads to host (~20 MB here), which
    # dominate over the axon tunnel; device compute is the stage sum above
    print(json.dumps({"stage": "analysis_device_end_to_end",
                      "sec_per_audio_sec": round(dt / total_sec, 4),
                      "realtime_x": round(total_sec / dt, 2),
                      "includes_host_transfers": True,
                      "device": jax.devices()[0].platform}))


if __name__ == "__main__":
    main()
