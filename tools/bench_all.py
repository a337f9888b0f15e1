#!/usr/bin/env python
"""Measure every headline number in BASELINE.md in one run.

Prints one JSON object per metric (and a final summary dict).  All timings
follow the environment rules from BASELINE.md: amortize many steps per
host<->device round trip and close every timed region with a value fetch
(block_until_ready acks early over the axon tunnel; single dispatches bottom
out at the ~27 ms round-trip floor).

    python tools/bench_all.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _enable_cache():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


def emit(metric: str, value: float, unit: str, **extra):
    print(json.dumps({"metric": metric, "value": round(value, 2),
                      "unit": unit, **extra}), flush=True)
    return {metric: value}


def bench_vae_train(iters: int) -> dict:
    import jax
    import jax.numpy as jnp
    from dvc_tpu.config import Config
    from dvc_tpu.train.trainer import create_train_state, make_train_step

    cfg = Config()
    model, state, optimizer = create_train_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(model, optimizer, compute_dtype="bfloat16",
                           donate=True)
    b, f = 256, 64
    rng = jax.random.PRNGKey(1)
    x1 = jnp.asarray(np.random.RandomState(0).rand(b, 80, f), jnp.float32)
    x2 = jnp.asarray(np.random.RandomState(1).rand(b, 80, f), jnp.float32)
    for _ in range(3):
        state, terms = step(state, x1, x2, rng)
    float(terms.total)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, terms = step(state, x1, x2, rng)
    float(terms.total)
    dt = (time.perf_counter() - t0) / iters
    return emit("vae_train_frames_per_sec_per_chip", 2 * b * f / dt,
                "frames/sec", batch=b)


def bench_vocoder(quick: bool) -> dict:
    import jax
    import jax.numpy as jnp
    from dvc_tpu.config import VocoderConfig
    from dvc_tpu.kernels.wavenet_step import pallas_generate
    from dvc_tpu.models.wavenet import WaveNet

    cfg = VocoderConfig()
    model = WaveNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4 * 256, 1)),
                           jnp.zeros((1, 4, cfg.cin_channels)))
    out = {}
    frames = 12 if quick else 48
    for b in ((1,) if quick else (1, 96)):
        c = jnp.asarray(np.random.RandomState(0).rand(b, frames,
                                                      cfg.cin_channels),
                        jnp.float32)
        gen = lambda: pallas_generate(variables, c, seed=1, cfg=cfg)
        w = gen()
        float(w.sum())
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            w = gen()
            float(w.sum())
            best = min(best, time.perf_counter() - t0)
        t_samples = frames * 256
        out.update(emit(f"vocoder_samples_per_sec_b{b}",
                        b * t_samples / best, "samples/sec",
                        per_utt=round(t_samples / best),
                        realtime_x=round(b * t_samples / best / 16000, 1)))
    return out


def bench_ge2e(iters: int) -> dict:
    # scan K steps inside ONE dispatch: the per-dispatch tunnel latency
    # fluctuates (observed 1.5-35 ms across the day) and would otherwise
    # dominate this ~35 ms device step
    import jax
    import jax.numpy as jnp
    import optax
    from dvc_tpu.config import SpeakerEncoderConfig
    from dvc_tpu.train.speaker_trainer import GE2EState, create_ge2e_state

    cfg = SpeakerEncoderConfig()
    model, state, opt = create_ge2e_state(jax.random.PRNGKey(0), cfg)
    batch = jnp.asarray(np.random.RandomState(0).rand(64, 10, 63, 80),
                        jnp.float32)

    def loss_fn(params, b):
        flat = b.reshape(-1, b.shape[-2], b.shape[-1])
        e = model.apply({"params": params}, flat)
        e = e.reshape(b.shape[0], b.shape[1], -1)
        return model.apply({"params": params}, e, method="loss")

    k = max(2, iters // 2)

    def multi(st, b):
        def body(carry, _):
            (loss, _), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(carry.params, b)
            updates, new_opt = opt.update(grads, carry.opt_state, carry.params)
            return GE2EState(step=carry.step + 1,
                             params=optax.apply_updates(carry.params, updates),
                             opt_state=new_opt), loss
        st, losses = jax.lax.scan(body, st, None, length=k)
        return st, losses[-1]

    mj = jax.jit(multi, donate_argnums=(0,))
    state, loss = mj(state, batch)
    float(loss)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        state, loss = mj(state, batch)
        float(loss)
        best = min(best, time.perf_counter() - t0)
    dt = best / k
    return emit("ge2e_device_step_ms", dt * 1e3, "ms",
                utts_per_sec=round(640 / dt))


def bench_mel(quick: bool) -> dict:
    import jax
    import jax.numpy as jnp
    from dvc_tpu.config import AudioConfig
    from dvc_tpu.ops.mel import melspectrogram

    cfg = AudioConfig()
    # batch large enough that device time clears the dispatch-latency floor
    b, secs = (16, 2) if quick else (256, 10)
    wavs = jnp.asarray(np.random.RandomState(0).rand(b, secs * 16000),
                       jnp.float32)
    f = jax.jit(lambda w: melspectrogram(w, cfg))
    m = f(wavs)
    float(m.sum())
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        m = f(wavs)
        float(m.sum())
        best = min(best, time.perf_counter() - t0)
    frames = m.shape[0] * m.shape[-1]
    return emit("mel_frames_per_sec", frames / best, "frames/sec",
                realtime_x=round(b * secs / best))


def bench_conversion(quick: bool) -> dict:
    import jax
    import jax.numpy as jnp
    from dvc_tpu import config as C
    from dvc_tpu.config import VocoderConfig
    from dvc_tpu.convert.conversion import convert_mel
    from dvc_tpu.kernels.wavenet_step import pallas_generate
    from dvc_tpu.models.disentangled_vae import DisentangledVAE
    from dvc_tpu.models.wavenet import WaveNet

    cfg = C.Config()
    model = DisentangledVAE(cfg.vae)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 80, 64))
    variables = model.init({"params": rng, "reparam": rng}, x, x, train=True)
    vcfg = VocoderConfig()
    wn_vars = WaveNet(vcfg).init(jax.random.PRNGKey(1),
                                 jnp.zeros((1, 4 * 256, 1)),
                                 jnp.zeros((1, 4, 80)))
    t_frames = 60 if quick else 188
    src = np.random.RandomState(0).rand(80, t_frames).astype(np.float32)
    trg = np.random.RandomState(1).rand(80, t_frames - 18).astype(np.float32)

    def full():
        _, converted = convert_mel(model, variables, src, trg, 64)
        return np.asarray(pallas_generate(wn_vars,
                                          jnp.asarray(converted.T[None]),
                                          seed=3, cfg=vcfg))

    w = full()
    dur = w.shape[1] / 16000
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        w = full()
        best = min(best, time.perf_counter() - t0)
    out = emit("conversion_latency_ms", best * 1e3, "ms",
               utterance_s=round(dur, 2), realtime_x=round(dur / best, 1))

    # same pipeline with the non-AR iSTFT vocoder (fast-vocoder family)
    import functools

    from dvc_tpu.config import ISTFTVocoderConfig
    from dvc_tpu.models.istft_vocoder import ISTFTVocoder, synthesize

    ivoc = ISTFTVocoder(ISTFTVocoderConfig(), cfg.audio)
    iv_vars = ivoc.init(jax.random.PRNGKey(2),
                        jnp.zeros((1, cfg.audio.num_mels, 4)))

    @functools.partial(jax.jit, static_argnums=(2,))
    def igen(params, mel_b, length):
        return synthesize(ivoc, params, mel_b, length)

    def full_istft():
        _, converted = convert_mel(model, variables, src, trg, 64)
        t = converted.shape[1]
        return np.asarray(igen(iv_vars, jnp.asarray(converted[None]),
                               t * cfg.audio.hop_size))

    w = full_istft()
    dur_i = w.shape[1] / 16000
    best_i = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        w = full_istft()
        best_i = min(best_i, time.perf_counter() - t0)
    out.update(emit("conversion_latency_istft_ms", best_i * 1e3, "ms",
                    utterance_s=round(dur_i, 2),
                    realtime_x=round(dur_i / best_i, 1)))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="smaller shapes / fewer iters (CI smoke)")
    args = ap.parse_args()
    _enable_cache()

    results = {}
    iters = 5 if args.quick else 30
    results.update(bench_vae_train(iters))
    results.update(bench_vocoder(args.quick))
    results.update(bench_ge2e(5 if args.quick else 20))
    results.update(bench_mel(args.quick))
    results.update(bench_conversion(args.quick))
    print(json.dumps({"summary": {k: round(v, 1) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
