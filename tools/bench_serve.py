#!/usr/bin/env python
"""Serving-path benchmark: concurrent conversion requests through the
micro-batching ConversionService (dvc_tpu/serve.py) with the full-size VAE
and the Pallas WaveNet vocoder.

Measures wall-clock for N concurrent ~3 s requests submitted at once (the
service drains them into device batches), and reports aggregate
audio-seconds per second plus the achieved batching ratio.

    python tools/bench_serve.py [--requests 8] [--frames 188]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=8)
    ap.add_argument("--frames", type=int, default=188)  # ~3 s utterances
    ap.add_argument("--vocoder", default="wavenet",
                    choices=["wavenet", "istft"])
    ap.add_argument("--pipeline", default="mel", choices=["mel", "world"],
                    help="world: bench the MCC/WORLD serving route "
                         "(WorldConversionService: batched device "
                         "analysis + latent swap + device synthesis)")
    ap.add_argument("--fs_mask", action="store_true",
                    help="serve through the FeatureSelection-masked swap "
                         "(a synthetic binary mask — identity is "
                         "irrelevant to throughput; the masked program "
                         "encodes the target content head too)")
    args = ap.parse_args()
    if args.pipeline == "world":
        return bench_world(args)

    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from dvc_tpu import config as C
    from dvc_tpu.models.disentangled_vae import DisentangledVAE
    from dvc_tpu.models.wavenet import WaveNet
    from dvc_tpu.serve import ConversionService

    cfg = C.Config()
    model = DisentangledVAE(cfg.vae)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 80, 64))
    variables = model.init({"params": rng, "reparam": rng}, x, x, train=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    vcfg = C.VocoderConfig()
    hop = int(np.prod(vcfg.upsample_scales))
    if args.vocoder == "istft":
        import tempfile as _tf

        from flax import serialization

        from dvc_tpu.config import ISTFTVocoderConfig
        from dvc_tpu.convert.vocode import make_istft_vocoder
        from dvc_tpu.models.istft_vocoder import ISTFTVocoder

        iv = ISTFTVocoder(ISTFTVocoderConfig(), cfg.audio)
        iv_vars = iv.init(jax.random.PRNGKey(1), jnp.zeros((1, 80, 4)))
        with _tf.NamedTemporaryFile(suffix=".msgpack", delete=False) as f:
            f.write(serialization.to_bytes({"params": iv_vars["params"]}))
            ckpt = f.name
        vocoder = make_istft_vocoder(ckpt, audio=cfg.audio)
    else:
        from dvc_tpu.convert.vocode import make_vocoder
        wn_vars = WaveNet(vcfg).init(jax.random.PRNGKey(1),
                                     jnp.zeros((1, 4 * hop, 1)),
                                     jnp.zeros((1, 4, 80)))
        vocoder = make_vocoder(None, vcfg, backend="pallas",
                               variables=wn_vars)

    np_rng = np.random.RandomState(0)
    with tempfile.TemporaryDirectory() as mel_dir:
        d = os.path.join(mel_dir, "trg")
        os.makedirs(d)
        for i in range(3):
            np.save(os.path.join(d, f"trg_{i:03d}_mel.npy"),
                    np_rng.rand(80, 120).astype(np.float32))
        fs_mask = None
        if args.fs_mask:
            from dvc_tpu.convert.conversion import binarize_fs_mask
            fs_mask = binarize_fs_mask(
                np.random.RandomState(7).rand(cfg.vae.latent_dim),
                cfg.vae.speaker_size, 0.5)
        service = ConversionService(cfg, model, variables, mel_dir,
                                    vocoder=vocoder,
                                    max_batch_chunks=args.requests * 4,
                                    max_wait_ms=200.0, fs_mask=fs_mask)
        mels = [np_rng.rand(80, args.frames).astype(np.float32)
                for _ in range(args.requests)]

        def run_all():
            outs = [None] * len(mels)

            def w(i):
                outs[i] = service.submit(mels[i], "trg", timeout=1800)

            ts = [threading.Thread(target=w, args=(i,))
                  for i in range(len(mels))]
            t0 = time.perf_counter()
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            dt = time.perf_counter() - t0
            assert all(o is not None and np.isfinite(o).all() for o in outs)
            return dt, outs

        run_all()  # warm-up (compiles)
        best = 1e9
        for _ in range(3):
            dt, outs = run_all()
            best = min(best, dt)
        # account only the REQUESTED audio (input frames), not the padded
        # tail chunk the conversion appends
        audio_s = args.requests * args.frames * hop / float(
            cfg.audio.sample_rate)
        s = service.stats
        suffix = "_fsmask" if args.fs_mask else ""
        print(json.dumps({
            "metric": ("serve_concurrent_requests_realtime_x_"
                       f"{args.vocoder}{suffix}"),
            "value": round(audio_s / best, 1), "unit": "x realtime aggregate",
            "requests": args.requests, "audio_s": round(audio_s, 1),
            "wall_s": round(best, 3),
            "batching_ratio": round(s["requests"] / max(1, s["batches"]), 2),
        }))


def bench_world(args):
    """WORLD-route serving benchmark: concurrent ~3 s WAV requests through
    WorldConversionService (serve --pipeline world)."""
    import tempfile as _tf
    import threading as _th

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from dvc_tpu import config as C
    from dvc_tpu.models.disentangled_vae import DisentangledVAE
    from dvc_tpu.serve import WorldConversionService

    fs = 16_000
    n_mcep = 36
    cfg = C.Config(vae=C.VAEConfig(num_mels=n_mcep, frames=128))
    model = DisentangledVAE(cfg.vae)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, n_mcep, 128))
    variables = model.init({"params": rng, "reparam": rng}, x, x, train=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}

    np_rng = np.random.RandomState(0)

    def voice(f0c, n):
        t = np.arange(n) / fs
        inst = f0c * (1 + 0.04 * np.sin(2 * np.pi * 3 * t))
        return (0.4 * np.sin(2 * np.pi * np.cumsum(inst) / fs)
                + 0.01 * np_rng.randn(n)).astype(np.float32)

    n_samples = args.frames * 256  # match the mel bench's audio seconds
    with _tf.TemporaryDirectory() as world_dir:
        d = os.path.join(world_dir, "trg")
        os.makedirs(d)
        for i in range(3):
            t = 200 + 20 * i
            np.savez(os.path.join(d, f"u{i}.npz"),
                     f0=np.abs(np_rng.rand(t) * 100 + 120),
                     normalized_mc=np_rng.randn(t, n_mcep)
                     .astype(np.float32))
        np.savez(os.path.join(world_dir, "log_f0_trg.npz"),
                 mean=5.2, std=0.2)
        np.savez(os.path.join(world_dir, "mcep_trg.npz"),
                 mean=np_rng.randn(n_mcep, 1) * 0.1,
                 std=np.abs(np_rng.rand(n_mcep, 1)) + 0.5)
        service = WorldConversionService(cfg, model, variables, world_dir,
                                         sample_rate=fs,
                                         max_batch_utts=args.requests,
                                         max_wait_ms=200.0)
        wavs = [voice(130 + 15 * i, n_samples)
                for i in range(args.requests)]

        def run_all():
            outs = [None] * len(wavs)

            def w(i):
                outs[i] = service.submit(wavs[i], "trg", timeout=1800)

            ts = [_th.Thread(target=w, args=(i,)) for i in range(len(wavs))]
            t0 = time.perf_counter()
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            dt = time.perf_counter() - t0
            assert all(o is not None and np.isfinite(o).all() for o in outs)
            return dt, outs

        run_all()  # warm-up (compiles)
        best = 1e9
        for _ in range(3):
            dt, _outs = run_all()
            best = min(best, dt)
        audio_s = args.requests * n_samples / float(fs)
        s = service.stats
        print(json.dumps({
            "metric": "serve_concurrent_requests_realtime_x_world",
            "value": round(audio_s / best, 1),
            "unit": "x realtime aggregate",
            "requests": args.requests, "audio_s": round(audio_s, 1),
            "wall_s": round(best, 3),
            "batching_ratio": round(s["requests"] / max(1, s["batches"]), 2),
        }))


if __name__ == "__main__":
    main()
