"""Vocoder trained-to-quality measurement on the attached chip.

--arch istft (default): trains the non-AR iSTFT vocoder
(models/istft_vocoder.py) and reports HELD-OUT fidelity: the mel L1
between mel(vocoded) and mel(ground truth) and the multi-resolution STFT
loss, at several points of the training trajectory.  This is the quality
loop the round-2 ROADMAP tracked only as a training-loss decrease
(3.46 -> 1.06); holdout mel-recon of actually-vocoded audio is the number
a user cares about.

--arch wavenet: the same protocol for the AR WaveNet at the PRODUCTION
config (24 layers, 512 channels — reference preprocessing/hparams.py
:82-117), teacher-forced via train/vocoder_trainer.py and AR-GENERATED on
holdout mels through convert/vocode.make_vocoder — on TPU that is the
Pallas resident kernel at production shape (VERDICT r3 item 3: the
exact-match gate alone ran tiny-only), elsewhere the lax.scan sampler.
Generation consumes the EMA weights, like the reference's published
checkpoint.

The corpus is formant-filtered glottal pulse trains (the construction of
tests/test_world_synthesis.make_vowel) with varied pitch/formants — real
enough to exercise harmonic structure, synthesizable without audio assets.

Usage: python tools/quality_vocoder.py [--arch istft|wavenet]
       [--steps 1500] [--out out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dvc_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

FS = 16000


def make_voice(rng, n_sec: float = 2.0) -> np.ndarray:
    from scipy.signal import lfilter

    f0 = 90 + rng.rand() * 160
    n = int(FS * n_sec)
    t = np.arange(n) / FS
    f0_t = f0 * (1 + 0.05 * np.sin(2 * np.pi * (2 + 3 * rng.rand()) * t))
    phase = np.cumsum(f0_t / FS)
    exc = (np.diff(np.floor(phase), prepend=0) > 0).astype(np.float64)
    exc -= exc.mean()
    exc += 0.02 * rng.randn(n)  # aspiration noise
    wav = np.zeros(n)
    for _ in range(3):
        f = 300 + rng.rand() * 2800
        bw = 80 + rng.rand() * 160
        g = 0.3 + rng.rand()
        r = np.exp(-np.pi * bw / FS)
        th = 2 * np.pi * f / FS
        wav += g * lfilter([1 - 2 * r * np.cos(th) + r * r],
                           [1, -2 * r * np.cos(th), r * r], exc)
    return (wav / np.abs(wav).max() * 0.6).astype(np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="istft", choices=["istft", "wavenet"])
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--n_train", type=int, default=48)
    ap.add_argument("--n_eval", type=int, default=8)
    ap.add_argument("--eval_seconds", type=float, default=2.0,
                    help="holdout utterance length (AR generation cost "
                         "scales with it)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--data_dir", default="/tmp/quality_vocoder")
    args = ap.parse_args()

    import jax.numpy as jnp

    from dvc_tpu.config import AudioConfig
    from dvc_tpu.ops.mel import melspectrogram
    from dvc_tpu.train.istft_vocoder_trainer import (
        multi_resolution_stft_loss,
    )
    from dvc_tpu.utils.wavio import write_wav

    audio = AudioConfig()
    rng = np.random.RandomState(0)
    os.makedirs(args.data_dir, exist_ok=True)
    for i in range(args.n_train):
        write_wav(os.path.join(args.data_dir, f"u{i:03d}.wav"),
                  make_voice(rng), FS)
    eval_wavs = [make_voice(np.random.RandomState(1000 + i),
                            n_sec=args.eval_seconds)
                 for i in range(args.n_eval)]
    eval_mels = [np.asarray(melspectrogram(jnp.asarray(w), audio))
                 for w in eval_wavs]

    if args.arch == "istft":
        from dvc_tpu.models.istft_vocoder import synthesize
        from dvc_tpu.train.istft_vocoder_trainer import (
            ISTFTVocoderTrainer,
            mel_wav_batches,
        )

        trainer = ISTFTVocoderTrainer(seed=0)

        def generate(mel, length):
            return np.asarray(synthesize(
                trainer.model, {"params": trainer.state.params},
                jnp.asarray(mel)[None], length))[0]

        crop_frames = 64
        batches = mel_wav_batches(args.data_dir, args.batch_size,
                                  crop_frames, audio=audio, seed=0)
    else:
        import jax

        from dvc_tpu.config import VocoderConfig
        from dvc_tpu.convert.vocode import make_vocoder
        from dvc_tpu.train.vocoder_trainer import (
            VocoderTrainer,
            wav_batches,
        )

        # PRODUCTION config: 24 layers, 512 channels (reference hparams)
        vcfg = VocoderConfig()
        trainer = VocoderTrainer(cfg=vcfg, lr=5e-4, max_time_steps=6400)
        hop = audio.hop_size

        def generate(mel, length):
            # AR generation from the EMA weights through the production
            # generation path (Pallas resident kernel on TPU)
            voc = make_vocoder(None, vcfg,
                               variables={"params": trainer.state.ema_params})
            return voc(np.asarray(mel))[:length]

        def _adapt():
            for x, c in wav_batches(args.data_dir, args.batch_size,
                                    trainer.max_time_steps, vcfg, seed=0,
                                    audio_cfg=audio):
                yield x, c

        batches = _adapt()

    def holdout_metrics(tag: str) -> dict:
        mel_l1s, mrstfts = [], []
        for w, m in zip(eval_wavs, eval_mels):
            y = generate(m, len(w))
            m_hat = np.asarray(melspectrogram(jnp.asarray(y), audio))
            tt = min(m.shape[-1], m_hat.shape[-1])
            mel_l1s.append(float(np.mean(np.abs(m_hat[..., :tt]
                                                - m[..., :tt]))))
            n = min(len(w), len(y))
            mrstfts.append(float(multi_resolution_stft_loss(
                jnp.asarray(y[:n])[None], jnp.asarray(w[:n])[None])))
        row = {"tag": tag,
               "holdout_mel_l1": round(float(np.mean(mel_l1s)), 4),
               "holdout_mrstft": round(float(np.mean(mrstfts)), 4)}
        print(f"{tag}: mel L1 {row['holdout_mel_l1']} "
              f"mrstft {row['holdout_mrstft']}", file=sys.stderr, flush=True)
        return row

    traj = [dict(step=0, **holdout_metrics("step 0"))]
    t0 = time.perf_counter()
    chunk = max(1, args.steps // 5)
    done = 0
    while done < args.steps:
        n = min(chunk, args.steps - done)
        trainer.train_steps(batches, n,
                            logging_func=lambda *a: print(
                                *a, file=sys.stderr, flush=True))
        done += n
        traj.append(dict(step=done, **holdout_metrics(f"step {done}")))
    train_s = time.perf_counter() - t0

    result = {
        "metric": f"{args.arch}_vocoder_holdout_fidelity",
        "arch": args.arch,
        "steps": args.steps,
        "train_seconds": round(train_s, 1),
        "holdout_mel_l1_untrained": traj[0]["holdout_mel_l1"],
        "holdout_mel_l1_final": traj[-1]["holdout_mel_l1"],
        "holdout_mrstft_final": traj[-1]["holdout_mrstft"],
        "trajectory": traj,
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
