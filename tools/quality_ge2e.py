"""GE2E speaker-encoder trained-to-EER measurement on the attached chip.

Trains the FULL reference-geometry encoder (3x LSTM-256, 64 speakers x 10
utterances per step — encoder/params_model.py, encoder/train.py) on a
synthetic multi-speaker corpus and reports the held-out verification EER
(eval/eer.verification_eer — all-pairs cosine scoring), i.e. the quality
number the reference only ever logs per training batch
(encoder/model.py:129-137).

Synthetic speakers are random smooth spectral profiles with shared
noise/content statistics; distinct profiles make speaker identity learnable
while random utterance content keeps the task non-trivial.

Usage: python tools/quality_ge2e.py [--steps 400] [--speakers 20]
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


def speaker_profiles(n: int, rng) -> list:
    """n distinct 3-bump spectral profiles: center triples are drawn
    WITHOUT replacement from a 16-point grid, so every speaker pair differs
    in at least one formant position (unseparable-profile collisions were
    making batch EER fluctuate 0.00-0.22 on crop luck)."""
    from itertools import combinations

    grid = np.linspace(6, 74, 16)
    triples = list(combinations(range(16), 3))
    rng.shuffle(triples)
    bins = np.arange(80)
    profs = []
    for t3 in triples[:n]:
        prof = np.zeros(80)
        for j, gi in enumerate(t3):
            a = 0.5 + 0.5 * rng.rand()
            prof += a * np.exp(-0.5 * ((bins - grid[gi]) / 5.0) ** 2)
        profs.append(prof / max(prof.max(), 1e-9))
    return profs


def utterance(prof: np.ndarray, rng, t: int = 180) -> np.ndarray:
    tt = np.linspace(0, 1, t)
    content = np.zeros(t)
    for k in range(1, 5):
        content += rng.randn() * np.sin(2 * np.pi * k * tt + rng.rand() * 6)
    content = 0.5 + 0.2 * content / max(1.0, np.abs(content).max())
    mel = prof[:, None] * content[None, :] + 0.08 * rng.rand(80, t)
    return np.clip(mel, 0.0, 1.0).astype(np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--speakers", type=int, default=20)
    ap.add_argument("--train_utts", type=int, default=12)
    ap.add_argument("--eval_utts", type=int, default=6)
    ap.add_argument("--out", default=None)
    ap.add_argument("--data_dir", default="/tmp/quality_ge2e")
    args = ap.parse_args()

    from dvc_tpu.config import SpeakerEncoderConfig
    from dvc_tpu.data.speaker_dataset import SpeakerVerificationSampler
    from dvc_tpu.eval.eer import verification_eer
    from dvc_tpu.models.speaker_inference import SpeakerEmbedder
    from dvc_tpu.train.speaker_trainer import SpeakerEncoderTrainer

    rng = np.random.RandomState(0)
    profiles = speaker_profiles(args.speakers, rng)
    eval_mels, eval_ids = [], []
    for s in range(args.speakers):
        prof = profiles[s]
        d = os.path.join(args.data_dir, f"spk{s:03d}")
        os.makedirs(d, exist_ok=True)
        for u in range(args.train_utts):
            np.save(os.path.join(d, f"u{u:03d}.npy"), utterance(prof, rng))
        for _ in range(args.eval_utts):  # held out — never written to disk
            eval_mels.append(utterance(prof, rng))
            eval_ids.append(s)

    cfg = SpeakerEncoderConfig(
        speakers_per_batch=min(args.speakers, 64),
        utterances_per_speaker=10)
    sampler = SpeakerVerificationSampler(
        args.data_dir, cfg.speakers_per_batch, cfg.utterances_per_speaker,
        cfg.partials_n_frames, seed=0)
    trainer = SpeakerEncoderTrainer(cfg, models_dir=os.path.join(
        args.data_dir, "models"))
    embedder = SpeakerEmbedder(cfg)
    ids_a = np.asarray(eval_ids)

    def holdout_eer(params) -> float:
        """Mean-of-partials embedding straight from mel frames (the
        50%-overlap partials of embed_utterance, minus its wav->mel step —
        these synthetic utterances exist only as mels)."""
        embedder.load(params)
        win = cfg.partials_n_frames
        out = []
        for mel in eval_mels:
            frames = mel.T  # (T, n_mels)
            starts = list(range(0, max(1, frames.shape[0] - win + 1),
                                max(1, win // 2)))
            batch = np.stack([frames[s:s + win] for s in starts])
            raw = embedder.embed_frames_batch(batch).mean(axis=0)
            out.append(raw / max(np.linalg.norm(raw, 2), 1e-9))
        return float(verification_eer(np.stack(out), ids_a))

    # periodic holdout evaluation: on a saturated toy corpus (every batch
    # contains every speaker) the loss ORBITS the optimum once margins are
    # large, so the trajectory — not just the final point — is the artifact
    t0 = time.perf_counter()
    chunk = max(1, args.steps // 8)
    traj = [{"step": 0, "eer": round(holdout_eer(trainer.state.params), 4)}]
    while int(trainer.state.step) < args.steps:
        trainer.train(sampler,
                      n_steps=min(chunk, args.steps - int(trainer.state.step)),
                      save_every=0, backup_every=0, log_every=chunk,
                      logging_func=lambda *a: print(*a, file=sys.stderr,
                                                    flush=True))
        traj.append({"step": int(trainer.state.step),
                     "eer": round(holdout_eer(trainer.state.params), 4)})
    train_s = time.perf_counter() - t0

    result = {
        "metric": "ge2e_holdout_verification_eer",
        "geometry": (f"{cfg.speakers_per_batch}x{cfg.utterances_per_speaker}"
                     f" lstm{cfg.hidden_size}x{cfg.num_layers}"),
        "steps": args.steps,
        "speakers": args.speakers,
        "train_seconds": round(train_s, 1),
        "holdout_eer_final": traj[-1]["eer"],
        "holdout_eer_best": min(t["eer"] for t in traj[1:]),
        "holdout_eer_untrained": traj[0]["eer"],
        "holdout_trials": len(eval_ids),
        "trajectory": traj,
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
