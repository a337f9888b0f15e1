"""Full-size trained-conversion quality measurement on the attached chip.

The CI gate (tests/test_pipeline.py::TestMelConversionQuality) pins a
SHRUNKEN architecture because a 1-core CPU host cannot compile/train the
full model in test time.  This tool runs the same protocol at the FULL
flagship architecture (frames=64, 512-ch convs, latent 32 = 4 style + 28
content — reference training.sh:1-13) on the real accelerator and reports
the honest numbers:

  * converged reconstruction L1;
  * style-direction margin: profile distance of the converted mel to the
    TARGET speaker's defining profile vs the SOURCE speaker's, for every
    ordered speaker pair (the conversion contract of reference
    model/variational_base_vae.py:243-330).

Synthetic speakers are spectral-bump profiles with random smooth content
(same construction as the CI gate).  With the full 28 content dims a small
corpus lets identity leak through content — the reference counters this
with 200k epochs on VCTK, which no bench-scale run reproduces — so this
tool REPORTS the measured margin rather than asserting a bar; the pinned
CI gate is the regression guard.

Usage: python tools/quality_full_size.py [--epochs 600] [--out out.json]
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

CENTERS = {"s0": 14.0, "s1": 33.0, "s2": 52.0, "s3": 70.0}


def synth_mel(style_center: float, rng, t: int) -> np.ndarray:
    bins = np.arange(80)
    style = np.exp(-0.5 * ((bins - style_center) / 9.0) ** 2)
    tt = np.linspace(0, 1, t)
    content = np.zeros(t)
    for k in range(1, 4):
        content += rng.randn() * np.sin(2 * np.pi * k * tt + rng.rand() * 6)
    content = 0.5 + 0.25 * content / max(1.0, np.abs(content).max())
    mel = style[:, None] * content[None, :] + 0.02 * rng.rand(80, t)
    return np.clip(mel, 0.0, 1.0).astype(np.float32)


def profile_dist(mel: np.ndarray, center: float) -> float:
    p = np.asarray(mel).mean(axis=1)
    p = p / max(p.sum(), 1e-9)
    bins = np.arange(80)
    ref = np.exp(-0.5 * ((bins - center) / 9.0) ** 2)
    ref = ref / ref.sum()
    return float(np.sqrt(((p - ref) ** 2).sum()))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=600)
    ap.add_argument("--utts", type=int, default=12)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--latent", type=int, default=None,
                    help="override latent_dim (keep full-size everything "
                         "else); the reference's 32=4+28 leaks identity "
                         "through content at toy-corpus scale — latent "
                         "8=4+4 is the bottleneck the CI gate pins")
    ap.add_argument("--out", default=None)
    ap.add_argument("--data_dir", default="/tmp/quality_full_size")
    args = ap.parse_args()

    import dvc_tpu.config as C
    from dvc_tpu.convert.conversion import convert_mel
    from dvc_tpu.data.dataset import PairedMelDataset
    from dvc_tpu.train.trainer import Trainer

    rng = np.random.RandomState(0)
    os.makedirs(args.data_dir, exist_ok=True)
    for spk, center in CENTERS.items():
        d = os.path.join(args.data_dir, spk)
        os.makedirs(d, exist_ok=True)
        for i in range(args.utts):
            t = 64 + int(rng.rand() * 32)
            np.save(os.path.join(d, f"{spk}_{i:03d}_mel.npy"),
                    synth_mel(center, rng, t))

    # FULL flagship architecture: every dim at the reference's value
    # (optionally a narrower latent — see --latent help)
    vae = C.VAEConfig() if args.latent is None \
        else C.VAEConfig(latent_dim=args.latent)
    cfg = C.Config(vae=vae,
                   train=C.TrainConfig(batch_size=args.batch_size,
                                       learning_rate=args.lr,
                                       seed=args.seed))
    ds = PairedMelDataset(args.data_dir, samples_length=cfg.vae.frames,
                          seed=args.seed)
    tr = Trainer(cfg)
    t0 = time.perf_counter()
    totals = {}
    for epoch in range(1, args.epochs + 1):
        totals = tr.train_epoch(ds, epoch)
        ds.shuffle_data()
        if epoch % max(1, args.epochs // 10) == 0:
            print(f"epoch {epoch}: recon/frame "
                  f"{totals['mse_x1'] / (80 * cfg.vae.frames):.4f}",
                  file=sys.stderr, flush=True)
    train_s = time.perf_counter() - t0

    variables = {"params": tr.state.params,
                 "batch_stats": tr.state.batch_stats}
    hold = np.random.RandomState(100)
    held = {s: synth_mel(c, hold, 72) for s, c in CENTERS.items()}

    recon_l1s, margins, pair_rows = [], [], []
    for src_s, src_c in CENTERS.items():
        for trg_s, trg_c in CENTERS.items():
            if src_s == trg_s:
                continue
            recons, converted = convert_mel(tr.model, variables,
                                            held[src_s], held[trg_s],
                                            frames=cfg.vae.frames)
            rl1 = float(np.mean(np.abs(
                np.asarray(recons)[:, :held[src_s].shape[1]] - held[src_s])))
            d_trg = profile_dist(converted, trg_c)
            d_src = profile_dist(converted, src_c)
            recon_l1s.append(rl1)
            margins.append(d_src - d_trg)
            pair_rows.append({"pair": f"{src_s}->{trg_s}",
                              "d_target": round(d_trg, 4),
                              "d_source": round(d_src, 4),
                              "recon_l1": round(rl1, 4)})

    toward = sum(1 for m in margins if m > 0)
    result = {
        "metric": "full_size_mel_conversion_quality",
        "architecture": (f"frames=64 enc512 latent{cfg.vae.latent_dim}"
                         f"({cfg.vae.speaker_size}+"
                         f"{cfg.vae.latent_dim - cfg.vae.speaker_size})"),
        "epochs": args.epochs,
        "train_seconds": round(train_s, 1),
        "final_recon_per_frame": round(
            totals["mse_x1"] / (80 * cfg.vae.frames), 4),
        "holdout_recon_l1_mean": round(float(np.mean(recon_l1s)), 4),
        "pairs_toward_target": f"{toward}/{len(margins)}",
        "mean_direction_margin": round(float(np.mean(margins)), 4),
        "pairs": pair_rows,
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
