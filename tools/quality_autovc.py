"""AutoVC baseline trained-to-quality measurement on the attached chip.

Trains the original-AutoVC generator (models/autovc.py — reference
autovc_replicate/original_autovc.py, which ships with NO trainer) on
synthetic profile-speakers with one-hot conditioning codes and measures
held-out conversion quality: reconstruction L1 and the style-direction
margin (profile distance of model(x_src, c_src, c_trg) to the TARGET
speaker's defining profile vs the SOURCE's).

Unlike the group-VAE (tools/quality_full_size.py), AutoVC's conversion is
EXPLICITLY conditioned on the target code, so the direction margin should
turn positive at toy scale once the decoder learns the code table — this
tool demonstrates that trained loop end to end on the chip.

Usage: python tools/quality_autovc.py [--epochs 300] [--out out.json]
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
    p = np.asarray(mel).mean(axis=-1) if mel.shape[0] == 80 \
        else np.asarray(mel).mean(axis=0)
    p = p / max(p.sum(), 1e-9)
    bins = np.arange(80)
    ref = np.exp(-0.5 * ((bins - center) / 9.0) ** 2)
    ref = ref / ref.sum()
    return float(np.sqrt(((p - ref) ** 2).sum()))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--utts", type=int, default=12)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--data_dir", default="/tmp/quality_autovc")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dvc_tpu.config import AutoVCConfig
    from dvc_tpu.data.dataset import PairedMelDataset
    from dvc_tpu.train.autovc_trainer import (
        create_autovc_state,
        make_autovc_step,
    )

    rng = np.random.RandomState(0)
    for spk, center in CENTERS.items():
        d = os.path.join(args.data_dir, spk)
        os.makedirs(d, exist_ok=True)
        for i in range(args.utts):
            t = 64 + int(rng.rand() * 32)
            np.save(os.path.join(d, f"{spk}_{i:03d}_mel.npy"),
                    synth_mel(center, rng, t))

    frames = 64
    ds = PairedMelDataset(args.data_dir, samples_length=frames,
                          seed=args.seed)
    acfg = AutoVCConfig()
    emb_table = np.zeros((len(ds.speaker_ids), acfg.dim_emb), np.float32)
    for si in range(len(ds.speaker_ids)):
        emb_table[si, si % acfg.dim_emb] = 1.0

    model, state, optimizer = create_autovc_state(
        jax.random.PRNGKey(args.seed), acfg, lr=args.lr, frames=frames)
    step = make_autovc_step(model, optimizer)

    t0 = time.perf_counter()
    last = 0.0
    for epoch in range(1, args.epochs + 1):
        total = n = 0.0
        for x1, _x2, spk in ds.batches(args.batch_size):
            x = jnp.asarray(np.transpose(x1, (0, 2, 1)))  # (B, T, 80)
            emb = jnp.asarray(emb_table[np.asarray(spk)])
            state, loss, _lr, _lc = step(state, x, emb)
            total += float(loss)
            n += 1
        ds.shuffle_data()
        last = total / max(n, 1)
        if epoch % max(1, args.epochs // 10) == 0:
            print(f"epoch {epoch}: loss {last:.4f}", file=sys.stderr,
                  flush=True)
    train_s = time.perf_counter() - t0

    spk_order = [str(s) for s in ds.speaker_ids]
    hold = np.random.RandomState(100)
    held = {s: synth_mel(c, hold, frames) for s, c in CENTERS.items()}

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    margins, recon_l1s, rows = [], [], []
    for src_s, src_c in CENTERS.items():
        x = jnp.asarray(held[src_s].T[None])  # (1, T, 80)
        c_src = jnp.asarray(emb_table[spk_order.index(src_s)][None])
        _, recon, _ = model.apply(variables, x, c_src, c_src, train=False)
        rl1 = float(np.mean(np.abs(np.asarray(recon)[0].T - held[src_s])))
        recon_l1s.append(rl1)
        for trg_s, trg_c in CENTERS.items():
            if trg_s == src_s:
                continue
            c_trg = jnp.asarray(emb_table[spk_order.index(trg_s)][None])
            _, conv, _ = model.apply(variables, x, c_src, c_trg, train=False)
            conv = np.asarray(conv)[0].T  # (80, T)
            d_trg = profile_dist(conv, trg_c)
            d_src = profile_dist(conv, src_c)
            margins.append(d_src - d_trg)
            rows.append({"pair": f"{src_s}->{trg_s}",
                         "d_target": round(d_trg, 4),
                         "d_source": round(d_src, 4)})

    toward = sum(1 for m in margins if m > 0)
    result = {
        "metric": "autovc_conversion_quality",
        "epochs": args.epochs,
        "final_loss": round(last, 4),
        "train_seconds": round(train_s, 1),
        "holdout_recon_l1_mean": round(float(np.mean(recon_l1s)), 4),
        "pairs_toward_target": f"{toward}/{len(margins)}",
        "mean_direction_margin": round(float(np.mean(margins)), 4),
        "pairs": rows,
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
