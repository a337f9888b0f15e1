"""End-to-end waveform-level conversion quality on the attached chip.

The north-star protocol of the reference (preprocessing/MCD_calculate.py
:54-114) minus the unobtainable published checkpoints: run the WHOLE chain

  synthetic parallel wav corpus -> mel preprocessing -> VAE training ->
  iSTFT-vocoder training -> latent-swap conversion of HELD-OUT utterances
  -> vocoding -> waveform-level MCD (eval/mcd.evaluate_mcd_wav: WORLD
  analysis + exact DTW)

and report the DIRECTIONAL gate: MCD(converted, target-speaker parallel
rendition) must be smaller than MCD(converted, source utterance).  The
corpus is parallel by construction (utterance i shares its content —
pitch/amplitude modulation — across speakers; speakers differ in formant
envelope and base pitch), which is exactly the parallel-corpus assumption
MCD_calculate.py makes about VCC-style data.

Defaults follow the CI mel-quality gate's regime (latent 8 = 4+4 content
bottleneck, where conversion direction is deterministic at small corpus
scale); --latent 32 --fs_swap measures the reference geometry with the
FeatureSelection-masked swap.  CI-scale version of this gate:
tests/test_pipeline.py::TestE2EWaveformQuality.

Usage: python tools/quality_e2e.py [--epochs 400] [--voc_steps 300]
       [--latent 8|32] [--fs_swap] [--out out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dvc_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

FS = 16_000


def make_envelope(formants):
    def env(f):
        a = np.full_like(np.asarray(f, np.float64), 0.02)
        for c, w, g in formants:
            a = a + g * np.exp(-0.5 * ((np.asarray(f) - c) / w) ** 2)
        return a
    return env


SPEAKERS = {
    # (formants [(center_hz, width_hz, gain)], base f0).  The two spectral
    # envelopes concentrate energy in DISJOINT mel regions (low vs high)
    # so speaker identity is as separable in MCC space as the CI mel
    # gate's bump profiles are in mel space — the property that makes a
    # directional MCD gate meaningful at sub-VCTK training scale.
    "sa": ([(350.0, 140.0, 1.0), (700.0, 220.0, 0.6)], 130.0),
    "sb": ([(2400.0, 450.0, 1.0), (3600.0, 500.0, 0.6)], 215.0),
}


def utterance_wav(spk: str, utt: int, n: int) -> np.ndarray:
    """Parallel corpus: utterance `utt` draws its CONTENT (pitch/amplitude
    modulation) from a seed shared across speakers; the speaker supplies
    formant envelope + base pitch."""
    formants, f0_base = SPEAKERS[spk]
    env = make_envelope(formants)
    crng = np.random.RandomState(10_000 + utt)  # content, speaker-shared
    t = np.arange(n) / FS
    mod = np.zeros(n)
    for k in range(1, 4):
        mod += crng.randn() * np.sin(2 * np.pi * (0.8 + k) * t
                                     + crng.rand() * 6)
    mod = mod / max(1.0, np.abs(mod).max())
    f0 = f0_base * (1 + 0.06 * mod)
    amp = 0.6 + 0.25 * np.roll(mod, n // 5)
    ph = 2 * np.pi * np.cumsum(f0) / FS
    n_harm = int(7000 / f0_base)
    wav = np.zeros(n)
    for k in range(1, n_harm + 1):
        wav += float(env(k * f0_base)) * np.sin(k * ph + 0.7 * k)
    wav = amp * wav / max(1e-9, np.abs(wav).max())
    # crc32, not hash(): PYTHONHASHSEED salts hash() per process (ADVICE r4)
    wav += 0.003 * np.random.RandomState(
        99 * utt + zlib.crc32(spk.encode()) % 97).randn(n)
    return (0.7 * wav).astype(np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--voc_steps", type=int, default=300)
    ap.add_argument("--utts", type=int, default=10)
    ap.add_argument("--holdout", type=int, default=3)
    ap.add_argument("--wav_seconds", type=float, default=1.25)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--latent", type=int, default=8)
    ap.add_argument("--fs_swap", action="store_true")
    ap.add_argument("--fs_epochs", type=int, default=60)
    ap.add_argument("--fs_top_k", type=int, default=None,
                    help="cap the FS swap at the top-k highest-sigmoid "
                         "CONTENT dims (style always swaps) — selective "
                         "masks preserve source content; VERDICT r4 item 2")
    ap.add_argument("--analysis", default="native",
                    choices=["native", "device"])
    ap.add_argument("--out", default=None)
    ap.add_argument("--data_dir", default="/tmp/quality_e2e")
    args = ap.parse_args()

    import jax

    import dvc_tpu.config as C
    from dvc_tpu.convert.conversion import convert_mel
    from dvc_tpu.data.dataset import PairedMelDataset
    from dvc_tpu.eval.mcd import evaluate_mcd_wav
    from dvc_tpu.models.istft_vocoder import synthesize as istft_synth
    from dvc_tpu.ops.mel import melspectrogram
    from dvc_tpu.train.istft_vocoder_trainer import (
        ISTFTVocoderTrainer, mel_wav_batches)
    from dvc_tpu.train.trainer import Trainer
    from dvc_tpu.utils.wavio import write_wav
    import jax.numpy as jnp

    audio = C.AudioConfig()
    n = int(args.wav_seconds * FS)
    wav_dir = os.path.join(args.data_dir, "wav")
    mel_dir = os.path.join(args.data_dir, "mel")
    wavs, mels = {}, {}
    mel_jit = jax.jit(lambda w: melspectrogram(w, audio))
    for spk in SPEAKERS:
        os.makedirs(os.path.join(wav_dir, spk), exist_ok=True)
        os.makedirs(os.path.join(mel_dir, spk), exist_ok=True)
        for u in range(args.utts):
            w = utterance_wav(spk, u, n)
            wavs[(spk, u)] = w
            m = np.asarray(mel_jit(jnp.asarray(w)))
            mels[(spk, u)] = m
            write_wav(os.path.join(wav_dir, spk, f"{spk}_{u:03d}.wav"),
                      w, FS)
            if u >= args.holdout:  # train split only
                np.save(os.path.join(mel_dir, spk,
                                     f"{spk}_{u:03d}_mel.npy"), m)

    # --- VAE training (full-size arch, optional latent override) --------
    vae = C.VAEConfig(latent_dim=args.latent)
    cfg = C.Config(vae=vae,
                   train=C.TrainConfig(batch_size=args.batch_size,
                                       learning_rate=args.lr,
                                       seed=args.seed))
    ds = PairedMelDataset(mel_dir, samples_length=cfg.vae.frames,
                          seed=args.seed)
    tr = Trainer(cfg)
    t0 = time.perf_counter()
    for epoch in range(1, args.epochs + 1):
        totals = tr.train_epoch(ds, epoch)
        ds.shuffle_data()
        if epoch % max(1, args.epochs // 8) == 0:
            print(f"vae epoch {epoch}: recon/frame "
                  f"{totals['mse_x1'] / (80 * cfg.vae.frames):.4f}",
                  file=sys.stderr, flush=True)
    variables = {"params": tr.state.params,
                 "batch_stats": tr.state.batch_stats}

    fs_mask = None
    if args.fs_swap:
        from dvc_tpu.convert.conversion import binarize_fs_mask
        from dvc_tpu.train.feature_selection_trainer import (
            FeatureSelectionTrainer)
        fs_tr = FeatureSelectionTrainer(cfg.vae.latent_dim,
                                        num_spk=len(SPEAKERS))
        lat, lab = [], []
        for x1, _x2, spk in ds.batches(min(args.batch_size, len(ds)),
                                       shuffle=False):
            lat.append(fs_tr.encode_latents(tr.model, variables, x1))
            lab.append(spk)
        fs_tr.train(np.concatenate(lat), np.concatenate(lab),
                    epochs=args.fs_epochs,
                    logging_func=lambda s: print(s, file=sys.stderr))
        fs_mask = binarize_fs_mask(fs_tr.feature_mask(np.concatenate(lat)),
                                   cfg.vae.speaker_size,
                                   top_k=args.fs_top_k)

    # --- vocoder training (both speakers' train wavs) --------------------
    voc = ISTFTVocoderTrainer(audio=audio, seed=0)
    batches = mel_wav_batches(wav_dir, batch_size=4, crop_frames=32,
                              audio=audio, seed=0)
    losses = voc.train_steps(batches, args.voc_steps,
                             logging_func=lambda s: print(s, file=sys.stderr))
    voc_vars = {"params": voc.state.params}

    # --- convert held-out, vocode, waveform MCD --------------------------
    # Three layers of direction evidence, so a failure localizes:
    #   mel-level      — converted mel's mean profile vs per-speaker train
    #                    profiles (no vocoder, no WORLD analysis involved);
    #   vocoded-ref    — MCD against the REFERENCES RENDERED THROUGH THE
    #                    SAME VOCODER: its spectral coloration is
    #                    common-mode and cancels;
    #   natural-ref    — the reference protocol (MCD_calculate.py), where
    #                    vocoder fidelity is part of what's measured.
    rows, margins, vmargins = [], [], []
    gen_dir = os.path.join(args.data_dir, "generation")
    os.makedirs(gen_dir, exist_ok=True)

    prof = {s: np.mean([mels[(s, u)].mean(axis=1)
                        for u in range(args.holdout, args.utts)], axis=0)
            for s in SPEAKERS}

    def vocode(mel):
        return np.asarray(istft_synth(voc.model, voc_vars,
                                      jnp.asarray(mel)[None]))[0]

    def traj(m):
        x = np.asarray(m).mean(axis=0)
        return (x - x.mean()) / max(x.std(), 1e-9)

    conv_wavs, conv_mels, src_refs, trg_refs, keys = [], [], [], [], []
    vsrc_refs, vtrg_refs, vctrl_refs, ctrl_refs, mel_dirn = [], [], [], [], []
    for src, trg in (("sa", "sb"), ("sb", "sa")):
        for u in range(args.holdout):
            src_mel = mels[(src, u)]
            trg_mel = mels[(trg, args.holdout)]  # a TRAIN utt of target
            _, conv = convert_mel(tr.model, variables, src_mel, trg_mel,
                                  frames=cfg.vae.frames, fs_mask=fs_mask)
            p = np.asarray(conv).mean(axis=1)
            mel_dirn.append(bool(np.linalg.norm(p - prof[trg])
                                 < np.linalg.norm(p - prof[src])))
            w = vocode(conv)
            conv_wavs.append(w)
            conv_mels.append(np.asarray(conv))
            keys.append((src, trg, u))
            src_refs.append(wavs[(src, u)])
            trg_refs.append(wavs[(trg, u)])  # parallel rendition
            vsrc_refs.append(vocode(mels[(src, u)]))
            vtrg_refs.append(vocode(mels[(trg, u)]))
            # content-MISMATCHED control: same target speaker, different
            # content (utterance holdout+1); natural + vocoded renderings
            ctrl_refs.append(wavs[(trg, args.holdout + 1)])
            vctrl_refs.append(vocode(mels[(trg, args.holdout + 1)]))
            write_wav(os.path.join(gen_dir,
                                   f"convert_{src}_to_{trg}_{u:03d}.wav"),
                      w, FS)
    mcd_trg = evaluate_mcd_wav(trg_refs, conv_wavs, FS,
                               analysis=args.analysis)
    mcd_src = evaluate_mcd_wav(src_refs, conv_wavs, FS,
                               analysis=args.analysis)
    vmcd_trg = evaluate_mcd_wav(vtrg_refs, conv_wavs, FS,
                                analysis=args.analysis)
    vmcd_src = evaluate_mcd_wav(vsrc_refs, conv_wavs, FS,
                                analysis=args.analysis)
    # content-preservation margins (VERDICT r4 item 2), three controls:
    #   natural  — MCD(parallel, mismatched-target-utt) - MCD(parallel,
    #              converted): the verdict's literal formula; vocoder
    #              fidelity is part of what's measured;
    #   vocoded  — both sides rendered through the SAME vocoder, so its
    #              coloration cancels and only content differs;
    #   cross    — MCD(parallel_u, conv of a DIFFERENT source utterance):
    #              a content-free drone scores ~0 here by construction.
    mcd_ctrl_nat = evaluate_mcd_wav(trg_refs, ctrl_refs, FS,
                                    analysis=args.analysis)
    mcd_ctrl_voc = evaluate_mcd_wav(vtrg_refs, vctrl_refs, FS,
                                    analysis=args.analysis)
    cross_conv = []
    for (src, trg, u) in keys:
        alt = [j for j, (s2, t2, u2) in enumerate(keys)
               if s2 == src and t2 == trg and u2 != u]
        cross_conv.append(conv_wavs[alt[0]])
    mcd_cross = evaluate_mcd_wav(trg_refs, cross_conv, FS,
                                 analysis=args.analysis)
    cmargins_nat = [c - t for t, c in zip(mcd_trg, mcd_ctrl_nat)]
    cmargins_voc = [c - t for t, c in zip(mcd_trg, mcd_ctrl_voc)]
    cmargins_cross = [x - t for t, x in zip(mcd_trg, mcd_cross)]
    # content sensitivity (the VALIDATED content metric — see
    # tests/test_pipeline.py::TestE2EWaveformQuality for why the MCD
    # controls above are diagnostics, not gates: the content-perfect
    # profile-transfer oracle itself loses them): per conversion
    # direction, mean|conv(u0)-conv(u1)| / mean|src_u0-src_u1|.
    # 1.0 = content preserved (profile-transfer oracle), 0 = drone.
    from dvc_tpu.convert.conversion import (
        content_sensitivity, profile_transfer_mel)
    sens_conv, sens_oracle = {}, {}
    for src, trg in (("sa", "sb"), ("sb", "sa")):
        idx = [j for j, (s2, t2, _u) in enumerate(keys)
               if s2 == src and t2 == trg][:2]
        srcs = [mels[(src, keys[j][2])] for j in idx]
        sens_conv[f"{src}->{trg}"] = round(content_sensitivity(
            [conv_mels[j] for j in idx], srcs), 4)
        pt = [profile_transfer_mel(m, prof[src], prof[trg]) for m in srcs]
        sens_oracle[f"{src}->{trg}"] = round(content_sensitivity(
            [np.asarray(melspectrogram(jnp.asarray(vocode(m)), audio))
             for m in pt], srcs), 4)

    tcorr_own, tcorr_cross = [], []
    for i, (src, trg, u) in enumerate(keys):
        tsrc = mels[(src, u)]
        tlen = tsrc.shape[1]
        tcorr_own.append(float(np.corrcoef(
            traj(conv_mels[i][:, :tlen]), traj(tsrc))[0, 1]))
        u2 = args.holdout + 1
        tlen2 = min(tlen, mels[(trg, u2)].shape[1])
        tcorr_cross.append(float(np.corrcoef(
            traj(conv_mels[i][:, :tlen2]),
            traj(mels[(trg, u2)][:, :tlen2]))[0, 1]))
    for i, (a, b) in enumerate(zip(mcd_trg, mcd_src)):
        margins.append(b - a)
        vmargins.append(vmcd_src[i] - vmcd_trg[i])
        rows.append({"utt": i, "mcd_to_target": round(a, 3),
                     "mcd_to_source": round(b, 3),
                     "vocoded_ref_mcd_to_target": round(vmcd_trg[i], 3),
                     "vocoded_ref_mcd_to_source": round(vmcd_src[i], 3),
                     "mcd_ctrl_natural": round(mcd_ctrl_nat[i], 3),
                     "mcd_ctrl_vocoded": round(mcd_ctrl_voc[i], 3),
                     "mcd_cross_converted": round(mcd_cross[i], 3),
                     "traj_corr_own": round(tcorr_own[i], 3),
                     "traj_corr_cross": round(tcorr_cross[i], 3),
                     "mel_level_toward_target": mel_dirn[i]})

    def frac(ms):
        return f"{sum(1 for m in ms if m > 0)}/{len(ms)}"

    result = {
        "metric": "e2e_waveform_mcd_direction",
        "latent": args.latent,
        "fs_swap": bool(args.fs_swap),
        "n_dims_swapped": (int(fs_mask.sum()) if fs_mask is not None
                           else cfg.vae.speaker_size),
        "fs_top_k": args.fs_top_k,
        "epochs": args.epochs,
        "voc_steps": args.voc_steps,
        "voc_final_loss": round(float(np.mean(losses[-20:])), 4),
        "train_seconds": round(time.perf_counter() - t0, 1),
        "mel_level_toward_target": f"{sum(mel_dirn)}/{len(mel_dirn)}",
        "pairs_toward_target": frac(margins),
        "mean_mcd_margin_db": round(float(np.mean(margins)), 3),
        "vocoded_ref_toward_target": frac(vmargins),
        "vocoded_ref_mean_margin_db": round(float(np.mean(vmargins)), 3),
        "mean_mcd_to_target_db": round(float(np.mean(mcd_trg)), 3),
        "content_preserved_natural": frac(cmargins_nat),
        "content_margin_natural_db": round(float(np.mean(cmargins_nat)), 3),
        "content_preserved_vocoded": frac(cmargins_voc),
        "content_margin_vocoded_db": round(float(np.mean(cmargins_voc)), 3),
        "content_preserved_cross": frac(cmargins_cross),
        "content_margin_cross_db": round(float(np.mean(cmargins_cross)), 3),
        "mean_traj_corr_own": round(float(np.mean(tcorr_own)), 3),
        "mean_traj_corr_cross": round(float(np.mean(tcorr_cross)), 3),
        "content_sensitivity_conv": sens_conv,
        "content_sensitivity_oracle_roundtrip": sens_oracle,
        "pairs": rows,
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
