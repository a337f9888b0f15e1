"""Unified CLI: preprocess / train / convert / eval-mcd subcommands.

Mirrors the reference's three entry points (preprocessing.sh -> preprocess,
training.sh -> train, conversion.sh -> convert, MCD_calculate.py -> eval-mcd)
with the same canonical hyperparameter defaults (training.sh:1-13:
batch 8, lr 1e-4, latent 32, speaker 4, 200k epochs).  The reference's
`--train`/`--convert` bool-typed flags (train.py:70-71, where any non-empty
string means True) are replaced by subcommands.

Usage:
  python -m dvc_tpu.cli.run preprocess <datasets_root> -o <out_dir> -d VCTK [--trim]
  python -m dvc_tpu.cli.run train --dataset_fp <mel_dir> --log_dir ./results ...
  python -m dvc_tpu.cli.run convert --dataset_fp <mel_dir> --src_spk A --trg_spk B ...
  python -m dvc_tpu.cli.run eval-mcd --src_dir <wavs> --cvt_dir <wavs> ...
"""

from __future__ import annotations

import argparse
import os
import sys


def _add_train_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--dataset_fp", required=True)
    p.add_argument("--log_dir", default="./results")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--epochs", type=int, default=200_000)
    p.add_argument("--latent-size", type=int, default=32)
    p.add_argument("--speaker_size", type=int, default=4)
    p.add_argument("--samples_length", type=int, default=None,
                   help="crop length in frames (default: 64 for mel, 128 "
                        "for the WORLD-MCC path, the reference values)")
    p.add_argument("--report-interval", type=int, default=50)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--mse_cof", type=float, default=10.0)
    p.add_argument("--kl_cof", type=float, default=10.0)
    p.add_argument("--style_cof", type=float, default=0.1)
    p.add_argument("--beta_cof", type=float, default=0.1)
    p.add_argument("--adv_cof", type=float, default=0.0,
                   help="weight of the gradient-reversal speaker-classifier "
                        "CE on the content latent (train/adversarial.py) — "
                        "an additive regularizer against identity leaking "
                        "into the content dims; 0 (default) keeps the "
                        "reference objective exactly")
    p.add_argument("--adv_lr", type=float, default=1e-3)
    p.add_argument("--adv_mode", default="confusion",
                   choices=["confusion", "grl"],
                   help="adversarial formulation (confusion is "
                        "non-saturating; see train/adversarial.py)")
    p.add_argument("--compute-dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--checkpoint-format", default="msgpack",
                   choices=["msgpack", "orbax"])
    p.add_argument("--features", default="mel", choices=["mel", "mcc"],
                   help="mel: mel-spectrogram VAE (reference's active path); "
                        "mcc: WORLD-MCC VAE (SpeechDatasetMCC2, the "
                        "reference's commented alternative, train.py:52)")
    p.add_argument("--num_mcep", type=int, default=36)
    p.add_argument("--do-not-resume", action="store_true")


def _config_from_args(args) -> "Config":
    from dvc_tpu import config as C
    num_mels = 80
    if getattr(args, "features", "mel") == "mcc":
        num_mels = args.num_mcep
    if getattr(args, "samples_length", None) is None:
        # reference defaults: 64-frame mel crops (train.py:53), 128-frame
        # MCC crops (SpeechDatasetMCC2) — keeping train and convert-world
        # geometry consistent without explicit flags
        args.samples_length = 128 if getattr(args, "features", "mel") == "mcc" \
            else 64
    vae = C.VAEConfig(latent_dim=args.latent_size, speaker_size=args.speaker_size,
                      frames=args.samples_length, num_mels=num_mels)
    loss = C.LossConfig(mse_cof=args.mse_cof, kl_cof=args.kl_cof,
                        style_cof=args.style_cof, beta_cof=args.beta_cof,
                        adv_cof=getattr(args, "adv_cof", 0.0),
                        adv_lr=getattr(args, "adv_lr", 1e-3),
                        adv_mode=getattr(args, "adv_mode", "confusion"))
    train = C.TrainConfig(batch_size=args.batch_size, learning_rate=args.lr,
                          epochs=args.epochs, report_interval=args.report_interval,
                          seed=args.seed, samples_length=args.samples_length,
                          compute_dtype=args.compute_dtype,
                          checkpoint_format=getattr(args, "checkpoint_format",
                                                    "msgpack"))
    return C.Config(vae=vae, loss=loss, train=train)


def cmd_preprocess(args) -> int:
    from dvc_tpu.data.preprocess import preprocess_dataset
    stats = preprocess_dataset(args.datasets_root, args.out_dir, args.dataset,
                               skip_existing=args.skip_existing,
                               trim=not args.no_trim)
    print(f"preprocessed {stats.n_files} files ({stats.n_frames} mel frames), "
          f"skipped {stats.n_skipped}")
    return 0


def cmd_train(args) -> int:
    from dvc_tpu.data.dataset import PairedMCCDataset, PairedMelDataset
    from dvc_tpu.train.trainer import Trainer

    cfg = _config_from_args(args)
    ds_cls = PairedMCCDataset if args.features == "mcc" else PairedMelDataset
    dataset = ds_cls(args.dataset_fp, samples_length=args.samples_length,
                     seed=args.seed)
    if cfg.loss.adv_cof > 0:
        # the adversary needs the corpus speaker count (classifier width)
        import dataclasses as _dc
        cfg = cfg.replace(loss=_dc.replace(
            cfg.loss, adv_speakers=len(dataset.speaker_ids)))
    os.makedirs(args.log_dir, exist_ok=True)
    with open(os.path.join(args.log_dir, "config.json"), "w") as f:
        f.write(cfg.to_json())

    trainer = Trainer(cfg,
                      checkpoints_path=os.path.join(args.log_dir, "checkpoints"),
                      logs_path=os.path.join(args.log_dir, "logs"),
                      estimation_dir=os.path.join(args.log_dir, "images",
                                                  "estimation"))
    trainer.run_training(dataset, args.epochs,
                         report_interval=args.report_interval,
                         reload_model=not args.do_not_resume)
    return 0


def _make_cli_vocoder(args, cfg):
    """Shared vocoder selection: --vocoder istft needs --vocoder_ckpt; a
    bare --vocoder_ckpt means the (auto-converted) WaveNet; griffinlim is
    the checkpoint-free default; none disables waveform output."""
    if getattr(args, "vocoder", "") == "istft":
        if not args.vocoder_ckpt:
            raise SystemExit("--vocoder istft needs --vocoder_ckpt")
        from dvc_tpu.convert.vocode import make_istft_vocoder
        return make_istft_vocoder(args.vocoder_ckpt, audio=cfg.audio)
    if args.vocoder_ckpt:
        from dvc_tpu.convert.vocode import make_vocoder
        return make_vocoder(args.vocoder_ckpt)
    if args.vocoder == "griffinlim":
        from dvc_tpu.convert.griffinlim import make_griffinlim_vocoder
        return make_griffinlim_vocoder(cfg.audio, n_iter=args.gl_iters)
    return None


def _load_fs_mask(args, cfg):
    """--fs_mask feature_mask.npz (train-fs output) -> (raw sigmoid mask,
    binary swap mask), or (None, None) when the flag is absent."""
    if not getattr(args, "fs_mask", ""):
        return None, None
    import numpy as np

    from dvc_tpu.convert.conversion import binarize_fs_mask
    loaded = np.load(args.fs_mask)
    raw = loaded["mask"] if hasattr(loaded, "files") else loaded
    if raw.shape != (cfg.vae.latent_dim,):
        raise SystemExit(
            f"--fs_mask shape {raw.shape} != latent_dim "
            f"({cfg.vae.latent_dim},) — was train-fs run on this model?")
    fs_mask = binarize_fs_mask(raw, cfg.vae.speaker_size,
                               args.fs_threshold,
                               top_k=getattr(args, "fs_top_k", None))
    print(f"FS-masked swap: {int(fs_mask.sum())}/{len(fs_mask)} dims "
          f"{np.where(fs_mask > 0)[0].tolist()}")
    return raw, fs_mask


def cmd_convert(args) -> int:
    import jax
    from dvc_tpu.convert.conversion import VoiceConverter
    from dvc_tpu.train.trainer import Trainer

    cfg = _config_from_args(args)
    if args.profile_transfer:
        # model-free DSP conversion (profile_transfer_mel): no checkpoint
        # to load; --analyze still needs the model, so reject the combo
        if getattr(args, "analyze", False):
            raise SystemExit("--analyze needs a trained model; drop it or "
                             "drop --profile_transfer")
        model, variables = None, None
    else:
        trainer = Trainer(cfg, checkpoints_path=os.path.join(
            args.log_dir, "checkpoints"))
        epoch = trainer.load_last(require=True)
        print(f"loaded checkpoint at epoch {epoch - 1}")
        model = trainer.model
        variables = {"params": trainer.state.params,
                     "batch_stats": trainer.state.batch_stats}

    vocoder = _make_cli_vocoder(args, cfg)

    raw, fs_mask = _load_fs_mask(args, cfg)

    converter = VoiceConverter(cfg, model, variables, seed=args.seed,
                               long_context=args.long_context,
                               fs_mask=fs_mask,
                               profile_transfer=args.profile_transfer)
    gen_dir = os.path.join(args.log_dir, "generation")
    converter.convert_speaker_pair(
        args.dataset_fp, args.src_spk, args.trg_spk, gen_dir,
        num_utterances=args.num_utterances, vocoder=vocoder)

    if getattr(args, "analyze", False):
        # latent-analysis artifacts (reference model/plot.py:23-55 computes
        # this figure but no entry point ever calls it): per-speaker latent
        # mean/std errorbars + npz, and the FS mask when one is loaded
        import numpy as np
        from glob import glob as _glob

        import jax.numpy as jnp

        from dvc_tpu.ops.chunk import chunk_mel
        from dvc_tpu.utils.plotting import plot_fs_mask, plot_latent_analysis

        mus, stds, spk_ids = [], [], []
        for spk_dir in sorted(_glob(os.path.join(args.dataset_fp, "*"))):
            if not os.path.isdir(spk_dir):
                continue
            fps = sorted(_glob(os.path.join(spk_dir, "*.npy")))[:16]
            if not fps:
                continue
            chunks = jnp.concatenate(
                [chunk_mel(jnp.asarray(np.load(fp), jnp.float32),
                           cfg.vae.frames) for fp in fps], axis=0)
            smu, _, cmu, _ = trainer.model.apply(variables, chunks,
                                                 method="encode")
            lat = np.asarray(jnp.concatenate([smu, cmu], axis=-1))
            mus.append(lat.mean(0))
            stds.append(lat.std(0))
            spk_ids.append(os.path.basename(spk_dir))
        os.makedirs(gen_dir, exist_ok=True)
        plot_latent_analysis(np.stack(mus), np.stack(stds), spk_ids,
                             os.path.join(gen_dir, "latent_analysis.png"),
                             os.path.join(gen_dir, "latent_analysis.npz"))
        if fs_mask is not None:
            plot_fs_mask(raw, os.path.join(gen_dir, "fs_mask.png"),
                         args.fs_threshold, cfg.vae.speaker_size)
            np.savez(os.path.join(gen_dir, "fs_mask.npz"),
                     sigmoid_mask=raw, binary_mask=fs_mask)
        print(f"latent analysis artifacts -> {gen_dir}")
    return 0


def cmd_train_autovc(args) -> int:
    """AutoVC baseline training (reference ships the models,
    autovc_replicate/, with no runnable trainer — additive completion:
    reconstruction + content-consistency objective of Qian et al. 2019,
    conditioned on GE2E embeddings or a one-hot bootstrap code)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import serialization

    from dvc_tpu.config import AutoVCConfig, SpeakerEncoderConfig
    from dvc_tpu.data.dataset import PairedMelDataset
    from dvc_tpu.train.autovc_trainer import (
        create_autovc_state,
        make_autovc_step,
    )

    if args.samples_length is None:
        # AutoVC always trains on mel crops; resolve the shared None default
        # here since this command does not go through _config_from_args
        args.samples_length = 64
    ds = PairedMelDataset(args.dataset_fp, samples_length=args.samples_length)
    acfg = AutoVCConfig()

    # per-speaker conditioning table
    emb_table = np.zeros((len(ds.speaker_ids), acfg.dim_emb), np.float32)
    if args.encoder_run_id:
        from dvc_tpu.models.speaker_inference import SpeakerEmbedder
        from dvc_tpu.train.speaker_trainer import SpeakerEncoderTrainer
        tr = SpeakerEncoderTrainer(SpeakerEncoderConfig(),
                                   run_id=args.encoder_run_id,
                                   models_dir=args.models_dir)
        if not tr.resume():
            raise SystemExit(f"no {args.encoder_run_id} checkpoint in "
                             f"{args.models_dir}")
        embedder = SpeakerEmbedder()
        embedder.load(tr.state.params)
        win = embedder.cfg.partials_n_frames
        for si, utts in enumerate(ds.spk_utt):
            crops = []
            for fp in utts[:8]:
                m = np.load(fp).T  # (T, 80)
                if len(m) < win:
                    m = np.pad(m, ((0, win - len(m)), (0, 0)))
                start = max(0, (len(m) - win) // 2)
                crops.append(m[start:start + win])
            embs = embedder.embed_frames_batch(np.stack(crops))
            mean = embs.mean(axis=0)
            emb_table[si] = mean / max(1e-8, np.linalg.norm(mean))
    else:
        # bootstrap: fixed one-hot speaker codes (documented stand-in for a
        # trained GE2E encoder; fine for smoke runs and small corpora)
        for si in range(len(ds.speaker_ids)):
            emb_table[si, si % acfg.dim_emb] = 1.0

    model, state, optimizer = create_autovc_state(
        jax.random.PRNGKey(args.seed), acfg, lr=args.lr,
        frames=args.samples_length)
    step = make_autovc_step(model, optimizer)
    os.makedirs(args.log_dir, exist_ok=True)
    bs = min(args.batch_size, max(1, len(ds)))
    for epoch in range(1, args.epochs + 1):
        total = n = 0.0
        for x1, _x2, spk in ds.batches(bs):
            x = jnp.asarray(np.transpose(x1, (0, 2, 1)))  # (B, T, 80)
            emb = jnp.asarray(emb_table[np.asarray(spk)])
            state, loss, l_recon, l_content = step(state, x, emb)
            total += float(loss)
            n += 1
        ds.shuffle_data()
        print(f"====> AutoVC epoch {epoch}: loss {total / max(n, 1):.4f}")
        if epoch % args.report_interval == 0 or epoch == args.epochs:
            out = os.path.join(args.log_dir, f"autovc_{epoch}.msgpack")
            with open(out, "wb") as f:
                f.write(serialization.to_bytes(state))
    return 0


def cmd_eval_eer(args) -> int:
    """Verification EER of a trained GE2E encoder over a labeled mel dir
    (speaker-per-subdirectory layout) — additive eval tool; the reference
    only reports the training-batch EER (encoder/model.py:129-137)."""
    from glob import glob

    import numpy as np

    from dvc_tpu.config import SpeakerEncoderConfig
    from dvc_tpu.eval.eer import verification_eer
    from dvc_tpu.models.speaker_inference import SpeakerEmbedder
    from dvc_tpu.train.speaker_trainer import SpeakerEncoderTrainer

    cfg = SpeakerEncoderConfig()
    trainer = SpeakerEncoderTrainer(cfg, run_id=args.run_id,
                                    models_dir=args.models_dir)
    if not trainer.resume():
        raise SystemExit(f"no {args.run_id} checkpoint in {args.models_dir}")
    embedder = SpeakerEmbedder(cfg)
    embedder.load(trainer.state.params)

    win = cfg.partials_n_frames
    embeds, ids = [], []
    for spk in sorted(os.listdir(args.mel_dir)):
        d = os.path.join(args.mel_dir, spk)
        if not os.path.isdir(d):
            continue
        for fp in sorted(glob(os.path.join(d, "*.npy")))[:args.max_utts]:
            m = np.load(fp).T  # (T, n_mels)
            if len(m) < win:
                m = np.pad(m, ((0, win - len(m)), (0, 0)))
            start = max(0, (len(m) - win) // 2)
            frames = m[start:start + win][None]
            e = embedder.embed_frames_batch(frames)[0]
            embeds.append(e / max(1e-12, np.linalg.norm(e)))
            ids.append(spk)
    if len(set(ids)) < 2:
        raise SystemExit("need at least two speakers with utterances")
    eer = verification_eer(np.stack(embeds), np.asarray(ids))
    print(f"verification EER over {len(ids)} utterances, "
          f"{len(set(ids))} speakers: {eer:.4f}")
    return 0


def cmd_serve(args) -> int:
    """HTTP conversion service with cross-request micro-batching
    (dvc_tpu/serve.py — additive serving capability)."""
    from dvc_tpu.serve import (
        ConversionService, ProfileTransferService, WorldConversionService,
        make_http_server)
    from dvc_tpu.train.trainer import Trainer

    if getattr(args, "pipeline", "mel") == "world":
        # the WORLD route serves the MCC-VAE (reference's
        # WORLD_processing.py path); dataset_fp is a preprocess-world dir
        args.features = "mcc"
    cfg = _config_from_args(args)
    if getattr(args, "profile_transfer", False):
        # model-free DSP route: no checkpoint; vocoder is the only device
        # work.  Reject silently-ignored flag combos (ADVICE r4 pattern).
        if args.pipeline == "world":
            raise SystemExit("--profile_transfer serves the mel pipeline "
                             "only; drop --pipeline world")
        if args.fs_mask:
            raise SystemExit("--profile_transfer is model-free; --fs_mask "
                             "does not apply")
        vocoder = _make_cli_vocoder(args, cfg)
        service = ProfileTransferService(cfg, args.dataset_fp, vocoder,
                                         max_wait_ms=args.max_wait_ms)
        server = make_http_server(service, args.host, args.port)
        print(f"serving on http://{args.host}:{args.port} "
              f"({len(service.speakers())} target speakers, "
              "profile-transfer DSP route)")
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            pass
        return 0
    trainer = Trainer(cfg,
                      checkpoints_path=os.path.join(args.log_dir, "checkpoints"))
    epoch = trainer.load_last(require=True)
    print(f"loaded checkpoint at epoch {epoch - 1}")
    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}

    _, fs_mask = _load_fs_mask(args, cfg)
    if getattr(args, "pipeline", "mel") == "world":
        # fs_mask is honored on both routes (ADVICE r4: it used to be
        # silently ignored with --pipeline world)
        service = WorldConversionService(cfg, trainer.model, variables,
                                         args.dataset_fp,
                                         sample_rate=cfg.audio.sample_rate,
                                         max_wait_ms=args.max_wait_ms,
                                         fs_mask=fs_mask)
    else:
        vocoder = _make_cli_vocoder(args, cfg)
        service = ConversionService(cfg, trainer.model, variables,
                                    args.dataset_fp, vocoder,
                                    max_wait_ms=args.max_wait_ms,
                                    fs_mask=fs_mask)
    server = make_http_server(service, args.host, args.port)
    print(f"serving on http://{args.host}:{args.port} "
          f"({len(service.speakers())} target speakers)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


def _run_world(args) -> None:
    from dvc_tpu.data.world_preprocess import preprocess_world_dataset
    for s in preprocess_world_dataset(args.dataset_fp, args.out_dir,
                                      num_mcep=args.num_mcep,
                                      f0_mode=getattr(args, "f0", "native")):
        if s["n_files"] == 0:
            print(f"{s['speaker']}: no wavs, skipped")
            continue
        print(f"{s['speaker']}: {s['n_files']} files, "
              f"logf0 {s['logf0_mean']:.3f}±{s['logf0_std']:.3f}")


def cmd_train_speaker(args) -> int:
    """GE2E speaker-encoder training (reference preprocessing/encoder/train.py:18-133)."""
    from dvc_tpu.config import SpeakerEncoderConfig
    from dvc_tpu.data.speaker_dataset import SpeakerVerificationSampler
    from dvc_tpu.train.speaker_trainer import SpeakerEncoderTrainer

    from dvc_tpu.utils.visualizations import Visualizations

    cfg = SpeakerEncoderConfig(
        speakers_per_batch=args.speakers_per_batch,
        utterances_per_speaker=args.utterances_per_speaker,
        learning_rate=args.lr)
    sampler = None
    if not args.no_resident_pool:
        # device-resident utterance pool: uploads ~5 KB of crop indices per
        # step instead of the 12.9 MB batch (decisive over slow links)
        from dvc_tpu.data.speaker_dataset import DeviceResidentSampler
        try:
            sampler = DeviceResidentSampler(
                args.clean_data_root, cfg.speakers_per_batch,
                cfg.utterances_per_speaker, cfg.partials_n_frames,
                seed=args.seed)
            print(f"device-resident pool: {sampler.pool.shape[0]} utterances "
                  f"({sampler.pool.nbytes / 2**20:.0f} MB on device)")
        except MemoryError as e:
            print(f"resident pool disabled ({e}); streaming from host")
    if sampler is None:
        sampler = SpeakerVerificationSampler(
            args.clean_data_root, cfg.speakers_per_batch,
            cfg.utterances_per_speaker, cfg.partials_n_frames, seed=args.seed)
    trainer = SpeakerEncoderTrainer(cfg, run_id=args.run_id,
                                    models_dir=args.models_dir)
    if not args.no_resume and trainer.resume():
        print(f"resumed {args.run_id} at step {int(trainer.state.step)}")
    # live loss/EER/step-time curves + periodic embedding projections
    # (reference encoder/train.py:56-111 visdom/UMAP loop)
    vis = Visualizations(args.run_id, os.path.join(args.models_dir, "viz"))
    vis.log_params(cfg)
    vis.log_dataset(args.clean_data_root, len(sampler.speakers))
    trainer.train(sampler, args.n_steps, save_every=args.save_every,
                  backup_every=args.backup_every, vis=vis,
                  projection_every=args.umap_every)
    return 0


def cmd_train_fs(args) -> int:
    """Feature-selection training on frozen-VAE latents (reference
    model/train_feature_selection.py:10-79, fixed)."""
    import numpy as np
    from dvc_tpu.data.dataset import PairedMelDataset
    from dvc_tpu.train.feature_selection_trainer import FeatureSelectionTrainer
    from dvc_tpu.train.trainer import Trainer

    cfg = _config_from_args(args)
    trainer = Trainer(cfg, checkpoints_path=os.path.join(args.log_dir,
                                                         "checkpoints"))
    epoch = trainer.load_last()
    print(f"loaded VAE checkpoint at epoch {epoch - 1}")
    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}

    ds = PairedMelDataset(args.dataset_fp, samples_length=args.samples_length)
    latents, labels = [], []
    fs_trainer = FeatureSelectionTrainer(cfg.vae.latent_dim,
                                         num_spk=len(ds.speaker_ids))
    fs_bs = min(cfg.train.batch_size, max(1, len(ds)))
    for x1, _x2, spk in ds.batches(fs_bs, shuffle=False):
        latents.append(fs_trainer.encode_latents(trainer.model, variables, x1))
        labels.append(spk)
    latents = np.concatenate(latents)
    labels = np.concatenate(labels)
    last = fs_trainer.train(latents, labels, epochs=args.fs_epochs)
    mask = fs_trainer.feature_mask(latents)
    out = os.path.join(args.log_dir, "feature_mask.npz")
    np.savez(out, mask=mask, acc=last.get("acc", 0.0))
    print(f"speaker-discriminative dims (mask>0.5): "
          f"{np.where(mask > 0.5)[0].tolist()} -> {out}")
    return 0


def _pair_converted_to_source(src_dir: str, cvt_dir: str) -> list:
    """Match converted wavs to their source wavs without renaming.

    Supports both naming conventions:
      * this repo's converter output (convert/conversion.py:110):
        <cvt_dir>/[<src>_to_<trg>/]convert_<src>_to_<trg>_<utt_id>.wav
        matched to a source wav whose stem ends with _<utt_id> (or equals it);
      * the reference's MCD_calculate.py:72 convention: <utt>_cv.wav
        matched to <src_dir>/<utt>.wav.
    Returns [(src_fp, cvt_fp), ...] sorted by converted path.
    """
    import re
    from glob import glob

    src_fps = sorted(glob(os.path.join(src_dir, "**", "*.wav"), recursive=True))
    by_stem = {os.path.splitext(os.path.basename(fp))[0]: fp for fp in src_fps}
    stems_sorted = sorted(by_stem.items())

    pairs = []
    for fp in sorted(glob(os.path.join(cvt_dir, "**", "*.wav"), recursive=True)):
        stem = os.path.splitext(os.path.basename(fp))[0]
        m = re.match(r"convert_(?P<src>.+)_to_(?P<trg>.+?)_(?P<utt>[^_]+)$",
                     stem)
        if m:
            src_spk, utt_id = m.group("src"), m.group("utt")
            # prefer the exact "<src_spk>_<utt>" stem so a multi-speaker
            # src_dir can't pair against another speaker's same-numbered
            # utterance; fall back to suffix/equality matches
            ranked = ([s for st, s in stems_sorted
                       if st == f"{src_spk}_{utt_id}"]
                      or [s for st, s in stems_sorted
                          if st == utt_id or st.endswith("_" + utt_id)])
            if ranked:
                pairs.append((ranked[0], fp))
        else:
            src_fp = by_stem.get(stem.split("_cv")[0])
            if src_fp:
                pairs.append((src_fp, fp))
    return pairs


def cmd_convert_world(args) -> int:
    """WORLD-feature voice conversion: latent swap on normalized MCCs +
    log-Gaussian pitch transform + WORLD synthesis (the path the reference
    ships machinery for but never wires — see convert/world_conversion.py)."""
    from glob import glob

    import numpy as np

    from dvc_tpu.convert.world_conversion import world_convert_utterance
    from dvc_tpu.train.trainer import Trainer
    from dvc_tpu.utils.wavio import write_wav

    args.features = "mcc"
    cfg = _config_from_args(args)
    trainer = Trainer(cfg,
                      checkpoints_path=os.path.join(args.log_dir, "checkpoints"))
    epoch = trainer.load_last(require=True)
    print(f"loaded MCC-VAE checkpoint at epoch {epoch - 1}")
    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}

    def stats(name):
        return dict(np.load(os.path.join(args.dataset_fp, name)))

    trg_stats = stats(f"mcep_{args.trg_spk}.npz")
    src_logf0 = stats(f"log_f0_{args.src_spk}.npz")
    trg_logf0 = stats(f"log_f0_{args.trg_spk}.npz")

    src_fps = np.sort(glob(os.path.join(args.dataset_fp, args.src_spk, "*.npz")))
    # sorted so --seed picks the same target utterance on any filesystem
    trg_fps = sorted(glob(os.path.join(args.dataset_fp, args.trg_spk, "*.npz")))
    rng = np.random.RandomState(args.seed)
    out_dir = os.path.join(args.log_dir, "generation_world",
                           f"{args.src_spk}_to_{args.trg_spk}")
    os.makedirs(out_dir, exist_ok=True)
    n = min(args.num_utterances, len(src_fps))
    src_npzs = [dict(np.load(src_fps[i])) for i in range(n)]
    trg_npzs = [dict(np.load(trg_fps[rng.choice(len(trg_fps))]))
                for _ in range(n)]
    src_lf0 = {"mean": float(src_logf0["mean"]),
               "std": float(src_logf0["std"])}
    trg_lf0 = {"mean": float(trg_logf0["mean"]),
               "std": float(trg_logf0["std"])}
    _, fs_mask = _load_fs_mask(args, cfg)
    if getattr(args, "synth", "native") == "device":
        from dvc_tpu.convert.world_conversion import world_convert_corpus
        wavs = world_convert_corpus(
            trainer.model, variables, src_npzs, trg_npzs, trg_stats,
            src_lf0, trg_lf0, frames=args.samples_length, fs_mask=fs_mask)
    else:
        wavs = [world_convert_utterance(
            trainer.model, variables, s, t, trg_stats, src_lf0, trg_lf0,
            frames=args.samples_length, fs_mask=fs_mask)
            for s, t in zip(src_npzs, trg_npzs)]
    for i, wav in enumerate(wavs):
        utt = os.path.splitext(os.path.basename(src_fps[i]))[0]
        out = os.path.join(
            out_dir, f"convert_{args.src_spk}_to_{args.trg_spk}_{utt}.wav")
        write_wav(out, wav, 16_000)
        print(f"wrote {out}")
    return 0


def cmd_embed(args) -> int:
    """Utterance embeddings from a trained GE2E encoder (reference
    preprocessing/encoder/inference.py:111-155 applied over a directory)."""
    from glob import glob

    import numpy as np

    from dvc_tpu.config import SpeakerEncoderConfig
    from dvc_tpu.models.speaker_inference import SpeakerEmbedder
    from dvc_tpu.train.speaker_trainer import SpeakerEncoderTrainer
    from dvc_tpu.utils.wavio import read_audio

    cfg = SpeakerEncoderConfig()
    trainer = SpeakerEncoderTrainer(cfg, run_id=args.run_id,
                                    models_dir=args.models_dir)
    if not trainer.resume():
        raise SystemExit(f"no {args.run_id} checkpoint in {args.models_dir}")
    embedder = SpeakerEmbedder(cfg)
    embedder.load(trainer.state.params)

    os.makedirs(args.out_dir, exist_ok=True)
    fps = sorted(glob(os.path.join(args.wav_dir, "**", "*.wav"),
                      recursive=True)
                 + glob(os.path.join(args.wav_dir, "**", "*.flac"),
                        recursive=True))
    for fp in fps:
        wav, _sr = read_audio(fp)
        embed = embedder.embed_utterance(wav)
        rel = os.path.relpath(fp, args.wav_dir)
        out_fn = "_".join(os.path.splitext(rel)[0].split(os.sep)) + "_embed.npy"
        np.save(os.path.join(args.out_dir, out_fn), embed)
    print(f"embedded {len(fps)} utterances -> {args.out_dir}")
    return 0


def cmd_train_vocoder(args) -> int:
    """Vocoder training on a directory of wavs.  --arch wavenet (default)
    trains the reference-recipe AR WaveNet (the path behind the published
    EMA checkpoint, preprocessing/hparams.py:129-151); --arch istft trains
    the non-autoregressive iSTFT vocoder (additive fast-vocoder family)."""
    if args.arch == "istft":
        from dvc_tpu.train.istft_vocoder_trainer import (
            ISTFTVocoderTrainer,
            mel_wav_batches,
        )
        trainer = ISTFTVocoderTrainer(lr=args.lr, seed=args.seed)
        crop_frames = max(8, args.max_time_steps // trainer.audio.hop_size)
        batches = mel_wav_batches(args.wav_dir, args.batch_size, crop_frames,
                                  seed=args.seed)
        trainer.train_steps(batches, args.n_steps)
        run_id = "istft_voc" if args.run_id == "wavenet" else args.run_id
        path = trainer.save(args.models_dir, run_id=run_id)
        print(f"saved istft vocoder checkpoint -> {path}")
        return 0

    from dvc_tpu.config import VocoderConfig
    from dvc_tpu.train.vocoder_trainer import VocoderTrainer, wav_batches

    cfg = VocoderConfig(layers=args.layers, stacks=args.stacks,
                        residual_channels=args.residual_channels,
                        gate_channels=args.residual_channels,
                        skip_out_channels=max(8, args.residual_channels // 2))
    trainer = VocoderTrainer(cfg, lr=args.lr,
                             max_time_steps=args.max_time_steps)
    batches = wav_batches(args.wav_dir, args.batch_size, args.max_time_steps,
                          cfg, seed=args.seed)
    trainer.train_steps(batches, args.n_steps)
    os.makedirs(args.models_dir, exist_ok=True)
    path = trainer.save(args.models_dir, run_id=args.run_id)
    print(f"saved vocoder (EMA) checkpoint -> {path}")
    return 0


def cmd_vocode(args) -> int:
    """Standalone mel -> waveform synthesis (reference
    preprocessing/processing.py:96-131 `vocoder`/`simple_inverse` utilities)."""
    import numpy as np

    from dvc_tpu.utils.wavio import write_wav

    mel = np.load(args.mel_npy)
    assert mel.ndim == 2, f"expected (n_mels, T), got {mel.shape}"
    if args.vocoder_ckpt:
        from dvc_tpu.convert.vocode import make_vocoder
        voc = make_vocoder(args.vocoder_ckpt)
    else:
        from dvc_tpu.config import AudioConfig
        from dvc_tpu.convert.griffinlim import make_griffinlim_vocoder
        voc = make_griffinlim_vocoder(AudioConfig(), n_iter=args.gl_iters)
    wav = voc(mel)
    out = args.out or os.path.splitext(args.mel_npy)[0] + "_vocoded.wav"
    write_wav(out, wav, 16_000)
    print(f"wrote {out} ({len(wav) / 16_000:.2f}s)")
    return 0


def cmd_eval_mcd(args) -> int:
    import numpy as np
    from dvc_tpu.eval.mcd import evaluate_mcd_wav
    from dvc_tpu.utils.wavio import read_wav

    pairs = _pair_converted_to_source(args.src_dir, args.cvt_dir)
    src = [read_wav(s)[0] for s, _ in pairs]
    cvt = [read_wav(c)[0] for _, c in pairs]
    mcds = evaluate_mcd_wav(src, cvt,
                            analysis=getattr(args, "analysis", "native"))
    for (_, fp), m in zip(pairs, mcds):
        print(f"utterance {os.path.basename(fp)} mcd: {m}")
    finite = [m for m in mcds if np.isfinite(m)]
    print("MCD value between two speaker: ",
          float(np.mean(finite)) if finite else None)
    return 0


def main(argv=None) -> int:
    # honor DVC_TPU_PLATFORM even though this image's sitecustomize pre-pins
    # the jax platform (env JAX_PLATFORMS alone is consulted too early)
    platform = os.environ.get("DVC_TPU_PLATFORM")
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)

    # persistent XLA compile cache: without it every CLI invocation pays
    # the full compile again (minutes for the big programs on this host)
    from dvc_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    parser = argparse.ArgumentParser(prog="dvc_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("preprocess")
    p.add_argument("datasets_root")
    p.add_argument("-o", "--out_dir", required=True)
    p.add_argument("-d", "--dataset", default="VCTK")
    p.add_argument("-s", "--skip_existing", action="store_true")
    p.add_argument("--no_trim", action="store_true")
    p.set_defaults(fn=cmd_preprocess)

    p = sub.add_parser("preprocess-world")
    p.add_argument("dataset_fp")
    p.add_argument("-o", "--out_dir", required=True)
    p.add_argument("--num_mcep", type=int, default=36)
    p.add_argument("--f0", choices=("native", "device"), default="native",
                   help="F0/envelope engine: native C++ per utterance, or "
                        "batched on-accelerator Harvest (corpus scale)")
    p.set_defaults(fn=lambda a: (_run_world(a), 0)[1])

    p = sub.add_parser("train")
    _add_train_args(p)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("convert")
    _add_train_args(p)
    p.add_argument("--src_spk", default="VCTK-Corpus_wav16_p225")
    p.add_argument("--trg_spk", default="VCTK-Corpus_wav16_p226")
    p.add_argument("--num_utterances", type=int, default=2)
    p.add_argument("--vocoder_ckpt", default="",
                   help="vocoder checkpoint: with --vocoder istft it is the "
                        "iSTFT vocoder's msgpack; otherwise a WaveNet "
                        "checkpoint (torch .pth auto-converts) that "
                        "overrides the griffinlim default")
    p.add_argument("--vocoder", default="griffinlim",
                   choices=["none", "griffinlim", "istft"],
                   help="griffinlim: checkpoint-free default; istft: the "
                        "non-AR fast vocoder (needs --vocoder_ckpt); a bare "
                        "--vocoder_ckpt selects the WaveNet")
    p.add_argument("--gl_iters", type=int, default=32)
    p.add_argument("--long_context", action="store_true",
                   help="encode with cross-chunk context (whole-utterance "
                        "conv+biLSTM) instead of independent 64-frame chunks")
    p.add_argument("--fs_mask", default="",
                   help="feature_mask.npz from train-fs (or a bare .npy "
                        "mask): swap the FeatureSelection-selected "
                        "speaker-discriminative latent dims instead of "
                        "only the style dims — closes the identity leak "
                        "through content dims at latent 32")
    p.add_argument("--fs_threshold", type=float, default=0.5,
                   help="sigmoid-mask binarization threshold for --fs_mask")
    p.add_argument("--fs_top_k", type=int, default=None,
                   help="cap the FS swap at the top-k highest-sigmoid CONTENT dims (style dims always swap) — keeps the swap selective so source content survives")
    p.add_argument("--profile_transfer", action="store_true",
                   help="model-free DSP conversion: shift the source mel by "
                        "the difference of per-speaker mean spectral "
                        "profiles (no checkpoint needed; content-preserving "
                        "by construction). The measured honesty baseline "
                        "every learned conversion is compared against "
                        "(docs/measurements/quality_full_size_*): at "
                        "sub-VCTK training scale it wins direction 20/20")
    p.add_argument("--analyze", action="store_true",
                   help="also write latent-analysis artifacts into the "
                        "generation dir: per-speaker latent mean/std plot "
                        "+ npz (reference model/plot.py:23-55, which the "
                        "reference never wires up) and the FS mask plot "
                        "when --fs_mask is given")
    p.set_defaults(fn=cmd_convert)

    p = sub.add_parser("train-speaker")
    p.add_argument("run_id")
    p.add_argument("clean_data_root")
    p.add_argument("-m", "--models_dir", required=True)
    p.add_argument("--n_steps", type=int, default=10_000)
    p.add_argument("--speakers_per_batch", type=int, default=64)
    p.add_argument("--utterances_per_speaker", type=int, default=10)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save_every", type=int, default=500)
    p.add_argument("--backup_every", type=int, default=3000)
    p.add_argument("--umap_every", type=int, default=100)
    p.add_argument("--no_resume", action="store_true")
    p.add_argument("--no_resident_pool", action="store_true",
                   help="stream batches from host instead of the "
                        "device-resident utterance pool")
    p.set_defaults(fn=cmd_train_speaker)

    p = sub.add_parser("train-fs")
    _add_train_args(p)
    p.add_argument("--fs_epochs", type=int, default=10)
    p.set_defaults(fn=cmd_train_fs)

    p = sub.add_parser("convert-world")
    _add_train_args(p)
    p.add_argument("--src_spk", required=True)
    p.add_argument("--trg_spk", required=True)
    p.add_argument("--num_utterances", type=int, default=2)
    p.add_argument("--synth", choices=["native", "device"], default="native",
                   help="native: WORLD-faithful pulse synthesis per "
                        "utterance; device: whole corpus in bucketed "
                        "vmapped programs (ops/world.synthesize_batch)")
    p.add_argument("--fs_mask", default="",
                   help="feature_mask.npz from train-fs (run on the "
                        "MCC-VAE): FeatureSelection-masked latent swap, "
                        "same semantics as convert --fs_mask")
    p.add_argument("--fs_threshold", type=float, default=0.5)
    p.add_argument("--fs_top_k", type=int, default=None,
                   help="cap the FS swap at the top-k highest-sigmoid CONTENT dims (style dims always swap) — keeps the swap selective so source content survives")
    p.set_defaults(fn=cmd_convert_world)

    p = sub.add_parser("embed")
    p.add_argument("run_id")
    p.add_argument("wav_dir")
    p.add_argument("-m", "--models_dir", required=True)
    p.add_argument("-o", "--out_dir", required=True)
    p.set_defaults(fn=cmd_embed)

    p = sub.add_parser("train-vocoder")
    p.add_argument("wav_dir")
    p.add_argument("-m", "--models_dir", required=True)
    p.add_argument("--run_id", default="wavenet")
    p.add_argument("--n_steps", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--max_time_steps", type=int, default=8000)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--layers", type=int, default=24)
    p.add_argument("--stacks", type=int, default=4)
    p.add_argument("--residual_channels", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--arch", default="wavenet", choices=["wavenet", "istft"])
    p.set_defaults(fn=cmd_train_vocoder)

    p = sub.add_parser("vocode")
    p.add_argument("mel_npy")
    p.add_argument("-o", "--out", default="")
    p.add_argument("--vocoder_ckpt", default="")
    p.add_argument("--gl_iters", type=int, default=32)
    p.set_defaults(fn=cmd_vocode)

    p = sub.add_parser("train-autovc")
    _add_train_args(p)
    p.add_argument("--encoder_run_id", default="",
                   help="GE2E run id for speaker embeddings (one-hot "
                        "bootstrap codes when omitted)")
    p.add_argument("-m", "--models_dir", default="",
                   help="GE2E models dir (with --encoder_run_id)")
    p.set_defaults(fn=cmd_train_autovc)

    p = sub.add_parser("serve")
    _add_train_args(p)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--max_wait_ms", type=float, default=10.0,
                   help="micro-batching window: how long the worker waits "
                        "to aggregate concurrent requests into one device "
                        "batch")
    p.add_argument("--vocoder_ckpt", default="")
    p.add_argument("--vocoder", default="griffinlim",
                   choices=["none", "griffinlim", "istft"])
    p.add_argument("--gl_iters", type=int, default=32)
    p.add_argument("--pipeline", default="mel", choices=["mel", "world"],
                   help="world: serve the MCC/WORLD conversion route "
                        "(batched device analysis + latent swap + device "
                        "synthesis; dataset_fp is a preprocess-world "
                        "output dir, the checkpoint an MCC-VAE)")
    p.add_argument("--fs_mask", default="",
                   help="feature_mask.npz from train-fs: serve with the "
                        "FeatureSelection-masked latent swap (honored on "
                        "both pipelines; same semantics as convert "
                        "--fs_mask / convert-world --fs_mask)")
    p.add_argument("--fs_threshold", type=float, default=0.5)
    p.add_argument("--fs_top_k", type=int, default=None,
                   help="cap the FS swap at the top-k highest-sigmoid CONTENT dims (style dims always swap) — keeps the swap selective so source content survives")
    p.add_argument("--profile_transfer", action="store_true",
                   help="serve the model-free DSP conversion (profile "
                        "shift, convert --profile_transfer semantics): no "
                        "checkpoint needed; the vocoder is the only device "
                        "work (mel pipeline only)")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("eval-eer")
    p.add_argument("run_id")
    p.add_argument("mel_dir")
    p.add_argument("-m", "--models_dir", required=True)
    p.add_argument("--max_utts", type=int, default=50,
                   help="utterances per speaker cap")
    p.set_defaults(fn=cmd_eval_eer)

    p = sub.add_parser("eval-mcd")
    p.add_argument("--src_dir", required=True)
    p.add_argument("--cvt_dir", required=True)
    p.add_argument("--analysis", choices=["native", "device"],
                   default="native",
                   help="device: corpus-batched on-accelerator WORLD "
                        "analysis (ops/world.world_decompose_batch)")
    p.set_defaults(fn=cmd_eval_mcd)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
