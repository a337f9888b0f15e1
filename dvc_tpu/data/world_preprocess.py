"""Offline WORLD-feature preprocessing: wav -> per-utterance .npz.

Parity with the reference's WORLD pipeline (preprocessing/WORLD_processing.py
:262-299 `preprocess_voice` + the __main__ normalization path :302-348):
per speaker, extract f0/sp/ap/mcc, fit per-speaker mcc mean/std and log-f0
statistics, then write `<utt>.npz` with keys (f0, sp, ap, mcc,
normalized_mc, mc_mean, mc_std) — the exact contract PairedMCCDataset
(reference SpeechDatasetMCC2, preprocessing/dataset.py:126-247) reads.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from dvc_tpu.ops.world import (
    logf0_statistics,
    mcs_normalization_fit_transform,
    world_encode_data,
)
from dvc_tpu.utils.wavio import read_wav


def preprocess_world_speaker(speaker_dir: str, out_dir: str,
                             sample_rate: int = 16_000, num_mcep: int = 36,
                             frame_period: float = 5.0,
                             save_sp_ap: bool = False,
                             f0_mode: str = "native") -> dict:
    """One speaker directory of wavs -> npz features + stats files.

    f0_mode selects the analysis engine: "native" (default) runs the C++
    Harvest/D4C per utterance — the algorithm-faithful pyworld replacement;
    "device" runs the batched accelerator path (ops/harvest.py Harvest +
    vmapped CheapTrick via world_decompose_batch) — the corpus-scale option,
    tolerance-gated against the native engine by tests/test_harvest_tpu.py.
    """
    spk = os.path.basename(os.path.normpath(speaker_dir))
    wav_fps = sorted(glob.glob(os.path.join(speaker_dir, "*.wav")))
    if not wav_fps:
        # an empty (or wav-free) speaker dir must not abort the whole run —
        # and must not create an empty out_dir subdir (PairedMCCDataset
        # would count it as a speaker)
        print(f"  {spk}: no .wav files, skipped")
        return {"speaker": spk, "n_files": 0, "n_frames": 0}
    spk_out = os.path.join(out_dir, spk)
    os.makedirs(spk_out, exist_ok=True)

    def load(fp):
        wav, sr = read_wav(fp)
        if sr != sample_rate:
            from dvc_tpu.ops.audio import resample_poly
            import jax.numpy as jnp
            wav = np.asarray(resample_poly(jnp.asarray(wav), sr, sample_rate))
        return wav / max(1e-8, np.abs(wav).max())  # librosa.util.normalize

    def analyze(fp):
        f0, _, sp, ap, mc = world_encode_data(load(fp), sample_rate,
                                              frame_period, num_mcep)
        return (fp, f0, sp, ap, mc)

    if f0_mode == "device":
        from dvc_tpu.ops.world import world_decompose_batch
        wavs = [load(fp) for fp in wav_fps]
        decomposed = world_decompose_batch(
            wavs, sample_rate, frame_period, num_mcep,
            keep_sp_ap=save_sp_ap)
        feats = [(fp, f0, sp, ap, mc)
                 for fp, (f0, _, sp, ap, mc) in zip(wav_fps, decomposed)]
        return _write_speaker_outputs(spk, spk_out, out_dir, feats,
                                      save_sp_ap)

    # thread pool over files: the native Harvest/D4C stages release the GIL
    # inside the C++ engine, and the jitted CheapTrick stage queues on the
    # device — the role of the reference's ThreadPool(8) over speakers
    # (preprocessing/encoder/preprocess.py:135) applied per utterance
    from concurrent.futures import ThreadPoolExecutor
    workers = min(8, max(1, os.cpu_count() or 1))
    if workers > 1 and len(wav_fps) > 1:
        # utterance-level parallelism: pin the engine's INNER pools to one
        # worker while the outer pool is active, so cores aren't
        # oversubscribed (results are bit-identical at any thread split —
        # dvc_common.h parallel_for is deterministic by construction)
        prev = os.environ.get("DVC_WORLD_THREADS")
        os.environ["DVC_WORLD_THREADS"] = "1"
        try:
            with ThreadPoolExecutor(workers) as pool:
                feats = list(pool.map(analyze, wav_fps))
        finally:
            if prev is None:
                os.environ.pop("DVC_WORLD_THREADS", None)
            else:
                os.environ["DVC_WORLD_THREADS"] = prev
    else:
        feats = [analyze(fp) for fp in wav_fps]

    return _write_speaker_outputs(spk, spk_out, out_dir, feats, save_sp_ap)


def _write_speaker_outputs(spk: str, spk_out: str, out_dir: str,
                           feats: list, save_sp_ap: bool) -> dict:
    # per-speaker statistics (reference :278-292 and the :340-346 norm path)
    all_mc = np.concatenate([mc for _, _, _, _, mc in feats], axis=0)
    _, mc_mean, mc_std = mcs_normalization_fit_transform(all_mc.T)
    logf0_mean, logf0_std = logf0_statistics(
        np.concatenate([f0 for _, f0, _, _, _ in feats]))
    np.savez(os.path.join(out_dir, f"log_f0_{spk}.npz"),
             mean=logf0_mean, std=logf0_std)
    np.savez(os.path.join(out_dir, f"mcep_{spk}.npz"), mean=mc_mean, std=mc_std)

    for fp, f0, sp, ap, mc in feats:
        out_fn = os.path.splitext(os.path.basename(fp))[0] + ".npz"
        normalized_mc = (mc - mc_mean.T) / mc_std.T  # (T, n_mcep)
        payload = dict(f0=f0, mcc=mc, normalized_mc=normalized_mc,
                       mc_mean=mc_mean.T, mc_std=mc_std.T)
        if save_sp_ap:
            payload.update(sp=sp, ap=ap)
        np.savez(os.path.join(spk_out, out_fn), **payload)
    return {"speaker": spk, "n_files": len(feats),
            "logf0_mean": logf0_mean, "logf0_std": logf0_std}


def preprocess_world_dataset(dataset_fp: str, out_dir: str,
                             sample_rate: int = 16_000, num_mcep: int = 36,
                             frame_period: float = 5.0,
                             f0_mode: str = "native") -> list[dict]:
    """All speaker dirs under dataset_fp (reference :302-348 driver)."""
    os.makedirs(out_dir, exist_ok=True)
    stats = []
    for d in sorted(os.listdir(dataset_fp)):
        full = os.path.join(dataset_fp, d)
        if os.path.isdir(full):
            stats.append(preprocess_world_speaker(full, out_dir, sample_rate,
                                                  num_mcep, frame_period,
                                                  f0_mode=f0_mode))
    return stats
