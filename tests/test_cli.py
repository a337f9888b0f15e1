"""CLI end-to-end smoke: preprocess -> train -> convert -> eval-mcd through
`dvc_tpu.cli.run.main(argv)` on a synthetic dataset (the pytest-resident
version of the manual verification recipe in .claude/skills/verify)."""

import os

import numpy as np
import pytest

from dvc_tpu.cli.run import main
from dvc_tpu.utils.wavio import write_wav


@pytest.fixture(scope="module")
def fake_vctk(tmp_path_factory):
    root = tmp_path_factory.mktemp("vctk")
    rng = np.random.RandomState(0)
    for spk, base in (("p225", 140.0), ("p226", 220.0)):
        d = root / "VCTK-Corpus" / "wav16" / spk
        d.mkdir(parents=True)
        for i in range(4):
            t = np.arange(6000) / 16000
            f = base * (1 + 0.06 * np.sin(2 * np.pi * 3 * t))
            wav = 0.4 * np.sin(2 * np.pi * np.cumsum(f) / 16000) \
                + 0.03 * rng.randn(6000)
            write_wav(str(d / f"{spk}_{i:03d}.wav"), wav, 16000)
    return root


class TestCliFlow:
    def test_preprocess_train_convert(self, fake_vctk, tmp_path):
        mels = str(tmp_path / "mels")
        results = str(tmp_path / "results")

        assert main(["preprocess", str(fake_vctk), "-o", mels,
                     "-d", "VCTK", "--no_trim"]) == 0
        npys = [f for f in os.listdir(os.path.join(mels, "p225"))
                if f.endswith(".npy")]
        assert len(npys) == 4

        # train 1 epoch on a deliberately tiny geometry (samples_length 16)
        assert main(["train", "--dataset_fp", mels, "--log_dir", results,
                     "--epochs", "1", "--report-interval", "1",
                     "--samples_length", "16", "--batch-size", "2",
                     "--compute-dtype", "float32"]) == 0
        ckpts = os.listdir(os.path.join(results, "checkpoints"))
        assert any(c.startswith("DisentangledVAE_VCTK_1") for c in ckpts)
        assert os.path.exists(os.path.join(results, "config.json"))

        # convert resumes the checkpoint, writes spectrogram pngs AND wavs
        # (griffinlim vocoder needs no checkpoint)
        assert main(["convert", "--dataset_fp", mels, "--log_dir", results,
                     "--samples_length", "16", "--src_spk", "p225",
                     "--trg_spk", "p226", "--num_utterances", "1",
                     "--vocoder", "griffinlim", "--gl_iters", "4",
                     "--compute-dtype", "float32"]) == 0
        gen = os.path.join(results, "generation", "p225_to_p226")
        wavs = [f for f in os.listdir(gen)
                if f.startswith("convert_") and f.endswith(".wav")]
        assert wavs, os.listdir(gen)

    def test_convert_then_eval_mcd_without_renaming(self, fake_vctk, tmp_path,
                                                    capsys):
        """VERDICT item 7: the converter's own output layout feeds eval-mcd
        directly — preprocess -> train -> convert -> eval-mcd yields a finite
        MCD with no file renaming."""
        import re

        mels = str(tmp_path / "mels")
        results = str(tmp_path / "results")
        assert main(["preprocess", str(fake_vctk), "-o", mels,
                     "-d", "VCTK", "--no_trim"]) == 0
        assert main(["train", "--dataset_fp", mels, "--log_dir", results,
                     "--epochs", "1", "--report-interval", "1",
                     "--samples_length", "16", "--batch-size", "2",
                     "--compute-dtype", "float32"]) == 0
        assert main(["convert", "--dataset_fp", mels, "--log_dir", results,
                     "--samples_length", "16", "--src_spk", "p225",
                     "--trg_spk", "p226", "--num_utterances", "2",
                     "--vocoder", "griffinlim", "--gl_iters", "4",
                     "--compute-dtype", "float32"]) == 0
        capsys.readouterr()
        assert main(["eval-mcd",
                     "--src_dir", str(fake_vctk / "VCTK-Corpus" / "wav16"
                                      / "p225"),
                     "--cvt_dir", os.path.join(results, "generation")]) == 0
        out = capsys.readouterr().out
        assert out.count("mcd:") == 2
        m = re.search(r"MCD value between two speaker:\s+([0-9.]+)", out)
        assert m and np.isfinite(float(m.group(1)))

    def test_train_fs_then_fs_mask_convert_with_analyze(self, fake_vctk,
                                                        tmp_path):
        """train -> train-fs -> convert --fs_mask --analyze: the
        FeatureSelection-masked swap route plus the latent-analysis
        artifacts (VERDICT r3 items 1 and 6) through the CLI surface."""
        mels = str(tmp_path / "mels")
        results = str(tmp_path / "results")
        assert main(["preprocess", str(fake_vctk), "-o", mels,
                     "-d", "VCTK", "--no_trim"]) == 0
        assert main(["train", "--dataset_fp", mels, "--log_dir", results,
                     "--epochs", "1", "--report-interval", "1",
                     "--samples_length", "16", "--batch-size", "2",
                     "--compute-dtype", "float32"]) == 0
        assert main(["train-fs", "--dataset_fp", mels, "--log_dir", results,
                     "--samples_length", "16", "--batch-size", "2",
                     "--fs_epochs", "2", "--compute-dtype", "float32"]) == 0
        mask_fp = os.path.join(results, "feature_mask.npz")
        assert os.path.exists(mask_fp)
        assert main(["convert", "--dataset_fp", mels, "--log_dir", results,
                     "--samples_length", "16", "--src_spk", "p225",
                     "--trg_spk", "p226", "--num_utterances", "1",
                     "--vocoder", "none", "--fs_mask", mask_fp,
                     "--analyze", "--compute-dtype", "float32"]) == 0
        gen = os.path.join(results, "generation")
        assert os.path.exists(os.path.join(gen, "latent_analysis.npz"))
        assert os.path.exists(os.path.join(gen, "fs_mask.npz"))
        z = np.load(os.path.join(gen, "latent_analysis.npz"))
        assert z["mus"].shape == (2, 32) and list(z["speakers"]) == \
            ["p225", "p226"]
        m = np.load(os.path.join(gen, "fs_mask.npz"))
        assert m["binary_mask"].shape == (32,)
        assert m["binary_mask"][:4].all()

    def test_profile_transfer_convert_needs_no_checkpoint(self, fake_vctk,
                                                          tmp_path):
        """convert --profile_transfer: the model-free DSP baseline
        (convert/conversion.py profile_transfer_mel — the honesty baseline
        of the quality_full_size artifacts) converts straight from
        preprocess output, no train step, and matches the library function
        exactly."""
        from glob import glob

        from dvc_tpu.convert.conversion import (profile_transfer_mel,
                                                speaker_mel_profile)

        mels = str(tmp_path / "mels")
        results = str(tmp_path / "results")
        assert main(["preprocess", str(fake_vctk), "-o", mels,
                     "-d", "VCTK", "--no_trim"]) == 0
        # no `train` call: there is no checkpoint anywhere under results
        assert main(["convert", "--dataset_fp", mels, "--log_dir", results,
                     "--samples_length", "16", "--src_spk", "p225",
                     "--trg_spk", "p226", "--num_utterances", "1",
                     "--vocoder", "griffinlim", "--gl_iters", "4",
                     "--profile_transfer", "--compute-dtype",
                     "float32"]) == 0
        gen = os.path.join(results, "generation", "p225_to_p226")
        wavs = [f for f in os.listdir(gen)
                if f.startswith("convert_") and f.endswith(".wav")]
        assert wavs, os.listdir(gen)

        # the saved converted png corresponds to profile_transfer_mel of
        # the first (sorted) source utterance — verify via the library
        src_fps = sorted(glob(os.path.join(mels, "p225", "*.npy")))
        src_prof = speaker_mel_profile(src_fps)
        trg_prof = speaker_mel_profile(
            sorted(glob(os.path.join(mels, "p226", "*.npy"))))
        expect = profile_transfer_mel(np.load(src_fps[0]), src_prof,
                                      trg_prof)
        assert expect.shape[0] == 80 and np.isfinite(expect).all()
        # content preservation by construction: deviations from the
        # profile pass through untouched
        src = np.load(src_fps[0])
        np.testing.assert_allclose(
            expect - expect.mean(axis=1, keepdims=True),
            np.clip(src + (trg_prof - src_prof)[:, None], 0, 1)
            - np.clip(src + (trg_prof - src_prof)[:, None], 0,
                      1).mean(axis=1, keepdims=True), atol=1e-6)

        # incompatible-flag guardrails
        with pytest.raises(SystemExit):
            main(["convert", "--dataset_fp", mels, "--log_dir", results,
                  "--samples_length", "16", "--profile_transfer",
                  "--analyze", "--compute-dtype", "float32"])
        with pytest.raises(ValueError):
            main(["convert", "--dataset_fp", mels, "--log_dir", results,
                  "--samples_length", "16", "--src_spk", "p225",
                  "--trg_spk", "p226", "--profile_transfer",
                  "--long_context", "--vocoder", "none",
                  "--compute-dtype", "float32"])

    def test_eval_mcd_identical_is_zero(self, fake_vctk, tmp_path, capsys):
        cvt = tmp_path / "cvt"
        cvt.mkdir()
        src_dir = fake_vctk / "VCTK-Corpus" / "wav16" / "p225"
        import shutil
        shutil.copy(src_dir / "p225_000.wav", cvt / "p225_000_cv.wav")
        assert main(["eval-mcd", "--src_dir", str(src_dir),
                     "--cvt_dir", str(cvt)]) == 0
        out = capsys.readouterr().out
        assert "mcd: 0.0" in out

    def test_unknown_subcommand_exits(self):
        with pytest.raises(SystemExit):
            main(["definitely-not-a-command"])


class TestWorldCliFlow:
    def test_mcc_train_and_convert_world(self, fake_vctk, tmp_path):
        """preprocess-world -> train --features mcc -> convert-world."""
        npz = str(tmp_path / "npz")
        results = str(tmp_path / "res")
        wav_root = str(fake_vctk / "VCTK-Corpus" / "wav16")
        assert main(["preprocess-world", wav_root, "-o", npz,
                     "--num_mcep", "24"]) == 0
        assert os.path.exists(os.path.join(npz, "mcep_p226.npz"))

        assert main(["train", "--dataset_fp", npz, "--log_dir", results,
                     "--features", "mcc", "--num_mcep", "24",
                     "--samples_length", "16", "--epochs", "1",
                     "--report-interval", "1", "--batch-size", "2",
                     "--compute-dtype", "float32"]) == 0

        assert main(["convert-world", "--dataset_fp", npz,
                     "--log_dir", results, "--features", "mcc",
                     "--num_mcep", "24", "--samples_length", "16",
                     "--src_spk", "p225", "--trg_spk", "p226",
                     "--num_utterances", "1",
                     "--compute-dtype", "float32"]) == 0
        gen = os.path.join(results, "generation_world", "p225_to_p226")
        wavs = [f for f in os.listdir(gen) if f.endswith(".wav")]
        assert wavs

        # corpus-batched device synthesis takes the same flags
        assert main(["convert-world", "--dataset_fp", npz,
                     "--log_dir", results, "--features", "mcc",
                     "--num_mcep", "24", "--samples_length", "16",
                     "--src_spk", "p225", "--trg_spk", "p226",
                     "--num_utterances", "1", "--synth", "device",
                     "--compute-dtype", "float32"]) == 0
        wavs = [f for f in os.listdir(gen) if f.endswith(".wav")]
        assert wavs


class TestEmbedCli:
    def test_train_speaker_then_embed(self, fake_vctk, tmp_path):
        mels = str(tmp_path / "mels")
        assert main(["preprocess", str(fake_vctk), "-o", mels,
                     "-d", "VCTK", "--no_trim"]) == 0
        models = str(tmp_path / "models")
        assert main(["train-speaker", "ge2e", mels, "-m", models,
                     "--n_steps", "2", "--speakers_per_batch", "2",
                     "--utterances_per_speaker", "2", "--save_every", "2",
                     "--umap_every", "0"]) == 0
        out = str(tmp_path / "embeds")
        assert main(["embed", "ge2e",
                     str(fake_vctk / "VCTK-Corpus" / "wav16" / "p225"),
                     "-m", models, "-o", out]) == 0
        fps = [f for f in os.listdir(out) if f.endswith("_embed.npy")]
        assert len(fps) == 4
        e = np.load(os.path.join(out, fps[0]))
        assert e.shape == (256,)
        assert abs(float(np.linalg.norm(e)) - 1.0) < 1e-4


class TestVocoderCli:
    def test_train_vocoder_tiny(self, fake_vctk, tmp_path):
        models = str(tmp_path / "voc")
        wav_root = str(fake_vctk / "VCTK-Corpus" / "wav16" / "p225")
        assert main(["train-vocoder", wav_root, "-m", models,
                     "--n_steps", "2", "--batch_size", "1",
                     "--max_time_steps", "512", "--layers", "2",
                     "--stacks", "1", "--residual_channels", "16"]) == 0
        ckpts = [f for f in os.listdir(models) if f.endswith(".msgpack")]
        assert len(ckpts) == 1
        # the saved EMA checkpoint loads through the production vocoder path
        from dvc_tpu.config import VocoderConfig
        from dvc_tpu.convert.vocode import make_vocoder
        cfg = VocoderConfig(layers=2, stacks=1, residual_channels=16,
                            gate_channels=16, skip_out_channels=8)
        voc = make_vocoder(os.path.join(models, ckpts[0]), cfg,
                           backend="scan", pad_frames_to=4)
        wav = voc(np.random.RandomState(0).rand(80, 4).astype(np.float32))
        assert np.isfinite(wav).all()


class TestVocodeCli:
    def test_vocode_mel_npy(self, tmp_path, capsys):
        mel = np.random.RandomState(0).rand(80, 10).astype(np.float32)
        fp = str(tmp_path / "m.npy")
        np.save(fp, mel)
        out = str(tmp_path / "m.wav")
        assert main(["vocode", fp, "-o", out, "--gl_iters", "2"]) == 0
        from dvc_tpu.utils.wavio import read_wav
        wav, sr = read_wav(out)
        assert sr == 16000 and len(wav) > 0 and np.isfinite(wav).all()


class TestEvalMcdPairing:
    def test_multispeaker_src_dir_pairs_correct_speaker(self, tmp_path):
        """convert_<src>_to_<trg>_<utt>.wav must pair against <src>_<utt>.wav
        even when another speaker has the same utterance number."""
        from dvc_tpu.cli.run import _pair_converted_to_source

        src = tmp_path / "src"
        for spk in ("p225", "p226"):
            (src / spk).mkdir(parents=True)
            write_wav(str(src / spk / f"{spk}_001.wav"),
                      np.zeros(1000), 16000)
        cvt = tmp_path / "cvt"
        cvt.mkdir()
        write_wav(str(cvt / "convert_p226_to_p225_001.wav"),
                  np.zeros(1000), 16000)
        pairs = _pair_converted_to_source(str(src), str(cvt))
        assert len(pairs) == 1
        assert os.path.basename(pairs[0][0]) == "p226_001.wav"

    def test_vocode_very_short_mel(self, tmp_path):
        """A 3-frame mel (shorter than fft/hop) must vocode, not crash."""
        mel = np.random.RandomState(0).rand(80, 3).astype(np.float32)
        fp = str(tmp_path / "short.npy")
        np.save(fp, mel)
        out = str(tmp_path / "short.wav")
        assert main(["vocode", fp, "-o", out, "--gl_iters", "2"]) == 0
        from dvc_tpu.utils.wavio import read_wav
        wav, _ = read_wav(out)
        assert len(wav) > 0 and np.isfinite(wav).all()
