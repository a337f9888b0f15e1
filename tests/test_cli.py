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

        # convert resumes the checkpoint and writes spectrogram pngs
        assert main(["convert", "--dataset_fp", mels, "--log_dir", results,
                     "--samples_length", "16", "--src_spk", "p225",
                     "--trg_spk", "p226", "--num_utterances", "1",
                     "--compute-dtype", "float32"]) == 0
        gen = os.path.join(results, "generation", "p225_to_p226")
        assert any(f.startswith("convert_") for f in os.listdir(gen))

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
