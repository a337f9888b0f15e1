"""Native FLAC decoder (native/dvc_flac.cpp) and the LibriSpeech/VoxCeleb
preprocessing paths (VERDICT round-1 item 8).  Fixtures are produced by the
in-repo encoder (tools/flac_encoder.py) since no flac binary exists here."""

import os

import numpy as np
import pytest

from dvc_tpu.native import flac as native_flac
from tools.flac_encoder import write_flac

pytestmark = pytest.mark.skipif(not native_flac.available(),
                                reason="native FLAC decoder unavailable")

FS = 16000


def _int16(wav):
    return np.clip(np.round(np.asarray(wav) * 32767.0), -32768, 32767) \
        .astype(np.int64)


class TestFlacRoundTrip:
    @pytest.mark.parametrize("mode", ["fixed2", "lpc1", "verbatim"])
    def test_mono_bit_exact(self, tmp_path, mode):
        rng = np.random.RandomState(0)
        t = np.arange(FS) / FS
        wav = 0.5 * np.sin(2 * np.pi * 220 * t) + 0.01 * rng.randn(FS)
        p = str(tmp_path / f"{mode}.flac")
        write_flac(p, wav, FS, mode=mode)
        got, sr = native_flac.read_flac(p)
        assert sr == FS and len(got) == FS
        np.testing.assert_array_equal(np.round(got * (1 << 15)), _int16(wav))

    def test_constant_subframe(self, tmp_path):
        p = str(tmp_path / "silence.flac")
        write_flac(p, np.zeros(5000), FS, mode="fixed2")
        got, sr = native_flac.read_flac(p)
        assert len(got) == 5000 and np.all(got == 0.0)

    def test_stereo_averaged(self, tmp_path):
        t = np.arange(FS) / FS
        st = np.stack([0.4 * np.sin(2 * np.pi * 200 * t),
                       0.2 * np.sin(2 * np.pi * 300 * t)], 1)
        p = str(tmp_path / "stereo.flac")
        write_flac(p, st, FS, mode="fixed2")
        got, _ = native_flac.read_flac(p)
        want = _int16(st).mean(1) / (1 << 15)
        np.testing.assert_allclose(got, want, atol=1e-7)

    def test_odd_length_last_frame(self, tmp_path):
        wav = 0.3 * np.sin(2 * np.pi * 150 * np.arange(10_123) / FS)
        p = str(tmp_path / "odd.flac")
        write_flac(p, wav, FS, mode="fixed2")
        got, _ = native_flac.read_flac(p)
        assert len(got) == 10_123

    @pytest.mark.parametrize("frame_bps", [8, 24])
    def test_per_frame_sample_size_override(self, tmp_path, frame_bps):
        """Frames may carry a sample-size code overriding STREAMINFO's bps;
        the decoder must scale by the FRAME's width (a si.bps-based scale
        mis-gains these files by 2^(diff))."""
        rng = np.random.RandomState(7)
        t = np.arange(FS // 2) / FS
        wav = 0.5 * np.sin(2 * np.pi * 220 * t) + 0.01 * rng.randn(len(t))
        p = str(tmp_path / f"ss{frame_bps}.flac")
        write_flac(p, wav, FS, mode="verbatim", frame_bps=frame_bps)
        got, sr = native_flac.read_flac(p)
        assert sr == FS
        # 8-bit frames quantize coarsely; 24-bit ones are 16-bit exact
        tol = 1.1 / (1 << (min(frame_bps, 16) - 1))
        np.testing.assert_allclose(got, np.clip(wav, -1, 1), atol=tol)
        assert np.abs(got).max() <= 1.0

    def test_non_flac_rejected(self, tmp_path):
        p = tmp_path / "junk.flac"
        p.write_bytes(b"not a flac file at all")
        with pytest.raises(ValueError):
            native_flac.read_flac(str(p))

    def test_read_audio_dispatch(self, tmp_path, monkeypatch):
        from dvc_tpu.utils.wavio import read_audio, write_wav

        wav = 0.2 * np.sin(2 * np.pi * 100 * np.arange(4000) / FS)
        fp_flac = str(tmp_path / "a.flac")
        fp_wav = str(tmp_path / "a.wav")
        write_flac(fp_flac, wav, FS)
        write_wav(fp_wav, wav, FS)
        gf, srf = read_audio(fp_flac)
        gw, srw = read_audio(fp_wav)
        assert srf == srw == FS
        # write_wav peak-rescales to full scale (the reference save_wav
        # convention); write_flac preserves level — compare shapes after
        # undoing the known gain
        np.testing.assert_allclose(gf[:len(gw)], gw * 0.2, atol=2e-4)
        # with ffmpeg hidden, unsupported containers fail with a clear
        # NotImplementedError regardless of what is installed on this host
        monkeypatch.setenv("PATH", str(tmp_path / "emptybin"))
        with pytest.raises(NotImplementedError):
            read_audio(str(tmp_path / "b.m4a"))


class TestLibriSpeechPreprocess:
    def test_preprocess_librispeech_other(self, tmp_path):
        """VERDICT item 8 gate: `preprocess -d librispeech_other` produces
        mels from a synthetic flac corpus (LibriSpeech layout:
        speaker/chapter/utt.flac)."""
        from dvc_tpu.data.preprocess import preprocess_dataset

        root = tmp_path / "data"
        rng = np.random.RandomState(0)
        for spk in ("19", "26"):
            for chap in ("495",):
                d = root / "LibriSpeech" / "train-other-500" / spk / chap
                d.mkdir(parents=True)
                for i in range(2):
                    t = np.arange(6000) / FS
                    wav = 0.4 * np.sin(2 * np.pi * (120 + 40 * int(spk)) * t) \
                        + 0.02 * rng.randn(6000)
                    write_flac(str(d / f"{spk}-495-{i:04d}.flac"), wav, FS)
        out = str(tmp_path / "mels")
        stats = preprocess_dataset(str(root), out, "librispeech_other")
        assert stats.n_files == 4
        for spk in ("19", "26"):
            fps = [f for f in os.listdir(os.path.join(out, spk))
                   if f.endswith("_mel.npy")]
            assert len(fps) == 2
            mel = np.load(os.path.join(out, spk, fps[0]))
            assert mel.shape[0] == 80
            assert 0.0 <= mel.min() and mel.max() <= 1.0


class TestVoxCeleb1Preprocess:
    def test_anglophone_filter(self, tmp_path):
        from dvc_tpu.data.preprocess import preprocess_dataset
        from dvc_tpu.utils.wavio import write_wav

        root = tmp_path / "data"
        vox = root / "VoxCeleb1"
        rng = np.random.RandomState(0)
        for spk in ("id10001", "id10002"):
            d = vox / "wav" / spk / "clip0"
            d.mkdir(parents=True)
            wav = 0.4 * np.sin(2 * np.pi * 180 * np.arange(5000) / FS) \
                + 0.02 * rng.randn(5000)
            write_wav(str(d / "00000.wav"), wav, FS)
        (vox / "vox1_meta.csv").write_text(
            "VoxCeleb1 ID\tVGGFace1 ID\tGender\tNationality\tSet\n"
            "id10001\tA\tm\tUSA\tdev\n"
            "id10002\tB\tf\tFrance\tdev\n")
        out = str(tmp_path / "mels")
        stats = preprocess_dataset(str(root), out, "voxceleb1")
        assert stats.n_files == 1
        assert os.path.isdir(os.path.join(out, "id10001"))
        assert not os.path.isdir(os.path.join(out, "id10002"))


class TestVoxCeleb2Preprocess:
    """m4a decode is delegated to an external ffmpeg (the reference's
    audioread backend does the same for VoxCeleb2); a stub ffmpeg on PATH
    verifies the invocation + wav handoff without a real AAC decoder."""

    def _fake_corpus(self, tmp_path):
        root = tmp_path / "data"
        d = root / "VoxCeleb2" / "dev" / "aac" / "id00001" / "vid0"
        d.mkdir(parents=True)
        (d / "00001.m4a").write_bytes(b"\x00\x00\x00\x18ftypM4A ")
        return root

    def test_stub_ffmpeg_decodes(self, tmp_path, monkeypatch):
        from dvc_tpu.data.preprocess import preprocess_dataset
        from dvc_tpu.utils.wavio import write_wav

        rng = np.random.RandomState(0)
        wav = 0.4 * np.sin(2 * np.pi * 200 * np.arange(8000) / FS) \
            + 0.02 * rng.randn(8000)
        fixture = tmp_path / "decoded.wav"
        write_wav(str(fixture), wav, FS)

        bindir = tmp_path / "bin"
        bindir.mkdir()
        stub = bindir / "ffmpeg"
        stub.write_text("#!/bin/sh\n"
                        "for last in \"$@\"; do :; done\n"
                        f"cp {fixture} \"$last\"\n")
        stub.chmod(0o755)
        monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")

        root = self._fake_corpus(tmp_path)
        out = str(tmp_path / "mels")
        stats = preprocess_dataset(str(root), out, "voxceleb2")
        assert stats.n_files == 1
        fps = [f for f in os.listdir(os.path.join(out, "id00001"))
               if f.endswith("_mel.npy")]
        assert fps == ["vid0_00001_mel.npy"]
        mel = np.load(os.path.join(out, "id00001", fps[0]))
        assert mel.shape[0] == 80 and 0.0 <= mel.min() and mel.max() <= 1.0

    def test_clear_error_without_ffmpeg(self, tmp_path, monkeypatch):
        from dvc_tpu.utils.wavio import read_audio

        root = self._fake_corpus(tmp_path)
        monkeypatch.setenv("PATH", str(tmp_path / "empty"))
        m4a = os.path.join(root, "VoxCeleb2", "dev", "aac", "id00001",
                           "vid0", "00001.m4a")
        with pytest.raises(NotImplementedError, match="ffmpeg"):
            read_audio(m4a)


class TestHostileHeader:
    def test_huge_claimed_total_samples(self, tmp_path):
        """A corrupt/hostile STREAMINFO claiming 2^36-1 total samples must
        not drive a 256 GB allocation: decoding starts from a file-size
        heuristic and grows only as far as real frames decode."""
        wav = 0.3 * np.sin(2 * np.pi * 220 * np.arange(4000) / FS)
        p = tmp_path / "big_claim.flac"
        write_flac(str(p), wav, FS)
        data = bytearray(p.read_bytes())
        # STREAMINFO body starts at offset 8; total_samples is bits 108-143
        data[8 + 13] |= 0x0F
        for i in range(14, 18):
            data[8 + i] = 0xFF
        p.write_bytes(bytes(data))
        got, sr = native_flac.read_flac(str(p))
        assert sr == FS and len(got) == 4000
