"""HTTP conversion service tests (dvc_tpu/serve.py): request path, target
style cache, cross-request micro-batching, and error handling."""

import io
import json
import threading
import time
import urllib.request
import urllib.error

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvc_tpu.config import Config, VAEConfig
from dvc_tpu.models.disentangled_vae import DisentangledVAE
from dvc_tpu.serve import ConversionService, make_http_server

CFG = Config(vae=VAEConfig(frames=16, dim_neck=8, enc_channels=32,
                           dim_pre=32, dec_lstm2_hidden=32,
                           postnet_channels=32))


@pytest.fixture(scope="module")
def service(tmp_path_factory):
    model = DisentangledVAE(CFG.vae)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, CFG.vae.num_mels, CFG.vae.frames), jnp.float32)
    variables = model.init({"params": rng, "reparam": rng}, x, x, train=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}

    mel_dir = tmp_path_factory.mktemp("mels")
    np_rng = np.random.RandomState(0)
    for spk in ("p1", "p2"):
        d = mel_dir / spk
        d.mkdir()
        for i in range(2):
            np.save(d / f"{spk}_{i:03d}_mel.npy",
                    np_rng.rand(80, 40).astype(np.float32))
    # no vocoder: mel-out mode; generous wait window so concurrent
    # requests land in one batch deterministically
    return ConversionService(CFG, model, variables, str(mel_dir),
                             vocoder=None, max_wait_ms=300.0)


@pytest.fixture(scope="module")
def server(service):
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    srv = make_http_server(service, "127.0.0.1", port)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read())


def _post_wav(url, wav_bytes):
    req = urllib.request.Request(url, data=wav_bytes, method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, r.read()


def _wav_bytes(seconds=0.4, seed=0):
    import tempfile, os
    from dvc_tpu.utils.wavio import write_wav
    rng = np.random.RandomState(seed)
    t = np.arange(int(16000 * seconds)) / 16000
    wav = (0.4 * np.sin(2 * np.pi * 200 * t)
           + 0.02 * rng.randn(len(t))).astype(np.float32)
    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
        path = f.name
    write_wav(path, wav, 16000)
    with open(path, "rb") as f:
        data = f.read()
    os.unlink(path)
    return data


class TestServiceDirect:
    def test_target_style_cached(self, service):
        s1 = service.target_style("p1")
        s2 = service.target_style("p1")
        assert s1 is s2
        assert s1.shape == (2 * CFG.vae.speaker_size // 2,)

    def test_unknown_speaker(self, service):
        # submit re-raises the worker's exception with its real type, so
        # the HTTP layer can map KeyError to 404
        with pytest.raises(KeyError, match="unknown target speaker"):
            service.submit(np.random.rand(80, 20).astype(np.float32), "nope")

    def test_submit_returns_mel(self, service):
        mel = np.random.RandomState(1).rand(80, 33).astype(np.float32)
        out = service.submit(mel, "p2")
        n_chunks = 33 // CFG.vae.frames + 1
        assert out.shape == (80, n_chunks * CFG.vae.frames)
        assert np.isfinite(out).all()
        assert 0.0 <= out.min() and out.max() <= 1.0

    def test_micro_batching_aggregates(self, service):
        before = dict(service.stats)
        mels = [np.random.RandomState(i).rand(80, 20).astype(np.float32)
                for i in range(4)]
        results = [None] * 4

        def worker(i):
            results[i] = service.submit(mels[i], "p1")

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(r is not None and np.isfinite(r).all() for r in results)
        dreq = service.stats["requests"] - before["requests"]
        dbat = service.stats["batches"] - before["batches"]
        assert dreq == 4
        # the 300 ms window must have merged at least two requests
        assert dbat < dreq

    def test_bad_speaker_file_does_not_poison_batch(self, service):
        """A corrupt target mel fails ITS request; co-batched requests for
        healthy speakers still succeed."""
        import os
        bad_dir = os.path.join(service.dataset_fp, "broken")
        os.makedirs(bad_dir, exist_ok=True)
        with open(os.path.join(bad_dir, "x_mel.npy"), "wb") as f:
            f.write(b"not an npy file")
        try:
            results = {}

            def w(name, spk):
                try:
                    results[name] = service.submit(
                        np.random.rand(80, 20).astype(np.float32), spk)
                except Exception as e:
                    results[name] = e

            ts = [threading.Thread(target=w, args=("good", "p1")),
                  threading.Thread(target=w, args=("bad", "broken"))]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            assert isinstance(results["good"], np.ndarray)
            assert isinstance(results["bad"], Exception)
        finally:
            import shutil
            shutil.rmtree(bad_dir)

    def test_batched_equals_solo(self, service):
        """Micro-batched conversion must be value-identical to a solo
        request (padding/bucketing cannot leak between requests)."""
        mel = np.random.RandomState(9).rand(80, 20).astype(np.float32)
        solo = service.submit(mel, "p1")
        outs = [None, None]

        def w(i):
            outs[i] = service.submit(mel, "p1")

        ts = [threading.Thread(target=w, args=(i,)) for i in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        np.testing.assert_allclose(outs[0], solo, rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(outs[1], solo, rtol=2e-5, atol=1e-6)


class TestFSMaskedService:
    """serve --fs_mask: the FeatureSelection-masked latent swap served with
    micro-batching must be value-identical to convert_mel(fs_mask=...) —
    the per-speaker cache holds the target's mean FULL latent and the
    style dims are always masked, so per-chunk source style never reaches
    the decoder (see ConversionService)."""

    @pytest.fixture(scope="class")
    def fs_setup(self, tmp_path_factory):
        from dvc_tpu.convert.conversion import binarize_fs_mask

        model = DisentangledVAE(CFG.vae)
        rng = jax.random.PRNGKey(0)
        x = jnp.zeros((2, CFG.vae.num_mels, CFG.vae.frames), jnp.float32)
        variables = model.init({"params": rng, "reparam": rng}, x, x,
                               train=True)
        variables = {"params": variables["params"],
                     "batch_stats": variables["batch_stats"]}

        mel_dir = tmp_path_factory.mktemp("fs_mels")
        np_rng = np.random.RandomState(0)
        # ONE target utterance so the service's corpus-mean latent equals
        # convert_mel's target-utterance mean exactly
        trg_mel = np_rng.rand(80, 40).astype(np.float32)
        d = mel_dir / "pt"
        d.mkdir()
        np.save(d / "pt_000_mel.npy", trg_mel)

        sig = np_rng.rand(CFG.vae.latent_dim).astype(np.float32)
        fs_mask = binarize_fs_mask(sig, CFG.vae.speaker_size, 0.5)
        svc = ConversionService(CFG, model, variables, str(mel_dir),
                                vocoder=None, max_wait_ms=50.0,
                                fs_mask=fs_mask)
        return svc, model, variables, trg_mel, fs_mask

    def test_matches_convert_mel(self, fs_setup):
        from dvc_tpu.convert.conversion import convert_mel

        svc, model, variables, trg_mel, fs_mask = fs_setup
        src = np.random.RandomState(7).rand(80, 33).astype(np.float32)
        out = svc.submit(src, "pt")
        _, want = convert_mel(model, variables, src, trg_mel,
                              frames=CFG.vae.frames, fs_mask=fs_mask)
        assert out.shape == want.shape
        np.testing.assert_allclose(out, want, rtol=2e-5, atol=1e-6)

    def test_style_cache_holds_full_latent(self, fs_setup):
        svc = fs_setup[0]
        lat = svc.target_style("pt")
        assert lat.shape == (CFG.vae.latent_dim,)


class TestWorldService:
    """serve --pipeline world: wav in -> batched WORLD analysis -> MCC
    latent swap -> device synthesis -> wav out."""

    @pytest.fixture(scope="class")
    def world_service(self, tmp_path_factory):
        from dvc_tpu.serve import WorldConversionService

        cfg = Config(vae=VAEConfig(num_mels=36, frames=32, dim_neck=8,
                                   enc_channels=32, dim_pre=32,
                                   dec_lstm2_hidden=32,
                                   postnet_channels=32))
        model = DisentangledVAE(cfg.vae)
        rng = jax.random.PRNGKey(0)
        x = jnp.zeros((2, 36, 32), jnp.float32)
        variables = model.init({"params": rng, "reparam": rng}, x, x,
                               train=True)
        variables = {"params": variables["params"],
                     "batch_stats": variables["batch_stats"]}

        world_dir = tmp_path_factory.mktemp("world")
        np_rng = np.random.RandomState(0)
        for spk in ("w1", "w2"):
            d = world_dir / spk
            d.mkdir()
            for i in range(2):
                t = 40 + 5 * i
                np.savez(d / f"u{i}.npz",
                         f0=np.abs(np_rng.rand(t) * 100 + 100),
                         normalized_mc=np_rng.randn(t, 36)
                         .astype(np.float32))
            np.savez(world_dir / f"log_f0_{spk}.npz",
                     mean=5.0 + 0.1 * ord(spk[-1]), std=0.2)
            np.savez(world_dir / f"mcep_{spk}.npz",
                     mean=np_rng.randn(36, 1) * 0.1,
                     std=np.abs(np_rng.rand(36, 1)) + 0.5)
        return WorldConversionService(cfg, model, variables,
                                      str(world_dir), max_wait_ms=300.0)

    def test_speakers_and_unknown(self, world_service):
        assert world_service.speakers() == ["w1", "w2"]
        with pytest.raises(KeyError, match="unknown target speaker"):
            world_service.submit(
                np.random.rand(6000).astype(np.float32), "nope")

    def test_wav_roundtrip(self, world_service):
        t = np.arange(6000) / 16000.0
        wav = (0.4 * np.sin(2 * np.pi * 160 * t * (1 + 0.02 * np.sin(
            2 * np.pi * 3 * t)))).astype(np.float32)
        out = world_service.submit(wav, "w1")
        n_frames = 6000 // 80 + 1
        assert out.shape == (n_frames * 80,)
        assert np.isfinite(out).all()
        assert np.abs(out).max() <= 0.951

    def test_fs_mask_matches_convert_mcc(self, tmp_path):
        """serve --pipeline world --fs_mask (ADVICE r4: used to be silently
        ignored): the served masked swap must be value-identical to
        convert-world's convert_mcc(fs_mask=...)."""
        from dvc_tpu.convert.conversion import binarize_fs_mask
        from dvc_tpu.convert.world_conversion import convert_mcc
        from dvc_tpu.ops.chunk import chunk_mel, unchunk_mel
        from dvc_tpu.serve import WorldConversionService

        cfg = Config(vae=VAEConfig(num_mels=36, frames=32, dim_neck=8,
                                   enc_channels=32, dim_pre=32,
                                   dec_lstm2_hidden=32,
                                   postnet_channels=32))
        model = DisentangledVAE(cfg.vae)
        rng = jax.random.PRNGKey(0)
        x = jnp.zeros((2, 36, 32), jnp.float32)
        variables = model.init({"params": rng, "reparam": rng}, x, x,
                               train=True)
        variables = {"params": variables["params"],
                     "batch_stats": variables["batch_stats"]}
        np_rng = np.random.RandomState(3)
        # ONE target utterance so the service's corpus-mean full latent
        # equals convert_mcc's target-utterance mean exactly
        trg_mc = np_rng.randn(45, 36).astype(np.float32)
        d = tmp_path / "wt"
        d.mkdir()
        np.savez(d / "u0.npz", f0=np.abs(np_rng.rand(45) * 100 + 100),
                 normalized_mc=trg_mc)
        np.savez(tmp_path / "log_f0_wt.npz", mean=5.0, std=0.2)
        np.savez(tmp_path / "mcep_wt.npz",
                 mean=np_rng.randn(36, 1) * 0.1,
                 std=np.abs(np_rng.rand(36, 1)) + 0.5)
        sig = np_rng.rand(cfg.vae.latent_dim).astype(np.float32)
        fs_mask = binarize_fs_mask(sig, cfg.vae.speaker_size, 0.5)
        svc = WorldConversionService(cfg, model, variables, str(tmp_path),
                                     max_wait_ms=50.0, fs_mask=fs_mask)
        lat = svc.target_assets("wt")[0]
        assert lat.shape == (cfg.vae.latent_dim,)

        src = np_rng.randn(36, 50).astype(np.float32)
        chunks = chunk_mel(jnp.asarray(src), cfg.vae.frames)
        out = np.asarray(unchunk_mel(svc._convert(
            chunks, jnp.broadcast_to(lat[None, :],
                                     (chunks.shape[0], lat.shape[-1])))))
        want = convert_mcc(model, variables, src, trg_mc.T,
                           frames=cfg.vae.frames, fs_mask=fs_mask)
        np.testing.assert_allclose(out, want, rtol=2e-5, atol=1e-6)

    def test_micro_batching(self, world_service):
        before = dict(world_service.stats)
        t = np.arange(6000) / 16000.0
        wavs = [(0.4 * np.sin(2 * np.pi * (140 + 30 * i) * t))
                .astype(np.float32) for i in range(3)]
        results = [None] * 3

        def worker(i):
            results[i] = world_service.submit(wavs[i],
                                              ["w1", "w2", "w1"][i])

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(3)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert all(r is not None and np.isfinite(r).all() for r in results)
        dreq = world_service.stats["requests"] - before["requests"]
        dbat = world_service.stats["batches"] - before["batches"]
        assert dreq == 3 and dbat < dreq


class TestProfileTransferService:
    """serve --profile_transfer: the model-free DSP route (no checkpoint,
    no device program; convert/conversion.py profile_transfer_mel with the
    request's own time-mean profile as the source profile)."""

    @pytest.fixture(scope="class")
    def pt_service(self, tmp_path_factory):
        from dvc_tpu.serve import ProfileTransferService
        mel_dir = tmp_path_factory.mktemp("pt_mels")
        np_rng = np.random.RandomState(3)
        for spk in ("p1", "p2"):
            d = mel_dir / spk
            d.mkdir()
            for i in range(2):
                np.save(d / f"{spk}_{i:03d}_mel.npy",
                        np_rng.rand(80, 40).astype(np.float32))
        return ProfileTransferService(CFG, str(mel_dir), vocoder=None,
                                      max_wait_ms=50.0), mel_dir

    def test_matches_library_function(self, pt_service):
        from glob import glob
        import os

        from dvc_tpu.convert.conversion import (profile_transfer_mel,
                                                speaker_mel_profile)
        svc, mel_dir = pt_service
        mel = np.random.RandomState(7).rand(80, 33).astype(np.float32)
        out = svc.submit(mel, "p2")
        prof = speaker_mel_profile(
            sorted(glob(os.path.join(str(mel_dir), "p2", "*.npy"))))
        np.testing.assert_allclose(
            out, profile_transfer_mel(mel, mel.mean(axis=1), prof),
            atol=1e-6)
        # no time padding: the DSP route returns the input length
        assert out.shape == mel.shape

    def test_profile_cached_and_unknown_speaker(self, pt_service):
        svc, _ = pt_service
        p1 = svc.target_profile("p1")
        assert svc.target_profile("p1") is p1
        with pytest.raises(KeyError, match="unknown target speaker"):
            svc.submit(np.random.rand(80, 20).astype(np.float32), "nope")

    def test_cli_flag_combos_rejected(self, pt_service, tmp_path):
        from dvc_tpu.cli.run import main
        _, mel_dir = pt_service
        for extra in (["--pipeline", "world"],
                      ["--fs_mask", "whatever.npz"]):
            with pytest.raises(SystemExit):
                main(["serve", "--dataset_fp", str(mel_dir),
                      "--log_dir", str(tmp_path), "--profile_transfer",
                      "--vocoder", "none"] + extra)


class TestHTTP:
    def test_health(self, server):
        code, body = _get(server + "/health")
        assert code == 200
        assert body["speakers"] == ["p1", "p2"]

    def test_convert_roundtrip(self, server):
        code, payload = _post_wav(server + "/convert?trg_spk=p1",
                                  _wav_bytes())
        assert code == 200
        mel = np.load(io.BytesIO(payload))  # mel-out mode: npy body
        assert mel.shape[0] == 80 and np.isfinite(mel).all()

    def test_missing_target(self, server):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post_wav(server + "/convert", _wav_bytes())
        assert e.value.code == 400

    def test_unknown_speaker_404(self, server):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post_wav(server + "/convert?trg_spk=ghost", _wav_bytes())
        assert e.value.code == 404

    def test_stats(self, server):
        code, body = _get(server + "/stats")
        assert code == 200
        assert body["requests"] >= 1 and body["batches"] >= 1
        lat = body["latency_ms"]
        assert lat["window"] >= 1
        assert 0 <= lat["p50"] <= lat["max"]
