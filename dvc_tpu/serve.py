"""Production serving: an HTTP voice-conversion service with cross-request
micro-batching.

The reference is an offline research script (conversion.sh converts two
utterances and exits); serving is an additive capability built on the same
latent-swap math (convert/conversion.py) designed around the TPU execution
model:

  * target-speaker styles are precomputed ONCE per speaker (mean style_mu
    over all of the speaker's 64-frame chunks — the reference's per-run
    random-utterance style, conversion.py:105, replaced by the stabler
    all-utterance mean) and cached on device;
  * concurrent requests are drained into ONE device batch: every request's
    chunks concatenate on the chunk axis (already the batch axis of the
    conversion program), run through a single encode/decode/postnet pass,
    and are split back per request — so the MXU sees one large matmul
    stream instead of per-request dispatches;
  * chunk-axis batch sizes are bucketed to powers of two (bounded XLA
    recompiles, padded tails masked out);
  * the vocoder runs through its `.batch` path (one Pallas launch / one
    Griffin-Lim inversion for the whole drain).

Endpoints (stdlib http.server; zero new dependencies):
  GET  /health                      -> {"status": "ok", "speakers": [...]}
  GET  /stats                       -> counters incl. batching ratio
  POST /convert?trg_spk=<spk>       -> body: wav bytes; reply: wav bytes

CLI: python -m dvc_tpu.cli.run serve --dataset_fp <mel_dir> --log_dir <run>
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from dataclasses import dataclass, field
from glob import glob
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse
import os

import numpy as np

import jax
import jax.numpy as jnp

from dvc_tpu.config import Config
from dvc_tpu.ops.chunk import chunk_mel, num_chunks


class ServiceOverloaded(Exception):
    """Request queue at capacity — clients should back off (HTTP 503)."""


def _bucket(n: int) -> int:
    b = 1
    while b < n:
        b <<= 1
    return b


@dataclass
class _Request:
    payload: np.ndarray                   # mel (80, T) or raw wav (N,)
    trg_spk: str
    done: threading.Event = field(default_factory=threading.Event)
    result: np.ndarray | None = None
    error: BaseException | None = None
    abandoned: bool = False               # submit timed out; skip the work
    t_submit: float = field(default_factory=time.monotonic)


class _MicroBatchService:
    """Queue + worker scaffolding shared by the mel and WORLD services:
    concurrent requests drain into one device batch (submit/_drain/_run);
    subclasses implement _process(batch) and _cost(request)."""

    input_kind = "mel"        # what submit() expects ("mel" | "wav")
    output_is_wav = False     # whether results are waveforms

    def _start(self, max_wait_ms: float, max_queue: int,
               max_batch_cost: int):
        self.max_wait_ms = max_wait_ms
        self.max_batch_cost = max_batch_cost
        self._q: queue.Queue[_Request] = queue.Queue(maxsize=max_queue)
        self.stats = {"requests": 0, "batches": 0, "chunks": 0,
                      "errors": 0}
        self._latencies: list[float] = []  # rolling window, seconds
        # guards stats/_latencies: mutated by the worker thread, read by
        # /stats handler threads
        self._stats_lock = threading.Lock()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, payload: np.ndarray, trg_spk: str,
               timeout: float = 120.0) -> np.ndarray:
        req = _Request(payload=payload, trg_spk=trg_spk)
        try:
            self._q.put_nowait(req)
        except queue.Full:
            raise ServiceOverloaded(
                f"request queue at capacity ({self._q.maxsize})") from None
        if not req.done.wait(timeout):
            # mark so the worker skips the device work for a reply nobody
            # will read (otherwise abandoned retries deepen an overload)
            req.abandoned = True
            raise TimeoutError("conversion timed out")
        if req.error is not None:
            raise req.error
        return req.result

    def _cost(self, req: _Request) -> int:
        raise NotImplementedError

    def _process(self, batch: list[_Request]) -> None:
        raise NotImplementedError

    def _drain(self) -> list[_Request]:
        """One micro-batch: block for the first request, then keep draining
        until the cost budget or the wait window is exhausted."""
        first = self._q.get()
        batch = [first]
        cost = self._cost(first)
        deadline = time.monotonic() + self.max_wait_ms / 1000.0
        while cost < self.max_batch_cost:
            remain = deadline - time.monotonic()
            if remain <= 0:
                break
            try:
                nxt = self._q.get(timeout=remain)
            except queue.Empty:
                break
            batch.append(nxt)
            cost += self._cost(nxt)
        return batch

    def _run(self):
        while True:
            batch = self._drain()
            try:
                self._process(batch)
            except Exception as e:  # pragma: no cover - defensive
                with self._stats_lock:
                    self.stats["errors"] += len(batch)
                for r in batch:
                    r.error = e
                    r.done.set()

    def _fail_request(self, r: _Request, e: BaseException):
        r.error = e
        r.done.set()
        with self._stats_lock:
            self.stats["errors"] += 1

    def _finish(self, owners: list[_Request], results: list[np.ndarray],
                n_chunks: int):
        now = time.monotonic()
        for r, w in zip(owners, results):
            r.result = np.asarray(w)
            r.done.set()
        with self._stats_lock:
            self._latencies.extend(now - r.t_submit for r in owners)
            del self._latencies[:-512]  # rolling window
            self.stats["requests"] += len(owners)
            self.stats["batches"] += 1
            self.stats["chunks"] += n_chunks


class ConversionService(_MicroBatchService):
    """Device-side mel conversion engine with a micro-batching worker."""

    def __init__(self, cfg: Config, model, variables, dataset_fp: str,
                 vocoder=None, max_batch_chunks: int = 64,
                 max_wait_ms: float = 10.0, max_queue: int = 256,
                 fs_mask=None):
        self.cfg = cfg
        self.model = model
        self.variables = variables
        self.dataset_fp = dataset_fp
        self.vocoder = vocoder
        self.output_is_wav = vocoder is not None
        self._style_cache: dict[str, jnp.ndarray] = {}
        self._style_lock = threading.Lock()
        self._start(max_wait_ms, max_queue, max_batch_chunks)

        frames = cfg.vae.frames
        mask = None if fs_mask is None else jnp.asarray(fs_mask, jnp.float32)

        # variables are passed as runtime jit ARGUMENTS, device-put once —
        # closing over them bakes every parameter into the compile payload
        # as an HLO constant, which the remote-compile transport rejects
        # for full-size models (HTTP 413) and bloats the executable.
        v_dev = jax.device_put(variables)

        if mask is None:
            @jax.jit
            def _convert(v, chunks, styles):
                # chunks (N, 80, F), styles (N, S): encode source content,
                # swap in the per-chunk target style, decode+postnet, clamp
                _, _, content_mu, _ = model.apply(v, chunks,
                                                  method="encode")
                z = jnp.concatenate([styles, content_mu], axis=-1)
                mel = model.apply(v, z, method="decode")
                mel = mel + model.apply(v, mel, method="postnet")
                return jnp.clip(mel, 0.0, 1.0)

            @jax.jit
            def _style_of(v, chunks):
                style_mu, _, _, _ = model.apply(v, chunks,
                                                method="encode")
                return jnp.mean(style_mu, axis=0)
        else:
            # FeatureSelection-masked swap (convert --fs_mask semantics,
            # conversion._convert_chunks_fs): the cached per-speaker vector
            # is the target's mean FULL latent, and convert_z takes it on
            # every masked dim.  The style dims are always masked, so the
            # source's per-chunk style values never reach the decoder —
            # no per-request style averaging is needed in the micro-batch.
            @jax.jit
            def _convert(v, chunks, trg_latents):
                style_mu, _, content_mu, _ = model.apply(
                    v, chunks, method="encode")
                src_z = jnp.concatenate([style_mu, content_mu], axis=-1)
                z = src_z * (1.0 - mask) + trg_latents * mask
                mel = model.apply(v, z, method="decode")
                mel = mel + model.apply(v, mel, method="postnet")
                return jnp.clip(mel, 0.0, 1.0)

            @jax.jit
            def _style_of(v, chunks):
                style_mu, _, content_mu, _ = model.apply(
                    v, chunks, method="encode")
                z = jnp.concatenate([style_mu, content_mu], axis=-1)
                return jnp.mean(z, axis=0)

        self._convert = lambda chunks, s: _convert(v_dev, chunks, s)
        self._style_of = lambda chunks: _style_of(v_dev, chunks)
        self._frames = frames

    # -- target styles -------------------------------------------------------

    def speakers(self) -> list[str]:
        return sorted(d for d in os.listdir(self.dataset_fp)
                      if os.path.isdir(os.path.join(self.dataset_fp, d)))

    def target_style(self, spk: str) -> jnp.ndarray:
        with self._style_lock:
            hit = self._style_cache.get(spk)
            if hit is not None:
                return hit
        fps = sorted(glob(os.path.join(self.dataset_fp, spk, "*.npy")))
        if not fps:
            raise KeyError(f"unknown target speaker {spk!r}")
        chunks = [chunk_mel(jnp.asarray(np.load(fp), jnp.float32),
                            self._frames) for fp in fps]
        style = self._style_of(jnp.concatenate(chunks, axis=0))
        with self._style_lock:
            self._style_cache[spk] = style
        return style

    # -- request path --------------------------------------------------------

    def _cost(self, req: _Request) -> int:
        return num_chunks(req.payload.shape[1], self._frames)

    def _process(self, batch: list[_Request]):
        frames = self._frames
        all_chunks, styles, spans = [], [], []
        offset = 0
        for r in batch:
            if r.abandoned:
                continue
            try:
                style = self.target_style(r.trg_spk)
            except Exception as e:
                # per-request failure (unknown speaker, corrupt mel on
                # disk, ...) must not poison the co-batched requests
                self._fail_request(r, e)
                continue
            c = chunk_mel(jnp.asarray(r.payload, jnp.float32), frames)
            spans.append((r, offset, c.shape[0]))
            offset += c.shape[0]
            all_chunks.append(c)
            styles.append(jnp.broadcast_to(style[None, :],
                                           (c.shape[0], style.shape[-1])))
        if not all_chunks:
            return
        chunks = jnp.concatenate(all_chunks, axis=0)
        style_arr = jnp.concatenate(styles, axis=0)
        n = chunks.shape[0]
        nb = _bucket(max(n, 1))
        if nb > n:  # pad to the bucket; padded chunks are discarded below
            chunks = jnp.concatenate(
                [chunks, jnp.zeros((nb - n,) + chunks.shape[1:],
                                   chunks.dtype)], axis=0)
            style_arr = jnp.concatenate(
                [style_arr, jnp.zeros((nb - n, style_arr.shape[-1]),
                                      style_arr.dtype)], axis=0)
        out = np.asarray(self._convert(chunks, style_arr))[:n]

        mels, owners = [], []
        for r, start, count in spans:
            mel = out[start:start + count]           # (count, 80, F)
            mel = mel.transpose(1, 0, 2).reshape(mel.shape[1], -1)
            mels.append(mel.astype(np.float32))
            owners.append(r)
        if self.vocoder is not None:
            batch_fn = getattr(self.vocoder, "batch", None)
            wavs = batch_fn(mels) if batch_fn is not None \
                else [self.vocoder(m) for m in mels]
        else:
            wavs = mels  # mel-out mode (no vocoder): return the mel itself
        self._finish(owners, wavs, n)


class ProfileTransferService(_MicroBatchService):
    """`serve --profile_transfer`: the model-free DSP conversion route.

    No checkpoint and no device program: converted = source mel shifted by
    (target speaker's mean spectral profile − the source's profile), clipped
    to [0,1] (convert/conversion.py profile_transfer_mel — content-
    preserving by construction, and the measured honesty baseline every
    learned conversion in this repo is compared against).  A serving
    request carries no source-speaker label, so the source profile is
    estimated from the request utterance itself (its own time-mean mel);
    target profiles are computed once per speaker from dataset_fp and
    cached.  The vocoder (when given) is the only device work."""

    def __init__(self, cfg: Config, dataset_fp: str, vocoder=None,
                 max_batch_chunks: int = 64, max_wait_ms: float = 10.0,
                 max_queue: int = 256):
        self.cfg = cfg
        self.dataset_fp = dataset_fp
        self.vocoder = vocoder
        self.output_is_wav = vocoder is not None
        self._prof_cache: dict[str, np.ndarray] = {}
        self._prof_lock = threading.Lock()
        self._frames = cfg.vae.frames
        self._start(max_wait_ms, max_queue, max_batch_chunks)

    def speakers(self) -> list[str]:
        return sorted(d for d in os.listdir(self.dataset_fp)
                      if os.path.isdir(os.path.join(self.dataset_fp, d)))

    def target_profile(self, spk: str) -> np.ndarray:
        with self._prof_lock:
            hit = self._prof_cache.get(spk)
            if hit is not None:
                return hit
        from dvc_tpu.convert.conversion import speaker_mel_profile
        fps = sorted(glob(os.path.join(self.dataset_fp, spk, "*.npy")))
        if not fps:
            raise KeyError(f"unknown target speaker {spk!r}")
        prof = speaker_mel_profile(fps)
        with self._prof_lock:
            self._prof_cache[spk] = prof
        return prof

    def _cost(self, req: _Request) -> int:
        # same cost unit as ConversionService so --max_wait_ms/--max_batch
        # tuning carries over (the vocoder batch is the real device work)
        return num_chunks(req.payload.shape[1], self._frames)

    def _process(self, batch: list[_Request]):
        from dvc_tpu.convert.conversion import profile_transfer_mel
        mels, owners, n = [], [], 0
        for r in batch:
            if r.abandoned:
                continue
            try:
                prof = self.target_profile(r.trg_spk)
            except Exception as e:
                self._fail_request(r, e)
                continue
            src = np.asarray(r.payload, np.float32)
            mels.append(profile_transfer_mel(src, src.mean(axis=1), prof))
            owners.append(r)
            n += num_chunks(src.shape[1], self._frames)
        if not owners:
            return
        if self.vocoder is not None:
            batch_fn = getattr(self.vocoder, "batch", None)
            wavs = batch_fn(mels) if batch_fn is not None \
                else [self.vocoder(m) for m in mels]
        else:
            wavs = mels
        self._finish(owners, wavs, n)


class WorldConversionService(_MicroBatchService):
    """`serve --pipeline world`: the MCC/WORLD conversion route, batched.

    The reference's WORLD path (preprocessing/WORLD_processing.py:99-106)
    is an offline per-utterance loop; here every stage of the drained
    micro-batch runs corpus-batched on the accelerator:

      wav bytes -> device WORLD analysis (ops/world.world_decompose_batch:
      batched Harvest + CheapTrick + mcep) -> per-utterance MCC
      normalization -> ONE chunk-axis VAE pass (target style latent from
      the speaker's preprocessed corpus, source content per chunk;
      convert_mcc semantics: decode only, no postnet/clip) -> target-space
      denormalization + mc2sp -> log-Gaussian pitch transform
      (WORLD_processing.py:187-192; source log-f0 stats fitted on the
      incoming utterance itself, since the serving client's speaker corpus
      is unknown) -> ops/world.synthesize_batch (bucketed device OLA
      synthesis).

    dataset_fp is a data/world_preprocess.py output dir: per-speaker npz
    subdirs plus log_f0_<spk>.npz / mcep_<spk>.npz stats files.
    """

    input_kind = "wav"
    output_is_wav = True
    vocoder = None  # synthesis is built in

    def __init__(self, cfg: Config, model, variables, dataset_fp: str,
                 sample_rate: int = 16_000, frame_period: float = 5.0,
                 max_batch_utts: int = 16, max_wait_ms: float = 10.0,
                 max_queue: int = 256, fs_mask=None):
        self.cfg = cfg
        self.model = model
        self.variables = variables
        self.dataset_fp = dataset_fp
        self.fs = sample_rate
        self.frame_period = frame_period
        self._frames = cfg.vae.frames
        self._n_mcep = cfg.vae.num_mels
        self._asset_cache: dict[str, tuple] = {}
        self._asset_lock = threading.Lock()

        model_ = model
        mask = None if fs_mask is None else jnp.asarray(fs_mask, jnp.float32)
        # runtime jit args, not closure constants — see ConversionService
        v_dev = jax.device_put(variables)

        if mask is None:
            @jax.jit
            def _convert(v, chunks, styles):
                # chunks (N, n_mcep, F), styles (N, S): convert_mcc semantics
                # (convert/world_conversion.py:35-57) — decode only
                _, _, content_mu, _ = model_.apply(v, chunks,
                                                   method="encode")
                z = jnp.concatenate([styles, content_mu], axis=-1)
                return model_.apply(v, z, method="decode")

            @jax.jit
            def _style_of(v, chunks):
                style_mu, _, _, _ = model_.apply(v, chunks,
                                                 method="encode")
                return jnp.mean(style_mu, axis=0)
        else:
            # FeatureSelection-masked swap on the WORLD route (convert-world
            # --fs_mask semantics, world_conversion.convert_mcc:63-69): the
            # cached per-speaker vector is the target's mean FULL latent,
            # taken on every masked dim; decode only, no postnet/clip.
            @jax.jit
            def _convert(v, chunks, trg_latents):
                style_mu, _, content_mu, _ = model_.apply(
                    v, chunks, method="encode")
                src_z = jnp.concatenate([style_mu, content_mu], axis=-1)
                z = src_z * (1.0 - mask) + trg_latents * mask
                return model_.apply(v, z, method="decode")

            @jax.jit
            def _style_of(v, chunks):
                style_mu, _, content_mu, _ = model_.apply(
                    v, chunks, method="encode")
                z = jnp.concatenate([style_mu, content_mu], axis=-1)
                return jnp.mean(z, axis=0)

        self._convert = lambda chunks, s: _convert(v_dev, chunks, s)
        self._style_of = lambda chunks: _style_of(v_dev, chunks)
        self._start(max_wait_ms, max_queue, max_batch_utts)

    # -- target speaker assets ------------------------------------------

    def speakers(self) -> list[str]:
        return sorted(d for d in os.listdir(self.dataset_fp)
                      if os.path.isdir(os.path.join(self.dataset_fp, d)))

    def target_assets(self, spk: str):
        """(style latent, mcep stats dict, logf0 stats dict), cached."""
        with self._asset_lock:
            hit = self._asset_cache.get(spk)
            if hit is not None:
                return hit
        fps = sorted(glob(os.path.join(self.dataset_fp, spk, "*.npz")))
        if not fps:
            raise KeyError(f"unknown target speaker {spk!r}")
        chunks = [chunk_mel(jnp.asarray(
            np.load(fp)["normalized_mc"].T, jnp.float32), self._frames)
            for fp in fps]
        style = self._style_of(jnp.concatenate(chunks, axis=0))
        mcep = dict(np.load(os.path.join(self.dataset_fp,
                                         f"mcep_{spk}.npz")))
        logf0 = dict(np.load(os.path.join(self.dataset_fp,
                                          f"log_f0_{spk}.npz")))
        assets = (style, mcep, logf0)
        with self._asset_lock:
            self._asset_cache[spk] = assets
        return assets

    # -- request path ----------------------------------------------------

    def _cost(self, req: _Request) -> int:
        return 1  # utterances; analysis cost scales with total duration

    def _process(self, batch: list[_Request]):
        from dvc_tpu.ops.world import (
            cheaptrick_fft_size,
            logf0_statistics,
            mc2sp,
            mcepalpha,
            pitch_conversion,
            synthesize_batch,
            world_decompose_batch,
        )

        live = []
        for r in batch:
            if r.abandoned:
                continue
            try:
                assets = self.target_assets(r.trg_spk)
            except Exception as e:
                self._fail_request(r, e)
                continue
            live.append((r, assets))
        if not live:
            return

        # 1. batched device analysis
        feats = world_decompose_batch([np.asarray(r.payload, np.float32)
                                       for r, _ in live],
                                      self.fs, self.frame_period,
                                      num_mcep=self._n_mcep,
                                      keep_sp_ap=False)

        # 2. per-utterance normalization + chunking -> one VAE batch
        all_chunks, styles, spans, norms = [], [], [], []
        offset = 0
        for (r, (style, _, _)), (f0, _, _, _, mc) in zip(live, feats):
            mean = mc.mean(axis=0, keepdims=True)
            std = np.maximum(mc.std(axis=0, keepdims=True), 1e-6)
            norm = ((mc - mean) / std).T.astype(np.float32)  # (n_mcep, T)
            c = chunk_mel(jnp.asarray(norm), self._frames)
            spans.append((offset, c.shape[0], norm.shape[1]))
            norms.append((f0, mean, std))
            offset += c.shape[0]
            all_chunks.append(c)
            styles.append(jnp.broadcast_to(style[None, :],
                                           (c.shape[0], style.shape[-1])))
        chunks = jnp.concatenate(all_chunks, axis=0)
        style_arr = jnp.concatenate(styles, axis=0)
        n = chunks.shape[0]
        nb = _bucket(max(n, 1))
        if nb > n:
            chunks = jnp.concatenate(
                [chunks, jnp.zeros((nb - n,) + chunks.shape[1:],
                                   chunks.dtype)], axis=0)
            style_arr = jnp.concatenate(
                [style_arr, jnp.zeros((nb - n, style_arr.shape[-1]),
                                      style_arr.dtype)], axis=0)
        out = np.asarray(self._convert(chunks, style_arr))[:n]

        # 3. denorm (target stats), mc2sp, pitch transform, batch synth
        alpha = mcepalpha(self.fs)
        fft_size = cheaptrick_fft_size(self.fs)
        f0s, sps, aps, owners = [], [], [], []
        for (r, (_, mcep_stats, trg_lf0)), (start, count, t), \
                (f0, _, _) in zip(live, spans, norms):
            conv = out[start:start + count]            # (count, n_mcep, F)
            conv = conv.transpose(1, 0, 2).reshape(conv.shape[1], -1)[:, :t]
            mc = conv.T * np.asarray(mcep_stats["std"]).T \
                + np.asarray(mcep_stats["mean"]).T     # (T, n_mcep)
            sp = np.asarray(mc2sp(jnp.asarray(mc, jnp.float32), alpha,
                                  fft_size))
            voiced = f0 > 0
            f0_conv = np.zeros_like(f0)
            if voiced.any():
                src_mean, src_std = logf0_statistics(f0)
                if np.isfinite(src_std) and src_std > 1e-6:
                    f0_conv[voiced] = pitch_conversion(
                        f0[voiced], src_mean, src_std,
                        float(trg_lf0["mean"]), float(trg_lf0["std"]))
                else:  # monotone input: shift to the target mean pitch
                    f0_conv[voiced] = np.exp(float(trg_lf0["mean"]))
            ap = np.full((t, sp.shape[1]), 0.2, np.float32)
            ap[~voiced[:t]] = 1.0 - 1e-12
            f0s.append(f0_conv[:t])
            sps.append(sp[:t])
            aps.append(ap)
            owners.append(r)

        wavs = synthesize_batch(f0s, sps, aps, self.fs, self.frame_period)
        results = []
        for w in wavs:
            peak = np.abs(w).max()
            results.append(w / peak * 0.95 if peak > 1e-8 else w)
        self._finish(owners, results, n)


def make_http_server(service: _MicroBatchService, host: str = "127.0.0.1",
                     port: int = 7860) -> ThreadingHTTPServer:
    from dvc_tpu.ops.mel import melspectrogram
    from dvc_tpu.ops.stft import num_frames
    from dvc_tpu.utils.wavio import write_wav

    audio_cfg = service.cfg.audio
    mel_jit = jax.jit(lambda w: melspectrogram(w, audio_cfg))

    def mel_fn(wav: np.ndarray) -> np.ndarray:
        # bucket the sample count to a power of two so arbitrary client
        # lengths reuse a handful of compiled programs (zero-pad extends
        # the framing's own zero padding, so the first num_frames(orig)
        # frames are unchanged), then crop to the true frame count
        n = len(wav)
        padded = np.zeros(_bucket(max(n, audio_cfg.hop_size)), np.float32)
        padded[:n] = wav
        mel = np.asarray(mel_jit(jnp.asarray(padded)))
        return mel[:, :num_frames(n, audio_cfg.fft_size, audio_cfg.hop_size)]

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # quiet by default
            pass

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = urlparse(self.path).path
            if path == "/health":
                self._json(200, {"status": "ok",
                                 "speakers": service.speakers()})
            elif path == "/stats":
                with service._stats_lock:
                    s = dict(service.stats)
                    lat = list(service._latencies)
                s["batching_ratio"] = (s["requests"] / s["batches"]
                                       if s["batches"] else 0.0)
                if lat:
                    arr = np.sort(np.asarray(lat))
                    s["latency_ms"] = {
                        "p50": round(float(arr[len(arr) // 2]) * 1e3, 1),
                        "p95": round(float(arr[int(len(arr) * 0.95)
                                              if len(arr) > 1 else 0]) * 1e3,
                                     1),
                        "max": round(float(arr[-1]) * 1e3, 1),
                        "window": len(arr),
                    }
                self._json(200, s)
            else:
                self._json(404, {"error": f"unknown path {path}"})

        def do_POST(self):
            parsed = urlparse(self.path)
            if parsed.path != "/convert":
                self._json(404, {"error": f"unknown path {parsed.path}"})
                return
            q = parse_qs(parsed.query)
            trg = q.get("trg_spk", [""])[0]
            if not trg:
                self._json(400, {"error": "trg_spk query parameter required"})
                return
            if trg not in service.speakers():
                self._json(404, {"error": f"unknown target speaker {trg!r}"})
                return
            length = int(self.headers.get("Content-Length", 0))
            if length <= 0:
                self._json(400, {"error": "wav body required"})
                return
            body = self.rfile.read(length)
            try:
                from dvc_tpu.utils.wavio import read_wav
                import tempfile
                with tempfile.NamedTemporaryFile(suffix=".wav",
                                                 delete=False) as tmp:
                    tmp.write(body)
                    tmp_path = tmp.name
                try:
                    wav, sr = read_wav(tmp_path)
                finally:
                    os.unlink(tmp_path)
                if sr != audio_cfg.sample_rate:
                    from dvc_tpu.ops.audio import resample_poly
                    wav = np.asarray(resample_poly(jnp.asarray(wav), sr,
                                                   audio_cfg.sample_rate))
                wav = np.asarray(wav, np.float32)
                payload = mel_fn(wav) if service.input_kind == "mel" else wav
                out = service.submit(payload, trg)
            except KeyError as e:
                # speaker dir listed but empty, or removed after the check
                self._json(404, {"error": str(e)})
                return
            except (ServiceOverloaded, TimeoutError) as e:
                self._json(503, {"error": str(e)})
                return
            except Exception as e:
                self._json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            if not service.output_is_wav:
                # mel-out mode: npy bytes
                buf = io.BytesIO()
                np.save(buf, out)
                payload = buf.getvalue()
                ctype = "application/octet-stream"
            else:
                import tempfile
                with tempfile.NamedTemporaryFile(suffix=".wav",
                                                 delete=False) as tmp:
                    tmp_path = tmp.name
                try:
                    write_wav(tmp_path, out, audio_cfg.sample_rate)
                    with open(tmp_path, "rb") as f:
                        payload = f.read()
                finally:
                    os.unlink(tmp_path)
                ctype = "audio/wav"
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

    return ThreadingHTTPServer((host, port), Handler)
