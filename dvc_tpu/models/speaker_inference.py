"""Speaker-encoder inference: utterance embeddings from sliding partials.

Parity with reference preprocessing/encoder/inference.py:15-155:
  * compute_partial_slices — 50%-overlap windows of partials_n_frames mel
    frames with the min_pad_coverage tail rule (:59-108, exact math);
  * embed_utterance — mean of partial embeddings, L2-normalized (:111-155);
  * embed_frames_batch — batched forward (:43-56).

TPU-native: partials of MANY utterances can be stacked into one batch and
embedded in a single jitted call (embed_frames_batch is just model.apply).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from dvc_tpu.config import AudioConfig, SpeakerEncoderConfig
from dvc_tpu.models.speaker_encoder import SpeakerEncoder


def compute_partial_slices(n_samples: int, partial_utterance_n_frames: int = 63,
                           min_pad_coverage: float = 0.75, overlap: float = 0.5,
                           sampling_rate: int = 16_000,
                           mel_window_step_ms: int = 10,
                           samples_per_frame: int | None = None
                           ) -> tuple[list[slice], list[slice]]:
    """Sliding-window partial slices over an utterance.

    The window/step/coverage arithmetic is a numeric parity contract with
    reference encoder/inference.py:59-108 (50%-overlap windows; a short tail
    window is kept only when it covers >= min_pad_coverage of a full one);
    computed here vectorized over all window starts at once.

    samples_per_frame overrides the ms-derived hop: the reference's encoder
    mels use a 10 ms step (160 samples), but THIS framework has one mel
    config for everything (AudioConfig.hop_size = 256) — callers slicing
    framework mels must pass that hop or the mel slices run past the frame
    count.
    """
    assert 0 <= overlap < 1
    assert 0 < min_pad_coverage <= 1

    if samples_per_frame is None:
        samples_per_frame = int(sampling_rate * mel_window_step_ms / 1000)
    n_frames = int(np.ceil((n_samples + 1) / samples_per_frame))
    frame_step = max(int(np.round(partial_utterance_n_frames * (1 - overlap))), 1)

    starts = np.arange(0, max(1, n_frames - partial_utterance_n_frames
                              + frame_step + 1), frame_step)
    ends = starts + partial_utterance_n_frames

    # Tail rule: the final window runs past the signal; keep it only if the
    # real samples cover enough of it (otherwise it is mostly padding).
    tail_cover = (n_samples - starts[-1] * samples_per_frame) \
        / (partial_utterance_n_frames * samples_per_frame)
    if tail_cover < min_pad_coverage and len(starts) > 1:
        starts, ends = starts[:-1], ends[:-1]

    mel_slices = [slice(int(a), int(b)) for a, b in zip(starts, ends)]
    wav_slices = [slice(int(a) * samples_per_frame, int(b) * samples_per_frame)
                  for a, b in zip(starts, ends)]
    return wav_slices, mel_slices


@dataclass
class SpeakerEmbedder:
    """Lazy-model embedding front end (role of the module-global _model in
    encoder/inference.py:11-41)."""

    cfg: SpeakerEncoderConfig = SpeakerEncoderConfig()
    audio_cfg: AudioConfig = AudioConfig()

    def __post_init__(self):
        self.model = SpeakerEncoder(self.cfg)
        self.params = None
        self._embed = jax.jit(
            lambda params, x: self.model.apply({"params": params}, x))

    def load(self, params) -> None:
        # pin on device once: checkpoint restores yield host numpy trees,
        # which a per-call jit argument would re-upload on every embed
        self.params = jax.device_put(params)

    def embed_frames_batch(self, frames_batch: np.ndarray) -> np.ndarray:
        """(B, n_frames, n_mels) -> (B, E)."""
        assert self.params is not None, "call load() before inference"
        return np.asarray(self._embed(self.params, jnp.asarray(frames_batch)))

    def embed_utterance(self, wav: np.ndarray, using_partials: bool = True,
                        return_partials: bool = False):
        """Waveform -> 256-d embedding (reference :111-155)."""
        from dvc_tpu.ops.mel import melspectrogram

        if not using_partials:
            frames = np.asarray(melspectrogram(jnp.asarray(wav), self.audio_cfg)).T
            embed = self.embed_frames_batch(frames[None])[0]
            return (embed, None, None) if return_partials else embed

        wave_slices, mel_slices = compute_partial_slices(
            len(wav), self.cfg.partials_n_frames,
            sampling_rate=self.audio_cfg.sample_rate,
            samples_per_frame=self.audio_cfg.hop_size)
        max_wave_length = wave_slices[-1].stop
        if max_wave_length >= len(wav):
            wav = np.pad(wav, (0, max_wave_length - len(wav)))

        frames = np.asarray(melspectrogram(jnp.asarray(wav), self.audio_cfg)).T
        frames_batch = np.stack([frames[s] for s in mel_slices])
        partial_embeds = self.embed_frames_batch(frames_batch)
        raw = partial_embeds.mean(axis=0)
        embed = raw / np.linalg.norm(raw, 2)
        if return_partials:
            return embed, partial_embeds, wave_slices
        return embed
