"""Speaker-verification data objects for GE2E training.

Parity with reference preprocessing/encoder/data_objects/:
  * RandomCycler (random_cycler.py:5-37): sample a source list in random
    order, guaranteeing every element appears at most twice as often as any
    other over any window;
  * Speaker.random_partial (speaker.py:22-40) + Utterance.random_partial
    (utterance.py:12-28): per speaker, sample U utterances and a random
    `n_frames` crop of each.  NOTE utterance.py:20 has `if frames.shape[0]:`
    (always true) so the reference ALWAYS crops from frame 0 — a bug; here
    the crop start is properly uniform random;
  * SpeakerBatch (speaker_batch.py:6-12): stacks to (S*U, n_frames, 80).

Mels on disk are (n_mels, T) .npy files (the preprocessing layout); they are
transposed to (T, n_mels) for the time-major LSTM, as the reference's
encoder data path does.
"""

from __future__ import annotations

import glob
import os
import random
from typing import Iterator, Sequence

import numpy as np


class RandomCycler:
    """Reference random_cycler.py:5-37 semantics."""

    def __init__(self, source: Sequence):
        if len(source) == 0:
            raise Exception("Can't create RandomCycler from an empty collection")
        self.all_items = list(source)
        self.next_items: list = []

    def sample(self, count: int) -> list:
        shuffle = lambda l: random.sample(l, len(l))
        out = []
        while count > 0:
            if count >= len(self.all_items):
                out.extend(shuffle(list(self.all_items)))
                count -= len(self.all_items)
                continue
            n = min(count, len(self.next_items))
            out.extend(self.next_items[:n])
            count -= n
            self.next_items = self.next_items[n:]
            if len(self.next_items) == 0:
                self.next_items = shuffle(list(self.all_items))
        return out

    def __next__(self):
        return self.sample(1)[0]


class Speaker:
    def __init__(self, root: str):
        self.root = root
        self.name = os.path.basename(os.path.normpath(root))
        fps = sorted(glob.glob(os.path.join(root, "*.npy")))
        if not fps:
            raise Exception(f"no utterances for speaker {self.name}")
        self.utterance_fps = fps
        self.cycler = RandomCycler(fps)
        self._cache: dict[str, np.ndarray] = {}

    def _frames(self, fp: str) -> np.ndarray:
        if fp not in self._cache:
            self._cache[fp] = np.load(fp).T.astype(np.float32)  # (T, n_mels)
        return self._cache[fp]

    def random_partial(self, count: int, n_frames: int,
                       rng: np.random.RandomState) -> np.ndarray:
        """-> (count, n_frames, n_mels) random crops of `count` utterances."""
        fps = self.cycler.sample(count)
        out = np.zeros((count, n_frames, 80), np.float32)
        for i, fp in enumerate(fps):
            frames = self._frames(fp)
            if len(frames) <= n_frames:
                padded = np.zeros((n_frames, frames.shape[1]), np.float32)
                padded[: len(frames)] = frames
                out[i] = padded
            else:
                start = rng.randint(0, len(frames) - n_frames)
                out[i] = frames[start:start + n_frames]
        return out


class SpeakerVerificationSampler:
    """Infinite batch stream: (speakers_per_batch, utts_per_speaker, n_frames,
    n_mels) — the collated SpeakerBatch of the reference DataLoader
    (speaker_verification_dataset.py:36-61)."""

    def __init__(self, dataset_root: str, speakers_per_batch: int = 64,
                 utterances_per_speaker: int = 10, n_frames: int = 63,
                 seed: int = 0, min_utterances: int = 1):
        speaker_dirs = sorted(
            d for d in glob.glob(os.path.join(dataset_root, "*"))
            if os.path.isdir(d))
        self.speakers = []
        for d in speaker_dirs:
            try:
                s = Speaker(d)
            except Exception:
                continue
            if len(s.utterance_fps) >= min_utterances:
                self.speakers.append(s)
        if not self.speakers:
            raise Exception(f"no speakers under {dataset_root}")
        self.cycler = RandomCycler(self.speakers)
        self.s = speakers_per_batch
        self.u = utterances_per_speaker
        self.n_frames = n_frames
        self.rng = np.random.RandomState(seed)
        random.seed(seed)

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            yield self.next_batch()

    def next_batch(self) -> np.ndarray:
        s_count = min(self.s, len(self.speakers))
        speakers = self.cycler.sample(s_count)
        batch = np.stack([
            spk.random_partial(self.u, self.n_frames, self.rng)
            for spk in speakers])
        return batch  # (S, U, n_frames, n_mels)
