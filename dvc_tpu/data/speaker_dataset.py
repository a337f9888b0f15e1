"""Speaker-verification data objects for GE2E training.

Parity with reference preprocessing/encoder/data_objects/:
  * EpochPermutationSampler fills the role of RandomCycler
    (random_cycler.py:5-37): stream a source list in random order with the
    guarantee that over any window no element appears more than twice as
    often as any other.  The mechanism here is different — concatenated
    full random permutations ("epochs") drained in order, driven by a
    numpy Generator — which meets the same bound: within one epoch every
    element appears exactly once, so across any window spanning k epoch
    boundaries counts differ by at most one epoch's worth;
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
from typing import Iterator, Sequence

import numpy as np


class EpochPermutationSampler:
    """Balanced infinite sampler (role of reference random_cycler.py:5-37).

    Items stream as a sequence of independent random permutations of the
    source; ``sample(count)`` returns the next ``count`` items of that
    stream, crossing epoch boundaries as needed.
    """

    def __init__(self, source: Sequence, rng: np.random.Generator | None = None):
        self.items = list(source)
        if not self.items:
            raise ValueError("cannot sample from an empty collection")
        self._rng = rng if rng is not None else np.random.default_rng()
        self._order = np.empty(0, np.intp)
        self._pos = 0

    def sample(self, count: int) -> list:
        out: list = []
        while len(out) < count:
            if self._pos == len(self._order):
                self._order = self._rng.permutation(len(self.items))
                self._pos = 0
            take = min(count - len(out), len(self._order) - self._pos)
            out.extend(self.items[j]
                       for j in self._order[self._pos:self._pos + take])
            self._pos += take
        return out

    def __next__(self):
        return self.sample(1)[0]


# Historical alias (round-1 name); the class above replaces the reference's
# RandomCycler with a re-designed implementation.
RandomCycler = EpochPermutationSampler


class Speaker:
    def __init__(self, root: str, rng: np.random.Generator | None = None):
        self.root = root
        self.name = os.path.basename(os.path.normpath(root))
        fps = sorted(glob.glob(os.path.join(root, "*.npy")))
        if not fps:
            raise Exception(f"no utterances for speaker {self.name}")
        self.utterance_fps = fps
        self.cycler = EpochPermutationSampler(fps, rng)
        self._cache: dict[str, np.ndarray] = {}

    def _frames(self, fp: str) -> np.ndarray:
        if fp not in self._cache:
            self._cache[fp] = np.load(fp).T.astype(np.float32)  # (T, n_mels)
        return self._cache[fp]

    def random_partial(self, count: int, n_frames: int,
                       rng: np.random.Generator) -> np.ndarray:
        """-> (count, n_frames, n_mels) random crops of `count` utterances."""
        fps = self.cycler.sample(count)
        n_mels = self._frames(fps[0]).shape[1]
        out = np.zeros((count, n_frames, n_mels), np.float32)
        for i, fp in enumerate(fps):
            frames = self._frames(fp)
            if len(frames) <= n_frames:
                padded = np.zeros((n_frames, frames.shape[1]), np.float32)
                padded[: len(frames)] = frames
                out[i] = padded
            else:
                start = int(rng.integers(0, len(frames) - n_frames))
                out[i] = frames[start:start + n_frames]
        return out


class SpeakerVerificationSampler:
    """Infinite batch stream: (speakers_per_batch, utts_per_speaker, n_frames,
    n_mels) — the collated SpeakerBatch of the reference DataLoader
    (speaker_verification_dataset.py:36-61)."""

    def __init__(self, dataset_root: str, speakers_per_batch: int = 64,
                 utterances_per_speaker: int = 10, n_frames: int = 63,
                 seed: int = 0, min_utterances: int = 1):
        self.rng = np.random.default_rng(seed)
        speaker_dirs = sorted(
            d for d in glob.glob(os.path.join(dataset_root, "*"))
            if os.path.isdir(d))
        self.speakers = []
        for d in speaker_dirs:
            try:
                s = Speaker(d, self.rng)
            except Exception:
                continue
            if len(s.utterance_fps) >= min_utterances:
                self.speakers.append(s)
        if not self.speakers:
            raise Exception(f"no speakers under {dataset_root}")
        self.cycler = EpochPermutationSampler(self.speakers, self.rng)
        self.s = speakers_per_batch
        self.u = utterances_per_speaker
        self.n_frames = n_frames

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
