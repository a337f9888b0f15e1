"""Flax model zoo: DisentangledVAE, GE2E SpeakerEncoder, AutoVC baselines,
WaveNet vocoder, FeatureSelection.

Internal tensor layout is channels-last (B, T, C) — TPU lane-friendly — with
(B, n_mels, T) accepted at the public API edges for reference parity
(the reference keeps torch's (B, C, T); see model/disentangled_vae.py:198-248).
"""

from dvc_tpu.models.layers import LSTM, ConvNorm, LinearNorm  # noqa: F401
from dvc_tpu.models.disentangled_vae import DisentangledVAE  # noqa: F401
from dvc_tpu.models.speaker_encoder import SpeakerEncoder  # noqa: F401
from dvc_tpu.models.autovc import AutoVC, AutoVCF0, ProposedAutoVC  # noqa: F401
from dvc_tpu.models.feature_selection import FeatureSelection  # noqa: F401
from dvc_tpu.models.wavenet import WaveNet  # noqa: F401
