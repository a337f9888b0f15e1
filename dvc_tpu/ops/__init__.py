"""Batched DSP ops as XLA-compiled JAX functions.

Each op mirrors a host-side native-library call in the reference
(lws/librosa/pyworld/pysptk/webrtcvad — see SURVEY.md §2.3) but is written
batched + jittable so whole datasets stream through the TPU instead of
per-file Python loops.
"""

from dvc_tpu.ops.mel import (  # noqa: F401
    mel_filterbank,
    amp_to_db,
    db_to_amp,
    normalize_mel,
    denormalize_mel,
    melspectrogram,
)
from dvc_tpu.ops.stft import stft_magnitude, frame_signal, num_frames, pad_lr  # noqa: F401
from dvc_tpu.ops.chunk import chunk_mel, unchunk_mel  # noqa: F401
from dvc_tpu.ops.audio import (  # noqa: F401
    normalize_volume,
    rescale_wav,
    resample_poly,
    energy_vad_mask,
    gmm_vad_mask,
    trim_long_silences,
    mulaw,
    inv_mulaw,
)
