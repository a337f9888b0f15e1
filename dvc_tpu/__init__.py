"""dvc_tpu — TPU-native disentangled-VAE voice-conversion framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of
v-manhlt3/Disentangle-VAE-for-VC (reference mounted at /root/reference):
many-to-many voice conversion on VCTK with a disentangled (speaker/content)
VAE, GE2E speaker encoder, AutoVC baselines, a WaveNet vocoder with a fused
Pallas autoregressive sampler, and MCD/EER evaluation.

Layers (TPU-first, not a port):
  ops/       batched DSP as XLA ops (STFT, mel, WORLD-style analysis, DTW, VAD)
  models/    Flax modules (DisentangledVAE, SpeakerEncoder, AutoVC, WaveNet)
  parallel/  mesh/axis naming, NamedSharding + shard_map helpers (ICI collectives)
  train/     jitted train steps, optax, checkpointing, metrics
  data/      host-side paired-utterance pipeline feeding device-put shards
  convert/   latent-swap conversion driver
  eval/      MCD / EER
  kernels/   Pallas TPU kernels (WaveNet AR step, etc.)
  native/    C++ host runtime (wav IO / DSP / data loading)
  utils/     config-free helpers (PRNG, trees, logging, profiling)
"""

__version__ = "0.1.0"

from dvc_tpu import config as config  # noqa: F401
