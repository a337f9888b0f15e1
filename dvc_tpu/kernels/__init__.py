from dvc_tpu.kernels.wavenet_step import pallas_generate, pack_wavenet_params  # noqa: F401
