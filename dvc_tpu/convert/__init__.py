from dvc_tpu.convert.conversion import convert_mel, VoiceConverter  # noqa: F401
