from dvc_tpu.utils.wavio import read_wav, write_wav  # noqa: F401
from dvc_tpu.utils.prng import key_seq  # noqa: F401
