from dvc_tpu.eval.mcd import mcd_from_mcc, dtw_path, evaluate_mcd_wav  # noqa: F401
from dvc_tpu.eval.eer import equal_error_rate  # noqa: F401
