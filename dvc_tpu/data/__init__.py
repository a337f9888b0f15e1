from dvc_tpu.data.dataset import PairedMelDataset, PairedMCCDataset  # noqa: F401
