from dvc_tpu.train.losses import gvae_pair_loss, kl_delta_vae, LossTerms  # noqa: F401
from dvc_tpu.train.trainer import (  # noqa: F401
    TrainState,
    create_train_state,
    make_train_step,
    Trainer,
)
from dvc_tpu.train.checkpoint import (  # noqa: F401
    save_checkpoint,
    load_last_checkpoint,
    latest_checkpoint_step,
)
