"""Training: config, forward loss, sharded train loop, checkpoints."""

from .config import (  # noqa: F401
    TrainingConfig,
    apply_overrides,
    load_config,
    make_coarse_cfg,
    make_refiner_cfg,
    save_config,
    update_cfg_debug,
)
from .forward_loss import BatchPoseData, forward_loss, make_hypotheses  # noqa: F401
from .train import (  # noqa: F401
    TrainState,
    create_train_state,
    load_checkpoint,
    make_train_step,
    save_checkpoint,
    synthetic_batch_fn,
    train,
)
