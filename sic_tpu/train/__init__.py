"""Training harness: losses, state, jitted steps, 3-stage trainer."""
from .losses import (adaptive_d_weight, adopt_weight, feat_align_loss,
                     hinge_d_loss, vanilla_d_loss)
from .state import (TrainState, is_frozen_path, make_ae_optimizer,
                    make_disc_optimizer, merge_params, partition_labels,
                    split_params, stage_grad_mask)
from .steps import FeatLossCfg, ImgLossCfg, make_steps
from .strategy import STAGE_NAMES, StageSpec, TrainingStrategy
from .trainer import (Trainer, create_train_state, load_checkpoint,
                      save_checkpoint)

__all__ = [
    "adaptive_d_weight", "adopt_weight", "feat_align_loss", "hinge_d_loss",
    "vanilla_d_loss", "TrainState", "is_frozen_path", "make_ae_optimizer",
    "make_disc_optimizer", "partition_labels", "stage_grad_mask",
    "FeatLossCfg", "ImgLossCfg", "make_steps", "merge_params", "split_params", "STAGE_NAMES", "StageSpec",
    "TrainingStrategy", "Trainer", "create_train_state", "load_checkpoint",
    "save_checkpoint",
]
