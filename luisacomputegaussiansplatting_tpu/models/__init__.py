from .gaussians import GaussianParams, GaussianScene, pad_params_to
from .trainer import (
    TrainConfig,
    TrainState,
    init_train_state,
    make_densify_train_step,
    make_train_step,
)
from .densify import (
    DensifyConfig,
    DensifyState,
    accumulate_stats,
    densify_step,
    init_densify_state,
    reset_opacity,
)
from .checkpoint import CheckpointManager
from .losses import d_ssim_l1_loss, l1_loss, ssim

__all__ = [
    "GaussianParams",
    "GaussianScene",
    "pad_params_to",
    "TrainConfig",
    "TrainState",
    "init_train_state",
    "make_train_step",
    "make_densify_train_step",
    "DensifyConfig",
    "DensifyState",
    "accumulate_stats",
    "densify_step",
    "init_densify_state",
    "reset_opacity",
    "CheckpointManager",
    "d_ssim_l1_loss",
    "l1_loss",
    "ssim",
]
