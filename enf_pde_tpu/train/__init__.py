from enf_pde_tpu.train.checkpoint import CheckpointManager
from enf_pde_tpu.train.inner_loop import (
    InnerLoopConfig,
    init_meta_sgd_lrs,
    make_inner_loop,
    sample_coordinate_masks,
)
from enf_pde_tpu.train.logging import MetricLogger
from enf_pde_tpu.train.loop import TrainLoop
from enf_pde_tpu.train.meta_sgd import MetaSGDTrainer
from enf_pde_tpu.train.state import Optimizers, TrainState, make_optimizers

__all__ = [
    "CheckpointManager",
    "InnerLoopConfig",
    "init_meta_sgd_lrs",
    "make_inner_loop",
    "sample_coordinate_masks",
    "MetricLogger",
    "TrainLoop",
    "MetaSGDTrainer",
    "Optimizers",
    "TrainState",
    "make_optimizers",
]
