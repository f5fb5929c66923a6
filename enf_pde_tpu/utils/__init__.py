from enf_pde_tpu.utils.equivariance import (
    equivariance_errors,
    equivariance_errors_2d,
    equivariance_errors_ball,
    equivariance_errors_sphere,
)
from enf_pde_tpu.utils.metrics import iou, mse, psnr
from enf_pde_tpu.utils.profiling import StepTimer, trace
from enf_pde_tpu.utils.visualization import (
    plot_ball_rollout,
    plot_planar_rollout,
    plot_sphere_rollout,
)

__all__ = [
    "equivariance_errors",
    "equivariance_errors_2d",
    "equivariance_errors_ball",
    "equivariance_errors_sphere",
    "iou",
    "mse",
    "psnr",
    "StepTimer",
    "trace",
    "plot_ball_rollout",
    "plot_planar_rollout",
    "plot_sphere_rollout",
]
