from enf_pde_tpu.dynamics.mlp_ode import MLPLatentODE
from enf_pde_tpu.dynamics.ponita import PonitaGen, PonitaLatentODE
from enf_pde_tpu.dynamics.solvers import euler_step, rk4_step, solve_latent_ode, solve_ode

__all__ = [
    "MLPLatentODE",
    "PonitaGen",
    "PonitaLatentODE",
    "euler_step",
    "rk4_step",
    "solve_latent_ode",
    "solve_ode",
]
