"""Sphere diffusion data: heat equation on S^2 from a random Gaussian bump.

The reference integrates ``dt(h) = D lap(h)`` with Dedalus RK222 on a 128x64 sphere
grid (``pdes.py:461-551``). The heat equation is diagonal in the spherical-harmonic
basis, so here the evolution is computed *exactly*:
``h_lm(t) = h_lm(0) exp(-D l (l+1) t)`` via ``SphereGrid.diffuse``.

Frame times match the reference's recording quirk: it records the IC, then every 10
solver steps of size 0.5 starting after the first step — i.e. t in
{0, 0.5, 5.5, 10.5, ...}; 20 frames are kept.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from enf_pde_tpu.data.sphere_harmonics import SphereGrid

__all__ = ["generate_sphere_diffusion_trajectories", "sphere_diffusion_grid", "reference_frame_times"]

_NPHI, _NTHETA = 128, 64
_D = 0.01


def sphere_diffusion_grid(nphi: int = _NPHI, ntheta: int = _NTHETA) -> SphereGrid:
    return SphereGrid(nphi, ntheta)


def reference_frame_times(num_frames: int = 20, dt: float = 0.5, cadence: int = 10) -> np.ndarray:
    """Frame times of the reference recorder: IC, then t = dt * (1 + cadence * k)."""
    ts = [0.0] + [dt * (1 + cadence * k) for k in range(num_frames - 1)]
    return np.asarray(ts)


def _gauss_peak(grid: SphereGrid, phi0: float, theta0: float, sigma: float = 0.25) -> jnp.ndarray:
    phi = jnp.asarray(grid.phi)[:, None]
    theta = jnp.asarray(grid.theta)[None, :]
    cos_d = (
        jnp.sin(theta) * jnp.cos(phi) * np.sin(theta0) * np.cos(phi0)
        + jnp.sin(theta) * jnp.sin(phi) * np.sin(theta0) * np.sin(phi0)
        + jnp.cos(theta) * np.cos(theta0)
    )
    d = jnp.arccos(jnp.clip(cos_d, -1.0, 1.0))
    return jnp.exp(-(d**2) / (2 * sigma**2))


def generate_sphere_diffusion_trajectories(
    seeds: np.ndarray,
    nphi: int = _NPHI,
    ntheta: int = _NTHETA,
    num_frames: int = 20,
    grid: SphereGrid | None = None,
) -> np.ndarray:
    """Trajectories [num, num_frames, nphi, ntheta, 1].

    Random bump center per seed (matching the reference's sampling:
    ``theta_0 ~ U[0, 2pi)`` (!), ``phi_0 = arccos(1 - 2u)`` — the reference swaps the
    roles, reproduced here for distributional parity, ``pdes.py:507-512``).
    """
    grid = grid or sphere_diffusion_grid(nphi, ntheta)
    ts = jnp.asarray(reference_frame_times(num_frames))
    out = []
    for s in seeds:
        rng = np.random.RandomState(int(s) % (2**31 - 1))
        theta0 = rng.rand() * 2 * np.pi
        phi0 = np.arccos(1 - 2 * rng.rand())
        h0 = _gauss_peak(grid, phi0, theta0)
        frames = grid.diffuse(h0, _D, ts)  # [T, nphi, ntheta]
        out.append(np.asarray(frames, dtype=np.float32)[..., None])
    return np.stack(out)
