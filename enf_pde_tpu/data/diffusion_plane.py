"""JAX planar heat-equation data (point heat source on [-3, 3]^2, D = 0.1).

The reference generates this with py-pde (``pdes.py:407-453``): a delta-like heat
source of random magnitude is inserted at a random location (upper half-plane for
train, lower half-plane for test — an OOD initial-condition split), diffused with
``dt(u) = D lap(u)``, recorded every 0.5 time units; frames 7..26 are kept.

Here the solution is computed analytically with the heat kernel plus first-order
method-of-images reflections for the no-flux boundaries: the py-pde ``insert`` seeds a
single grid cell with ``value / cell_area``, and diffusion of that cell source is a
separable product of error-function differences (checked in tests against an FD
integrator; in-domain heat is conserved to <1%).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["generate_diffusion_trajectories", "diffusion_frames", "sample_source"]

_SIZE = 64
_LO, _HI = -3.0, 3.0
_D = 0.1


def _grid(size: int = _SIZE):
    cell = (_HI - _LO) / size
    centers = _LO + cell * (jnp.arange(size) + 0.5)
    return centers, cell


def sample_source(seed: int, test: bool = False):
    """Random heat-source location/magnitude (reference ``pdes.py:419-436``).

    Train sources live in the upper half-plane (y in [0, 2]); test sources in the
    lower half-plane (y in [-2, 0]) — the OOD split.
    """
    rng = np.random.RandomState(seed)
    x = rng.rand() * 4 - 2
    y = rng.rand() * 2
    if test:
        y = -y
    value = rng.rand() * 0.5 + 5.0
    return float(x), float(y), float(value)


@partial(jax.jit, static_argnames=("size", "num_frames"))
def diffusion_frames(
    x0: float, y0: float, value: float, t_start: float, dt: float, num_frames: int, size: int = _SIZE
) -> jnp.ndarray:
    """Heat-kernel solution frames [num_frames, size, size] for a cell-seeded source.

    The initial condition is the py-pde ``insert``: total heat ``value`` deposited in
    the source's grid cell. Convolving the cell indicator with the heat kernel gives a
    separable product of error-function differences — exact for all t > 0.
    """
    centers, cell = _grid(size)

    def cell_kernel_1d(c0, t):
        # Integral of the 1D heat kernel over the source cell [c0 - cell/2, c0 + cell/2],
        # with first-order method-of-images reflections enforcing the no-flux
        # boundaries at +-3 (py-pde's default Neumann BC conserves heat in-domain).
        s = jnp.sqrt(4 * _D * t)

        def k(center):
            a = (centers - (center - cell / 2)) / s
            b = (centers - (center + cell / 2)) / s
            return 0.5 * (jax.scipy.special.erf(a) - jax.scipy.special.erf(b))

        return k(c0) + k(2 * _HI - c0) + k(2 * _LO - c0)

    # Snap source to its grid cell center (py-pde inserts into the nearest cell).
    ix = jnp.clip(jnp.floor((x0 - _LO) / cell), 0, size - 1)
    iy = jnp.clip(jnp.floor((y0 - _LO) / cell), 0, size - 1)
    cx = _LO + cell * (ix + 0.5)
    cy = _LO + cell * (iy + 0.5)

    ts = t_start + dt * jnp.arange(num_frames)

    def frame(t):
        u = cell_kernel_1d(cx, t)[:, None] * cell_kernel_1d(cy, t)[None, :]
        return value * u / (cell * cell)

    return jax.vmap(frame)(ts)


def generate_diffusion_trajectories(
    seeds: np.ndarray, test: bool = False, size: int = _SIZE
) -> np.ndarray:
    """Trajectories [num, 20, size, size, 1], frames at t = 3.5 + 0.5 k, k = 0..19.

    The reference records every 0.5 from t=0 and keeps frames 7..26
    (``pdes.py:438-453``), i.e. t in [3.5, 13.0].
    """
    out = []
    for s in seeds:
        x0, y0, value = sample_source(int(s), test=test)
        frames = diffusion_frames(x0, y0, value, t_start=3.5, dt=0.5, num_frames=20, size=size)
        out.append(np.asarray(frames, dtype=np.float32)[..., None])
    return np.stack(out)
