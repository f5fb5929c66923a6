"""JAX Cahn-Hilliard data: spinodal decomposition on a 64^2 grid.

The reference generates this with py-pde's ``CahnHilliardPDE`` (``pdes.py:365-399``):
``dt(c) = lap(c^3 - c - gamma * lap(c))`` with gamma = 1, from uniform random ICs in
[-1, 1] on a unit-spacing 64x64 grid with no-flux boundaries, recorded every 20 time
units with the first 10 frames discarded.

Here the equation is integrated with a linearly-stabilized semi-implicit (IMEX)
spectral scheme in a cosine basis (DCT-II), which natively encodes the no-flux
(Neumann) boundary conditions: the quartic-dissipation term and a stabilizer
``S lap(c)`` are treated implicitly (diagonal in the cosine basis), the nonlinear term
explicitly. Runs as a jitted ``lax.scan`` on the accelerator.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["cahn_hilliard_rollout", "generate_ch_trajectories"]

_GAMMA = 1.0
_STAB = 2.0  # linear stabilization constant (standard for IMEX CH)


@partial(jax.jit, static_argnames=("record_steps", "steps_per_record"))
def cahn_hilliard_rollout(
    c0: jnp.ndarray, dt: float, record_steps: int, steps_per_record: int
) -> jnp.ndarray:
    """Integrate batched CH fields [batch, N, N]; snapshot before each record stretch.

    Returns [batch, record_steps, N, N].
    """
    N = c0.shape[-1]
    # Neumann Laplacian eigenvalues on a unit-spacing grid in the DCT-II basis.
    k = jnp.pi * jnp.arange(N) / N
    lam1d = 2.0 * (jnp.cos(k) - 1.0)  # discrete: -4 sin^2(k/2), in [-4, 0]
    lam = lam1d[:, None] + lam1d[None, :]  # Laplacian symbol (negative semidefinite)
    denom = 1.0 + dt * _GAMMA * lam**2 - dt * _STAB * lam

    dctn = partial(jax.scipy.fft.dctn, type=2, axes=(-2, -1), norm="ortho")
    idctn = partial(jax.scipy.fft.idctn, type=2, axes=(-2, -1), norm="ortho")

    def step(c_hat, _):
        c = idctn(c_hat)
        nonlin = dctn(c**3 - c)
        c_hat = (c_hat + dt * lam * (nonlin - _STAB * c_hat)) / denom
        return c_hat, ()

    def record(c_hat, _):
        snap = idctn(c_hat)
        c_hat, _ = jax.lax.scan(step, c_hat, None, length=steps_per_record)
        return c_hat, snap

    _, snaps = jax.lax.scan(record, dctn(c0), None, length=record_steps)
    return jnp.moveaxis(snaps, 0, 1)


def generate_ch_trajectories(
    seeds: np.ndarray,
    size: int = 64,
    dt: float = 1e-2,
    frame_dt: float = 20.0,
    num_frames: int = 20,
    skip_frames: int = 10,
) -> np.ndarray:
    """CH trajectories [num, num_frames, size, size, 1].

    ICs are uniform random in [-1, 1] per seed; the first ``skip_frames`` recorded
    frames are discarded (reference ``pdes.py:397``).
    """
    c0 = jnp.stack(
        [
            jax.random.uniform(jax.random.PRNGKey(int(s)), (size, size), minval=-1, maxval=1)
            for s in seeds
        ]
    )
    total = num_frames + skip_frames
    traj = cahn_hilliard_rollout(
        c0, dt, record_steps=total, steps_per_record=int(frame_dt / dt)
    )
    traj = traj[:, skip_frames:]
    return np.asarray(traj, dtype=np.float32)[..., None]
