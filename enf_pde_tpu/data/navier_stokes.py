"""JAX-native pseudo-spectral 2D Navier-Stokes (vorticity form) on the torus.

The reference generates this dataset host-side with a PyTorch FFT solver
(``experiments/fitting/datasets/pdes.py:186-303``). Here the same physics — forced
incompressible NS in vorticity form, Crank-Nicolson diffusion + explicit dealiased
advection — is a jitted ``lax.scan`` over complex FFT states, so trajectory generation
runs batched on the accelerator.

Physics setup matched to the reference dataset: 64^2 grid on [0,1]^2, viscosity 1e-3,
forcing ``0.3 (cos(4 pi x) + cos(4 pi y))``, ICs from a Gaussian random field
(alpha=2.5, tau=7) burned in for 30 time units, one frame per time unit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from enf_pde_tpu.data.splitfft import (
    dft_matrices,
    fft2_real_input,
    ifft2_real_output,
)

__all__ = [
    "GaussianRF2D",
    "navier_stokes_rollout",
    "navier_stokes_rollout_split",
    "generate_ns_trajectories",
    "default_forcing",
]


class GaussianRF2D:
    """Gaussian random field sampler with spectral density ~ (4 pi^2 |k|^2 + tau^2)^-alpha."""

    def __init__(self, size: int, alpha: float = 2.5, tau: float = 7.0, sigma: float | None = None):
        self.size = size
        if sigma is None:
            sigma = tau ** (0.5 * (2 * alpha - 2.0))
        k = jnp.concatenate([jnp.arange(0, size // 2), jnp.arange(-(size // 2), 0)])
        kx = k[:, None]
        ky = k[None, :]
        sqrt_eig = (
            (size**2)
            * jnp.sqrt(2.0)
            * sigma
            * ((4 * (jnp.pi**2) * (kx**2 + ky**2) + tau**2) ** (-alpha / 2.0))
        )
        self.sqrt_eig = sqrt_eig.at[0, 0].set(0.0)

    def sample(self, key, num: int = 1) -> jnp.ndarray:
        """Sample ``num`` fields of shape [num, size, size]."""
        kr, ki = jax.random.split(key)
        shape = (num, self.size, self.size)
        coeff = jax.random.normal(kr, shape) + 1j * jax.random.normal(ki, shape)
        coeff = self.sqrt_eig[None] * coeff
        return jnp.fft.ifftn(coeff, axes=(-2, -1)).real

    def sample_split(self, key, num: int = 1) -> jnp.ndarray:
        """``sample`` without complex dtypes (same distribution, same key layout).

        Draws the identical spectral coefficients as ``sample`` and inverts them
        with split-complex matmul DFTs, so it runs on backends with no complex
        support (the axon TPU). Per-key fields match ``sample`` to float32
        roundoff.
        """
        kr, ki = jax.random.split(key)
        shape = (num, self.size, self.size)
        re = self.sqrt_eig[None] * jax.random.normal(kr, shape)
        im = self.sqrt_eig[None] * jax.random.normal(ki, shape)
        C, S = dft_matrices(self.size, re.dtype)
        return ifft2_real_output(re, im, C, S)


def default_forcing(size: int) -> jnp.ndarray:
    """Kolmogorov-type forcing 0.3 (cos(4 pi x) + cos(4 pi y)) on [0,1)^2."""
    t = jnp.linspace(0, 1, size + 1)[:-1]
    X, Y = jnp.meshgrid(t, t, indexing="ij")
    return 0.3 * (jnp.cos(4 * jnp.pi * X) + jnp.cos(4 * jnp.pi * Y))


@partial(jax.jit, static_argnames=("record_steps", "steps_per_record"))
def navier_stokes_rollout(
    w0: jnp.ndarray,
    f: jnp.ndarray,
    visc: float,
    delta_t: float,
    record_steps: int,
    steps_per_record: int,
) -> jnp.ndarray:
    """Integrate batched vorticity fields and record snapshots.

    Args:
        w0: initial vorticity [batch, N, N].
        f: forcing [N, N].
        visc: kinematic viscosity.
        delta_t: solver step size.
        record_steps: number of recorded snapshots.
        steps_per_record: solver steps between snapshots.

    Returns:
        ``(snapshots, w_final)``: vorticity snapshots [batch, record_steps, N, N] and
        the final physical-space state [batch, N, N]. Snapshots are taken *before*
        each stretch of ``steps_per_record`` solver steps, so the first frame is the
        initial state (matching the reference's record-at-t=0 cadence,
        ``pdes.py:220-227``).
    """
    N = w0.shape[-1]
    k_max = N // 2
    k = jnp.concatenate([jnp.arange(0, k_max), jnp.arange(-k_max, 0)])
    k_y = jnp.broadcast_to(k[None, :], (N, N))
    k_x = k_y.T
    lap = 4 * (jnp.pi**2) * (k_x**2 + k_y**2)
    lap = lap.at[0, 0].set(1.0)
    dealias = (jnp.abs(k_y) <= (2.0 / 3.0) * k_max) & (jnp.abs(k_x) <= (2.0 / 3.0) * k_max)
    dealias = dealias.astype(w0.dtype)[None]

    w_h0 = jnp.fft.fftn(w0, axes=(-2, -1))
    f_h = jnp.fft.fftn(f)[None]

    two_pi_i_kx = 2j * jnp.pi * k_x
    two_pi_i_ky = 2j * jnp.pi * k_y
    cn_num = 1.0 - 0.5 * delta_t * visc * lap
    cn_den = 1.0 + 0.5 * delta_t * visc * lap

    def step(w_h, _):
        psi_h = w_h / lap
        u = jnp.fft.ifftn(two_pi_i_ky * psi_h, axes=(-2, -1)).real  # dpsi/dy
        v = jnp.fft.ifftn(-two_pi_i_kx * psi_h, axes=(-2, -1)).real  # -dpsi/dx
        w_x = jnp.fft.ifftn(two_pi_i_kx * w_h, axes=(-2, -1)).real
        w_y = jnp.fft.ifftn(two_pi_i_ky * w_h, axes=(-2, -1)).real
        F_h = jnp.fft.fftn(u * w_x + v * w_y, axes=(-2, -1)) * dealias
        w_h = (-delta_t * F_h + delta_t * f_h + cn_num * w_h) / cn_den
        return w_h, ()

    def record(w_h, _):
        snap = jnp.fft.ifftn(w_h, axes=(-2, -1)).real
        w_h, _ = jax.lax.scan(step, w_h, None, length=steps_per_record)
        return w_h, snap

    w_h_final, snaps = jax.lax.scan(record, w_h0, None, length=record_steps)
    w_final = jnp.fft.ifftn(w_h_final, axes=(-2, -1)).real
    return jnp.moveaxis(snaps, 0, 1), w_final  # [batch, T, N, N], [batch, N, N]


@jax.jit
def _grf_sample_split_batch(sqrt_eig: jnp.ndarray, keys: jnp.ndarray) -> jnp.ndarray:
    """Batched ``GaussianRF2D.sample_split``: one field per PRNG key, [num, N, N].

    Per-key spectral draws match ``sample(key, 1)[0]`` (same split layout); the
    inverse transform is the complex-free matmul DFT.
    """

    def draw(k):
        kr, ki = jax.random.split(k)
        re = sqrt_eig * jax.random.normal(kr, sqrt_eig.shape)
        im = sqrt_eig * jax.random.normal(ki, sqrt_eig.shape)
        return re, im

    re, im = jax.vmap(draw)(keys)
    C, S = dft_matrices(sqrt_eig.shape[-1], re.dtype)
    return ifft2_real_output(re, im, C, S)


@partial(jax.jit, static_argnames=("record_steps", "steps_per_record"))
def navier_stokes_rollout_split(
    w0: jnp.ndarray,
    f: jnp.ndarray,
    visc: float,
    delta_t: float,
    record_steps: int,
    steps_per_record: int,
) -> jnp.ndarray:
    """``navier_stokes_rollout`` with split-complex matmul DFTs (no complex dtypes).

    Same physics, discretization, and recording cadence; spectral states are
    ``(re, im)`` float plane pairs and every transform is a ``precision=HIGHEST``
    real matmul (``data/splitfft.py``), so the solver runs batched on the axon
    TPU where ``jnp.fft`` is unavailable. Agrees with the complex path to f32
    roundoff per step (test-enforced on short rollouts; long chaotic rollouts
    decorrelate from the complex path exactly as any equally-valid f32
    reordering does).
    """
    N = w0.shape[-1]
    k_max = N // 2
    k = jnp.concatenate([jnp.arange(0, k_max), jnp.arange(-k_max, 0)])
    k_y = jnp.broadcast_to(k[None, :], (N, N))
    k_x = k_y.T
    lap = 4 * (jnp.pi**2) * (k_x**2 + k_y**2)
    lap = lap.at[0, 0].set(1.0)
    dealias = (jnp.abs(k_y) <= (2.0 / 3.0) * k_max) & (jnp.abs(k_x) <= (2.0 / 3.0) * k_max)
    dealias = dealias.astype(w0.dtype)[None]

    C, S = dft_matrices(N, w0.dtype)
    w_re, w_im = fft2_real_input(w0, C, S)
    f_re, f_im = fft2_real_input(f, C, S)
    f_re, f_im = f_re[None], f_im[None]

    two_pi_kx = 2 * jnp.pi * k_x
    two_pi_ky = 2 * jnp.pi * k_y
    cn_num = 1.0 - 0.5 * delta_t * visc * lap
    cn_den = 1.0 + 0.5 * delta_t * visc * lap

    def step(w, _):
        w_re, w_im = w
        psi_re, psi_im = w_re / lap, w_im / lap
        # (a + i b) * (i c) = -c b + i c a  — the i k_x / i k_y spectral derivatives.
        u = ifft2_real_output(-two_pi_ky * psi_im, two_pi_ky * psi_re, C, S)  # dpsi/dy
        v = ifft2_real_output(two_pi_kx * psi_im, -two_pi_kx * psi_re, C, S)  # -dpsi/dx
        w_x = ifft2_real_output(-two_pi_kx * w_im, two_pi_kx * w_re, C, S)
        w_y = ifft2_real_output(-two_pi_ky * w_im, two_pi_ky * w_re, C, S)
        F_re, F_im = fft2_real_input(u * w_x + v * w_y, C, S)
        F_re, F_im = F_re * dealias, F_im * dealias
        w_re = (-delta_t * F_re + delta_t * f_re + cn_num * w_re) / cn_den
        w_im = (-delta_t * F_im + delta_t * f_im + cn_num * w_im) / cn_den
        return (w_re, w_im), ()

    def record(w, _):
        snap = ifft2_real_output(w[0], w[1], C, S)
        w, _ = jax.lax.scan(step, w, None, length=steps_per_record)
        return w, snap

    (w_re, w_im), snaps = jax.lax.scan(record, (w_re, w_im), None, length=record_steps)
    w_final = ifft2_real_output(w_re, w_im, C, S)
    return jnp.moveaxis(snaps, 0, 1), w_final


def generate_ns_trajectories(
    seeds: np.ndarray,
    size: int = 64,
    visc: float = 1e-3,
    t_horizon: int = 20,
    delta_t: float = 1e-3,
    burn_in: float = 30.0,
    split_fft: bool = False,
) -> np.ndarray:
    """Generate NS trajectories for the given per-trajectory seeds.

    Each IC is a GRF sample evolved for ``burn_in`` time units; the recorded
    trajectory then has one frame per time unit over ``t_horizon``.

    ``split_fft=True`` routes both the GRF sampler and the solver through the
    complex-free matmul-DFT path so generation can batch on accelerators
    without complex support (the axon TPU platform).

    Returns [num, t_horizon, size, size, 1] float32.
    """
    sampler = GaussianRF2D(size)
    f = default_forcing(size)
    rollout = navier_stokes_rollout_split if split_fft else navier_stokes_rollout
    if split_fft:
        # One jitted vmapped draw for the whole batch: per-seed sample calls
        # would pay remote-TPU dispatch latency a few hundred times per block.
        keys = jnp.asarray(
            np.stack([np.asarray(jax.random.PRNGKey(int(s))) for s in seeds])
        )
        w0 = _grf_sample_split_batch(sampler.sqrt_eig, keys)
    else:
        w0 = jnp.concatenate(
            [sampler.sample(jax.random.PRNGKey(int(s)), 1) for s in seeds], axis=0
        )
    # Burn-in: evolve and keep the final state.
    burn_steps = int(burn_in / delta_t)
    _, burned = rollout(
        w0, f, visc, delta_t, record_steps=1, steps_per_record=burn_steps
    )
    steps_per_frame = int(1.0 / delta_t)
    traj, _ = rollout(
        burned, f, visc, delta_t, record_steps=t_horizon, steps_per_record=steps_per_frame
    )
    return np.asarray(traj, dtype=np.float32)[..., None]
