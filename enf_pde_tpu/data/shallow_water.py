"""JAX spectral rotating shallow-water solver on the sphere (Galewsky-jet data).

The reference generates this dataset with Dedalus (``pdes.py:559-730``): the rotating
shallow-water equations with hyperdiffusion,

    dt(u) + nu lap(lap(u)) + g grad(h) + 2 Omega zcross(u) = -u . grad(u)
    dt(h) + nu lap(lap(h)) + H div(u) = -div(h u)

from a balanced Galewsky zonal jet plus a randomized height bump, on a 192x96 sphere
grid in Earth-radius/hour simulation units, recording 20 frames (the first 6 later
skipped as too noisy) of (h, u_phi, u_theta).

Here the same system is solved in vorticity-divergence form with scalar
spherical-harmonic transforms (``SphereGrid``):

    dt(zeta) = -div((zeta + f) V)
    dt(delta) = curl_r((zeta + f) V) - lap(E + g h),  E = |V|^2 / 2
    dt(h) = -div(h V) - H delta

with ``V`` recovered from streamfunction/velocity potential (``psi = lap^-1 zeta``,
``chi = lap^-1 delta``). Time stepping is a Strang split: the linear gravity-wave
subsystem is advanced by its exact per-mode propagator (the reference's RK222 treats
it implicitly), advective tendencies by SSPRK3, and the ``nu lap^2`` hyperdiffusion by
an exact integrating factor; triangular truncation at ``lmax = 2/3 ntheta``
dealiases the quadratic terms. Everything is a jitted ``lax.scan`` over complex SH
coefficients.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from enf_pde_tpu.data.sphere_harmonics import SphereGrid

__all__ = [
    "SWUnits",
    "ShallowWaterSolver",
    "galewsky_state",
    "generate_sw_trajectories",
    ]


class SWUnits:
    """Simulation units matching the reference (Earth radius = 1, hour = 1)."""

    meter = 1.0 / 6.37122e6
    hour = 1.0
    second = hour / 3600.0
    R = 1.0
    Omega = 7.292e-5 / second
    g = 9.80616 * meter / second**2
    H = 1e4 * meter
    nu = 1e5 * meter**2 / second / 32**2  # hyperdiffusion matched at ell=32
    umax = 80 * meter / second
    timestep = 1200 * second


class ShallowWaterSolver:
    def __init__(self, grid: SphereGrid, units: SWUnits = SWUnits()):
        self.grid = grid
        self.u = units
        # lap^-1 with the l=0 mode nulled.
        lap = grid.laplacian_eig / units.R**2  # [-l(l+1)/R^2]
        self.lap = lap[:, None]
        inv = np.zeros(grid.lmax + 1)
        inv[1:] = 1.0 / np.asarray(lap)[1:]
        self.lap_inv = jnp.asarray(inv)[:, None]
        self.f_grid = 2 * units.Omega * jnp.asarray(grid.x)[None, :]  # 2 Omega cos(theta)
        self.inv_sin = 1.0 / grid.sin_theta[None, :]
        # Triangular truncation mask (l >= m and l <= lmax by construction).
        L = np.arange(grid.lmax + 1)[:, None]
        M = np.arange(grid.mmax + 1)[None, :]
        self.valid = jnp.asarray(L >= M)

    # -- differential operators on the grid ---------------------------------------

    def velocities(self, zeta_lm, delta_lm):
        """V = k x grad(psi) + grad(chi) in physical (eastward u_phi) orientation.

        Solid-body eastward rotation has zeta = +2 w cos(theta) — the standard sign
        convention, so the Coriolis term enters the Galewsky balance as published.
        """
        g = self.grid
        psi = zeta_lm * self.lap_inv
        chi = delta_lm * self.lap_inv
        psi_t = g.synthesis_dtheta(psi)
        chi_t = g.synthesis_dtheta(chi)
        psi_p = g.synthesis(g.dphi_coeffs(psi))
        chi_p = g.synthesis(g.dphi_coeffs(chi))
        R = self.u.R
        u_phi = (psi_t + chi_p * self.inv_sin) / R
        u_theta = (-psi_p * self.inv_sin + chi_t) / R
        return u_phi, u_theta

    def div(self, a_phi, a_theta):
        """Divergence of a grid vector field, returned as SH coefficients."""
        g = self.grid
        dphi = g.dphi_coeffs(g.analysis(a_phi * self.inv_sin))
        dtheta_lm = g.analysis_dtheta_flux(a_theta)
        return (dphi + dtheta_lm) / self.u.R

    def curl_r(self, a_phi, a_theta):
        """Radial curl (physical orientation): (1/R sin t)[d(a_phi sin t)/dt - d a_theta/d phi]."""
        g = self.grid
        dphi = g.dphi_coeffs(g.analysis(a_theta * self.inv_sin))
        dtheta_lm = g.analysis_dtheta_flux(a_phi)
        return (dtheta_lm - dphi) / self.u.R

    # -- tendencies ----------------------------------------------------------------

    def tendencies_nonlinear(self, state):
        """Advective/rotational tendencies (everything except linear gravity waves).

        The linear gravity-wave subsystem ``d(delta)/dt = -g lap h, dh/dt = -H delta``
        is integrated exactly by ``linear_propagator`` (the reference's Dedalus RK222
        treats it implicitly); splitting it out lifts the gravity-wave CFL limit at
        the reference's 20-minute step.
        """
        zeta_lm, delta_lm, h_lm = state
        g, un = self.grid, self.u
        u_phi, u_theta = self.velocities(zeta_lm, delta_lm)
        zeta = g.synthesis(zeta_lm)
        h = g.synthesis(h_lm)
        eta = zeta + self.f_grid

        d_zeta = -self.div(eta * u_phi, eta * u_theta)
        energy = 0.5 * (u_phi**2 + u_theta**2)
        d_delta = self.curl_r(eta * u_phi, eta * u_theta) - self.lap * g.analysis(energy)
        d_h = -self.div(h * u_phi, h * u_theta)
        return (
            d_zeta * self.valid,
            d_delta * self.valid,
            d_h * self.valid,
        )

    def linear_propagator(self, t: float):
        """Exact exp(t M) of the per-mode gravity-wave system.

        ``d/dt [delta, h] = M [delta, h]`` with ``M = [[0, g k2], [-H, 0]]``,
        ``k2 = l(l+1)/R^2`` (note ``-g lap h = +g k2 h``). ``M^2 = -g H k2 I`` gives
        ``exp(tM) = cos(w t) I + sin(w t)/w M``, ``w = sqrt(g H k2)``.
        """
        un = self.u
        k2 = -self.lap  # +l(l+1)/R^2, [L, 1]
        w = jnp.sqrt(un.g * un.H * k2)
        cos = jnp.cos(w * t)
        sinc = jnp.where(w > 0, jnp.sin(w * t) / jnp.where(w > 0, w, 1.0), t)
        a12 = sinc * un.g * k2  # delta <- h coupling
        a21 = -sinc * un.H  # h <- delta coupling
        return cos, a12, a21

    @partial(jax.jit, static_argnames=("self", "num_records", "steps_per_record"))
    def rollout(self, state, dt: float, num_records: int, steps_per_record: int):
        """Strang split: half linear, SSPRK3 nonlinear, half linear; hyperdiffusion
        by exact integrating factor. Records (h, u_phi, u_theta) after each stretch
        (the reference recorder skips the IC and stores every 50 iterations).
        """
        hyper = jnp.exp(-self.u.nu * (self.lap**2) * dt)
        cos, a12, a21 = self.linear_propagator(0.5 * dt)

        def half_linear(state):
            zeta_lm, delta_lm, h_lm = state
            new_delta = cos * delta_lm + a12 * h_lm
            new_h = a21 * delta_lm + cos * h_lm
            return (zeta_lm, new_delta, new_h)

        def step(state, _):
            state = half_linear(state)
            # SSPRK3 (Shu-Osher) on the advective tendencies; its stability region
            # covers the imaginary axis up to sqrt(3), safe for resolved advection.
            k1 = self.tendencies_nonlinear(state)
            s1 = jax.tree.map(lambda s, d: s + dt * d, state, k1)
            k2 = self.tendencies_nonlinear(s1)
            s2 = jax.tree.map(
                lambda s, x, d: 0.75 * s + 0.25 * (x + dt * d), state, s1, k2
            )
            k3 = self.tendencies_nonlinear(s2)
            state = jax.tree.map(
                lambda s, x, d: s / 3.0 + (2.0 / 3.0) * (x + dt * d), state, s2, k3
            )
            state = half_linear(state)
            state = jax.tree.map(lambda s: s * hyper, state)
            return state, ()

        def record(state, _):
            state, _ = jax.lax.scan(step, state, None, length=steps_per_record)
            zeta_lm, delta_lm, h_lm = state
            u_phi, u_theta = self.velocities(zeta_lm, delta_lm)
            return state, (self.grid.synthesis(h_lm), u_phi, u_theta)

        _, snaps = jax.lax.scan(record, state, None, length=num_records)
        return snaps


def galewsky_state(
    grid: SphereGrid, seed: int, units: SWUnits = SWUnits()
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Balanced Galewsky zonal jet + randomized height bump, as SH coefficients.

    Randomization matches the reference (``pdes.py:621-637``): bump amplitude
    ``120 m +- 30 m``, widths ``alpha ~ 1/3 +- 1/9``, ``beta ~ 1/15 +- 1/45``.
    """
    rng = np.random.RandomState(seed % (2**31 - 1))
    hpert = 120 * units.meter + 30 * units.meter * (1 - 2 * rng.rand())
    alpha = 1 / 3 + 1 / 9 * (1 - 2 * rng.rand())
    beta = 1 / 15 + 1 / 45 * (1 - 2 * rng.rand())

    lat0 = np.pi / 7
    lat1 = np.pi / 2 - lat0
    en = np.exp(-4 / (lat1 - lat0) ** 2)

    def u_jet(lat):
        lat = np.asarray(lat)
        inside = (lat > lat0) & (lat < lat1)
        with np.errstate(divide="ignore", over="ignore", invalid="ignore"):
            prof = np.where(
                inside, units.umax / en * np.exp(1.0 / ((lat - lat0) * (lat - lat1) + 1e-300)), 0.0
            )
        return np.nan_to_num(prof)

    # Balanced height by meridional integration of gradient-wind balance:
    # g dh/dlat = -u (f R + u tan(lat)).
    lat_fine = np.linspace(-np.pi / 2 + 1e-6, np.pi / 2 - 1e-6, 20001)
    uj = u_jet(lat_fine)
    f = 2 * units.Omega * np.sin(lat_fine)
    integrand = -(uj * (units.R * f + uj * np.tan(lat_fine))) / units.g
    h_fine = np.concatenate([[0.0], np.cumsum(0.5 * (integrand[1:] + integrand[:-1]) * np.diff(lat_fine))])

    lat_grid = np.pi / 2 - grid.theta  # colatitude -> latitude
    h_bal = np.interp(lat_grid, lat_fine, h_fine)
    # Area-weighted zero mean (the reference LBVP enforces ave(h) = 0).
    h_bal = h_bal - np.sum(h_bal * grid.w) / np.sum(grid.w)

    phi = grid.phi[:, None]
    lat2d = lat_grid[None, :]
    lat_bump = np.pi / 4
    bump = hpert * np.cos(lat2d) * np.exp(-((phi / alpha) ** 2)) * np.exp(
        -(((lat_bump - lat2d) / beta) ** 2)
    )
    h0 = jnp.asarray(h_bal[None, :] + bump)

    # Initial vorticity of the zonal jet: zeta = -(1/(R sin t)) d(u_phi sin t)/d theta.
    solver = ShallowWaterSolver(grid, units)
    u_phi0 = jnp.asarray(u_jet(lat_grid))[None, :] * jnp.ones((grid.nphi, 1))
    zeta0 = solver.curl_r(u_phi0, jnp.zeros_like(u_phi0))
    delta0 = jnp.zeros_like(zeta0)
    return zeta0 * solver.valid, delta0, grid.analysis(h0) * solver.valid


def generate_sw_trajectories(
    seeds: np.ndarray,
    nphi: int = 192,
    ntheta: int = 96,
    num_frames: int = 20,
    grid: SphereGrid | None = None,
) -> np.ndarray:
    """SW trajectories [num, num_frames, nphi, ntheta, 3] with channels (h, u_phi, u_theta).

    360 simulated hours, one frame per 60000 simulated seconds — the reference's
    recording protocol (the first stored frame comes one cadence after t=0; the
    reference keeps ``h_list[1:21]``).
    """
    grid = grid or SphereGrid(nphi, ntheta, lmax=(2 * ntheta) // 3)
    units = SWUnits()
    solver = ShallowWaterSolver(grid, units)
    out = []
    # dt = 400 s (a third of the reference's IMEX step): the Strang split treats the
    # *mean-depth* gravity waves exactly, but height deviations reach ~25% of H and
    # their explicit residual needs the extra CFL margin at lmax = 64. The recording
    # cadence (one frame per 60000 s) is unchanged.
    dt = units.timestep / 3
    for s in seeds:
        state = galewsky_state(grid, int(s), units)
        h, u_phi, u_theta = solver.rollout(
            state, dt, num_records=num_frames, steps_per_record=150
        )
        traj = jnp.stack([h, u_phi, u_theta], axis=-1)  # [T, nphi, ntheta, 3]
        out.append(np.asarray(traj, dtype=np.float32))
    return np.stack(out)


def _avg_pool_2x2(traj: np.ndarray) -> np.ndarray:
    """[T, H, W, C] -> [T, H//2, W//2, C] by 2x2 mean pooling."""
    t, h, w, c = traj.shape
    return traj.reshape(t, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


