"""Internally heated convection in the unit ball (IHC dataset).

Trajectories come from the spectral Boussinesq solver in
``enf_pde_tpu.data.ball_convection`` — the same physics as the reference's Dedalus
generator (``pdes.py:738-846``): Rayleigh 1e6, Prandtl 1, internal source
``T_source = 6``, stress-free/impenetrable velocity, fixed-flux temperature
(``dT/dr(1) = -2``), low-passed random-noise + ``1 - r^2`` initial conditions,
CFL-adaptive SBDF2. Frames are recorded on the reference output grid
(48 x 24 x 24 uniform phi/theta/r, ``fit_ihc.py:33-37``) every 0.2 time units after
a transient, mirroring the reference's every-10-iterations cadence at ``max_dt``.

``BallModes`` (the exact Neumann heat-kernel eigenbasis of the ball) is kept as the
validation oracle: with buoyancy disabled the convection solver must reproduce its
closed-form conduction solution (see ``tests/test_ball_convection.py``).
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import brentq
from scipy.special import spherical_jn

from enf_pde_tpu.data.sphere_harmonics import legendre_table

__all__ = ["BallModes", "generate_ihc_trajectories", "neumann_bessel_roots"]

_KAPPA = 1e-3  # (Rayleigh * Prandtl)^(-1/2) at Ra = 1e6, Pr = 1


def neumann_bessel_roots(l: int, num: int) -> np.ndarray:
    """First ``num`` positive roots of d/dx j_l(x) = 0."""
    roots = []
    x = 1e-3 if l == 0 else 0.5
    prev = spherical_jn(l, x, derivative=True)
    step = 0.01
    while len(roots) < num:
        x2 = x + step
        cur = spherical_jn(l, x2, derivative=True)
        if prev * cur < 0:
            roots.append(brentq(lambda t: spherical_jn(l, t, derivative=True), x, x2))
        x, prev = x2, cur
        if x > 400:
            raise RuntimeError("Bessel root search ran away")
    return np.asarray(roots)


class BallModes:
    """Neumann heat-kernel eigenbasis of the unit ball on a (phi, theta, r) grid.

    Exact conduction solutions: the perturbation ``u = T - (1 - r^2)`` obeys the pure
    heat equation with a homogeneous Neumann boundary and is diagonal in the basis
    ``Y_lm(theta, phi) * j_l(lambda_{l,n} r)`` with ``j_l'(lambda) = 0``.
    """

    def __init__(self, nphi: int = 48, ntheta: int = 24, nr: int = 24, lmax: int = 12, nmax: int = 8):
        self.nphi, self.ntheta, self.nr = nphi, ntheta, nr
        self.lmax, self.nmax = lmax, nmax
        self.mmax = min(lmax, nphi // 2)
        # Output angular grid matches the reference entry point (fit_ihc.py:33-37):
        # uniform phi, uniform theta in (0, pi) — synthesis needs no quadrature, so
        # the Legendre table is evaluated directly at these thetas.
        self.phi = np.linspace(0, 2 * np.pi, nphi, endpoint=False)
        self.theta = np.linspace(1e-3, np.pi, ntheta, endpoint=False)
        P = legendre_table(lmax, np.cos(self.theta))
        self._P_out = P[:, : self.mmax + 1, :]  # [L, M, ntheta]

        # Radial Gauss-Legendre quadrature on [0, 1] (weight r^2 dr).
        nodes, weights = np.polynomial.legendre.leggauss(64)
        self.rq = 0.5 * (nodes + 1.0)
        self.wq = 0.5 * weights

        # Output radial grid matches the reference entry point: linspace(0, 1, nr).
        self.r_out = np.linspace(0, 1, nr)

        # Radial modes j_l(lambda_{l,n} r), Neumann at r=1, L2(r^2 dr)-normalized.
        self.lam = np.zeros((lmax + 1, nmax))
        self.radial_q = np.zeros((lmax + 1, nmax, len(self.rq)))  # at quadrature nodes
        self.radial_out = np.zeros((lmax + 1, nmax, nr))  # at output radii
        for l in range(lmax + 1):
            lams = neumann_bessel_roots(l, nmax)
            self.lam[l] = lams
            for n, lam in enumerate(lams):
                fq = spherical_jn(l, lam * self.rq)
                norm = np.sqrt(np.sum(self.wq * fq**2 * self.rq**2))
                self.radial_q[l, n] = fq / norm
                self.radial_out[l, n] = spherical_jn(l, lam * self.r_out) / norm

    def sample_ic_coeffs(self, seed: int, scale: float = 0.1) -> np.ndarray:
        """Random band-limited modal coefficients for a noise IC."""
        rng = np.random.RandomState(seed % (2**31 - 1))
        L, M, N = self.lmax + 1, self.mmax + 1, self.nmax
        coeffs = (rng.randn(L, M, N) + 1j * rng.randn(L, M, N)) * scale
        ls = np.arange(L)[:, None, None]
        ms = np.arange(M)[None, :, None]
        coeffs = np.where(ls >= ms, coeffs, 0.0)
        coeffs[:, 0] = coeffs[:, 0].real  # m = 0 modes are real
        # Taper the spectrum so the field is smooth at grid scale.
        taper = np.exp(-0.5 * (ls / (L / 2)) ** 2) * np.exp(
            -0.5 * (np.arange(N)[None, None, :] / (N / 2)) ** 2
        )
        return coeffs * taper

    def frames(self, coeffs: np.ndarray, times: np.ndarray) -> np.ndarray:
        """Exact heat-equation frames [T, nphi, ntheta, nr] for modal IC ``coeffs``."""
        decay = np.exp(-_KAPPA * (self.lam[:, None, :] ** 2)[None] * times[:, None, None, None])
        # [T, L, M, N] -> contract radial modes -> [T, L, M, nr]
        ct = coeffs[None] * decay
        field_lm_r = np.einsum("tlmn,lnr->tlmr", ct, self.radial_out)
        # SH synthesis per radius onto the uniform-theta output grid.
        g_m = np.einsum("lmj,tlmr->trmj", self._P_out, field_lm_r)  # [T, nr, M, ntheta]
        pad = self.nphi // 2 + 1 - (self.mmax + 1)
        if pad > 0:
            g_m = np.pad(g_m, [(0, 0), (0, 0), (0, pad), (0, 0)])
        grid = np.fft.irfft(g_m * self.nphi, n=self.nphi, axis=-2)  # [T, nr, nphi, ntheta]
        pert = np.moveaxis(grid, 1, -1)  # [T, nphi, ntheta, nr]
        equilibrium = (1.0 - self.r_out**2)[None, None, None, :]
        return pert + equilibrium


def generate_ihc_trajectories(
    seeds: np.ndarray, solver=None, num_frames: int = 20
) -> np.ndarray:
    """Convection trajectories [num, num_frames, 48, 24, 24, 1].

    Frame cadence mirrors the reference recorder (every 10 adaptive steps of ~0.02
    time units, transient of 10 records skipped): frames at ``t = 2.0 + 0.2 k``.
    """
    from enf_pde_tpu.data.ball_convection import BallConvectionSolver, BallOutputGrid

    solver = solver or BallConvectionSolver()
    out_grid = BallOutputGrid(solver)
    out = []
    for s in seeds:
        frames = solver.simulate(
            int(s),
            record_interval=0.2,
            t_start_record=2.0,
            num_frames=num_frames,
            out_grid=out_grid,
        )
        out.append(frames.astype(np.float32)[..., None])
    return np.stack(out)
