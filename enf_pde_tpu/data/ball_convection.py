"""Boussinesq convection in the unit ball: a toroidal-poloidal spectral solver.

Reproduces the physics of the reference's IHC data generator
(``/root/reference/experiments/fitting/datasets/pdes.py:738-846``, a Dedalus
BallBasis IVP): internally heated convection at Rayleigh 1e6, Prandtl 1,

    div(u) = 0
    dt(u) - nu*lap(u) + grad(p) - r*T*rhat = -curl(u) x u
    dt(T) - kappa*lap(T)                  = -u.grad(T) + kappa*T_source,  T_source = 6

with stress-free, impenetrable velocity (``shear_stress = 0``, ``u_r(1) = 0``) and
fixed-flux temperature (``dT/dr(1) = -2``), ICs = low-passed random noise + the
conductive equilibrium ``1 - r^2``, SBDF2 time stepping with CFL-adaptive dt.

Discretization (this implementation, not a Dedalus port):

- **Angular**: spherical harmonics on a Gauss-Legendre (theta) x uniform (phi) grid,
  1.5x dealiased; scalar analysis/synthesis are dense Legendre contractions + FFTs.
- **Radial**: one-sided Jacobi bases on [0, 1], exactly regular at the origin:
  ``r^{l+sigma} P_n^{(0, l+sigma+1/2)}(2r^2-1)`` with sigma = 0 for scalars, +1 for
  the velocity potentials, -1 for vector-forcing profiles (the parity/leading-power
  each family needs). Basis derivatives are computed symbolically term-by-term.
- **Velocity**: u = curl(curl(W rhat)) + curl(Z rhat). Per (l, m):
  u_r = l(l+1) W / r^2, with S = W'/r and T = -Z/r in the (Q, S, T) vector-harmonic
  decomposition ``F = Q Y rhat + S r-grad(Y) + T rhat x r-grad(Y)``.
- **Evolution** (D_l f := f'' - l(l+1) f / r^2):
      dt(Z)      = nu D_l Z      - r * T^F
      dt(D_l W)  = nu D_l^2 W    - (Q^F - d_r(r S^F))
      dt(T_lm)   = kappa (T'' + 2T'/r - l(l+1)T/r^2) - [u.grad T]_lm + source
  where (Q^F, S^F, T^F) analyze the grid forcing F = r*T*rhat - omega x u.
  The curl maps (poloidal P, toroidal T) -> (T, -D_l P), so the vorticity is
  synthesized by the same routine from (Z, -(W'' - l(l+1)W/r^2)).
- **Implicit solves**: per-l square collocation-tau systems — rows are the SBDF2
  operator evaluated at interior Gauss collocation radii plus boundary tau rows
  (Z'(1) = 2 Z(1), W(1) = 0, W''(1) = 2 W'(1), T'(1) = -2 on the mean mode) — LU
  factored once per timestep size.

Validation hooks used by the tests: with u = 0 the temperature path reproduces the
exact Neumann heat-kernel solution; divergence-free synthesis; analysis/synthesis
round trips; curl consistency; low-Ra decay vs high-Ra convective growth.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
from scipy.linalg import lu_factor, lu_solve
from scipy.special import eval_jacobi

from enf_pde_tpu.data.sphere_harmonics import legendre_table

__all__ = ["AngularGrid", "RadialBasis", "BallConvectionSolver"]


def _bmm_c(A, B):
    """Batched matmul of complex A with real B via two real BLAS gemms.

    The hot transforms were 30x slower through numpy's complex c_einsum path.
    """
    return np.matmul(A.real, B) + 1j * np.matmul(A.imag, B)


# ------------------------------------------------------------------ angular (numpy)


class AngularGrid:
    """Scalar SHT on a Gauss-Legendre x uniform-phi grid (numpy, float64).

    Fields are ``[..., nphi, ntheta]``; coefficients ``[..., L, M]`` complex with the
    m >= 0 rfft convention. ``analysis(f)[l, m] = <f, Y*_lm>`` for orthonormal
    ``Y_lm = Pbar_l^m(cos theta) e^{i m phi}``.
    """

    def __init__(self, nphi: int, ntheta: int, lmax: int):
        assert lmax < ntheta
        self.nphi, self.ntheta, self.lmax = nphi, ntheta, lmax
        self.mmax = min(lmax, nphi // 2)
        nodes, weights = np.polynomial.legendre.leggauss(ntheta)
        order = np.argsort(-nodes)
        self.x, self.w = nodes[order], weights[order]
        self.theta = np.arccos(self.x)
        self.sin_theta = np.sqrt(1.0 - self.x**2)
        self.phi = 2 * np.pi * np.arange(nphi) / nphi

        P_ext = legendre_table(lmax + 1, self.x)
        self.P = P_ext[: lmax + 1, : self.mmax + 1, :]  # [L, M, J]

        # dPbar/dtheta via the normalized recurrence (same as SphereGrid).
        L1 = lmax + 2
        ls = np.arange(L1, dtype=np.float64)[:, None]
        ms = np.arange(L1, dtype=np.float64)[None, :]
        with np.errstate(invalid="ignore", divide="ignore"):
            eps = np.sqrt(np.maximum(ls**2 - ms**2, 0.0) / np.maximum(4 * ls**2 - 1.0, 1e-300))
        H = np.zeros((lmax + 1, lmax + 1, ntheta))
        for m in range(lmax + 1):
            for l in range(m, lmax + 1):
                up = l * eps[l + 1, m] * P_ext[l + 1, m]
                down = (l + 1) * eps[l, m] * (P_ext[l - 1, m] if l >= 1 else 0.0)
                H[l, m] = (up - down) / self.sin_theta
        self.H = H[:, : self.mmax + 1, :]

        self.Pw = self.P * self.w[None, None, :]
        self.Hw = self.H * self.w[None, None, :]
        # m-major contiguous copies for batched-BLAS transforms.
        self.P_m = np.ascontiguousarray(self.P.transpose(1, 0, 2))  # [M, L, J]
        self.H_m = np.ascontiguousarray(self.H.transpose(1, 0, 2))
        self.PwT_m = np.ascontiguousarray(self.Pw.transpose(1, 2, 0))  # [M, J, L]
        self.HwT_m = np.ascontiguousarray(self.Hw.transpose(1, 2, 0))
        ls = np.arange(lmax + 1, dtype=np.float64)
        self.llp1 = ls * (ls + 1.0)  # [L]
        self.im = 1j * np.arange(self.mmax + 1, dtype=np.float64)  # [M]

    # fields <-> m-space -----------------------------------------------------------
    def _to_m(self, f):
        return np.fft.rfft(f, axis=-2)[..., : self.mmax + 1, :] / self.nphi

    def _from_m(self, g_m):
        pad = self.nphi // 2 + 1 - (self.mmax + 1)
        if pad > 0:
            g_m = np.pad(g_m, [(0, 0)] * (g_m.ndim - 2) + [(0, pad), (0, 0)])
        return np.fft.irfft(g_m * self.nphi, n=self.nphi, axis=-2)

    def _contract_analysis(self, table_T, f):
        """c_m [..., M, J] x table [M, J, L] -> [..., L, M]."""
        c_m = self._to_m(f)
        cm = np.moveaxis(c_m, -2, 0)  # [M, ..., J]
        out = _bmm_c(cm, table_T)  # [M, ..., L]
        return 2 * np.pi * np.moveaxis(out, (0, -1), (-1, -2))

    def _contract_synthesis(self, table, flm):
        """flm [..., L, M] x table [M, L, J] -> grid (via irfft)."""
        fm = np.moveaxis(flm, -1, 0)  # [M, ..., L]
        g = _bmm_c(fm, table)  # [M, ..., J]
        return self._from_m(np.moveaxis(g, 0, -2))

    # transforms ---------------------------------------------------------------
    def analysis(self, f):
        """[..., nphi, ntheta] -> [..., L, M]: f_lm = <f, Y*_lm>."""
        return self._contract_analysis(self.PwT_m, f)

    def analysis_dtheta(self, f):
        """Coefficients of <f, dY*_lm/dtheta> (no integration by parts)."""
        return self._contract_analysis(self.HwT_m, f)

    def synthesis(self, flm):
        return self._contract_synthesis(self.P_m, flm)

    def synthesis_dtheta(self, flm):
        return self._contract_synthesis(self.H_m, flm)

    def synthesis_dphi_over_sin(self, flm):
        """Grid values of (1/sin theta) d/dphi of the field with coefficients flm."""
        return self._contract_synthesis(self.P_m, flm * self.im) / self.sin_theta


# ------------------------------------------------------------------ radial (numpy)


class RadialBasis:
    """One-sided Jacobi radial basis, regular at the origin.

    Basis: ``phi^l_n(r) = c_n r^{l+sigma} P_n^{(0, l+sigma+1/2)}(2 r^2 - 1)``,
    orthonormalized under ``int_0^1 f g r^2 dr``. Derivatives of any order are exact:
    each is a sum of terms ``coeff * r^p * d^j/dt^j P_n (t=2r^2-1)`` maintained
    symbolically (differentiation maps (c, p, j) -> (c p, p-1, j) + (4c, p+1, j+1)).
    """

    def __init__(self, lmax: int, nmax: int, sigma: int, lmin: int = 0):
        self.lmax, self.nmax, self.sigma, self.lmin = lmax, nmax, sigma, lmin
        # Quadrature for normalization.
        qn, qw = np.polynomial.legendre.leggauss(2 * nmax + lmax + 8)
        rq = 0.5 * (qn + 1.0)
        wq = 0.5 * qw
        self._norm = np.ones((lmax + 1, nmax))
        for l in range(lmin, lmax + 1):
            vals = self._eval_raw(l, rq, 0)
            self._norm[l] = np.sqrt(np.sum(wq[:, None] * vals**2 * rq[:, None] ** 2, axis=0))

    def _alpha_beta(self, l):
        p0 = l + self.sigma
        return 0.0, p0 + 0.5, p0

    def _eval_raw(self, l, r, deriv):
        """Un-normalized [len(r), nmax] matrix of the deriv-th radial derivative."""
        a, b, p0 = self._alpha_beta(l)
        r = np.asarray(r, dtype=np.float64)
        t = 2 * r**2 - 1
        # terms: dict (p, j) -> coeff, starting from r^{p0} P^{(j=0)}
        terms = {(p0, 0): 1.0}
        for _ in range(deriv):
            new: Dict[Tuple[float, int], float] = {}
            for (p, j), c in terms.items():
                if p != 0:
                    new[(p - 1, j)] = new.get((p - 1, j), 0.0) + c * p
                new[(p + 1, j + 1)] = new.get((p + 1, j + 1), 0.0) + 4.0 * c
            terms = new
        out = np.zeros((len(r), self.nmax))
        ns = np.arange(self.nmax)
        for (p, j), c in terms.items():
            # d^j/dt^j P_n^{(a,b)} = 2^{-j} prod_{i<j}(n+a+b+1+i) P_{n-j}^{(a+j,b+j)}
            scale = np.ones(self.nmax)
            for i in range(j):
                scale *= (ns + a + b + 1 + i) / 2.0
            pj = np.zeros((len(r), self.nmax))
            for n in range(j, self.nmax):
                pj[:, n] = scale[n] * eval_jacobi(n - j, a + j, b + j, t)
            if p < 0:
                # falling-factorial coefficients kill negative powers exactly
                assert abs(c) < 1e-12, f"negative power r^{p} with coeff {c}"
                continue
            out += c * (r[:, None] ** p) * pj
        return out

    def eval(self, l, r, deriv=0):
        """Normalized evaluation matrix [len(r), nmax] of the deriv-th derivative."""
        return self._eval_raw(l, r, deriv) / self._norm[l][None, :]

    def stack(self, r, deriv=0):
        """[L, len(r), nmax] evaluation tensor over all l (zeros below lmin)."""
        out = np.zeros((self.lmax + 1, len(r), self.nmax))
        for l in range(self.lmin, self.lmax + 1):
            out[l] = self.eval(l, r, deriv)
        return out

    def projector(self, r, w):
        """[L, nmax, len(r)] weighted least-squares projection (grid values at the
        quadrature nodes ``r`` with weights ``w`` -> coefficients)."""
        out = np.zeros((self.lmax + 1, self.nmax, len(r)))
        for l in range(self.lmin, self.lmax + 1):
            E = self.eval(l, r, 0)  # [nq, N]
            Wsq = (w * r**2)[:, None]
            A = E.T @ (Wsq * E)
            out[l] = np.linalg.solve(A, (Wsq * E).T)
        return out


# ------------------------------------------------------------------ the solver


class BallConvectionSolver:
    """Galerkin toroidal-poloidal solver for internally heated ball convection.

    Weak-form discretization per (l, m): test functions live in the same recombined
    radial bases as the trial functions, which satisfy the velocity boundary
    conditions exactly (Z'(1) = 2Z(1); W(1) = 0, W''(1) = 2W'(1)); temperature's
    fixed-flux condition is natural (enters as a boundary term). All operators are
    then symmetric and sign-definite, so SBDF is unconditionally stable for the
    linear part — a collocation-tau variant of this solver exhibited spurious
    positive eigenmodes and blew up.

    With c = l(l+1), D_l f = f'' - c f / r^2, and quadrature integrals over [0, 1]:

        temperature (weight r^2 dr):   M_T dT/dt = -kappa K_T T + F_T
        toroidal    (weight dr):       M_Z dZ/dt = -nu K_Z Z + F_Z
        poloidal    (weight dr):       M_W dW/dt = -nu G_W W + F_W

        M_T = <psi, psi> r^2          K_T = <psi', psi'> r^2 + c <psi, psi>
        M_Z = <zeta, zeta>            K_Z = <zeta', zeta'> + c <zeta, zeta>/r^2
                                             - 2 zeta(1) zeta(1)^T
        M_W = <omega', omega'> + c <omega, omega>/r^2       (= -<omega, D_l omega>)
        G_W = <D_l omega, D_l omega> - 2 omega'(1) omega'(1)^T

        F_T = -<psi, u.grad T> r^2 + kappa T_source <psi, 1> r^2 (mean mode)
              + kappa psi(1) dT/dr(1)                            (flux BC, mean mode)
        F_Z = -<zeta, r T^F>
        F_W = -<omega, Q^F> - <omega', r S^F>   (the d_r moved onto the test function)

    where (Q^F, S^F, T^F) analyze the grid forcing F = r T rhat - omega x u.
    """

    def __init__(
        self,
        lmax: int = 23,
        nmax: int = 24,
        rayleigh: float = 1e6,
        prandtl: float = 1.0,
        t_source: float = 6.0,
        buoyancy: float = 1.0,
        nphi_grid: int | None = None,
        ntheta_grid: int | None = None,
        nq: int | None = None,
    ):
        self.lmax, self.nmax = lmax, nmax
        self.kappa = (rayleigh * prandtl) ** (-0.5)
        self.nu = (rayleigh / prandtl) ** (-0.5)
        self.t_source = t_source
        self.buoyancy = buoyancy  # 0 disables the r*T*rhat force (conduction limit)

        # Dealiased angular grid.
        nphi_grid = nphi_grid or int(3 * lmax + 3)
        nphi_grid += nphi_grid % 2  # rfft-friendly
        ntheta_grid = ntheta_grid or int(np.ceil(1.5 * (lmax + 1)))
        self.ang = AngularGrid(nphi_grid, ntheta_grid, lmax)
        self.M = self.ang.mmax + 1
        self.L = lmax + 1

        # Radial quadrature (both the nonlinear grid and all weak-form integrals);
        # 3/2 dealiasing for the quadratic nonlinearities.
        nq = nq or (3 * nmax) // 2
        qn, qw = np.polynomial.legendre.leggauss(nq)
        self.rq = 0.5 * (qn + 1.0)
        self.wq = 0.5 * qw
        self.nq = nq

        self.bT = RadialBasis(lmax, nmax, sigma=0)
        self.bV = RadialBasis(lmax, nmax, sigma=1, lmin=1)

        # Temperature basis: unconstrained, N modes.
        self.NT = nmax
        self.ET0 = self.bT.stack(self.rq, 0)  # [L, nq, NT]
        self.ET1 = self.bT.stack(self.rq, 1)
        self.PT = self.bT.projector(self.rq, self.wq)  # ICs only
        one = np.array([1.0])
        self.bT_bnd0 = self.bT.stack(one, 0)[:, 0]  # psi(1) [L, NT]

        # Velocity bases: recombine raw sigma=+1 functions to satisfy the BCs.
        self.NZ, self.NW = nmax - 1, nmax - 2
        V0q = self.bV.stack(self.rq, 0)
        V1q = self.bV.stack(self.rq, 1)
        V2q = self.bV.stack(self.rq, 2)
        v0 = self.bV.stack(one, 0)[:, 0]  # [L, N] values at r=1
        v1 = self.bV.stack(one, 1)[:, 0]
        v2 = self.bV.stack(one, 2)[:, 0]

        L, N = self.L, nmax
        self.RZ = np.zeros((L, N, self.NZ))  # recombined -> raw coefficients
        self.RW = np.zeros((L, N, self.NW))
        for l in range(1, L):
            g1 = v1[l] - 2 * v0[l]  # zeta'(1) - 2 zeta(1) functional
            for n in range(self.NZ):
                self.RZ[l, n, n] = 1.0
                self.RZ[l, n + 1, n] = -g1[n] / g1[n + 1]
            g2 = v2[l] - 2 * v1[l]  # omega''(1) - 2 omega'(1) functional
            for n in range(self.NW):
                A2 = np.array([[v0[l, n + 1], v0[l, n + 2]], [g2[n + 1], g2[n + 2]]])
                rhs2 = -np.array([v0[l, n], g2[n]])
                ab = np.linalg.solve(A2, rhs2)
                self.RW[l, n, n] = 1.0
                self.RW[l, n + 1, n] = ab[0]
                self.RW[l, n + 2, n] = ab[1]
            # Normalize each recombined function in L2(dr) for conditioning.
            for R, E in ((self.RZ, V0q), (self.RW, V0q)):
                vals = E[l] @ R[l]
                nrm = np.sqrt(np.sum(self.wq[:, None] * vals**2, axis=0))
                R[l] /= np.maximum(nrm, 1e-300)

        # Effective evaluation tensors for the recombined bases [L, nq, NZ/NW].
        self.EZ0 = np.einsum("lqn,lnk->lqk", V0q, self.RZ)
        self.EZ1 = np.einsum("lqn,lnk->lqk", V1q, self.RZ)
        self.EW0 = np.einsum("lqn,lnk->lqk", V0q, self.RW)
        self.EW1 = np.einsum("lqn,lnk->lqk", V1q, self.RW)
        self.EW2 = np.einsum("lqn,lnk->lqk", V2q, self.RW)
        self.zeta_b = np.einsum("ln,lnk->lk", v0, self.RZ)  # zeta(1)
        self.omega_b1 = np.einsum("ln,lnk->lk", v1, self.RW)  # omega'(1)

        # Weak-form matrices per l.
        wq, rq = self.wq, self.rq
        c = self.ang.llp1
        w_r2 = (wq * rq**2)[None, :, None]
        self.MT = np.einsum("lqa,lqb->lab", self.ET0 * w_r2, self.ET0)
        self.KT = np.einsum("lqa,lqb->lab", self.ET1 * w_r2, self.ET1) + c[
            :, None, None
        ] * np.einsum("lqa,lqb->lab", self.ET0 * wq[None, :, None], self.ET0)

        w_1 = wq[None, :, None]
        w_inv2 = (wq / rq**2)[None, :, None]
        self.MZ = np.einsum("lqa,lqb->lab", self.EZ0 * w_1, self.EZ0)
        self.KZ = (
            np.einsum("lqa,lqb->lab", self.EZ1 * w_1, self.EZ1)
            + c[:, None, None] * np.einsum("lqa,lqb->lab", self.EZ0 * w_inv2, self.EZ0)
            - 2 * np.einsum("la,lb->lab", self.zeta_b, self.zeta_b)
        )
        self.MW = np.einsum("lqa,lqb->lab", self.EW1 * w_1, self.EW1) + c[
            :, None, None
        ] * np.einsum("lqa,lqb->lab", self.EW0 * w_inv2, self.EW0)
        DW = self.EW2 - c[:, None, None] * self.EW0 / rq[None, :, None] ** 2
        self.GW = np.einsum("lqa,lqb->lab", DW * w_1, DW) - 2 * np.einsum(
            "la,lb->lab", self.omega_b1, self.omega_b1
        )

        self._lu_cache: dict = {}

    # ----------------------------------------------------------------- solve setup

    def _matrices(self, dt: float):
        """LU factors of the SBDF implicit matrices per l, for both SBDF2 and SBDF1."""
        key = round(float(dt), 14)
        if key in self._lu_cache:
            return self._lu_cache[key]
        mats = {"T": [], "Z": [], "W": []}
        for a0 in (1.5, 1.0):  # SBDF2, SBDF1
            luT, luZ, luW = [], [], []
            for l in range(self.L):
                luT.append(lu_factor((a0 / dt) * self.MT[l] + self.kappa * self.KT[l]))
                if l == 0:
                    luZ.append(None)
                    luW.append(None)
                    continue
                luZ.append(lu_factor((a0 / dt) * self.MZ[l] + self.nu * self.KZ[l]))
                luW.append(lu_factor((a0 / dt) * self.MW[l] + self.nu * self.GW[l]))
            mats["T"].append(luT)
            mats["Z"].append(luZ)
            mats["W"].append(luW)
        self._lu_cache = {key: mats}  # keep only the current dt
        return mats

    # -------------------------------------------------------------- grid synthesis

    def _radial_eval(self, X, E):
        """coeffs [L, M, n] x eval [L, nr, n] -> profiles [nr, L, M]."""
        out = _bmm_c(X, E.transpose(0, 2, 1))  # [L, M, nr]
        return out.transpose(2, 0, 1)

    def _vector_grid(self, pol_q, dpol_q, tor_q):
        """Synthesize a solenoidal vector field from potential profiles at radii rq.

        pol_q / dpol_q / tor_q: [nr, L, M] profiles of P, P', and the toroidal
        potential. Returns (F_r, F_theta, F_phi) grids [nr, nphi, ntheta].
        """
        rq = self.rq[:, None, None]
        llp1 = self.ang.llp1[None, :, None]
        f_r = self.ang.synthesis(llp1 * pol_q / rq**2)
        s_prof = dpol_q / rq  # S = P'/r
        t_prof = -tor_q / rq  # T = -Z/r
        f_t = self.ang.synthesis_dtheta(s_prof) - self.ang.synthesis_dphi_over_sin(t_prof)
        f_p = self.ang.synthesis_dphi_over_sin(s_prof) + self.ang.synthesis_dtheta(t_prof)
        return f_r, f_t, f_p

    def _qst_analysis(self, f_r, f_t, f_p):
        """Grid vector field -> (Q, S, T) coefficient profiles [nr, L, M]."""
        with np.errstate(divide="ignore", invalid="ignore"):
            inv_llp1 = np.where(self.ang.llp1 > 0, 1.0 / np.maximum(self.ang.llp1, 1), 0.0)
        inv_llp1 = inv_llp1[None, :, None]
        sin = self.ang.sin_theta
        Q = self.ang.analysis(f_r)
        S = inv_llp1 * (
            self.ang.analysis_dtheta(f_t)
            - self.ang.im[None, None, :] * self.ang.analysis(f_p / sin)
        )
        T = inv_llp1 * (
            self.ang.im[None, None, :] * self.ang.analysis(f_t / sin)
            + self.ang.analysis_dtheta(f_p)
        )
        return Q, S, T

    # -------------------------------------------------------------- explicit terms

    def _explicit(self, Tc, Wc, Zc):
        """Weak-form forcing integrals (F_T, F_Z, F_W) and the velocity grids."""
        ang, rq = self.ang, self.rq[:, None, None]
        llp1 = ang.llp1[None, :, None]

        W0 = self._radial_eval(Wc, self.EW0)
        W1 = self._radial_eval(Wc, self.EW1)
        W2 = self._radial_eval(Wc, self.EW2)
        Z0 = self._radial_eval(Zc, self.EZ0)
        Z1 = self._radial_eval(Zc, self.EZ1)
        T0 = self._radial_eval(Tc, self.ET0)
        T1 = self._radial_eval(Tc, self.ET1)

        u_r, u_t, u_p = self._vector_grid(W0, W1, Z0)
        dlW = W2 - llp1 * W0 / rq**2
        o_r, o_t, o_p = self._vector_grid(Z0, Z1, -dlW)

        T_g = ang.synthesis(T0)
        dTr = ang.synthesis(T1)
        dTt = ang.synthesis_dtheta(T0) / rq
        dTp = ang.synthesis_dphi_over_sin(T0) / rq

        # F = r T rhat - omega x u ; temperature advection u . grad T.
        f_r = self.buoyancy * self.rq[:, None, None] * T_g - (o_t * u_p - o_p * u_t)
        f_t = -(o_p * u_r - o_r * u_p)
        f_p = -(o_r * u_t - o_t * u_r)
        adv = u_r * dTr + u_t * dTt + u_p * dTp

        Q, S, Tf = self._qst_analysis(f_r, f_t, f_p)
        adv_lm = ang.analysis(adv)  # [nq, L, M]

        # Weak-form forcing integrals (quadrature over r).
        w_r2 = (self.wq * self.rq**2)[:, None]
        w_1 = self.wq[:, None]
        F_T = -_bmm_c(adv_lm.transpose(1, 2, 0), self.ET0 * w_r2[None])
        # Internal heating (constant in space; mean mode) + flux boundary term.
        F_T[0, 0] += (
            self.kappa
            * self.t_source
            * np.sqrt(4 * np.pi)
            * (self.ET0[0].T @ (self.wq * self.rq**2))
        )
        F_T[0, 0] += self.kappa * (-2.0 * np.sqrt(4 * np.pi)) * self.bT_bnd0[0]

        rTf = (self.rq[:, None, None] * Tf).transpose(1, 2, 0)  # [L, M, q]
        F_Z = -_bmm_c(rTf, self.EZ0 * w_1[None])
        # Poloidal: the equation for -D_l W is tested with omega, so the weak RHS is
        # -<omega, E> with E = -(Q - d_r(rS)); by parts this is +<omega, Q> + <omega', rS>.
        rS = (self.rq[:, None, None] * S).transpose(1, 2, 0)
        F_W = _bmm_c(Q.transpose(1, 2, 0), self.EW0 * w_1[None]) + _bmm_c(
            rS, self.EW1 * w_1[None]
        )
        return F_T, F_Z, F_W, (u_r, u_t, u_p)

    # -------------------------------------------------------------- time stepping

    def _apply(self, Mats, X):
        """Batched per-l matrix application: [L, a, b] x [L, M, b] -> [L, M, a]."""
        return _bmm_c(X, Mats.transpose(0, 2, 1))

    def _solve(self, lus, rhs):
        """Per-l LU solves; rhs [L, M, n] -> coefficients [L, M, n]."""
        out = np.zeros_like(rhs)
        for l in range(self.L):
            if lus[l] is None:
                continue
            out[l] = lu_solve(lus[l], rhs[l].T).T
        return out

    def _mask(self, X):
        """Zero coefficients with m > l (and keep m=0 rows real)."""
        ls = np.arange(self.L)[:, None]
        ms = np.arange(self.M)[None, :]
        X *= (ms <= ls)[..., None]
        X[:, 0, :] = X[:, 0, :].real
        return X

    def initial_condition(self, seed: int, scale: float = 0.1):
        """Reference IC: normal grid noise low-passed to half resolution + (1 - r^2)."""
        rng = np.random.RandomState(seed % (2**31 - 1))
        noise = rng.normal(scale=scale, size=(self.nq, self.ang.nphi, self.ang.ntheta))
        n_lm = self.ang.analysis(noise)
        n_lm *= np.arange(self.L)[:, None] <= self.lmax // 2
        Tc = np.einsum("qlm,lnq->lmn", n_lm, self.PT)
        Tc[..., self.nmax // 2 :] = 0.0
        # Conductive equilibrium on the mean mode.
        eq = np.sqrt(4 * np.pi) * (1.0 - self.rq**2)
        Tc[0, 0] += self.PT[0] @ eq
        Wc = np.zeros((self.L, self.M, self.NW), dtype=complex)
        Zc = np.zeros((self.L, self.M, self.NZ), dtype=complex)
        return self._mask(Tc.astype(complex)), Wc, Zc

    def _cfl_dt(self, u_grids, safety=0.5, max_dt=0.02, min_dt=1e-4):
        """Advective CFL on the RESOLVED scales (like Dedalus's grid-based CFL).

        The nonlinear evaluation grid is 3/2-dealiased, i.e. finer than the model
        resolution; computing the CFL on it would be ~2-4x over-strict. Grid
        spacings here correspond to the spectral resolution: a Gauss grid of nmax
        radial points, lmax+1 colatitudes, 2*mmax longitudes.
        """
        u_r, u_t, u_p = u_grids
        if not hasattr(self, "_cfl_dr"):
            nodes, _ = np.polynomial.legendre.leggauss(self.nmax)
            r_res = 0.5 * (np.sort(nodes) + 1.0)
            dr_res = np.gradient(r_res)
            # Map each quadrature radius to the resolution spacing at that radius.
            self._cfl_dr = np.interp(self.rq, r_res, dr_res)
            self._cfl_dth = np.pi / (self.lmax + 1)
            self._cfl_dph = np.pi / max(self.ang.mmax, 1)
        rq = self.rq[:, None, None]
        sin = self.ang.sin_theta[None, None, :]
        freq = (
            np.abs(u_r) / self._cfl_dr[:, None, None]
            + np.abs(u_t) / (rq * self._cfl_dth)
            + np.abs(u_p) / np.maximum(rq * sin * self._cfl_dph, 1e-9)
        )
        f = float(freq.max())
        if f <= 0:
            return max_dt
        return float(np.clip(safety / f, min_dt, max_dt))

    def simulate(
        self,
        seed: int,
        stop_time: float = 12.0,
        record_interval: float = 0.2,
        t_start_record: float = 2.0,
        num_frames: int = 20,
        max_dt: float = 0.02,
        cfl_cadence: int = 10,
        out_grid: "BallOutputGrid | None" = None,
        on_step=None,
        ic=None,
    ) -> np.ndarray:
        """Run one trajectory; returns frames on the output grid [T, nphi, ntheta, nr]."""
        Tc, Wc, Zc = ic if ic is not None else self.initial_condition(seed)
        out_grid = out_grid or BallOutputGrid(self)
        frames = []
        record_times = t_start_record + record_interval * np.arange(num_frames)

        dt = max_dt
        t = 0.0
        E_prev = None  # (F_T, F_Z, F_W) of the previous step
        X_prev = None  # mass-matrix products of the previous state
        step = 0
        next_rec = 0

        while t < stop_time - 1e-12 and next_rec < num_frames:
            F_T, F_Z, F_W, u_grids = self._explicit(Tc, Wc, Zc)
            if step % cfl_cadence == 0:
                new_dt = self._cfl_dt(u_grids, max_dt=max_dt)
                # Adopt only significant changes; a changed dt invalidates the SBDF2
                # history weighting -> restart with SBDF1.
                if abs(new_dt - dt) > 0.1 * dt:
                    E_prev, X_prev = None, None
                    dt = new_dt
            mats = self._matrices(dt)

            MT_T = self._apply(self.MT, Tc)
            MZ_Z = self._apply(self.MZ, Zc)
            MW_W = self._apply(self.MW, Wc)

            if E_prev is not None:
                rhs_T = (2 / dt) * MT_T - (0.5 / dt) * X_prev[0] + 2 * F_T - E_prev[0]
                rhs_Z = (2 / dt) * MZ_Z - (0.5 / dt) * X_prev[1] + 2 * F_Z - E_prev[1]
                rhs_W = (2 / dt) * MW_W - (0.5 / dt) * X_prev[2] + 2 * F_W - E_prev[2]
                idx = 0
            else:
                rhs_T = (1 / dt) * MT_T + F_T
                rhs_Z = (1 / dt) * MZ_Z + F_Z
                rhs_W = (1 / dt) * MW_W + F_W
                idx = 1

            X_prev = (MT_T, MZ_Z, MW_W)
            E_prev = (F_T, F_Z, F_W)

            Tc = self._mask(self._solve(mats["T"][idx], rhs_T))
            Zc = self._mask(self._solve(mats["Z"][idx], rhs_Z))
            Wc = self._mask(self._solve(mats["W"][idx], rhs_W))
            t += dt
            step += 1
            if on_step is not None:
                on_step(step, t, dt, self, Tc, Wc, Zc)

            while next_rec < num_frames and t >= record_times[next_rec] - 1e-9:
                frames.append(out_grid.temperature(self, Tc))
                next_rec += 1

        while len(frames) < num_frames:  # safety: pad with the last frame
            frames.append(frames[-1])
        return np.stack(frames)

    # -------------------------------------------------------------- diagnostics

    def kinetic_energy(self, Wc, Zc) -> float:
        W0 = self._radial_eval(Wc, self.EW0)
        W1 = self._radial_eval(Wc, self.EW1)
        Z0 = self._radial_eval(Zc, self.EZ0)
        u_r, u_t, u_p = self._vector_grid(W0, W1, Z0)
        dens = u_r**2 + u_t**2 + u_p**2
        ang_w = (2 * np.pi / self.ang.nphi) * self.ang.w[None, None, :]
        return float(np.sum(self.wq[:, None, None] * self.rq[:, None, None] ** 2 * dens * ang_w))


class BallOutputGrid:
    """Synthesis tables for the reference output grid: uniform phi (48), uniform theta
    in (0, pi) (24), r = linspace(0, 1, 24) (matches ``data.ball_coords``)."""

    def __init__(self, solver: BallConvectionSolver, nphi: int = 48, ntheta: int = 24, nr: int = 24):
        self.nphi, self.ntheta, self.nr = nphi, ntheta, nr
        self.theta = np.linspace(1e-3, np.pi, ntheta, endpoint=False)
        self.r = np.linspace(0, 1, nr)
        P = legendre_table(solver.lmax, np.cos(self.theta))
        self.P_out = P[:, : solver.ang.mmax + 1, :]  # [L, M, ntheta]
        self.ET_out = solver.bT.stack(self.r, 0)  # [L, nr, N]
        self.mmax = solver.ang.mmax

    def temperature(self, solver: BallConvectionSolver, Tc) -> np.ndarray:
        """[nphi, ntheta, nr] grid values of the temperature field."""
        prof = np.einsum("lmn,lrn->rlm", Tc, self.ET_out)  # [nr, L, M]
        g_m = np.einsum("lmj,rlm->rmj", self.P_out, prof)  # [nr, M, ntheta]
        pad = self.nphi // 2 + 1 - (self.mmax + 1)
        if pad > 0:
            g_m = np.pad(g_m, [(0, 0), (0, pad), (0, 0)])
        grid = np.fft.irfft(g_m * self.nphi, n=self.nphi, axis=-2)  # [nr, nphi, ntheta]
        return np.moveaxis(grid, 0, -1)
