"""Scalar spherical-harmonic transforms on a Gauss-Legendre x uniform-phi grid.

Analysis/synthesis are dense matmuls over precomputed normalized associated-Legendre
tables — MXU-friendly and exact for band-limited fields (Gauss-Legendre quadrature in
cos(theta) integrates polynomials up to degree ``2*ntheta - 1`` exactly).

Used by the sphere-diffusion dataset (heat kernel is diagonal in the SH basis:
``f_lm(t) = f_lm(0) * exp(-D l (l+1) t)``) and by the spherical shallow-water solver.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SphereGrid", "legendre_table"]


def legendre_table(lmax: int, x: np.ndarray) -> np.ndarray:
    """Orthonormal associated Legendre functions ``Pbar[l, m, j]`` at nodes ``x``.

    Normalized so that ``2 pi * sum_j w_j Pbar[l,m] Pbar[l',m] = delta_ll'`` with
    Gauss-Legendre weights w, i.e. the spherical harmonics
    ``Y_lm = Pbar_l^m(cos theta) e^{i m phi}`` are orthonormal on the sphere.
    Computed with the standard stable recurrences in float64.
    """
    x = np.asarray(x, dtype=np.float64)
    J = x.shape[0]
    s = np.sqrt(1.0 - x * x)
    P = np.zeros((lmax + 1, lmax + 1, J))
    P[0, 0] = np.sqrt(1.0 / (4.0 * np.pi))
    for m in range(1, lmax + 1):
        P[m, m] = -np.sqrt((2 * m + 1) / (2.0 * m)) * s * P[m - 1, m - 1]
    for m in range(0, lmax):
        P[m + 1, m] = np.sqrt(2 * m + 3.0) * x * P[m, m]
    for m in range(0, lmax + 1):
        for l in range(m + 2, lmax + 1):
            a = np.sqrt((4.0 * l * l - 1.0) / (l * l - m * m))
            b = np.sqrt(((l - 1.0) ** 2 - m * m) / (4.0 * (l - 1.0) ** 2 - 1.0))
            P[l, m] = a * (x * P[l - 1, m] - b * P[l - 2, m])
    return P


class SphereGrid:
    """A (phi, theta) grid with SH analysis/synthesis.

    phi: ``nphi`` uniform points in [0, 2pi); theta: ``ntheta`` Gauss-Legendre
    colatitude nodes. Fields are laid out ``[..., nphi, ntheta]`` (longitude first,
    like the reference's Dedalus grids).
    """

    def __init__(self, nphi: int, ntheta: int, lmax: int | None = None):
        self.nphi = nphi
        self.ntheta = ntheta
        self.lmax = lmax if lmax is not None else ntheta - 1
        assert self.lmax < ntheta, "Need lmax < ntheta for exact quadrature."
        self.mmax = min(self.lmax, nphi // 2)

        nodes, weights = np.polynomial.legendre.leggauss(ntheta)
        # Descending in x = cos(theta): theta ascending from 0 to pi.
        order = np.argsort(-nodes)
        self.x = nodes[order]
        self.w = weights[order]
        self.theta = np.arccos(self.x)
        self.phi = 2 * np.pi * np.arange(nphi) / nphi

        # Compute one extra degree so the theta-derivative recurrence has P_{l+1}.
        P_ext = legendre_table(self.lmax + 1, self.x)  # [L+2, M+2, J]
        P = P_ext[: self.lmax + 1]
        self._P = jnp.asarray(P[:, : self.mmax + 1, :])  # [L, M, J]
        self._Pw = jnp.asarray(P[:, : self.mmax + 1, :] * self.w[None, None, :])

        # d Pbar_l^m / d theta via the normalized recurrence
        #   sin(theta) dP_l^m/dtheta = l eps_{l+1}^m P_{l+1}^m - (l+1) eps_l^m P_{l-1}^m,
        # eps_l^m = sqrt((l^2 - m^2) / (4 l^2 - 1)) (verified against finite
        # differences in tests).
        L1 = self.lmax + 2
        ls_f = np.arange(L1, dtype=np.float64)[:, None]
        ms_f = np.arange(L1, dtype=np.float64)[None, :]
        with np.errstate(invalid="ignore", divide="ignore"):
            eps = np.sqrt(
                np.maximum(ls_f**2 - ms_f**2, 0.0) / np.maximum(4.0 * ls_f**2 - 1.0, 1e-300)
            )
        sin_t = np.sqrt(1.0 - self.x**2)
        H = np.zeros((self.lmax + 1, self.lmax + 1, ntheta))
        for m in range(self.lmax + 1):
            for l in range(m, self.lmax + 1):
                up = l * eps[l + 1, m] * P_ext[l + 1, m]
                down = (l + 1) * eps[l, m] * (P_ext[l - 1, m] if l >= 1 else 0.0)
                H[l, m] = (up - down) / sin_t
        self._H = jnp.asarray(H[:, : self.mmax + 1, :])

        self.sin_theta = jnp.asarray(sin_t)
        ls = np.arange(self.lmax + 1)
        self.l_values = jnp.asarray(ls)
        self.m_values = jnp.asarray(np.arange(self.mmax + 1))
        self.laplacian_eig = jnp.asarray(-ls * (ls + 1.0))  # on the unit sphere

    # -- transforms --------------------------------------------------------

    def analysis(self, f: jnp.ndarray) -> jnp.ndarray:
        """Field [..., nphi, ntheta] -> SH coefficients [..., lmax+1, mmax+1] (complex).

        Coefficient convention: ``f = sum_{l,m>=0} Re-expansion`` via ``synthesis``;
        for m = 0 the coefficient is real-valued information only.
        """
        c_m = jnp.fft.rfft(f, axis=-2) / self.nphi  # [..., nphi//2+1, ntheta]
        c_m = c_m[..., : self.mmax + 1, :]
        # f_lm = 2 pi sum_j w_j Pbar[l,m,j] c_m[..., m, j]
        return 2 * jnp.pi * jnp.einsum("lmj,...mj->...lm", self._Pw, c_m)

    def synthesis(self, flm: jnp.ndarray) -> jnp.ndarray:
        """SH coefficients [..., lmax+1, mmax+1] -> field [..., nphi, ntheta]."""
        g_m = jnp.einsum("lmj,...lm->...mj", self._P, flm)  # [..., mmax+1, ntheta]
        pad = self.nphi // 2 + 1 - (self.mmax + 1)
        if pad > 0:
            g_m = jnp.pad(g_m, [(0, 0)] * (g_m.ndim - 2) + [(0, pad), (0, 0)])
        return jnp.fft.irfft(g_m * self.nphi, n=self.nphi, axis=-2)

    def synthesis_dtheta(self, flm: jnp.ndarray) -> jnp.ndarray:
        """Colatitude derivative: coefficients -> d(field)/d(theta) on the grid."""
        g_m = jnp.einsum("lmj,...lm->...mj", self._H, flm)
        pad = self.nphi // 2 + 1 - (self.mmax + 1)
        if pad > 0:
            g_m = jnp.pad(g_m, [(0, 0)] * (g_m.ndim - 2) + [(0, pad), (0, 0)])
        return jnp.fft.irfft(g_m * self.nphi, n=self.nphi, axis=-2)

    def analysis_dtheta_flux(self, a: jnp.ndarray) -> jnp.ndarray:
        """SH coefficients of ``(1/sin t) d(a sin t)/dt`` via integration by parts.

        ``< (1/sin t) d(a sin t)/dt, Y*_lm > = - < a, dY*_lm/dt >`` (the boundary term
        vanishes at the poles), so this is an analysis with the theta-derivative table
        in place of the Legendre table. Used by spherical div/curl operators.
        """
        c_m = jnp.fft.rfft(a, axis=-2) / self.nphi
        c_m = c_m[..., : self.mmax + 1, :]
        Hw = self._H * jnp.asarray(self.w)[None, None, :]
        return -2 * jnp.pi * jnp.einsum("lmj,...mj->...lm", Hw, c_m)

    def dphi_coeffs(self, flm: jnp.ndarray) -> jnp.ndarray:
        """Longitude derivative in spectral space: multiply by i m."""
        return flm * (1j * self.m_values)

    def filter_lowpass(self, f: jnp.ndarray, lcut: int) -> jnp.ndarray:
        """Zero all SH modes with l > lcut."""
        flm = self.analysis(f)
        mask = (self.l_values <= lcut)[:, None]
        return self.synthesis(flm * mask)

    # -- diffusion ----------------------------------------------------------

    def diffuse(self, f: jnp.ndarray, D: float, t: jnp.ndarray) -> jnp.ndarray:
        """Exact heat-equation evolution: returns fields at times ``t`` [T, ...grid]."""
        flm = self.analysis(f)
        decay = jnp.exp(self.laplacian_eig[None, :] * D * jnp.asarray(t)[:, None])  # [T, L]
        evolved = flm[None] * decay[(...,) + (None,) * (flm.ndim - 1)].reshape(
            len(t), *([1] * (flm.ndim - 2)), self.lmax + 1, 1
        )
        return self.synthesis(evolved)
