"""Validation of the spectral Boussinesq ball-convection solver (IHC data).

Physics contract (reference ``pdes.py:738-846``): internally heated convection,
stress-free + impenetrable velocity, fixed-flux temperature. Checks here:

1. exact vector-harmonic (Q, S, T) round trips through the grid;
2. symmetric weak-form operators are PSD (unconditional SBDF stability);
3. the conduction limit reproduces the closed-form Neumann heat solution to
   time-stepper accuracy (single-eigenmode exponential decay);
4. the full Rayleigh-1e6 configuration develops convection (perturbation energy
   grows off the conductive profile) while staying finite — the behavior the IHC
   experiment exists to exercise.
"""

import numpy as np
import pytest

from enf_pde_tpu.data.ball_convection import (
    BallConvectionSolver,
    BallOutputGrid,
)
from enf_pde_tpu.data.ihc import neumann_bessel_roots
from scipy.special import spherical_jn


@pytest.fixture(scope="module")
def small_solver():
    return BallConvectionSolver(lmax=7, nmax=10, buoyancy=0.0)


def _random_potentials(solver, scale, seed=0, lcut=4):
    rng = np.random.RandomState(seed)
    L, M = solver.L, solver.M

    def draw(n):
        X = (rng.randn(L, M, n) + 1j * rng.randn(L, M, n)) * scale
        ls = np.arange(L)[:, None, None]
        ms = np.arange(M)[None, :, None]
        X *= (ms <= ls) * (ls >= 1) * (ls <= lcut)
        X[:, 0] = X[:, 0].real
        X[..., n // 2 :] = 0
        return X

    return draw(solver.NW), draw(solver.NZ)


def test_qst_round_trip(small_solver):
    """Synthesize u from (W, Z), analyze back: Q = l(l+1)W/r^2, S = W'/r, T = -Z/r."""
    s = small_solver
    Wc, Zc = _random_potentials(s, 0.1)
    W0 = s._radial_eval(Wc, s.EW0)
    W1 = s._radial_eval(Wc, s.EW1)
    Z0 = s._radial_eval(Zc, s.EZ0)
    u = s._vector_grid(W0, W1, Z0)
    Q, S, T = s._qst_analysis(*u)
    rq = s.rq[:, None, None]
    llp1 = s.ang.llp1[None, :, None]
    ls = np.arange(s.L)[None, :, None]
    ms = np.arange(s.M)[None, None, :]
    mask = np.broadcast_to((ls >= 1) & (ms <= ls), Q.shape)
    for got, want in ((Q, llp1 * W0 / rq**2), (S, W1 / rq), (T, -Z0 / rq)):
        scale = np.abs(want)[mask].max()
        assert np.abs(got - want)[mask].max() < 1e-10 * max(scale, 1.0)


def test_weak_operators_are_psd(small_solver):
    """Sign-definite weak forms = unconditional SBDF stability for the linear part."""
    from scipy.linalg import eigh

    s = small_solver
    for l in range(1, s.L):
        for K, Mm in ((s.KZ[l], s.MZ[l]), (s.GW[l], s.MW[l]), (s.KT[l], s.MT[l])):
            ev = eigh(K, Mm, eigvals_only=True)
            assert ev.min() > -1e-8 * max(1.0, abs(ev.max()))


@pytest.mark.slow
def test_conduction_limit_matches_exact_eigenmode():
    """Buoyancy off + single Neumann mode IC -> exact exponential decay."""
    s = BallConvectionSolver(lmax=5, nmax=12, buoyancy=0.0)
    l, m = 2, 1
    lam = neumann_bessel_roots(l, 1)[0]

    # IC: equilibrium + eps * j_l(lam r) Y_lm, projected into the solver basis.
    Tc, Wc, Zc = s.initial_condition(0, scale=0.0)
    prof = spherical_jn(l, lam * s.rq)
    eps = 1e-2
    Tc[l, m] += eps * (s.PT[l] @ prof)

    out = BallOutputGrid(s, nphi=16, ntheta=8, nr=8)
    dt_rec = 5.0
    frames = s.simulate(
        0, stop_time=20.0, record_interval=dt_rec, t_start_record=dt_rec,
        num_frames=3, max_dt=0.02, out_grid=out, ic=(Tc, Wc, Zc),
    )
    eq = (1.0 - out.r**2)[None, None, :]
    pert = frames - eq[None]
    amps = np.sqrt([np.mean(p**2) for p in pert])
    kappa = s.kappa
    expected_ratio = np.exp(-kappa * lam**2 * dt_rec)
    for k in range(2):
        ratio = amps[k + 1] / amps[k]
        assert abs(ratio - expected_ratio) < 2e-3 * expected_ratio, (ratio, expected_ratio)


@pytest.mark.slow
def test_rayleigh_1e6_develops_convection():
    """At Ra 1e6 the noise IC grows into convection; fields remain finite and sane."""
    s = BallConvectionSolver(lmax=15, nmax=16)
    out = BallOutputGrid(s, nphi=24, ntheta=12, nr=12)
    ke = []

    def cb(step, t, dt, sol, T, W, Z):
        if step % 25 == 0:
            ke.append(sol.kinetic_energy(W, Z))

    frames = s.simulate(
        11, record_interval=1.0, t_start_record=1.0, num_frames=6,
        out_grid=out, on_step=cb,
    )
    assert np.isfinite(frames).all()
    # Convective instability: kinetic energy grows by orders of magnitude from the
    # buoyancy-seeded start before/while saturating.
    ke = np.asarray(ke)
    assert ke.max() > 30 * ke[0], (ke[0], ke.max())
    # Temperature stays in a physical range (conductive profile is <= 1).
    assert frames.max() < 2.0 and frames.min() > -1.0
    # And the field departs from pure conduction.
    eq = (1.0 - out.r**2)[None, None, :]
    pert_energy = [float(np.mean((f - eq) ** 2)) for f in frames]
    assert pert_energy[-1] > pert_energy[0]


@pytest.mark.slow
def test_generate_ihc_trajectories_shape():
    from enf_pde_tpu.data.ihc import generate_ihc_trajectories

    s = BallConvectionSolver(lmax=9, nmax=10)
    trajs = generate_ihc_trajectories(np.arange(1), s, num_frames=3)
    # Output grid is the reference 48 x 24 x 24 regardless of solver resolution.
    assert trajs.shape == (1, 3, 48, 24, 24, 1)
    assert np.isfinite(trajs).all()
