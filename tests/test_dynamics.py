"""Latent ODE model and solver tests: shapes, equivariance, convergence, BPTT."""

import jax
import jax.numpy as jnp
import numpy as np

from enf_pde_tpu.dynamics import (
    MLPLatentODE,
    PonitaLatentODE,
    rk4_step,
    solve_latent_ode,
    solve_ode,
)
from enf_pde_tpu.geometry import Ponita2D, RelativePositionPeriodic

B, Z, LAT = 2, 4, 8


def _latents(key=0, pose_dim=2):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    p = jax.random.normal(ks[0], (B, Z, pose_dim))
    a = 1 + 0.1 * jax.random.normal(ks[1], (B, Z, LAT))
    w = jnp.ones((B, Z, 1))
    return p, a, w


def _ponita(invariant):
    return PonitaLatentODE(
        num_hidden=16,
        num_layers=2,
        scalar_num_out=LAT,
        vec_num_out=1,
        invariant=invariant,
        basis_dim=8,
        degree=2,
        widening_factor=2,
    )


def test_ponita_ode_shapes_plain():
    ode = _ponita(RelativePositionPeriodic(2))
    lat = _latents()
    params = ode.init(jax.random.PRNGKey(1), lat)
    dp, da, dw = ode.apply(params, lat)
    assert dp.shape == (B, Z, 2)
    assert da.shape == (B, Z, LAT)
    assert dw.shape == (B, Z, 1)
    np.testing.assert_allclose(dw, 0.0)


def test_ponita_ode_shapes_oriented():
    ode = _ponita(Ponita2D())
    lat = _latents(pose_dim=3)  # (x, y, theta)
    params = ode.init(jax.random.PRNGKey(1), lat)
    dp, da, _ = ode.apply(params, lat)
    assert dp.shape == (B, Z, 3)  # (dx, dy, dtheta)
    assert da.shape == (B, Z, LAT)


def test_ponita_ode_se2_equivariance():
    """Rotating the latent poses rotates the position derivative and preserves da."""
    ode = _ponita(Ponita2D())
    p, a, w = _latents(pose_dim=3)
    params = ode.init(jax.random.PRNGKey(1), (p, a, w))
    dp, da, _ = ode.apply(params, (p, a, w))

    th = np.pi / 4
    R = jnp.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    p_rot = jnp.concatenate([p[..., :2] @ R.T, p[..., 2:] + th], axis=-1)
    dp_rot, da_rot, _ = ode.apply(params, (p_rot, a, w))

    np.testing.assert_allclose(np.asarray(da_rot), np.asarray(da), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dp_rot[..., :2]), np.asarray(dp[..., :2] @ R.T), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dp_rot[..., 2]), np.asarray(dp[..., 2]), atol=1e-5)


def test_ponita_local_kernel():
    ode = PonitaLatentODE(
        num_hidden=16,
        num_layers=1,
        scalar_num_out=LAT,
        vec_num_out=1,
        invariant=RelativePositionPeriodic(2),
        basis_dim=8,
        degree=2,
        widening_factor=2,
        kernel_size=0.2,
    )
    lat = _latents()
    params = ode.init(jax.random.PRNGKey(1), lat)
    dp, da, _ = ode.apply(params, lat)
    assert jnp.all(jnp.isfinite(dp)) and jnp.all(jnp.isfinite(da))


def test_mlp_ode_shapes():
    ode = MLPLatentODE(num_hidden=16, num_layers=3, scalar_num_out=LAT, vec_num_out=1)
    lat = _latents()
    params = ode.init(jax.random.PRNGKey(1), lat)
    dp, da, dw = ode.apply(params, lat)
    assert dp.shape == (B, Z, 2) and da.shape == (B, Z, LAT)


def test_solver_harmonic_oscillator_accuracy():
    """RK4 on x'' = -x conserves energy to 1e-5; Euler drifts but follows."""

    def f(x, t):
        return jnp.stack([x[1], -x[0]])

    x0 = jnp.array([1.0, 0.0])
    traj = solve_ode(f, x0, 0.0, 2 * np.pi, 0.01, method="rk4")
    t_final = (traj.shape[0] - 1) * 0.01
    analytic = np.array([np.cos(t_final), -np.sin(t_final)])
    np.testing.assert_allclose(np.asarray(traj[-1]), analytic, atol=1e-5)
    energy = traj[:, 0] ** 2 + traj[:, 1] ** 2
    np.testing.assert_allclose(np.asarray(energy), 1.0, atol=1e-5)


def test_solve_latent_ode_shapes_and_time_axis():
    def f(latents, t):
        p, a, w = latents
        return -p, 0.5 * a, jnp.zeros_like(w)

    p, a, w = _latents()
    ps, as_, ws = solve_latent_ode(f, (p, a, w), t0=0, tf=5, h=1.0, method="euler")
    assert ps.shape == (B, 6, Z, 2)
    assert as_.shape == (B, 6, Z, LAT)
    assert ws.shape == (B, 6, Z, 1)
    np.testing.assert_allclose(np.asarray(ps[:, 0]), np.asarray(p))
    # Euler with h=1 on p' = -p collapses to zero after one step.
    np.testing.assert_allclose(np.asarray(ps[:, 1]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ws[:, -1]), np.asarray(w))  # window static


def test_solve_latent_ode_matches_unrolled_reference():
    """The scan rollout equals a step-by-step Python unroll (reference semantics)."""

    def f(latents, t):
        p, a, w = latents
        return jnp.sin(a[..., :2]) * 0.1, -0.2 * a + p.sum(-1, keepdims=True), jnp.zeros_like(w)

    lat = _latents()
    ps, as_, ws = solve_latent_ode(f, lat, t0=0, tf=4, h=1.0, method="rk4")

    cur = lat
    expected = [lat]
    for i in range(4):
        cur = rk4_step(f, cur, float(i), 1.0)
        expected.append(cur)
    for t in range(5):
        np.testing.assert_allclose(np.asarray(ps[:, t]), np.asarray(expected[t][0]), rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(as_[:, t]), np.asarray(expected[t][1]), rtol=2e-5, atol=1e-6)


def test_solve_latent_ode_unroll_parity():
    """`node.ode_unroll` is a pure scheduling knob: unrolled scan matches unroll=1,
    including when the unroll factor does not divide the step count."""

    def f(latents, t):
        p, a, w = latents
        return jnp.sin(a[..., :2]) * 0.1, -0.2 * a + p.sum(-1, keepdims=True), jnp.zeros_like(w)

    lat = _latents()
    base = solve_latent_ode(f, lat, t0=0, tf=5, h=1.0, method="rk4")
    for u in (2, 4):
        got = solve_latent_ode(f, lat, t0=0, tf=5, h=1.0, method="rk4", unroll=u)
        for b, g in zip(base, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_solve_latent_ode_grad_flow_and_stopgrad():
    def f(latents, t):
        p, a, w = latents
        return 0.1 * a[..., :2], 0.1 * a, jnp.zeros_like(w)

    lat = _latents()

    def loss(a0, stop):
        ps, as_, ws = solve_latent_ode(
            f, (lat[0], a0, lat[2]), 0, 3, 1.0, method="euler", stop_gradient=stop
        )
        return jnp.mean(as_[:, -1] ** 2)

    g_full = jax.grad(lambda a0: loss(a0, False))(lat[1])
    g_stop = jax.grad(lambda a0: loss(a0, True))(lat[1])
    assert float(jnp.abs(g_full).sum()) > 0
    # stop_gradient cuts BPTT: gradient to the initial condition is zero.
    np.testing.assert_allclose(np.asarray(g_stop), 0.0, atol=1e-7)


def test_latent_rollout_with_ponita_jits():
    ode = _ponita(RelativePositionPeriodic(2))
    lat = _latents()
    params = ode.init(jax.random.PRNGKey(1), lat)

    @jax.jit
    def rollout(params, lat):
        return solve_latent_ode(
            lambda z, t: ode.apply(params, z), lat, 0, 9, 1.0, method="euler"
        )

    ps, as_, ws = rollout(params, lat)
    assert ps.shape == (B, 10, Z, 2)
    assert jnp.all(jnp.isfinite(ps)) and jnp.all(jnp.isfinite(as_))


def test_local_kernel_gradients_finite_at_self_pairs():
    """Local (exp-windowed) PONITA kernels must have finite pose gradients.

    The pairwise-distance diagonal is exactly zero; a plain ``jnp.linalg.norm``
    there has NaN gradients, which poisoned every ODE-phase update of the
    Cahn-Hilliard config (the reference carries the same bug,
    ``ponita_ode_g.py:151`` with its shipped ``kernel_size: .2``).
    """
    ode = PonitaLatentODE(
        num_hidden=16, num_layers=2, scalar_num_out=LAT, vec_num_out=1,
        invariant=RelativePositionPeriodic(2), basis_dim=8, degree=2,
        widening_factor=2, kernel_size=0.2,
    )
    p, a, w = _latents()
    params = ode.init(jax.random.PRNGKey(0), (p, a, w))

    def loss(p):
        dp, da, dw = ode.apply(params, (p, a, w))
        return jnp.sum(dp**2) + jnp.sum(da**2)

    g = jax.grad(loss)(p)
    assert bool(jnp.all(jnp.isfinite(g)))
