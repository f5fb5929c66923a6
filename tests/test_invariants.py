"""Property tests for the geometry invariants: shapes, group invariance, windows."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enf_pde_tpu.geometry import (
    AbsolutePositionND,
    BallInvariant,
    BallLatInvariant,
    NormRelativePositionND,
    Ponita2D,
    PonitaPos2D,
    RelativeLatitudePeriodic,
    RelativePositionND,
    RelativePositionPeriodic,
    RelativePositionPolarPeriodic,
    get_ca_invariant,
    get_sa_invariant,
)

B, N, Z = 2, 7, 5


def rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape)


def angles(key, *shape):
    return jax.random.uniform(jax.random.PRNGKey(key), shape, minval=0.0, maxval=np.pi)


@pytest.mark.parametrize(
    "inv,xdim,pdim",
    [
        (RelativePositionND(2), 2, 2),
        (RelativePositionND(3), 3, 3),
        (NormRelativePositionND(2), 2, 2),
        (AbsolutePositionND(2), 2, 2),
        (RelativePositionPeriodic(2), 2, 2),
        (PonitaPos2D(), 2, 4),
        (Ponita2D(), 4, 4),
        (RelativePositionPolarPeriodic(), 2, 2),
        (RelativeLatitudePeriodic(), 2, 2),
        (BallInvariant(), 3, 4),
        (BallLatInvariant(), 3, 4),
    ],
)
def test_shapes(inv, xdim, pdim):
    x = rand(0, B, N, xdim)
    p = rand(1, B, Z, pdim)
    out = inv(x, p)
    assert out.shape == (B, N, Z, inv.dim)
    assert jnp.all(jnp.isfinite(out))


def test_invariants_are_hashable_and_jit_static():
    inv = RelativePositionPeriodic(2)

    @jax.jit
    def f(x, p):
        return inv(x, p)

    x, p = rand(0, B, N, 2), rand(1, B, Z, 2)
    np.testing.assert_allclose(f(x, p), inv(x, p), rtol=1e-6)
    assert hash(RelativePositionPeriodic(2)) == hash(inv)


def test_rel_pos_translation_invariance():
    inv = RelativePositionND(2)
    x, p = rand(0, B, N, 2), rand(1, B, Z, 2)
    t = rand(2, B, 1, 2)
    np.testing.assert_allclose(inv(x + t, p + t), inv(x, p), atol=1e-6)


def test_norm_rel_pos_rotation_invariance():
    inv = NormRelativePositionND(2)
    x, p = rand(0, B, N, 2), rand(1, B, Z, 2)
    th = 0.7
    R = jnp.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    np.testing.assert_allclose(inv(x @ R.T, p @ R.T), inv(x, p), atol=1e-5)


def test_periodic_invariance_under_wraparound():
    inv = RelativePositionPeriodic(2)
    x, p = rand(0, B, N, 2), rand(1, B, Z, 2)
    np.testing.assert_allclose(inv(x + 2.0, p), inv(x, p), atol=1e-4)
    t = rand(2, B, 1, 2)
    np.testing.assert_allclose(inv(x + t, p + t), inv(x, p), atol=1e-5)


def test_ponita_se2_invariance():
    """Joint rotation+translation of poses and queries leaves invariants unchanged."""
    inv = PonitaPos2D()
    x = rand(0, B, N, 2)
    p_pos, p_theta = rand(1, B, Z, 2), rand(2, B, Z, 1)
    p = jnp.concatenate([p_pos, jnp.cos(p_theta), jnp.sin(p_theta)], axis=-1)

    th = 0.9
    R = jnp.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    t = rand(3, B, 1, 2)
    x_g = x @ R.T + t
    p_theta_g = p_theta + th
    p_g = jnp.concatenate([p_pos @ R.T + t, jnp.cos(p_theta_g), jnp.sin(p_theta_g)], axis=-1)
    np.testing.assert_allclose(inv(x_g, p_g), inv(x, p), atol=1e-5)


def test_polar_periodic_so3_invariance():
    """Great-circle cosine is invariant to a shared longitude rotation."""
    inv = RelativePositionPolarPeriodic()
    x = jnp.stack([angles(0, B, N) * 2, angles(1, B, N)], axis=-1)
    p = jnp.stack([angles(2, B, Z) * 2, angles(3, B, Z)], axis=-1)
    dphi = 1.23
    x_g = x.at[..., 0].add(dphi)
    p_g = p.at[..., 0].add(dphi)
    np.testing.assert_allclose(inv(x_g, p_g), inv(x, p), atol=1e-5)


def test_latitude_periodic_longitude_invariance():
    inv = RelativeLatitudePeriodic()
    x = jnp.stack([angles(0, B, N) * 2, angles(1, B, N)], axis=-1)
    p = jnp.stack([angles(2, B, Z) * 2, angles(3, B, Z)], axis=-1)
    dphi = 0.77
    np.testing.assert_allclose(
        inv(x.at[..., 0].add(dphi), p.at[..., 0].add(dphi)), inv(x, p), atol=1e-5
    )


def _euler_zyx(Rm):
    """Recover (alpha, beta, gamma) from a Z-Y-X rotation matrix."""
    alpha = np.arctan2(Rm[..., 1, 0], Rm[..., 0, 0])
    beta = -np.arcsin(np.clip(Rm[..., 2, 0], -1, 1))
    gamma = np.arctan2(Rm[..., 2, 1], Rm[..., 2, 2])
    return alpha, beta, gamma


def _rot_zyx(alpha, beta, gamma):
    ca, sa, cb, sb, cg, sg = (
        np.cos(alpha), np.sin(alpha), np.cos(beta), np.sin(beta), np.cos(gamma), np.sin(gamma)
    )
    return np.stack(
        [
            np.stack([ca * cb, ca * sb * sg - sa * cg, ca * sb * cg + sa * sg], axis=-1),
            np.stack([sa * cb, sa * sb * sg + ca * cg, sa * sb * cg - ca * sg], axis=-1),
            np.stack([-sb + 0 * ca, cb * sg, cb * cg], axis=-1),
        ],
        axis=-2,
    )


def test_ball_invariant_so3_bi_invariance():
    """inv(g x, R g^-1) == inv(x, R): the latent pose acts from the right.

    The reference's ball invariant rotates the query into the latent frame as
    ``R(p) @ x`` (ball.py:89), so a global rotation g is absorbed by the pose update
    ``R -> R g^{-1}``.
    """
    inv = BallInvariant()
    x = jnp.stack([angles(0, B, N) * 2, angles(1, B, N), angles(2, B, N) / np.pi], axis=-1)
    eul = np.array(angles(3, B, Z, 3)) * 0.9  # keep beta away from gimbal lock
    p = jnp.concatenate([jnp.asarray(eul), jnp.full((B, Z, 1), 0.75)], axis=-1)

    dphi = 0.5
    g = _rot_zyx(np.array(dphi), np.array(0.0), np.array(0.0))  # rotation about z
    # Transform queries: unit vector u(x') = g @ u(x); longitude shift by dphi.
    x_g = x.at[..., 0].add(dphi)
    # Transform poses: R' = R @ g^{-1}, re-extract Euler angles.
    R = _rot_zyx(eul[..., 0], eul[..., 1], eul[..., 2])
    Rp = R @ g.T
    a2, b2, g2 = _euler_zyx(Rp)
    p_g = jnp.concatenate(
        [jnp.asarray(np.stack([a2, b2, g2], axis=-1)), jnp.full((B, Z, 1), 0.75)], axis=-1
    )
    np.testing.assert_allclose(inv(x_g, p_g), inv(x, p), atol=1e-4)


def test_window_nonperiodic_is_log_domain():
    inv = RelativePositionND(2)
    x, p = rand(0, B, N, 2), rand(1, B, Z, 2)
    sigma = jnp.ones((B, Z, 1))
    w = inv.gaussian_window(x, p, sigma)
    assert w.shape == (B, N, Z, 1)
    assert jnp.all(w <= 0)  # -(d^2 / sigma^2)
    d2 = jnp.sum((p[:, None] - x[:, :, None]) ** 2, axis=-1, keepdims=True)
    np.testing.assert_allclose(w, -d2, atol=1e-6)


def test_window_periodic_sign_and_shape():
    inv = RelativePositionPeriodic(2)
    x, p = rand(0, B, N, 2), rand(1, B, Z, 2)
    sigma = 2.0 * jnp.ones((B, Z, 1))
    w = inv.gaussian_window(x, p, sigma)
    assert w.shape == (B, N, Z, 1)
    assert jnp.all(w >= 0)  # +(1/sigma^2) * sum cos^2 >= 0 (reference quirk)
    assert jnp.all(w <= 2.0 / sigma[0, 0, 0] ** 2 + 1e-6)


def test_window_sphere_probability_domain():
    inv = RelativePositionPolarPeriodic()
    x = jnp.stack([angles(0, B, N) * 2, angles(1, B, N)], axis=-1)
    p = jnp.stack([angles(2, B, Z) * 2, angles(3, B, Z)], axis=-1)
    sigma = jnp.full((B, Z, 1), 1.5)
    w = inv.gaussian_window(x, p, sigma)
    assert w.shape == (B, N, Z, 1)
    assert jnp.all(w > 0) and jnp.all(w <= 1.0)
    # Window peaks where x == p.
    p_same = x[:, :Z, :]
    w_same = inv.gaussian_window(p_same, p_same, sigma)
    assert jnp.all(jnp.diagonal(w_same[..., 0], axis1=1, axis2=2) > 0.99)


class _NefCfg(dict):
    __getattr__ = dict.__getitem__


@pytest.mark.parametrize(
    "name,sa_type,ca_type",
    [
        ("rel_pos_periodic", RelativePositionPeriodic, RelativePositionPeriodic),
        ("ponita", Ponita2D, PonitaPos2D),
        ("polar_periodic", RelativePositionPolarPeriodic, RelativePositionPolarPeriodic),
        ("latitude_periodic", RelativeLatitudePeriodic, RelativeLatitudePeriodic),
        ("ball", BallInvariant, BallInvariant),
        ("ball_lat", BallLatInvariant, BallLatInvariant),
        ("abs_pos", AbsolutePositionND, AbsolutePositionND),
        ("rel_pos", RelativePositionND, RelativePositionND),
        ("norm_rel_pos", NormRelativePositionND, NormRelativePositionND),
    ],
)
def test_factories(name, sa_type, ca_type):
    cfg = _NefCfg(invariant_type=name, num_in=2)
    assert isinstance(get_sa_invariant(cfg), sa_type)
    assert isinstance(get_ca_invariant(cfg), ca_type)
