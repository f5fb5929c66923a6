"""Numeric equivariance checks on a trained decoder.

The reference only eyeballs equivariance (decode from translated/rotated latents, log
images to wandb, ``_base_pde_trainer.py:731-757``). Here the same transformations are
verified *numerically*: transform latent poses and query coordinates together and
measure the decode discrepancy. Returns relative errors suitable for logging/asserts.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

__all__ = [
    "equivariance_errors",
    "equivariance_errors_2d",
    "equivariance_errors_sphere",
    "equivariance_errors_ball",
]


def _rel_err(a, b):
    return float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-12))


# ------------------------------------------------------------------ S^2 / B^3 helpers


def _angles_to_vec(ang):
    """(phi, theta) spherical angles [..., 2] -> unit vectors [..., 3]."""
    phi, theta = ang[..., 0], ang[..., 1]
    return jnp.stack(
        [jnp.sin(theta) * jnp.cos(phi), jnp.sin(theta) * jnp.sin(phi), jnp.cos(theta)],
        axis=-1,
    )


def _vec_to_angles(v):
    """Unit vectors [..., 3] -> (phi in [0, 2pi), theta in [0, pi]) [..., 2]."""
    phi = jnp.mod(jnp.arctan2(v[..., 1], v[..., 0]), 2 * np.pi)
    theta = jnp.arccos(jnp.clip(v[..., 2], -1.0, 1.0))
    return jnp.stack([phi, theta], axis=-1)


def _rotation_matrix(a: float = 0.7, b: float = 0.4, c: float = 0.2) -> jnp.ndarray:
    """A fixed generic SO(3) element Rz(a) @ Ry(b) @ Rz(c)."""

    def rz(t):
        return jnp.array(
            [[np.cos(t), -np.sin(t), 0.0], [np.sin(t), np.cos(t), 0.0], [0.0, 0.0, 1.0]]
        )

    ry = jnp.array(
        [[np.cos(b), 0.0, np.sin(b)], [0.0, 1.0, 0.0], [-np.sin(b), 0.0, np.cos(b)]]
    )
    return rz(a) @ ry @ rz(c)


def _euler_zyx_matrix(alpha, beta, gamma):
    """Rz(alpha) @ Ry(beta) @ Rx(gamma), rows on axis -2 (matches BallInvariant)."""
    ca, sa = jnp.cos(alpha), jnp.sin(alpha)
    cb, sb = jnp.cos(beta), jnp.sin(beta)
    cg, sg = jnp.cos(gamma), jnp.sin(gamma)
    return jnp.stack(
        [
            jnp.stack([ca * cb, ca * sb * sg - sa * cg, ca * sb * cg + sa * sg], axis=-1),
            jnp.stack([sa * cb, sa * sb * sg + ca * cg, sa * sb * cg - ca * sg], axis=-1),
            jnp.stack([-sb, cb * sg, cb * cg], axis=-1),
        ],
        axis=-2,
    )


def _matrix_to_euler_zyx(M):
    """Inverse of ``_euler_zyx_matrix`` (generic branch; gimbal lock unhandled)."""
    beta = jnp.arcsin(jnp.clip(-M[..., 2, 0], -1.0, 1.0))
    alpha = jnp.arctan2(M[..., 1, 0], M[..., 0, 0])
    gamma = jnp.arctan2(M[..., 2, 1], M[..., 2, 2])
    return alpha, beta, gamma


def equivariance_errors_2d(
    decoder_apply,
    nef_params,
    coords: jnp.ndarray,
    p: jnp.ndarray,
    a: jnp.ndarray,
    window: jnp.ndarray,
    has_orientation: bool,
    periodic: bool,
    translation=(0.31, -0.17),
    angle: float = np.pi / 6,
) -> Dict[str, float]:
    """Relative decode errors under joint (coords, poses) transformations.

    For an equivariant decoder, ``f(g x; g p, a) == f(x; p, a)`` — translations for
    translation-invariant geometries, rotations when poses carry orientation.

    Args:
        coords: [b, n, 2]; p: [b, z, pose_dim]; a / window: latents.
        has_orientation: p[..., 2:] holds an angle (SE(2) geometries).
        periodic: domain is the [-1, 1] torus (translations wrap).

    Returns:
        dict with 'translation' and (if oriented) 'rotation' relative errors.
    """
    base = decoder_apply(nef_params, coords, p, a, window)
    out: Dict[str, float] = {}

    t = jnp.asarray(translation)
    coords_t = coords + t
    p_t = p.at[..., :2].add(t)  # angular pose components (if any) are untouched
    if periodic:
        coords_t = (coords_t + 1) % 2 - 1
        p_t = p_t.at[..., :2].set((p_t[..., :2] + 1) % 2 - 1)
    shifted = decoder_apply(nef_params, coords_t, p_t, a, window)
    out["translation"] = _rel_err(base, shifted)

    if has_orientation:
        R = jnp.array([[np.cos(angle), -np.sin(angle)], [np.sin(angle), np.cos(angle)]])
        coords_r = coords @ R.T
        p_r = jnp.concatenate([p[..., :2] @ R.T, p[..., 2:] + angle], axis=-1)
        rotated = decoder_apply(nef_params, coords_r, p_r, a, window)
        out["rotation"] = _rel_err(base, rotated)
    return out


def equivariance_errors_sphere(
    decoder_apply,
    nef_params,
    coords: jnp.ndarray,
    p: jnp.ndarray,
    a: jnp.ndarray,
    window: jnp.ndarray,
    full_so3: bool,
    lon_shift: float = 0.83,
) -> Dict[str, float]:
    """Decode errors on S^2 under joint (coords, poses) rotations.

    Coordinates and poses are (phi, theta) spherical angles. For the SO(3)-invariant
    geometry (``polar_periodic``) a generic rotation is applied to both via unit
    vectors; the longitude-only geometry (``latitude_periodic``) gets a longitude
    shift (the only symmetry it claims). Numeric analogue of the reference's visual
    check (``_base_pde_trainer.py:731-757``) for the curved domains it never covered.
    """
    base = decoder_apply(nef_params, coords, p, a, window)
    out: Dict[str, float] = {}

    coords_l = coords.at[..., 0].add(lon_shift)
    p_l = p.at[..., 0].add(lon_shift)
    out["longitude"] = _rel_err(base, decoder_apply(nef_params, coords_l, p_l, a, window))

    if full_so3:
        Q = _rotation_matrix()
        coords_r = _vec_to_angles(_angles_to_vec(coords) @ Q.T)
        p_r = _vec_to_angles(_angles_to_vec(p[..., :2]) @ Q.T)
        out["rotation"] = _rel_err(base, decoder_apply(nef_params, coords_r, p_r, a, window))
    return out


def equivariance_errors_ball(
    decoder_apply,
    nef_params,
    coords: jnp.ndarray,
    p: jnp.ndarray,
    a: jnp.ndarray,
    window: jnp.ndarray,
    euler_poses: bool,
    lon_shift: float = 0.83,
) -> Dict[str, float]:
    """Decode errors on the solid ball B^3 under joint rotations.

    Coordinates are (phi, theta, r); poses are (alpha, beta, gamma, r) Euler angles
    (``euler_poses=True``, the ``ball`` invariant) or (phi, theta, <unused>, r)
    (``ball_lat``). For ``ball``, the pose rotation transforms as R -> R @ Q^T (the
    attention invariant ``R @ x_hat`` is then exactly preserved); the *window*,
    however, reuses (alpha, beta) as sphere angles (reference quirk, ``ball.py:36-52``)
    and is NOT equivariant under that recomposition — the logged rotation error
    therefore measures the reference architecture's own window quirk, not an
    implementation defect. For ``ball_lat``, the longitude shift is exact.
    """
    base = decoder_apply(nef_params, coords, p, a, window)
    out: Dict[str, float] = {}

    if euler_poses:
        Q = _rotation_matrix()
        dirs = _vec_to_angles(_angles_to_vec(coords[..., :2]) @ Q.T)
        coords_r = jnp.concatenate([dirs, coords[..., 2:3]], axis=-1)
        R = _euler_zyx_matrix(p[..., 0], p[..., 1], p[..., 2])
        alpha, beta, gamma = _matrix_to_euler_zyx(R @ Q.T)
        p_r = jnp.stack([alpha, beta, gamma, p[..., 3]], axis=-1)
        out["rotation"] = _rel_err(base, decoder_apply(nef_params, coords_r, p_r, a, window))
    else:
        coords_l = coords.at[..., 0].add(lon_shift)
        p_l = p.at[..., 0].add(lon_shift)
        out["longitude"] = _rel_err(
            base, decoder_apply(nef_params, coords_l, p_l, a, window)
        )
    return out


def equivariance_errors(
    decoder_apply,
    nef_params,
    coords: jnp.ndarray,
    p: jnp.ndarray,
    a: jnp.ndarray,
    window: jnp.ndarray,
    invariant,
    coordinate_system: str,
) -> Dict[str, float]:
    """Dispatch the numeric equivariance check on the trained geometry.

    ``invariant`` is the decoder's cross-attention invariant (its class decides which
    group actions the architecture claims); ``coordinate_system`` is the dataset's
    ('cartesian' | 'polar' | 'ball'). Returns {} for the non-equivariant ablation.
    """
    from enf_pde_tpu.geometry.invariants import (
        AbsolutePositionND,
        BallInvariant,
        RelativePositionPolarPeriodic,
    )

    if isinstance(invariant, AbsolutePositionND):
        return {}
    if coordinate_system == "cartesian":
        return equivariance_errors_2d(
            decoder_apply,
            nef_params,
            coords,
            p,
            a,
            window,
            has_orientation=invariant.num_z_ori_dims > 0,
            periodic=invariant.is_periodic,
        )
    if coordinate_system == "polar":
        return equivariance_errors_sphere(
            decoder_apply,
            nef_params,
            coords,
            p,
            a,
            window,
            full_so3=isinstance(invariant, RelativePositionPolarPeriodic),
        )
    if coordinate_system == "ball":
        return equivariance_errors_ball(
            decoder_apply,
            nef_params,
            coords,
            p,
            a,
            window,
            euler_poses=isinstance(invariant, BallInvariant),
        )
    raise ValueError(f"Unknown coordinate system: {coordinate_system!r}")
