"""Bi-invariant geometry functions between query coordinates and latent point poses.

Each invariant maps ``(x[b, n, x_dim], p[b, z, p_dim]) -> inv[b, n, z, dim]`` and also
provides the Gaussian-window attention bias for its geometry. Invariants are frozen
dataclasses holding only static metadata, so they are hashable and can be closed over /
passed as static arguments under ``jax.jit``.

Semantics follow the reference ``enf/steerable_attention/invariant/`` exactly,
including its window quirks, which are part of the trained-model contract:

- planar/toroidal windows are *log-domain* biases (``-(1/sigma^2) * d^2`` resp.
  ``+(1/sigma^2) * sum cos^2(pi*(p-x))``, reference ``_base_invariant.py:25-43``),
- spherical/ball windows are *probability-domain* ``exp(-d^2 / (2 sigma^2))``
  (reference ``polar_periodic.py:35-38``, ``ball.py:36-52``);
  both flavours are **added** to the attention logits.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

__all__ = [
    "BaseInvariant",
    "RelativePositionND",
    "NormRelativePositionND",
    "AbsolutePositionND",
    "RelativePositionPeriodic",
    "PonitaPos2D",
    "Ponita2D",
    "RelativePositionPolarPeriodic",
    "RelativeLatitudePeriodic",
    "BallInvariant",
    "BallLatInvariant",
    "get_sa_invariant",
    "get_ca_invariant",
    "INVARIANT_REGISTRY",
]


def _sq_dist(x_pos, p_pos):
    """Squared euclidean distance, broadcast to [b, n, z, 1]."""
    return jnp.sum((p_pos[:, None, :, :] - x_pos[:, :, None, :]) ** 2, axis=-1, keepdims=True)


def _sphere_unit_vec(phi, theta):
    """(phi, theta) spherical angles -> unit vectors on S^2, stacked on the last axis."""
    return jnp.stack(
        [jnp.sin(theta) * jnp.cos(phi), jnp.sin(theta) * jnp.sin(phi), jnp.cos(theta)],
        axis=-1,
    )


def _great_circle_cos(x_ang, p_ang):
    """Cosine of the great-circle angle between angular coords [b,n,2] and [b,z,2].

    Coordinate convention: ``[..., 0] = phi`` (longitude), ``[..., 1] = theta``
    (colatitude), matching reference ``polar_periodic.py:51-64``. Returns [b,n,z,1].
    """
    xv = _sphere_unit_vec(x_ang[:, :, 0], x_ang[:, :, 1])
    pv = _sphere_unit_vec(p_ang[:, :, 0], p_ang[:, :, 1])
    cos = jnp.einsum("bnd,bmd->bnm", xv, pv)
    norm = jnp.linalg.norm(xv, axis=-1)[:, :, None] * jnp.linalg.norm(pv, axis=-1)[:, None, :]
    return (cos / norm)[:, :, :, None]


def _sphere_window(cos_ang, sigma):
    """exp(-d^2 / 2 sigma^2) with d the clipped great-circle distance. sigma: [b,z,1]."""
    dist = jnp.arccos(jnp.clip(cos_ang, -1 + 1e-6, 1 - 1e-6))
    return jnp.exp(-(dist**2) / (2 * sigma[:, None, :, :] ** 2))


@dataclasses.dataclass(frozen=True)
class BaseInvariant:
    """Static metadata + window dispatch shared by all invariants.

    Attributes:
        dim: dimensionality of the produced invariant feature.
        num_x_pos_dims / num_x_ori_dims: positional / orientation dims of queries.
        num_z_pos_dims / num_z_ori_dims: positional / orientation dims of latent poses.
        is_periodic: whether the underlying domain is periodic.
    """

    dim: int = 0
    num_x_pos_dims: int = 0
    num_x_ori_dims: int = 0
    num_z_pos_dims: int = 0
    num_z_ori_dims: int = 0
    is_periodic: bool = False

    def __call__(self, x, p):
        raise NotImplementedError

    def gaussian_window(self, x, p, sigma):
        """Additive attention-logit bias. Default: non-periodic log-domain window."""
        p_pos = p[:, :, : self.num_z_pos_dims]
        x_pos = x[:, :, : self.num_x_pos_dims]
        return -(1.0 / sigma[:, None, :] ** 2) * _sq_dist(x_pos, p_pos)


@dataclasses.dataclass(frozen=True)
class RelativePositionND(BaseInvariant):
    """Translation-group invariant on R^n: x - p. Reference ``rel_pos.py``."""

    def __init__(self, num_dims: int):
        super().__init__(
            dim=num_dims,
            num_x_pos_dims=num_dims,
            num_x_ori_dims=0,
            num_z_pos_dims=num_dims,
            num_z_ori_dims=0,
        )

    def __call__(self, x, p):
        return x[:, :, None, : self.num_x_pos_dims] - p[:, None, :, : self.num_z_pos_dims]


@dataclasses.dataclass(frozen=True)
class NormRelativePositionND(BaseInvariant):
    """E(n)-invariant distance ||p - x||. Reference ``norm_rel_pos.py``."""

    def __init__(self, num_dims: int):
        super().__init__(
            dim=1,
            num_x_pos_dims=num_dims,
            num_x_ori_dims=0,
            num_z_pos_dims=num_dims,
            num_z_ori_dims=0,
        )

    def __call__(self, x, p):
        return jnp.linalg.norm(p[:, None, :, :] - x[:, :, None, :], ord=2, axis=-1, keepdims=True)


@dataclasses.dataclass(frozen=True)
class AbsolutePositionND(BaseInvariant):
    """Non-equivariant ablation: broadcast absolute x. Reference ``abs_pos.py``."""

    def __init__(self, num_dims: int):
        super().__init__(
            dim=num_dims,
            num_x_pos_dims=num_dims,
            num_x_ori_dims=0,
            num_z_pos_dims=num_dims,
            num_z_ori_dims=0,
        )

    def __call__(self, x, p):
        b, n, d = x.shape
        return jnp.broadcast_to(x[:, :, None, :], (b, n, p.shape[1], d))


@dataclasses.dataclass(frozen=True)
class RelativePositionPeriodic(BaseInvariant):
    """Translation invariant on the torus T^n over [-1, 1]^n: [cos(pi*d), sin(pi*d)].

    Reference ``rel_pos_periodic.py`` (invariant) and ``_base_invariant.py:35-43``
    (periodic window: ``+(1/sigma^2) * sum cos^2(pi*(p - x))``).
    """

    def __init__(self, num_dims: int):
        super().__init__(
            dim=2 * num_dims,
            num_x_pos_dims=num_dims,
            num_x_ori_dims=0,
            num_z_pos_dims=num_dims,
            num_z_ori_dims=0,
            is_periodic=True,
        )

    def __call__(self, x, p):
        rel = p[:, None, :, :] - x[:, :, None, :]
        return jnp.concatenate([jnp.cos(jnp.pi * rel), jnp.sin(jnp.pi * rel)], axis=-1)

    def gaussian_window(self, x, p, sigma):
        p_pos = p[:, :, : self.num_z_pos_dims]
        x_pos = x[:, :, : self.num_x_pos_dims]
        rel = p_pos[:, None, :, :] - x_pos[:, :, None, :]
        neg_cos_sq = -jnp.sum(jnp.cos(jnp.pi * rel) ** 2, axis=-1, keepdims=True)
        return -(1.0 / sigma[:, None, :] ** 2) * neg_cos_sq


@dataclasses.dataclass(frozen=True)
class PonitaPos2D(BaseInvariant):
    """SE(2) position-only invariant: relative position rotated into the latent frame.

    Latent pose is (x, y, cos t, sin t); queries are positions only.
    Reference ``ponita.py:6-44``. Used for cross attention (queries have no
    orientation).
    """

    def __init__(self):
        super().__init__(
            dim=2, num_x_pos_dims=2, num_x_ori_dims=0, num_z_pos_dims=2, num_z_ori_dims=1
        )

    def __call__(self, x, p):
        x_pos = x[:, :, None, :]
        p_pos, p_ori = p[:, None, :, :2], p[:, None, :, 2:]
        rel = x_pos - p_pos
        inv1 = rel[..., 0] * p_ori[..., 0] + rel[..., 1] * p_ori[..., 1]
        inv2 = -rel[..., 0] * p_ori[..., 1] + rel[..., 1] * p_ori[..., 0]
        return jnp.stack([inv1, inv2], axis=-1)


@dataclasses.dataclass(frozen=True)
class Ponita2D(BaseInvariant):
    """Full SE(2) bi-invariant when both sides carry orientation (PONITA, Bekkers et al.).

    Reference ``ponita.py:47-86``. Used for latent-latent self attention and the
    PONITA latent ODE kernel.
    """

    def __init__(self):
        super().__init__(
            dim=3, num_x_pos_dims=2, num_x_ori_dims=1, num_z_pos_dims=2, num_z_ori_dims=1
        )

    def __call__(self, x, p):
        x_pos, x_ori = x[:, :, None, :2], x[:, :, None, 2:]
        p_pos, p_ori = p[:, None, :, :2], p[:, None, :, 2:]
        rel = x_pos - p_pos
        inv1 = rel[..., 0] * p_ori[..., 0] + rel[..., 1] * p_ori[..., 1]
        inv2 = -rel[..., 0] * p_ori[..., 1] + rel[..., 1] * p_ori[..., 0]
        inv3 = (x_ori * p_ori).sum(axis=-1)
        return jnp.stack([inv1, inv2, inv3], axis=-1)


@dataclasses.dataclass(frozen=True)
class RelativePositionPolarPeriodic(BaseInvariant):
    """SO(3)-invariant scalar on S^2: cosine of the great-circle angle.

    Coordinates are (phi, theta) spherical angles. Reference ``polar_periodic.py``.
    """

    def __init__(self):
        super().__init__(
            dim=1,
            num_x_pos_dims=2,
            num_x_ori_dims=0,
            num_z_pos_dims=2,
            num_z_ori_dims=0,
            is_periodic=True,
        )

    def __call__(self, x, p):
        return _great_circle_cos(x[:, :, :2], p[:, :, :2])

    def gaussian_window(self, x, p, sigma):
        return _sphere_window(self(x, p), sigma)


@dataclasses.dataclass(frozen=True)
class RelativeLatitudePeriodic(BaseInvariant):
    """Longitude-rotation-only invariant on S^2 (for dynamics that break full SO(3)).

    Emits ``[theta_x, theta_p, cos(dphi), sin(dphi)]``. Reference
    ``spherical_longitude.py``.
    """

    def __init__(self):
        super().__init__(
            dim=4,
            num_x_pos_dims=2,
            num_x_ori_dims=0,
            num_z_pos_dims=2,
            num_z_ori_dims=0,
            is_periodic=True,
        )

    def __call__(self, x, p):
        b, n = x.shape[0], x.shape[1]
        z = p.shape[1]
        phi_x = jnp.broadcast_to(x[:, :, None, 0], (b, n, z))[..., None]
        th_x = jnp.broadcast_to(x[:, :, None, 1], (b, n, z))[..., None]
        phi_p = jnp.broadcast_to(p[:, None, :, 0], (b, n, z))[..., None]
        th_p = jnp.broadcast_to(p[:, None, :, 1], (b, n, z))[..., None]
        return jnp.concatenate(
            [th_x, th_p, jnp.cos(phi_x - phi_p), jnp.sin(phi_x - phi_p)], axis=-1
        )

    def gaussian_window(self, x, p, sigma):
        return _sphere_window(_great_circle_cos(x[:, :, :2], p[:, :, :2]), sigma)


@dataclasses.dataclass(frozen=True)
class BallInvariant(BaseInvariant):
    """SO(3) bi-invariant on the solid ball B^3.

    Queries are spherical coords (phi, theta, r); latent poses are Euler angles plus a
    radius (alpha, beta, gamma, r). The query direction is rotated into the latent
    frame and both radii are appended. Reference ``ball.py``, including its window,
    which reuses the first two pose components as angles.
    """

    def __init__(self):
        super().__init__(
            dim=5, num_x_pos_dims=3, num_x_ori_dims=0, num_z_pos_dims=4, num_z_ori_dims=0
        )

    def __call__(self, x, p):
        phi_x, theta_x, r_x = x[:, :, 0], x[:, :, 1], x[:, :, 2]
        xv = _sphere_unit_vec(phi_x, theta_x)

        alpha, beta, gamma, r_p = p[:, :, 0], p[:, :, 1], p[:, :, 2], p[:, :, 3]
        ca, sa = jnp.cos(alpha), jnp.sin(alpha)
        cb, sb = jnp.cos(beta), jnp.sin(beta)
        cg, sg = jnp.cos(gamma), jnp.sin(gamma)
        # Z-Y-X Euler rotation matrix, rows stacked on axis -2 (reference ball.py:80-86).
        rot = jnp.stack(
            [
                jnp.stack([ca * cb, ca * sb * sg - sa * cg, ca * sb * cg + sa * sg], axis=-1),
                jnp.stack([sa * cb, sa * sb * sg + ca * cg, sa * sb * cg - ca * sg], axis=-1),
                jnp.stack([-sb, cb * sg, cb * cg], axis=-1),
            ],
            axis=-2,
        )
        rotated = jnp.einsum("bnij,bcj->bcni", rot, xv)
        r_x_b = jnp.broadcast_to(r_x[:, :, None, None], (*r_x.shape, r_p.shape[1], 1))
        r_p_b = jnp.broadcast_to(r_p[:, None, :, None], r_x_b.shape)
        return jnp.concatenate([rotated, r_x_b, r_p_b], axis=-1)

    def gaussian_window(self, x, p, sigma):
        # Reference quirk (ball.py:36-52): the window interprets the first two pose
        # components (alpha, beta Euler angles) as (phi, theta) sphere angles.
        return _sphere_window(_great_circle_cos(x[:, :, :2], p[:, :, :2]), sigma)


@dataclasses.dataclass(frozen=True)
class BallLatInvariant(BaseInvariant):
    """Longitude-invariant ball variant: [theta_x, theta_p, cos dphi, sin dphi, r_x, r_p].

    Reference ``ball_lat.py``.
    """

    def __init__(self):
        super().__init__(
            dim=6, num_x_pos_dims=3, num_x_ori_dims=0, num_z_pos_dims=4, num_z_ori_dims=0
        )

    def __call__(self, x, p):
        b, n = x.shape[0], x.shape[1]
        z = p.shape[1]
        phi_x = jnp.broadcast_to(x[:, :, None, 0], (b, n, z))[..., None]
        th_x = jnp.broadcast_to(x[:, :, None, 1], (b, n, z))[..., None]
        phi_p = jnp.broadcast_to(p[:, None, :, 0], (b, n, z))[..., None]
        th_p = jnp.broadcast_to(p[:, None, :, 1], (b, n, z))[..., None]
        r_x = x[:, :, 2][:, :, None, None]
        r_p = p[:, :, 3][:, None, :, None]
        r_x = jnp.broadcast_to(r_x, (b, n, z, 1))
        r_p = jnp.broadcast_to(r_p, (b, n, z, 1))
        return jnp.concatenate(
            [th_x, th_p, jnp.cos(phi_x - phi_p), jnp.sin(phi_x - phi_p), r_x, r_p], axis=-1
        )

    def gaussian_window(self, x, p, sigma):
        return _sphere_window(_great_circle_cos(x[:, :, :2], p[:, :, :2]), sigma)


def _build(name: str, num_dims: int, for_cross_attention: bool) -> BaseInvariant:
    if name == "norm_rel_pos":
        return NormRelativePositionND(num_dims)
    if name == "rel_pos":
        return RelativePositionND(num_dims)
    if name == "rel_pos_periodic":
        if num_dims != 2:
            raise ValueError("rel_pos_periodic currently supports 2D input only.")
        return RelativePositionPeriodic(num_dims)
    if name == "ponita":
        if num_dims != 2:
            raise ValueError("ponita currently supports 2D input only.")
        # Queries in cross attention carry no orientation -> position-only invariant
        # (reference invariant/__init__.py:32 vs :66).
        return PonitaPos2D() if for_cross_attention else Ponita2D()
    if name == "abs_pos":
        return AbsolutePositionND(num_dims)
    if name == "polar_periodic":
        return RelativePositionPolarPeriodic()
    if name == "latitude_periodic":
        return RelativeLatitudePeriodic()
    if name == "ball":
        return BallInvariant()
    if name == "ball_lat":
        return BallLatInvariant()
    raise ValueError(f"Unknown invariant type: {name!r}")


INVARIANT_REGISTRY = (
    "norm_rel_pos",
    "rel_pos",
    "rel_pos_periodic",
    "ponita",
    "abs_pos",
    "polar_periodic",
    "latitude_periodic",
    "ball",
    "ball_lat",
)


def get_sa_invariant(nef_cfg) -> BaseInvariant:
    """Invariant used for latent-latent self attention (and the PONITA ODE kernel)."""
    return _build(nef_cfg.invariant_type, int(nef_cfg.num_in), for_cross_attention=False)


def get_ca_invariant(nef_cfg) -> BaseInvariant:
    """Invariant used for coordinate->latent cross attention."""
    return _build(nef_cfg.invariant_type, int(nef_cfg.num_in), for_cross_attention=True)
