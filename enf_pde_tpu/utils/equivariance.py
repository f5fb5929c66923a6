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

__all__ = ["equivariance_errors_2d"]


def _rel_err(a, b):
    return float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-12))


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
