"""Evaluation metrics: MSE, PSNR, IoU.

Parity with reference ``trainer_utils/metrics.py`` (which its trainers never import —
they inline MSE; kept here because downstream users may rely on them).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["mse", "psnr", "iou"]


def mse(a, b):
    """Mean squared error."""
    return jnp.mean(jnp.square(a - b))


def psnr(image, ground_truth, eps: float = 1e-8):
    """Peak signal-to-noise ratio in dB, peak taken from the ground truth.

    Accepts [batch, *spatial, channels]; reduces over everything but batch.
    """
    maxval = jnp.max(ground_truth)
    img = image / maxval
    gt = ground_truth / maxval
    axes = tuple(range(1, img.ndim))
    err = jnp.maximum(0.0, jnp.mean((img - gt) ** 2, axis=axes))
    return -10.0 * jnp.log10(err + eps)


def iou(occ1, occ2) -> np.ndarray:
    """Intersection-over-union of occupancy fields thresholded at 0."""
    occ1 = np.asarray(occ1).reshape(np.asarray(occ1).shape[0], -1) >= 0.0
    occ2 = np.asarray(occ2).reshape(np.asarray(occ2).shape[0], -1) >= 0.0
    union = (occ1 | occ2).sum(axis=-1).astype(np.float64)
    inter = (occ1 & occ2).sum(axis=-1).astype(np.float64)
    return inter / np.maximum(union, 1.0)
