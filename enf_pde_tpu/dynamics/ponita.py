"""PONITA-style equivariant latent vector field (the dynamics model of all experiments).

A dense point-cloud convolution over the latent set: a polynomial-MLP kernel basis over
pairwise invariants ``inv(p, p)`` drives separable group convolutions; scalars read out
context derivatives, and vectors read out pose derivatives as invariant-gated sums of
relative positions (and orientations when the poses carry one).

Parity with reference ``experiments/fitting/ode_models/ponita_ode_g.py`` (``PonitaGen``
/ ``PonitaODEGen``), including the ``a - 1`` centering (contexts are initialized at
ones) and the zero window derivative.
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from enf_pde_tpu.geometry.invariants import BaseInvariant
from enf_pde_tpu.ops.embeddings import polynomial_features

__all__ = ["PonitaGen", "PonitaLatentODE"]


def _chang_xavier_uniform(key, shape, dtype=jnp.float32):
    """Kernel-net init from the reference (ponita_ode_g.py:9-13)."""
    fan_in = shape[0] if len(shape) == 2 else int(np.prod(shape[1:]))
    fan_out = shape[1] if len(shape) == 2 else shape[0]
    std = np.sqrt(2.0 / (fan_in + fan_out) * fan_in)
    return jax.random.uniform(key, shape, dtype, -std, std)


class SepGconv(nn.Module):
    """Separable group convolution on a fully connected point cloud.

    ``a[b, senders, c] * kernel[b, receivers, senders, c] -> out[b, receivers, c]``.
    """

    num_hidden: int
    basis_dim: int
    bias: bool = True

    @nn.compact
    def __call__(self, a, kernel_basis):
        kernel = nn.Dense(self.num_hidden, use_bias=False, kernel_init=_chang_xavier_uniform)(
            kernel_basis
        )
        a = jnp.einsum("bsc,brsc->brc", a, kernel)
        if self.bias:
            a = a + self.param("bias", nn.initializers.zeros, (self.num_hidden,))
        return a


class ConvBlock(nn.Module):
    num_hidden: int
    basis_dim: int
    widening_factor: int

    @nn.compact
    def __call__(self, a, kernel_basis):
        a = SepGconv(self.num_hidden, self.basis_dim)(a, kernel_basis)
        a = nn.LayerNorm()(a)
        a = nn.Dense(self.widening_factor * self.num_hidden)(a)
        a = nn.gelu(a)
        return nn.Dense(self.num_hidden)(a)


class PonitaGen(nn.Module):
    """Equivariant point-cloud network with scalar and vector readouts."""

    num_hidden: int
    num_layers: int
    scalar_num_out: int
    vec_num_out: int
    invariant: BaseInvariant
    basis_dim: int
    degree: int
    widening_factor: int
    global_pool: bool
    kernel_size: Union[float, str] = "global"

    @nn.compact
    def __call__(self, latent):
        p, a, _ = latent

        # Angular pose components are embedded to the circle before computing
        # invariants, matching the decoder convention.
        if self.invariant.num_z_ori_dims > 0:
            p_pos = p[:, :, : self.invariant.num_z_pos_dims]
            p_ang = p[:, :, self.invariant.num_z_pos_dims :]
            p = jnp.concatenate([p_pos, jnp.cos(p_ang), jnp.sin(p_ang)], axis=-1)

        invariants = self.invariant(p, p)  # [b, z, z, inv_dim]

        # Kernel basis: polynomial features -> MLP -> basis coefficients.
        kb = polynomial_features(invariants, self.degree)
        kb = nn.Dense(self.num_hidden)(kb)
        kb = nn.gelu(kb)
        kb = nn.Dense(self.basis_dim)(kb)
        kernel_basis = nn.gelu(kb)
        if self.kernel_size != "global":
            # Safe pairwise distance: ``jnp.linalg.norm`` has NaN gradients on the
            # zero-distance self-pairs, which poisons every ODE-phase update the
            # moment gradients flow through the rollout (the reference has this
            # exact bug — ``ponita_ode_g.py:151-153`` with the shipped
            # ``config_cahn_hilliard.yaml`` kernel_size 0.2; forward values match,
            # the diagonal gets the correct zero subgradient here).
            d2 = jnp.sum((p[:, :, None, :] - p[:, None, :, :]) ** 2, axis=-1)
            pos = d2 > 0
            dist = jnp.where(pos, jnp.sqrt(jnp.where(pos, d2, 1.0)), 0.0)
            kernel_basis = kernel_basis * jnp.exp(-dist / self.kernel_size)[..., None]

        a = nn.Dense(self.num_hidden, use_bias=False)(a)
        for _ in range(self.num_layers):
            a = ConvBlock(self.num_hidden, self.basis_dim, self.widening_factor)(a, kernel_basis)

        small_init = nn.initializers.variance_scaling(1e-6, "fan_in", "truncated_normal")
        scalar_out = nn.Dense(self.scalar_num_out, use_bias=False, kernel_init=small_init)(a)

        vec_out = None
        if self.vec_num_out > 0:
            pos_dims = self.invariant.num_z_pos_dims
            rel_pos = p[:, :, None, :pos_dims] - p[:, None, :, :pos_dims]
            # Gate vectors by invariants + sender features.
            inv_feat = jnp.concatenate(
                [
                    invariants,
                    jnp.broadcast_to(a[:, None, :, :], invariants.shape[:-1] + (a.shape[-1],)),
                ],
                axis=-1,
            )
            gate_rel = nn.Dense(self.vec_num_out, use_bias=False, kernel_init=small_init)(inv_feat)
            vec_out = (gate_rel * rel_pos).mean(axis=-2)
            if self.invariant.num_z_ori_dims > 0:
                p_ori = jnp.broadcast_to(p[:, None, :, pos_dims:], rel_pos.shape)
                gate_ori = nn.Dense(self.vec_num_out, use_bias=False, kernel_init=small_init)(
                    inv_feat
                )
                vec_out = vec_out + (gate_ori * p_ori).mean(axis=-2)

        if self.global_pool:
            scalar_out = scalar_out.mean(axis=1)
            if vec_out is not None:
                vec_out = vec_out.mean(axis=1)
        return scalar_out, vec_out


class PonitaLatentODE(nn.Module):
    """Wraps ``PonitaGen`` as a latent vector field ``(p, a, w) -> (dp, da, dw)``."""

    num_hidden: int
    num_layers: int
    scalar_num_out: int
    vec_num_out: int
    invariant: BaseInvariant
    basis_dim: int
    degree: int
    widening_factor: int
    global_pool: bool = False
    kernel_size: Union[float, str] = "global"

    @nn.compact
    def __call__(self, latents):
        p, a, window = latents
        # Contexts are initialized at ones; center them before the vector field.
        a = a - 1

        oriented = self.invariant.num_z_ori_dims > 0
        scalar_num_out = self.scalar_num_out + 1 if oriented else self.scalar_num_out
        scalar, vec = PonitaGen(
            num_hidden=self.num_hidden,
            num_layers=self.num_layers,
            scalar_num_out=scalar_num_out,
            vec_num_out=self.vec_num_out,
            invariant=self.invariant,
            basis_dim=self.basis_dim,
            degree=self.degree,
            widening_factor=self.widening_factor,
            global_pool=self.global_pool,
            kernel_size=self.kernel_size,
        )((p, a, window))

        if oriented:
            da = scalar[:, :, :-1]
            d_angle = scalar[:, :, -1:]
            dp = jnp.concatenate([vec, d_angle], axis=-1)
        else:
            da = scalar
            dp = vec
        dw = jnp.zeros_like(window) if window is not None else None
        return dp, da, dw
