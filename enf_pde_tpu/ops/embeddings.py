"""Coordinate-invariant embeddings: random Fourier features, polynomial, plain MLP.

Parity with reference ``enf/steerable_attention/embedding/``: the RFF net projects with
fixed (stop-gradient) Gaussian coefficients, concatenates ``[sin, cos]``, then applies
ReLU hidden layers and a variance-scaled final linear layer (``rff.py``).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

__all__ = ["RFFNet", "FFNEmbedding", "PolynomialEmbedding", "polynomial_features", "get_embedding"]


class RFFEmbedding(nn.Module):
    in_dim: int
    hidden_dim: int
    learnable_coefficients: bool
    std: float

    @nn.compact
    def __call__(self, x):
        assert self.hidden_dim % 2 == 0, "RFF hidden_dim must be even."
        coeff = self.param(
            "coefficients",
            nn.initializers.normal(stddev=self.std),
            (self.in_dim, self.hidden_dim // 2),
        )
        if not self.learnable_coefficients:
            coeff = lax.stop_gradient(coeff)
        x_proj = (2 * jnp.pi) * (x @ coeff)
        return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)


class RFFNet(nn.Module):
    """RFF encoding -> (num_layers - 1) x [Dense + ReLU] -> Dense."""

    in_dim: int
    output_dim: int
    hidden_dim: int
    num_layers: int = 2
    learnable_coefficients: bool = False
    std: float = 1.0
    numerator: float = 2.0

    @nn.compact
    def __call__(self, x):
        assert self.num_layers >= 2, "RFFNet needs at least a hidden and an output layer."
        x = RFFEmbedding(
            in_dim=self.in_dim,
            hidden_dim=self.hidden_dim,
            learnable_coefficients=self.learnable_coefficients,
            std=self.std,
        )(x)
        for _ in range(self.num_layers - 1):
            x = nn.Dense(
                self.hidden_dim,
                kernel_init=nn.initializers.variance_scaling(self.numerator, "fan_in", "normal"),
                bias_init=nn.initializers.normal(stddev=1e-6),
            )(x)
            x = nn.relu(x)
        return nn.Dense(
            self.output_dim,
            kernel_init=nn.initializers.variance_scaling(self.numerator, "fan_in", "uniform"),
            bias_init=nn.initializers.normal(stddev=1e-6),
        )(x)


def polynomial_features(x: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Concatenated outer-product power features up to ``degree`` + 1 factors.

    Pure function (no params); also used by the PONITA kernel basis.
    """
    feats = [x]
    for _ in range(degree):
        feats.append(
            jnp.einsum("...i,...j->...ij", feats[-1], x).reshape(*x.shape[:-1], -1)
        )
    return jnp.concatenate(feats, axis=-1)


class PolynomialEmbedding(nn.Module):
    num_out: int
    num_hidden: int
    degree: int
    num_layers: int = 2

    @nn.compact
    def __call__(self, x):
        x = polynomial_features(x, self.degree)
        for _ in range(self.num_layers - 1):
            x = nn.gelu(nn.Dense(self.num_hidden)(x))
        return nn.Dense(self.num_out)(x)


class FFNEmbedding(nn.Module):
    num_hidden: int
    num_out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.num_hidden)(x)
        x = nn.gelu(x)
        return nn.Dense(self.num_out)(x)


def get_embedding(embedding_type: str, num_in: int, num_hidden: int, num_emb_dim: int, freq_multiplier: float):
    if embedding_type == "rff":
        return RFFNet(
            in_dim=num_in,
            output_dim=num_emb_dim,
            hidden_dim=num_hidden,
            num_layers=2,
            learnable_coefficients=False,
            std=freq_multiplier,
        )
    if embedding_type == "ffn":
        return FFNEmbedding(num_hidden=num_hidden, num_out=num_emb_dim)
    if embedding_type == "polynomial":
        return PolynomialEmbedding(
            num_hidden=num_hidden, num_out=num_emb_dim, degree=int(freq_multiplier)
        )
    raise ValueError(f"Unknown embedding type: {embedding_type!r}")
