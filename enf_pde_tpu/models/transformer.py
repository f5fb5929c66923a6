"""Latent-space equivariant transformer (self attention over the latent point set).

Parity with reference ``enf/models/equivariant_transformer.py`` — a latent-set
processor / classifier head with optional global max pooling. (Not used by the PDE
experiments, which evolve latents with the PONITA neural ODE instead; included for
capability parity.)
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp
from flax import linen as nn
from jax.nn import gelu

from enf_pde_tpu.geometry.invariants import BaseInvariant
from enf_pde_tpu.ops.attention import EquivariantCrossAttention, PointwiseFFN

__all__ = ["EquivariantTransformer", "SelfAttentionBlock"]


class SelfAttentionBlock(nn.Module):
    """LayerNorm -> self attention (conditioned on own features) -> [residual] -> FFN."""

    num_hidden: int
    num_heads: int
    attn_operator: partial
    residual: bool
    project_heads: bool

    def setup(self):
        self.layer_norm_attn = nn.LayerNorm()
        self.attn = self.attn_operator(
            num_hidden=self.num_hidden, num_heads=self.num_heads, project_heads=self.project_heads
        )
        width = self.num_hidden if self.project_heads else self.num_heads * self.num_hidden
        self.pointwise_ffn = PointwiseFFN(num_in=width, num_hidden=width, num_out=width)

    def __call__(self, p, a, window_size):
        a_norm = self.layer_norm_attn(a)
        a_attn = self.attn(x=p, p=p, a=a_norm, x_h=a_norm, window_sigma=window_size)
        if self.residual:
            return self.pointwise_ffn(a + a_attn)
        return self.pointwise_ffn(a_attn)


class EquivariantTransformer(nn.Module):
    num_hidden: int
    num_heads: int
    num_layers: int
    num_out: int
    self_attn_invariant: BaseInvariant
    embedding_type: str
    embedding_freq_multiplier: tuple
    condition_value_transform: bool
    global_pooling: bool = False

    def setup(self):
        self_attn = partial(
            EquivariantCrossAttention,
            invariant=self.self_attn_invariant,
            embedding_type=self.embedding_type,
            embedding_freq_multiplier=tuple(self.embedding_freq_multiplier),
            condition_value_transform=self.condition_value_transform,
            condition_invariant_embedding=True,
            # The latent transformer attends without a Gaussian window (its blocks are
            # called with window_sigma=None in the reference).
            use_gaussian_window=False,
        )
        self.latent_stem = nn.Dense(self.num_hidden)
        self.self_attention_blocks = [
            SelfAttentionBlock(
                num_hidden=self.num_hidden,
                num_heads=self.num_heads,
                attn_operator=self_attn,
                residual=True,
                project_heads=True,
            )
            for _ in range(self.num_layers)
        ]
        self.out_proj = nn.Sequential(
            [nn.Dense(self.num_hidden), gelu, nn.Dense(self.num_hidden), gelu, nn.Dense(self.num_out)]
        )

    def __call__(self, latents):
        """Process a latent set ``(p, a, gaussian_window)``.

        Returns [batch, num_latents, num_out], or [batch, num_out] with global pooling.
        """
        p, a, _ = latents
        if self.self_attn_invariant.num_z_ori_dims > 0:
            p_pos, p_ang = p[:, :, :2], p[:, :, 2:]
            p = jnp.concatenate([p_pos, jnp.cos(p_ang), jnp.sin(p_ang)], axis=-1)
        a = self.latent_stem(a)
        for block in self.self_attention_blocks:
            a = block(p, a, window_size=None)
            a = gelu(a)
        if self.global_pooling:
            a = jnp.max(a, axis=1)
        return self.out_proj(a)
