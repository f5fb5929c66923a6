"""Equivariant cross attention between coordinate queries and a latent point set.

This is the hot op of the framework (reference
``enf/steerable_attention/equivariant_cross_attention.py:24-151``): a query is built
from an RFF embedding of the bi-invariants ``inv(x, p)``; keys/values come from the
latent contexts ``a``; values are FiLM-conditioned *per (coordinate, latent) pair* by a
second invariant embedding; a per-latent Gaussian window is added to the logits; and
the softmax normalizes over the (small) latent axis.

Two execution paths share the same parameters:

- ``backend='xla'``: a straight jnp composition; XLA fuses the elementwise chain into
  the surrounding matmuls. Used for training (full autodiff incl. second-order
  grads through the meta-SGD inner loop).
- ``backend='pallas'``: the fused Pallas decode kernel (``ops.pallas_decode``), which
  tiles the coordinate axis and never materializes the ``[b, c, z, H, D]`` value
  tensor in HBM. Used for inference / rollout decoding.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn
from jax.nn import gelu, softmax

from enf_pde_tpu.geometry.invariants import BaseInvariant
from enf_pde_tpu.ops.embeddings import get_embedding

__all__ = ["PointwiseFFN", "EquivariantCrossAttention"]


class PointwiseFFN(nn.Module):
    """Dense -> gelu -> LayerNorm -> Dense (reference PointwiseFFN)."""

    num_in: int
    num_hidden: int
    num_out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.num_hidden)(x)
        x = gelu(x)
        x = nn.LayerNorm()(x)
        return nn.Dense(self.num_out)(x)


class EquivariantCrossAttention(nn.Module):
    """Cross attention from coordinates ``x`` to latents ``(p, a)``.

    Args:
        num_hidden: per-head hidden width D.
        num_heads: number of heads H.
        invariant: geometry invariant producing ``inv(x, p) [b, c, z, inv_dim]``.
        embedding_type: 'rff' | 'ffn' | 'polynomial'.
        embedding_freq_multiplier: (query freq multiplier, value freq multiplier).
        condition_value_transform: FiLM-condition values on the invariant embedding.
        condition_invariant_embedding: additionally condition the value-side invariant
            embedding on per-coordinate features ``x_h`` (used by the latent
            transformer only).
        project_heads: project concatenated heads back to ``num_hidden``.
        use_gaussian_window: add the per-latent Gaussian window to the logits.
        backend: 'xla' (default) or 'pallas' (fused decode kernel; forward parity
            with 'xla', used for inference decoding).
    """

    num_hidden: int
    num_heads: int
    invariant: BaseInvariant
    embedding_type: str
    embedding_freq_multiplier: tuple
    condition_value_transform: bool
    condition_invariant_embedding: bool
    project_heads: bool
    use_gaussian_window: bool = True
    backend: str = "xla"

    def setup(self):
        freq_q, freq_v = self.embedding_freq_multiplier
        self.invariant_embedding_query = get_embedding(
            embedding_type=self.embedding_type,
            num_in=self.invariant.dim,
            num_hidden=self.num_hidden,
            num_emb_dim=self.num_hidden,
            freq_multiplier=freq_q,
        )
        self.invariant_embedding_value = get_embedding(
            embedding_type=self.embedding_type,
            num_in=self.invariant.dim,
            num_hidden=self.num_hidden,
            num_emb_dim=self.num_hidden,
            freq_multiplier=freq_v,
        )

        self.inv_emb_to_q = nn.Dense(self.num_heads * self.num_hidden)
        self.a_to_k = nn.Dense(self.num_heads * self.num_hidden)
        self.a_to_v = nn.Dense(self.num_heads * self.num_hidden)
        self.scale = 1.0 / (self.num_hidden**0.5)

        if self.condition_invariant_embedding:
            self.inv_emb_cond_to_inv_emb = PointwiseFFN(
                self.num_hidden, self.num_hidden, 2 * self.num_hidden
            )
        if self.condition_value_transform:
            self.inv_emb_to_v = PointwiseFFN(
                self.num_hidden, self.num_hidden, 2 * self.num_heads * self.num_hidden
            )
            self.inv_emb_cond_mixer = PointwiseFFN(
                self.num_hidden, self.num_hidden, self.num_hidden
            )

        if self.project_heads:
            self.out_proj = nn.Dense(self.num_hidden)
        else:
            self.out_proj = nn.Dense(self.num_heads * self.num_hidden)

    def __call__(self, x, p, a, window_sigma=None, x_h: Optional[jnp.ndarray] = None):
        """Apply equivariant cross attention.

        Args:
            x: query coordinates [batch, num_coords, coord_dim].
            p: latent poses [batch, num_latents, pose_dim].
            a: latent contexts [batch, num_latents, context_dim].
            window_sigma: per-latent Gaussian window size [batch, num_latents, 1].
            x_h: optional per-coordinate conditioning [batch, num_coords, num_hidden].

        Returns:
            [batch, num_coords, num_hidden] (or ``num_heads * num_hidden`` when
            ``project_heads`` is False).
        """
        H, D = self.num_heads, self.num_hidden

        if self._use_pallas():
            return self._call_pallas(x, p, a, window_sigma)

        inv = self.invariant(x, p)  # [b, c, z, inv_dim]
        q = self.inv_emb_to_q(self.invariant_embedding_query(inv))  # [b, c, z, H*D]
        k = self.a_to_k(a)  # [b, z, H*D]
        v = self.a_to_v(a)  # [b, z, H*D]

        if self.condition_value_transform:
            inv_emb_v = self.invariant_embedding_value(inv)  # [b, c, z, D]
            if self.condition_invariant_embedding:
                assert x_h is not None, "x_h is required when conditioning the invariant embedding."
                g, b_ = jnp.split(self.inv_emb_cond_to_inv_emb(x_h), 2, axis=-1)
                inv_emb_v = inv_emb_v * (1 + g[:, :, None, :]) + b_[:, :, None, :]
            v_gamma, v_beta = jnp.split(self.inv_emb_to_v(inv_emb_v), 2, axis=-1)
            v = v[:, None, :, :] * (1 + v_gamma) + v_beta  # [b, c, z, H*D]
            v = v.reshape(v.shape[:-1] + (H, D))
            v = self.inv_emb_cond_mixer(v)  # per-head mixer over D
        else:
            v = v[:, None, :, :]
            v = v.reshape(v.shape[:-1] + (H, D))

        q = q.reshape(q.shape[:-1] + (H, D))
        k = k.reshape(k.shape[:-1] + (H, D))

        # Per-(coordinate, latent, head) logits.
        att = (q * k[:, None, ...]).sum(axis=-1) * self.scale
        if self.use_gaussian_window:
            att = att + self.invariant.gaussian_window(x, p, sigma=window_sigma)
        att = softmax(att, axis=-2)  # normalize over latents

        y = (att[..., None] * v).sum(axis=2)  # contract the latent axis
        y = y.reshape(*y.shape[:2], H * D)
        return self.out_proj(y)

    # ------------------------------------------------------------------ pallas path

    def _use_pallas(self) -> bool:
        """The fused kernel covers the decode configuration used by all experiments."""
        return (
            self.backend in ("pallas", "pallas_interpret")
            and not self.is_initializing()  # params must exist to be extracted
            and self.condition_value_transform
            and not self.condition_invariant_embedding
            and self.embedding_type == "rff"
        )

    def _call_pallas(self, x, p, a, window_sigma):
        from enf_pde_tpu.ops.pallas_decode import extract_attention_weights, fused_enf_decode

        inv = self.invariant(x, p)  # [b, c, z, i] — the kernel's natural layout
        if self.use_gaussian_window:
            wb = self.invariant.gaussian_window(x, p, sigma=window_sigma)[..., 0]
        else:
            wb = jnp.zeros(inv.shape[:3], dtype=inv.dtype)
        k = self.a_to_k(a)
        v = self.a_to_v(a)
        weights = extract_attention_weights(
            {
                "invariant_embedding_query": self.invariant_embedding_query.variables["params"],
                "invariant_embedding_value": self.invariant_embedding_value.variables["params"],
                "inv_emb_to_q": self.inv_emb_to_q.variables["params"],
                "inv_emb_to_v": self.inv_emb_to_v.variables["params"],
                "inv_emb_cond_mixer": self.inv_emb_cond_mixer.variables["params"],
            }
        )
        interpret = self.backend == "pallas_interpret"
        y = fused_enf_decode(
            inv,
            wb,
            k,
            v,
            weights,
            num_heads=self.num_heads,
            head_dim=self.num_hidden,
            interpret=interpret,
            # Strict f32 in interpreter parity tests; bf16 MXU operands on hardware.
            compute_dtype=jnp.float32 if interpret else jnp.bfloat16,
        )
        return self.out_proj(y)
