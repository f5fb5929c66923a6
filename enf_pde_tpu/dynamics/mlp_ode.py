"""Non-equivariant MLP latent vector field (dynamics baseline).

Parity with reference ``experiments/fitting/ode_models/mlp_ode.py``: two 3-hidden-layer
gelu MLPs on ``concat(p, a - 1)`` produce the pose and context derivatives; the window
derivative is zero.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["MLPLatentODE"]


class MLPLatentODE(nn.Module):
    num_hidden: int
    num_layers: int
    scalar_num_out: int
    vec_num_out: int

    @nn.compact
    def __call__(self, latents):
        p, a, window = latents
        a = a - 1
        h = jnp.concatenate([p, a], axis=-1)

        def mlp(x, num_out):
            for _ in range(3):
                x = nn.gelu(nn.Dense(self.num_hidden)(x))
            return nn.Dense(num_out)(x)

        dp = mlp(h, 2 * self.vec_num_out)
        da = mlp(h, self.scalar_num_out)
        dw = jnp.zeros_like(window) if window is not None else None
        return dp, da, dw
