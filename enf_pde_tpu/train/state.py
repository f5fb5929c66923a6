"""Train state pytrees and optimizer construction."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import optax
from flax import struct

__all__ = ["TrainState", "make_optimizers", "Optimizers"]


class TrainState(struct.PyTreeNode):
    """All trainable state as a single pytree (jit/shard/checkpoint friendly).

    ``params`` holds ``{'nef', 'autodecoder', 'meta_sgd_lrs', 'ode'}`` (the
    autodecoding trainer omits ``meta_sgd_lrs``).
    """

    params: Any = struct.field(pytree_node=True)
    nef_opt_state: optax.OptState = struct.field(pytree_node=True)
    autodecoder_opt_state: optax.OptState = struct.field(pytree_node=True)
    ode_opt_state: optax.OptState = struct.field(pytree_node=True)
    meta_sgd_opt_state: optax.OptState = struct.field(pytree_node=True)
    rng: jnp.ndarray = struct.field(pytree_node=True)


class Optimizers(struct.PyTreeNode):
    """Bundle of optax transforms (static, not a pytree of arrays)."""

    nef: optax.GradientTransformation = struct.field(pytree_node=False)
    autodecoder: optax.GradientTransformation = struct.field(pytree_node=False)
    ode: optax.GradientTransformation = struct.field(pytree_node=False)
    meta_sgd: optax.GradientTransformation = struct.field(pytree_node=False)


def make_optimizers(cfg) -> Optimizers:
    """Optimizer chains matching the reference (``pde_trainer.py:60-67``):

    global-norm clip 1.0 + AdamW for the decoder and the ODE model (the reference uses
    ``learning_rate_enf`` for both), Adam for per-signal codes and for the learned
    per-parameter inner-loop learning rates.
    """
    lr_enf = float(cfg.optimizer.learning_rate_enf)
    lr_codes = float(cfg.optimizer.learning_rate_codes)
    lr_meta = float(cfg.get_path("meta.learning_rate_meta_sgd", 1e-4))
    # Opt-in regularizer for the latent dynamics. Default = optax.adamw's own
    # 1e-4, i.e. exactly what the reference gets implicitly (pde_trainer.py:60-67)
    # — parity rows are untouched. Raising it pushes the ODE toward more
    # conservative extrapolation (the knob suggested by
    # results/r3/diff_sphere_out_t_note.md for pure-decay datasets).
    wd_ode = float(cfg.get_path("optimizer.weight_decay_ode", 1e-4))
    return Optimizers(
        nef=optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(lr_enf)),
        autodecoder=optax.adam(lr_codes),
        ode=optax.chain(
            optax.clip_by_global_norm(1.0), optax.adamw(lr_enf, weight_decay=wd_ode)
        ),
        meta_sgd=optax.adam(lr_meta),
    )
