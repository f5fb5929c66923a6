"""Meta-SGD inner loop: a ``lax.scan`` of K latent SGD steps with learned per-leaf LRs.

Semantics follow reference ``pde_trainer.py:122-235``: shared init latents are tiled
over the batch, each inner step fits the latents to a random coordinate subset of the
target frame with gradients scaled by the batch size and per-parameter learned learning
rates, and the returned loss is evaluated on a held-out (K+1)-th coordinate mask.
Outer training differentiates **through** the loop (second-order / MAML).

TPU-first differences from the reference:

- ``lax.scan`` over inner steps instead of a Python unroll (compile time and memory
  stay constant in K).
- inner gradients are taken w.r.t. the latent pytree only (the reference
  differentiates w.r.t. everything and discards all but the latent grads).
- PRNG keys are split per consumer instead of reused across masks.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from enf_pde_tpu.models.latents import LatentParams, latents_to_pose, tile_latents

__all__ = ["InnerLoopConfig", "make_inner_loop", "sample_coordinate_masks"]


class InnerLoopConfig(NamedTuple):
    num_inner_steps: int
    max_num_sampled_points: int
    optimize_gaussian_window: bool
    noise_pos_inner_loop: float
    # Fully unroll the K-step scan (K is 3-4 in every config). At the small
    # per-step shapes of the inner loop (e.g. shallow water: batch 1, 8 latents,
    # hid 128) the step is latency-bound, not FLOP-bound, and unrolling lets XLA
    # fuse across iterations instead of re-entering a loop of tiny kernels —
    # in both the forward scan and the second-order backward. Compile time and
    # peak memory are unchanged at K<=4 (the differentiated scan already stores
    # every iteration's residuals). `meta.inner_unroll=false` restores the scan.
    unroll: bool = True


def sample_coordinate_masks(rng, num_coords: int, num_masks: int, num_sampled: int) -> jnp.ndarray:
    """Independent random coordinate subsets: [num_masks, min(num_sampled, num_coords)]."""
    take = min(num_sampled, num_coords)
    keys = jax.random.split(rng, num_masks)
    return jax.vmap(lambda k: jax.random.permutation(k, num_coords)[:take])(keys)


def make_inner_loop(
    decoder_apply: Callable,
    coords: jnp.ndarray,
    cfg: InnerLoopConfig,
):
    """Build the jittable inner-loop function.

    Args:
        decoder_apply: ``decoder.apply(nef_params, x, p, a, window) -> values``.
        coords: full coordinate set [num_coords, coord_dim] (closed over; static).
        cfg: static inner-loop hyperparameters.

    Returns:
        ``inner_loop(nef_params, meta_lrs, latent_init, frames, rng, dp) ->
        (query_loss, fitted_latents)`` where ``latent_init`` is a shared
        (num_signals=1) latent pytree, ``frames`` is [batch, *spatial, channels], and
        ``dp`` (static python float) optionally restricts fitting to a random
        ``dp``-fraction of coordinates (sparse-observation evaluation).
    """

    def inner_loop(
        nef_params,
        meta_lrs,
        latent_init: LatentParams,
        frames: jnp.ndarray,
        rng: jnp.ndarray,
        dp: float = 0.0,
    ) -> Tuple[jnp.ndarray, LatentParams]:
        img = frames.reshape(frames.shape[0], -1, frames.shape[-1])  # [b, N, C]
        batch_size = img.shape[0]
        local_coords = coords

        k_dp, k_mask, k_noise = jax.random.split(rng, 3)

        # Sparse-observation evaluation: fit on a random dp-fraction of coordinates.
        if dp > 0:
            keep = jax.random.permutation(k_dp, coords.shape[0])[: int(coords.shape[0] * dp)]
            local_coords = coords[keep]
            img = img[:, keep]

        masks = sample_coordinate_masks(
            k_mask,
            local_coords.shape[0],
            cfg.num_inner_steps + 1,
            cfg.max_num_sampled_points,
        )

        latents = tile_latents(latent_init, batch_size)
        if cfg.noise_pos_inner_loop > 0:
            latents["p_pos"] = latents["p_pos"] + cfg.noise_pos_inner_loop * jax.random.normal(
                k_noise, latents["p_pos"].shape
            )

        def recon_loss(latent_params: LatentParams, mask) -> jnp.ndarray:
            xs = local_coords[mask]  # [M, d]
            ys = img[:, mask]  # [b, M, C]
            xs = jnp.broadcast_to(xs[None], (batch_size, *xs.shape))
            p, a, window = latents_to_pose(latent_params)
            out = decoder_apply(nef_params, xs, p, a, window)
            return jnp.mean((out - ys) ** 2)

        def sgd_step(latent_params: LatentParams, mask):
            grads = jax.grad(recon_loss)(latent_params, mask)
            # The loss means over the batch; rescale so each signal's latents see
            # their own full gradient (reference pde_trainer.py:207).
            grads = jax.tree.map(lambda g: g * batch_size, grads)
            if not cfg.optimize_gaussian_window and "gaussian_window" in grads:
                grads["gaussian_window"] = jnp.zeros_like(grads["gaussian_window"])
            updated = {
                name: latent_params[name] - meta_lrs[name] * grads[name]
                for name in latent_params
            }
            return updated, ()

        latents, _ = jax.lax.scan(
            sgd_step, latents, masks[: cfg.num_inner_steps], unroll=bool(cfg.unroll)
        )
        query_loss = recon_loss(latents, masks[cfg.num_inner_steps])
        return query_loss, latents

    return inner_loop


def init_meta_sgd_lrs(
    latent_dim: int,
    lr_pos: float,
    lr_a: float,
    lr_window: float,
    with_orientation: bool,
) -> dict:
    """Learned per-parameter inner learning rates (reference ``pde_trainer.py:83-97``)."""
    lrs = {
        "p_pos": jnp.ones((1,)) * lr_pos,
        "a": jnp.ones((latent_dim,)) * lr_a,
        "gaussian_window": jnp.ones((1,)) * lr_window,
    }
    if with_orientation:
        lrs["p_ori"] = jnp.ones((1,)) * lr_pos
    return lrs
