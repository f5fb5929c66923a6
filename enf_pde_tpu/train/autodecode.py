"""Per-signal autodecoding trainer (the non-meta-learning baseline).

Parity with reference ``nonmaml_pde_trainer.py``: every training signal owns a row in
a latent table; the nef phase jointly fits decoder + per-signal latents to frame 0;
the ode phase rolls stored latents forward and fits the dynamics; validation re-fits a
fresh latent table on the val set from scratch (optionally with a coordinate-dropout
mask) before measuring rollout MSE.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from enf_pde_tpu.builders import coordinate_system_for
from enf_pde_tpu.dynamics.solvers import solve_latent_ode
from enf_pde_tpu.models.decoder import decode_chunked
from enf_pde_tpu.models.latents import gather_latents, init_latents, latents_to_pose
from enf_pde_tpu.train.state import TrainState, make_optimizers

__all__ = ["AutodecodingTrainer"]


class AutodecodingTrainer:
    """Owns jitted steps for autodecoding training and the re-fitting val protocol."""

    def __init__(self, cfg, decoder, ode_model, coords: jnp.ndarray, seed: int = 0):
        self.cfg = cfg
        self.decoder = decoder
        self.ode_model = ode_model
        self.coords = jnp.asarray(coords)
        self.seed = seed
        self.opts = make_optimizers(cfg)
        self.coordinate_system = coordinate_system_for(cfg.dataset.name)
        inv = decoder.cross_attn_invariant
        self.num_pos_dims = inv.num_z_pos_dims
        self.num_ori_dims = inv.num_z_ori_dims
        # Forward-only validation decoding can run the fused Pallas kernel while
        # the (first-order) training steps keep the XLA path; see resolve_eval_backend.
        from enf_pde_tpu.train.meta_sgd import resolve_eval_backend

        eval_backend = resolve_eval_backend(cfg, decoder)
        if eval_backend != decoder.backend:
            self.eval_decoder = decoder.clone(backend=eval_backend)
        else:
            self.eval_decoder = decoder
        self._build_steps()

    def _make_table(self, num_signals: int):
        return init_latents(
            num_signals=num_signals,
            num_latents=self.cfg.nef.num_latents,
            latent_dim=self.cfg.nef.latent_dim,
            num_pos_dims=self.num_pos_dims,
            num_ori_dims=self.num_ori_dims,
            coordinate_system=self.coordinate_system,
            gaussian_window_size=self.cfg.nef.gaussian_window,
        )

    def init_state(self, num_signals: Optional[int] = None) -> TrainState:
        cfg = self.cfg
        key = jax.random.PRNGKey(self.seed)
        key, nef_key, ode_key = jax.random.split(key, 3)
        table = self._make_table(num_signals or cfg.dataset.num_signals_train)
        p, a, window = latents_to_pose(gather_latents(table, jnp.array([0])))

        n_init = min(cfg.training.max_num_sampled_points, 128)
        sample_coords = jnp.broadcast_to(
            self.coords[None, :n_init], (1, n_init, self.coords.shape[-1])
        )
        # One jitted program for the whole state build — same rationale as
        # MetaSGDTrainer.init_state: un-jitted flax/optax init compiles one tiny
        # program per primitive (slow on CPU, worse on the remote-compile TPU).
        @jax.jit
        def _build(nef_key, ode_key, key, table):
            nef_params = self.decoder.init(nef_key, sample_coords, p, a, window)
            ode_params = self.ode_model.init(ode_key, (p, a, window))
            params = {"nef": nef_params, "autodecoder": table, "ode": ode_params}
            return TrainState(
                params=params,
                nef_opt_state=self.opts.nef.init(nef_params),
                autodecoder_opt_state=self.opts.autodecoder.init(table),
                ode_opt_state=self.opts.ode.init(ode_params),
                meta_sgd_opt_state=(),
                rng=key,
            )

        return _build(nef_key, ode_key, key, table)

    # ------------------------------------------------------------------ losses

    def _recon_loss(self, params, frames, idx, rng, dp_mask=None):
        """Frame-0 reconstruction from per-signal latents at a random coord subset."""
        img = frames.reshape(frames.shape[0], -1, frames.shape[-1])
        coords = self.coords
        if dp_mask is not None:
            coords = coords[dp_mask]
            img = img[:, dp_mask]
        M = self.cfg.training.max_num_sampled_points
        if M < coords.shape[0]:
            sel = jax.random.permutation(rng, coords.shape[0])[:M]
            coords = coords[sel]
            img = img[:, sel]
        coords = jnp.broadcast_to(coords[None], (img.shape[0], *coords.shape))
        p, a, window = latents_to_pose(gather_latents(params["autodecoder"], idx))
        out = self.decoder.apply(params["nef"], coords, p, a, window)
        return jnp.mean((out - img) ** 2)

    def _ode_loss(self, params, trajectory, idx, rng):
        cfg = self.cfg
        T = cfg.dataset.traj_len_train
        trajectory = trajectory[:, :T]
        b = trajectory.shape[0]
        latents = latents_to_pose(gather_latents(params["autodecoder"], idx))
        sol = solve_latent_ode(
            f=lambda z, t: self.ode_model.apply(params["ode"], z),
            latents=latents,
            t0=0,
            tf=(T - 1) * cfg.node.dt,
            h=cfg.node.dt,
            method=cfg.node.method,
        )
        p_fl, a_fl, w_fl = jax.tree.map(lambda x: x.reshape(-1, *x.shape[2:]), sol)

        num_coords = self.coords.shape[0]
        M = cfg.training.max_num_sampled_points
        traj_fl = trajectory.reshape(b, T, -1, trajectory.shape[-1])
        if M < num_coords:
            keys = jax.random.split(rng, T)
            mask = jax.vmap(lambda k: jax.random.permutation(k, num_coords)[:M])(keys)
            xs = self.coords[mask]
            xs = jnp.broadcast_to(xs[None], (b, T, M, xs.shape[-1])).reshape(b * T, M, -1)
            ys = jnp.take_along_axis(traj_fl, mask[None, :, :, None], axis=2)
            ys = ys.reshape(b * T, M, trajectory.shape[-1])
        else:
            xs = jnp.broadcast_to(
                self.coords[None, None], (b, T, num_coords, self.coords.shape[-1])
            ).reshape(b * T, num_coords, -1)
            ys = traj_fl.reshape(b * T, num_coords, trajectory.shape[-1])
        recon = self.decoder.apply(params["nef"], xs, p_fl, a_fl, w_fl)
        return jnp.mean((recon - ys) ** 2)

    # ------------------------------------------------------------------ steps

    def _nef_train_step(self, state, trajectory, idx, update_nef: bool = True, dp_mask=None):
        loss_key, next_rng = jax.random.split(state.rng)
        loss, grads = jax.value_and_grad(self._recon_loss)(
            state.params, trajectory[:, 0], idx, loss_key, dp_mask
        )
        params = dict(state.params)
        nef_opt_state = state.nef_opt_state
        if update_nef:
            nef_updates, nef_opt_state = self.opts.nef.update(
                grads["nef"], state.nef_opt_state, state.params["nef"]
            )
            params["nef"] = optax.apply_updates(state.params["nef"], nef_updates)
        ad_updates, ad_opt_state = self.opts.autodecoder.update(
            grads["autodecoder"], state.autodecoder_opt_state
        )
        params["autodecoder"] = optax.apply_updates(state.params["autodecoder"], ad_updates)
        return loss, state.replace(
            params=params,
            nef_opt_state=nef_opt_state,
            autodecoder_opt_state=ad_opt_state,
            rng=next_rng,
        )

    def _ode_train_step(self, state, trajectory, idx):
        loss_key, next_rng = jax.random.split(state.rng)
        loss, grads = jax.value_and_grad(self._ode_loss)(state.params, trajectory, idx, loss_key)
        ode_updates, ode_opt_state = self.opts.ode.update(
            grads["ode"], state.ode_opt_state, state.params["ode"]
        )
        params = dict(state.params, ode=optax.apply_updates(state.params["ode"], ode_updates))
        return loss, state.replace(params=params, ode_opt_state=ode_opt_state, rng=next_rng)

    def _val_step(self, state, trajectory, idx):
        """Rollout MSE from *stored* latents over ``test.val_rollout_frames`` frames.

        The reference hardcodes a 20-frame validation rollout
        (``nonmaml_pde_trainer.py:252,264``); here the horizon is explicit config,
        defaulting to twice the train horizon (identical at T=10).
        """
        cfg = self.cfg
        T_in = cfg.dataset.traj_len_train
        T_total = min(cfg.get_path("test.val_rollout_frames", 2 * T_in), trajectory.shape[1])
        trajectory = trajectory[:, :T_total]
        latents = latents_to_pose(gather_latents(state.params["autodecoder"], idx))
        sol = solve_latent_ode(
            f=lambda z, t: self.ode_model.apply(state.params["ode"], z),
            latents=latents,
            t0=0,
            tf=(T_total - 1) * cfg.node.dt,
            h=cfg.node.dt,
            method=cfg.node.method,
        )
        p_fl, a_fl, w_fl = jax.tree.map(lambda x: x.reshape(-1, *x.shape[2:]), sol)
        coords = jnp.broadcast_to(self.coords[None], (p_fl.shape[0], *self.coords.shape))
        recon = decode_chunked(
            self.eval_decoder.apply, state.params["nef"], coords, p_fl, a_fl, w_fl,
            chunk_size=cfg.training.max_num_sampled_points,
        )
        recon = recon.reshape(trajectory.shape)
        mse_in = jnp.mean((recon[:, :T_in] - trajectory[:, :T_in]) ** 2)
        mse_out = jnp.mean((recon[:, T_in:] - trajectory[:, T_in:]) ** 2)
        return mse_in, mse_out

    def _build_steps(self):
        self.nef_train_step = jax.jit(partial(self._nef_train_step, update_nef=True))
        self.codes_only_step = jax.jit(
            self._nef_train_step, static_argnames=("update_nef",)
        )
        self.ode_train_step = jax.jit(self._ode_train_step)
        self.val_step = jax.jit(self._val_step)

    def fallback_to_xla_eval(self):
        """Swap validation decoding to the XLA path (see MetaSGDTrainer)."""
        base = self.decoder
        if base.backend in ("pallas", "pallas_interpret"):
            base = base.clone(backend="xla")
        self.eval_decoder = base
        jax.clear_caches()  # see MetaSGDTrainer.fallback_to_xla_eval
        self._build_steps()

    # ------------------------------------------------------------------ val protocol

    def refit_latents(self, state, loader, num_epochs: int, dp: float = 0.0, seed: int = 1):
        """Fit a fresh latent table to a dataset with the decoder frozen.

        Reference ``nonmaml_pde_trainer.py:434-466``: used at validation time (per
        dropout rate) so test signals get latents without touching the decoder.
        """
        key = jax.random.PRNGKey(seed)
        table = self._make_table(len(loader.indices))
        val_state = state.replace(
            params=dict(state.params, autodecoder=table),
            autodecoder_opt_state=self.opts.autodecoder.init(table),
            rng=key,
        )
        dp_mask = None
        if dp > 0:
            dp_mask = jax.random.permutation(key, self.coords.shape[0])[
                : int(self.coords.shape[0] * dp)
            ]
        for _ in range(num_epochs):
            for batch in loader:
                traj, _, idx = batch
                _, val_state = self.codes_only_step(
                    val_state, jnp.asarray(traj), jnp.asarray(idx), update_nef=False,
                    dp_mask=dp_mask,
                )
        return val_state
