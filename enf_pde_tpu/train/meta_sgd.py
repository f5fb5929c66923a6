"""Meta-SGD PDE trainer: pure jitted step functions + a thin orchestration class.

The training algorithm (reference ``pde_trainer.py``):

- **nef phase**: outer gradients of the inner-loop query loss update the decoder and
  the learned inner learning rates (second-order through the K-step latent fit).
- **ode phase**: latents are inner-fitted to frame 0, rolled out with the latent ODE
  for ``traj_len_train`` steps, decoded at random coordinate subsets of every frame,
  and the rollout MSE updates the ODE model.
- **dual phase**: the rollout loss updates decoder + inner LRs + ODE together.

All steps, including validation rollouts with chunked full-field decoding, compile to
single XLA programs (the reference leaves validation un-jitted).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from enf_pde_tpu.builders import coordinate_system_for
from enf_pde_tpu.dynamics.solvers import solve_latent_ode
from enf_pde_tpu.models.decoder import decode_chunked
from enf_pde_tpu.models.latents import init_latents, latents_to_pose
from enf_pde_tpu.train.inner_loop import InnerLoopConfig, init_meta_sgd_lrs, make_inner_loop
from enf_pde_tpu.train.state import TrainState, make_optimizers

__all__ = ["MetaSGDTrainer", "resolve_eval_backend", "resolve_ode_backend"]


def resolve_eval_backend(cfg, decoder) -> str:
    """Backend for forward-only (validation/rollout) decoding.

    ``nef.eval_backend: pallas`` in the experiment configs selects the fused TPU
    kernel; on non-TPU backends (the CPU test mesh, debugging) it silently falls
    back to the XLA path, which is numerically equivalent (tests/test_pallas.py).
    ``pallas_interpret`` is left untouched — it is the explicit CPU debug mode.
    """
    backend = cfg.nef.get("eval_backend", decoder.backend)
    if backend == "pallas" and jax.default_backend() != "tpu":
        return decoder.backend if decoder.backend != "pallas" else "xla"
    return backend


def resolve_ode_backend(cfg, decoder) -> str:
    """Backend for the ode/dual-phase rollout decode (``_ode_loss``).

    That decode sits OUTSIDE the K-step inner loop, so its gradients are plain
    first-order VJPs — exactly what the fused kernel's custom VJP serves — while
    the nef phase's second-order objective stays on the train (XLA) path.
    ``nef.ode_backend: pallas`` opts a config in; default is the train backend
    (i.e. no behavior change). Same TPU-only gating as ``resolve_eval_backend``.
    """
    backend = cfg.nef.get("ode_backend", decoder.backend)
    if backend == "pallas" and jax.default_backend() != "tpu":
        return decoder.backend if decoder.backend != "pallas" else "xla"
    return backend


class MetaSGDTrainer:
    """Builds and owns the jitted train/val step functions for one experiment."""

    def __init__(self, cfg, decoder, ode_model, coords: jnp.ndarray, seed: int = 0,
                 coord_mesh=None):
        """``coord_mesh``: optional ``jax.sharding.Mesh`` — when set, validation
        full-grid decodes shard the *coordinate* axis across it instead of chunking
        (softmax is over latents, so coordinate tiles are embarrassingly parallel;
        see parallel/mesh.py::sharded_decode). Use for replicated-batch evals with
        large grids (super-resolution, inference) where the batch axis alone cannot
        fill the mesh. Must be set before the first ``val_step`` call — the branch
        is baked in at trace time."""
        self.cfg = cfg
        self.coord_mesh = coord_mesh
        self.decoder = decoder
        self.ode_model = ode_model
        self.coords = jnp.asarray(coords)
        self.seed = seed
        self.opts = make_optimizers(cfg)

        self.coordinate_system = coordinate_system_for(cfg.dataset.name)
        inv = decoder.cross_attn_invariant
        self.num_pos_dims = inv.num_z_pos_dims
        self.num_ori_dims = inv.num_z_ori_dims

        self.inner_cfg = InnerLoopConfig(
            num_inner_steps=cfg.meta.num_inner_steps,
            max_num_sampled_points=cfg.training.max_num_sampled_points,
            optimize_gaussian_window=cfg.nef.optimize_gaussian_window,
            noise_pos_inner_loop=cfg.meta.noise_pos_inner_loop,
            unroll=bool(cfg.meta.get("inner_unroll", True)),
        )
        self.inner_loop = make_inner_loop(decoder.apply, self.coords, self.inner_cfg)

        # Validation decoding is forward-only, so it can run on the fused Pallas
        # kernel even while training uses the XLA path (which supports the
        # second-order autodiff the meta objective needs). Same parameter tree.
        eval_backend = resolve_eval_backend(cfg, decoder)
        if eval_backend != decoder.backend:
            self.eval_decoder = decoder.clone(backend=eval_backend)
        else:
            self.eval_decoder = decoder
        # The ode/dual-phase rollout decode is first-order in the decoder, so it
        # can run the fused kernel while the inner loop stays on XLA.
        ode_backend = resolve_ode_backend(cfg, decoder)
        if ode_backend != decoder.backend:
            self.ode_decoder = decoder.clone(backend=ode_backend)
        else:
            self.ode_decoder = decoder
        self._build_steps()

    # ------------------------------------------------------------------ state init

    def init_state(self) -> TrainState:
        cfg = self.cfg
        key = jax.random.PRNGKey(self.seed)
        key, nef_key, ode_key = jax.random.split(key, 3)

        latent_init = init_latents(
            num_signals=1,
            num_latents=cfg.nef.num_latents,
            latent_dim=cfg.nef.latent_dim,
            num_pos_dims=self.num_pos_dims,
            num_ori_dims=self.num_ori_dims,
            coordinate_system=self.coordinate_system,
            gaussian_window_size=cfg.nef.gaussian_window,
        )
        p, a, window = latents_to_pose(latent_init)

        meta_lrs = init_meta_sgd_lrs(
            latent_dim=cfg.nef.latent_dim,
            lr_pos=cfg.meta.inner_learning_rate_p,
            lr_a=cfg.meta.inner_learning_rate_a,
            lr_window=cfg.meta.inner_learning_rate_window,
            with_orientation=self.num_ori_dims > 0,
        )

        n_init = min(cfg.training.max_num_sampled_points, 128)
        sample_coords = jnp.broadcast_to(self.coords[None, :n_init], (1, n_init, self.coords.shape[-1]))

        # One jitted program for the whole state build: un-jitted flax/optax init
        # compiles one tiny XLA program per primitive (measured 164 compiles /
        # ~16 s on CPU, and one remote-compile RPC each on the relayed TPU
        # platform); jitted it is a single (persistently cacheable) program.
        @jax.jit
        def _build(nef_key, ode_key, key):
            nef_params = self.decoder.init(nef_key, sample_coords, p, a, window)
            ode_params = self.ode_model.init(ode_key, (p, a, window))
            params = {
                "nef": nef_params,
                "autodecoder": latent_init,
                "meta_sgd_lrs": meta_lrs,
                "ode": ode_params,
            }
            return TrainState(
                params=params,
                nef_opt_state=self.opts.nef.init(nef_params),
                autodecoder_opt_state=self.opts.autodecoder.init(latent_init),
                ode_opt_state=self.opts.ode.init(ode_params),
                meta_sgd_opt_state=self.opts.meta_sgd.init(meta_lrs),
                rng=key,
            )

        return _build(nef_key, ode_key, key)

    # ------------------------------------------------------------------ losses

    def _rollout(self, ode_params, latents, num_frames: int):
        return solve_latent_ode(
            f=lambda z, t: self.ode_model.apply(ode_params, z),
            latents=latents,
            t0=0,
            tf=(num_frames - 1) * self.cfg.node.dt,
            h=self.cfg.node.dt,
            method=self.cfg.node.method,
            unroll=int(self.cfg.node.get("ode_unroll", 1)),
        )

    def _nef_loss(self, params, trajectory, rng):
        """Inner-loop query loss on one or ``fit_on_num_steps`` random frames."""
        cfg = self.cfg
        fos = cfg.training.nef.fit_on_num_steps
        k_sel, k_inner = jax.random.split(rng)
        if fos == 1:
            frames = trajectory[:, 0]
        else:
            idx = jax.random.permutation(k_sel, cfg.dataset.traj_len_train)[:fos]
            frames = trajectory[:, idx]
            frames = frames.reshape(frames.shape[0] * fos, *frames.shape[2:])
        loss, _ = self.inner_loop(
            params["nef"], params["meta_sgd_lrs"], params["autodecoder"], frames, k_inner
        )
        return loss

    def _ode_loss(self, params, trajectory, rng):
        """Inner-fit frame 0 -> latent rollout -> decode random subsets -> MSE."""
        cfg = self.cfg
        T = cfg.dataset.traj_len_train
        k_inner, k_mask = jax.random.split(rng)
        trajectory = trajectory[:, :T]
        b = trajectory.shape[0]

        _, fitted = self.inner_loop(
            params["nef"], params["meta_sgd_lrs"], params["autodecoder"], trajectory[:, 0], k_inner
        )
        sol = self._rollout(params["ode"], latents_to_pose(fitted), T)
        p_fl, a_fl, w_fl = jax.tree.map(lambda x: x.reshape(-1, *x.shape[2:]), sol)

        num_coords = self.coords.shape[0]
        M = cfg.training.max_num_sampled_points
        traj_fl = trajectory.reshape(b, T, -1, trajectory.shape[-1])  # [b, T, N, C]
        if M < num_coords:
            # One random coordinate subset per timestep, shared across the batch.
            keys = jax.random.split(k_mask, T)
            mask = jax.vmap(lambda k: jax.random.permutation(k, num_coords)[:M])(keys)
            xs = self.coords[mask]  # [T, M, d]
            xs = jnp.broadcast_to(xs[None], (b, T, M, xs.shape[-1])).reshape(b * T, M, -1)
            ys = jnp.take_along_axis(traj_fl, mask[None, :, :, None], axis=2)
            ys = ys.reshape(b * T, M, trajectory.shape[-1])
        else:
            xs = jnp.broadcast_to(
                self.coords[None, None], (b, T, num_coords, self.coords.shape[-1])
            ).reshape(b * T, num_coords, -1)
            ys = traj_fl.reshape(b * T, num_coords, trajectory.shape[-1])

        recon = self.ode_decoder.apply(params["nef"], xs, p_fl, a_fl, w_fl)
        return jnp.mean((recon - ys) ** 2)

    # ------------------------------------------------------------------ updates

    def _update_nef(self, state: TrainState, grads):
        nef_updates, nef_opt_state = self.opts.nef.update(
            grads["nef"], state.nef_opt_state, state.params["nef"]
        )
        nef_params = optax.apply_updates(state.params["nef"], nef_updates)

        lr_updates, meta_opt_state = self.opts.meta_sgd.update(
            grads["meta_sgd_lrs"], state.meta_sgd_opt_state
        )
        meta_lrs = optax.apply_updates(state.params["meta_sgd_lrs"], lr_updates)
        meta_lrs = jax.tree.map(lambda x: jnp.clip(x, 1e-6, 10.0), meta_lrs)
        return nef_params, nef_opt_state, meta_lrs, meta_opt_state

    def _nef_train_step(self, state: TrainState, trajectory):
        loss_key, next_rng = jax.random.split(state.rng)
        loss, grads = jax.value_and_grad(self._nef_loss)(state.params, trajectory, loss_key)
        nef_params, nef_opt_state, meta_lrs, meta_opt_state = self._update_nef(state, grads)

        params = dict(state.params, nef=nef_params, meta_sgd_lrs=meta_lrs)
        autodecoder_opt_state = state.autodecoder_opt_state
        if self.cfg.optimizer.learning_rate_codes != 0:
            ad_updates, autodecoder_opt_state = self.opts.autodecoder.update(
                grads["autodecoder"], state.autodecoder_opt_state
            )
            params["autodecoder"] = optax.apply_updates(state.params["autodecoder"], ad_updates)

        return loss, state.replace(
            params=params,
            nef_opt_state=nef_opt_state,
            meta_sgd_opt_state=meta_opt_state,
            autodecoder_opt_state=autodecoder_opt_state,
            rng=next_rng,
        )

    def _ode_train_step(self, state: TrainState, trajectory):
        loss_key, next_rng = jax.random.split(state.rng)
        if self.ode_decoder is not self.decoder:
            # ode_backend opt-in: differentiate wrt the ode params only. The pure
            # ode phase never applies the nef/meta-lr/autodecoder gradients, yet
            # the full-grad path still backprops them through the K-step inner
            # loop (second-order) — pure waste, and the only thing keeping this
            # step off the fused kernel. Identical loss, identical applied grads.
            # (Gated on the opt-in so default-config runs keep the committed
            # round-3 numerics bit-for-bit while their raw evidence re-records.)
            loss, ode_grads = jax.value_and_grad(
                lambda op: self._ode_loss(dict(state.params, ode=op), trajectory, loss_key)
            )(state.params["ode"])
        else:
            loss, grads = jax.value_and_grad(self._ode_loss)(
                state.params, trajectory, loss_key
            )
            ode_grads = grads["ode"]
        ode_updates, ode_opt_state = self.opts.ode.update(
            ode_grads, state.ode_opt_state, state.params["ode"]
        )
        ode_params = optax.apply_updates(state.params["ode"], ode_updates)
        return loss, state.replace(
            params=dict(state.params, ode=ode_params),
            ode_opt_state=ode_opt_state,
            rng=next_rng,
        )

    def _dual_train_step(self, state: TrainState, trajectory):
        loss_key, next_rng = jax.random.split(state.rng)
        loss, grads = jax.value_and_grad(self._ode_loss)(state.params, trajectory, loss_key)
        nef_params, nef_opt_state, meta_lrs, meta_opt_state = self._update_nef(state, grads)
        ode_updates, ode_opt_state = self.opts.ode.update(
            grads["ode"], state.ode_opt_state, state.params["ode"]
        )
        ode_params = optax.apply_updates(state.params["ode"], ode_updates)
        return loss, state.replace(
            params=dict(state.params, nef=nef_params, meta_sgd_lrs=meta_lrs, ode=ode_params),
            nef_opt_state=nef_opt_state,
            meta_sgd_opt_state=meta_opt_state,
            ode_opt_state=ode_opt_state,
            rng=next_rng,
        )

    # ------------------------------------------------------------------ validation

    def _val_step(self, state: TrainState, trajectory, batch_idx=0, dp: float = 0.0):
        """Fit frame 0, roll out over train + out horizon, decode all coords, MSE split.

        Fully jitted (chunked decode is a lax.map), unlike the reference's Python
        chunk loop (``pde_trainer.py:544-553``). ``batch_idx`` decorrelates the
        inner-loop coordinate masks across validation batches.
        """
        cfg = self.cfg
        T_in = cfg.dataset.traj_len_train
        # Clamp the out-horizon to the frames the dataset actually provides (the
        # reference's NS config requests 50 extrapolation frames from 20-frame data).
        T_total = min(T_in + cfg.dataset.traj_len_out_horizon, trajectory.shape[1])
        trajectory = trajectory[:, :T_total]
        b = trajectory.shape[0]

        loss_key = jax.random.fold_in(state.rng, batch_idx)
        _, fitted = self.inner_loop(
            state.params["nef"],
            state.params["meta_sgd_lrs"],
            state.params["autodecoder"],
            trajectory[:, 0],
            loss_key,
            dp=dp,
        )
        sol = self._rollout(state.params["ode"], latents_to_pose(fitted), T_total)
        p_fl, a_fl, w_fl = jax.tree.map(lambda x: x.reshape(-1, *x.shape[2:]), sol)

        coords = jnp.broadcast_to(
            self.coords[None], (p_fl.shape[0], *self.coords.shape)
        )
        if self.coord_mesh is not None:
            # Coordinate-sharded whole-grid decode: each device decodes its
            # coordinate shard independently (no cross-device reduction — softmax
            # is over latents); per-device memory is bounded by the shard, which
            # is what chunking bounds on one device.
            from jax.sharding import NamedSharding, PartitionSpec

            axis = self.coord_mesh.axis_names[0]
            coords = jax.lax.with_sharding_constraint(
                coords, NamedSharding(self.coord_mesh, PartitionSpec(None, axis, None))
            )
            recon = self.eval_decoder.apply(state.params["nef"], coords, p_fl, a_fl, w_fl)
        else:
            recon = decode_chunked(
                self.eval_decoder.apply,
                state.params["nef"],
                coords,
                p_fl,
                a_fl,
                w_fl,
                chunk_size=cfg.training.max_num_sampled_points,
            )
        recon = recon.reshape(trajectory.shape)
        mse_in = jnp.mean((recon[:, :T_in] - trajectory[:, :T_in]) ** 2)
        if T_total > T_in:
            mse_out = jnp.mean((recon[:, T_in:] - trajectory[:, T_in:]) ** 2)
        else:
            mse_out = jnp.zeros(())
        return mse_in, mse_out

    def fit_latents(self, state: TrainState, frames, rng=None, dp: float = 0.0):
        """Public helper: inner-fit latents to frames. Returns the latent pytree."""
        rng = rng if rng is not None else state.rng
        _, fitted = self.inner_loop(
            state.params["nef"], state.params["meta_sgd_lrs"], state.params["autodecoder"],
            frames, rng, dp=dp,
        )
        return fitted

    def rollout_latents(self, state: TrainState, latents, num_frames: int):
        """Public helper: roll fitted latents forward ``num_frames`` (incl. t0)."""
        return self._rollout(state.params["ode"], latents_to_pose(latents), num_frames)

    # ------------------------------------------------------------------ jit wiring

    def _build_steps(self):
        self.nef_train_step = jax.jit(self._nef_train_step, donate_argnums=(0,))
        self.ode_train_step = jax.jit(self._ode_train_step, donate_argnums=(0,))
        self.dual_train_step = jax.jit(self._dual_train_step, donate_argnums=(0,))
        self.val_step = jax.jit(self._val_step)
        self.val_step_dp = {
            dp: jax.jit(partial(self._val_step, dp=dp)) for dp in (0.05, 0.1, 0.5)
        }

    def fallback_to_xla_eval(self):
        """Swap validation decoding to the XLA path and rebuild the jitted steps.

        Safety valve for Mosaic compile failures on the fused eval kernel (new
        hardware, compiler regressions): the XLA path is numerically equivalent
        (tests/test_pallas.py), so a long run degrades in speed, not in results.
        """
        base = self.decoder
        if base.backend in ("pallas", "pallas_interpret"):
            base = base.clone(backend="xla")
        self.eval_decoder = base
        # The ode-phase decoder runs the same fused kernel — a Mosaic failure in
        # one implies the other; degrade both together.
        if self.ode_decoder.backend in ("pallas", "pallas_interpret"):
            self.ode_decoder = base
        # Drop every cached trace/executable: the failed kernel's program must not
        # be resurrected through jit-dispatch caches keyed on bound-method equality
        # (the ihc64 s0 run retried into the identical failed Mosaic compile).
        jax.clear_caches()
        self._build_steps()

    def phase_window(self, epoch: int) -> Tuple[bool, bool]:
        """(train_nef, train_ode) flags for this epoch (ref ``_base_pde_trainer.py:279-288``)."""
        t = self.cfg.training
        train_nef = t.nef.train_from_epoch < epoch <= t.nef.train_until_epoch
        train_ode = t.ode.train_from_epoch < epoch <= t.ode.train_until_epoch
        return train_nef, train_ode

    def phase_active(self, epoch: int) -> bool:
        """Whether any training phase covers this epoch.

        The reference raises mid-run when its schedule has a hole
        (``_base_pde_trainer.py:290-298`` → ``ValueError("No training step set")``),
        which makes config epochs past the last phase window unreachable dead
        config — e.g. ``config_ihc.yaml`` asks for 2500 epochs but its ode phase
        ends at 2000, so the reference can only ever execute 2000 IHC epochs.
        ``TrainLoop.run`` uses this hook to stop cleanly instead.
        """
        return any(self.phase_window(epoch))

    def select_train_step(self, epoch: int) -> Tuple[Callable, bool, bool]:
        """Phase scheduling by epoch ranges (reference ``_base_pde_trainer.py:281-299``)."""
        train_nef, train_ode = self.phase_window(epoch)
        if train_nef and train_ode:
            return self.dual_train_step, train_nef, train_ode
        if train_nef:
            return self.nef_train_step, train_nef, train_ode
        if train_ode:
            return self.ode_train_step, train_nef, train_ode
        raise ValueError(f"No training phase active at epoch {epoch}.")
