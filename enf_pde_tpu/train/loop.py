"""Epoch-level training loop: phase scheduling, validation protocol, checkpoints.

Orchestration is plain Python around the jitted step functions; the measurement
protocol (in-t / out-t rollout MSE over val *and* train loaders, dropout variants at
5/10/50%) matches reference ``_base_pde_trainer.py:239-424``.
"""

from __future__ import annotations

import time
from typing import Iterable, Optional

import jax
import numpy as np

from enf_pde_tpu.train.checkpoint import CheckpointManager
from enf_pde_tpu.train.logging import MetricLogger
from enf_pde_tpu.train.meta_sgd import MetaSGDTrainer
from enf_pde_tpu.train.state import TrainState

__all__ = ["TrainLoop"]


class TrainLoop:
    def __init__(
        self,
        trainer: MetaSGDTrainer,
        train_loader: Iterable,
        val_loader: Iterable,
        logger: Optional[MetricLogger] = None,
        checkpoints: Optional[CheckpointManager] = None,
        shard_batch=None,
    ):
        self.trainer = trainer
        self.cfg = trainer.cfg
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.logger = logger or MetricLogger(self.cfg.get_path("logging.log_dir", "outputs/run"))
        self.checkpoints = checkpoints
        self.shard_batch = shard_batch or (lambda x: x)
        self.global_step = 0
        self._equivariance_checked = False

    def _batch_traj(self, batch):
        traj = batch[0] if isinstance(batch, (tuple, list)) else batch
        if isinstance(traj, jax.Array):
            return traj  # device-cached batch (loader.enable_device_cache)
        return self.shard_batch(np.asarray(traj))

    def train_epoch(self, state: TrainState, epoch: int) -> TrainState:
        step_fn, train_nef, train_ode = self.trainer.select_train_step(epoch)
        # Async-dispatch loop: losses accumulate ON DEVICE and the host never blocks
        # inside the epoch, so step N+1's host work (batch sampling, transfer) and
        # dispatch overlap step N's compute. One blocking fetch per epoch. On the
        # remote-dispatch TPU platform a per-step float(loss) costs a full round
        # trip per step (~30 ms serialized into every step's wall time).
        loss_ep, n = None, 0
        epoch_t0 = time.perf_counter()
        sample_loss = None
        for batch in self.train_loader:
            loss, state = step_fn(state, self._batch_traj(batch))
            loss_ep = loss if loss_ep is None else loss_ep + loss
            if self.global_step % self.cfg.logging.log_every_n_steps == 0:
                sample_loss, sample_step = loss, self.global_step
            n += 1
            self.global_step += 1
        mean_loss = float(loss_ep) / max(n, 1) if loss_ep is not None else 0.0
        epoch_s = time.perf_counter() - epoch_t0
        if sample_loss is not None:
            metrics = {"mse_step": float(sample_loss)}
            if n and epoch_s:
                metrics["step_time_s"] = round(epoch_s / n, 4)
                metrics["steps_per_sec"] = round(n / epoch_s, 3)
            self.logger.log(metrics, step=sample_step)
        self.logger.log(
            {
                "epoch": epoch,
                "train_mse_epoch": mean_loss,
                "phase": ("nef+ode" if train_nef and train_ode else "nef" if train_nef else "ode"),
            },
            step=self.global_step,
            echo=True,
        )
        return state

    def _eval_loader(self, state, loader, step_fn, seed_offset: int = 0):
        # Device-side accumulation (see train_epoch): one blocking fetch per loader
        # pass instead of two per batch.
        mse_in, mse_out, n = None, None, 0
        for batch in loader:
            # batch index + epoch offset decorrelate inner-loop coordinate masks
            # across batches *and* across validation epochs (state.rng only advances
            # with train steps). Traced int arg -> no recompilation per epoch.
            a, b = step_fn(state, self._batch_traj(batch), seed_offset + n)
            mse_in = a if mse_in is None else mse_in + a
            mse_out = b if mse_out is None else mse_out + b
            n += 1
        if n == 0:
            return 0.0, 0.0
        return float(mse_in) / n, float(mse_out) / n

    def validate_epoch(self, state: TrainState, epoch: int):
        off = epoch << 20
        v_in, v_out = self._eval_loader(state, self.val_loader, self.trainer.val_step, off)
        t_in, t_out = self._eval_loader(state, self.train_loader, self.trainer.val_step, off)
        self.logger.log(
            {
                "epoch": epoch,
                "val_mse_in_t": v_in,
                "val_mse_out_t": v_out,
                "train_mse_in_t": t_in,
                "train_mse_out_t": t_out,
            },
            step=self.global_step,
            echo=True,
        )
        if not self._equivariance_checked and epoch > self.cfg.get_path(
            "test.test_equiv_at_epoch", 10**9
        ):
            self._log_equivariance(state, epoch)
            self._equivariance_checked = True

    def _log_equivariance(self, state: TrainState, epoch: int):
        """Numeric analogue of the reference's visual equivariance sanity check.

        Dispatches on the trained geometry: plane/torus (translation + rotation),
        S^2 (longitude / full SO(3)), B^3 (longitude / Euler-recomposed SO(3)).
        Logs nothing for the non-equivariant ``abs_pos`` ablation.
        """
        import jax.numpy as jnp

        from enf_pde_tpu.models.latents import latents_to_pose
        from enf_pde_tpu.utils.equivariance import equivariance_errors

        batch = next(iter(self.val_loader))
        frames = self._batch_traj(batch)[:, 0]
        fitted = self.trainer.fit_latents(state, jnp.asarray(frames))
        p, a, w = latents_to_pose(fitted)
        n = min(512, self.trainer.coords.shape[0])
        coords = jnp.broadcast_to(
            self.trainer.coords[None, :n], (p.shape[0], n, self.trainer.coords.shape[-1])
        )
        errs = equivariance_errors(
            self.trainer.decoder.apply,
            state.params["nef"],
            coords,
            p,
            a,
            w,
            invariant=self.trainer.decoder.cross_attn_invariant,
            coordinate_system=self.trainer.coordinate_system,
        )
        if not errs:
            return
        self.logger.log(
            {"epoch": epoch, **{f"equivariance_err_{k}": v for k, v in errs.items()}},
            step=self.global_step,
            echo=True,
        )

    def visualize_epoch(self, state: TrainState, epoch: int):
        """Rollout figure: fit frame 0, roll out, decode, plot GT/pred/error panels.

        Parity with the reference's wandb figure logging during training
        (``_base_pde_trainer.py:574-729``), dispatched on the coordinate system.
        """
        import os

        import jax.numpy as jnp

        from enf_pde_tpu.models.decoder import decode_chunked
        from enf_pde_tpu.utils import visualization as viz

        cfg = self.cfg
        batch = next(iter(self.val_loader))
        traj = np.asarray(self._batch_traj(batch))
        t_total = min(
            cfg.dataset.traj_len_train + cfg.dataset.traj_len_out_horizon, traj.shape[1]
        )
        traj = traj[:1, :t_total]

        fitted = self.trainer.fit_latents(state, jnp.asarray(traj[:, 0]))
        sol = self.trainer.rollout_latents(state, fitted, t_total)
        p_fl, a_fl, w_fl = jax.tree.map(lambda x: x.reshape(-1, *x.shape[2:]), sol)
        coords = self.trainer.coords
        xs = jnp.broadcast_to(coords[None], (p_fl.shape[0], *coords.shape))
        recon = decode_chunked(
            self.trainer.eval_decoder.apply,
            state.params["nef"],
            xs,
            p_fl,
            a_fl,
            w_fl,
            chunk_size=cfg.training.max_num_sampled_points,
        )
        pred = np.asarray(recon).reshape(traj.shape)

        out_path = os.path.join(self.logger.log_dir, "figures", f"rollout_epoch{epoch:05d}.png")
        cs = self.trainer.coordinate_system
        if cs == "cartesian":
            viz.plot_planar_rollout(traj[0], pred[0], out_path, p_traj=np.asarray(sol[0][0]))
        elif cs == "polar":
            viz.plot_sphere_rollout(traj[0], pred[0], out_path)
        else:
            viz.plot_ball_rollout(traj[0], pred[0], out_path)
        self.logger.log_image("rollout_figure", out_path, step=self.global_step)
        return out_path

    def validate_epoch_dp(self, state: TrainState, epoch: int):
        metrics = {"epoch": epoch}
        off = epoch << 20
        for dp, fn in self.trainer.val_step_dp.items():
            tag = f"dp{int(dp * 100)}"
            v_in, v_out = self._eval_loader(state, self.val_loader, fn, off)
            t_in, t_out = self._eval_loader(state, self.train_loader, fn, off)
            metrics.update(
                {
                    f"val_mse_in_t_{tag}": v_in,
                    f"val_mse_out_t_{tag}": v_out,
                    f"train_mse_in_t_{tag}": t_in,
                    f"train_mse_out_t_{tag}": t_out,
                }
            )
        self.logger.log(metrics, step=self.global_step, echo=True)

    def _check_resumed_config(self, epoch: int):
        """Compare the config saved in the checkpoint against the live one.

        The reference restores the stored JSON config alongside the state
        (``_base_pde_trainer.py:203-237``); here the model is already built, so a
        divergence is surfaced loudly instead of silently trusting the caller.
        Logging paths may legitimately differ between runs.
        """
        try:
            saved = self.checkpoints.restore_config(epoch)
        except Exception:
            return
        import json

        # JSON-roundtrip the live config so tuples/lists and numeric types compare
        # identically to the JSON-restored checkpoint copy.
        live = json.loads(json.dumps(self.cfg.to_dict()))

        def flat(d, prefix=""):
            for k, v in sorted(d.items()):
                key = f"{prefix}{k}"
                if isinstance(v, dict):
                    yield from flat(v, key + ".")
                else:
                    yield key, v

        saved_flat = dict(flat(saved))
        diffs = {
            k: (saved_flat.get(k), v)
            for k, v in flat(live)
            if not k.startswith("logging.") and saved_flat.get(k) != v
        }
        if diffs:
            print(f"[loop] WARNING: resumed config differs from checkpoint: {diffs}")

    def _eval_guarded(self, fn, *args):
        """Run a validation entry point; on a fused-kernel failure, fall back to XLA.

        The Pallas eval kernel compiles lazily at the first validation. If Mosaic
        rejects it (new hardware, compiler regression), a multi-hour training run
        must not die at its first validation epoch — swap the eval decoder to the
        numerically-equivalent XLA path, rebuild the jitted steps, and retry once.
        """
        trainer = self.trainer
        eval_backend = getattr(trainer, "eval_decoder", trainer.decoder).backend
        if eval_backend not in ("pallas", "pallas_interpret") or not hasattr(
            trainer, "fallback_to_xla_eval"
        ):
            return fn(*args)
        try:
            return fn(*args)
        except Exception as e:
            print(f"[loop] pallas eval backend failed ({e!r}); retrying with xla")
            trainer.fallback_to_xla_eval()
            self.logger.log({"eval_backend": "xla_fallback"}, step=self.global_step)
            return fn(*args)

    def run(self, num_epochs: int, state: Optional[TrainState] = None) -> TrainState:
        if state is None:
            state = self.trainer.init_state()
        start_epoch = 1
        if self.checkpoints is not None and self.cfg.get_path("logging.resume", False):
            latest = self.checkpoints.latest_epoch()
            if latest is not None:
                state = self.checkpoints.restore(state)
                start_epoch = latest + 1
                self._check_resumed_config(latest)
                print(f"[loop] resumed from epoch {latest}")

        t_start = time.time()
        self.logger.log(
            {
                "train_backend": self.trainer.decoder.backend,
                "eval_backend": getattr(
                    self.trainer, "eval_decoder", self.trainer.decoder
                ).backend,
                "ode_backend": getattr(
                    self.trainer, "ode_decoder", self.trainer.decoder
                ).backend,
            },
            step=self.global_step,
            echo=True,
        )
        viz_every = self.cfg.get_path("logging.visualize_every_n_epochs", 0)
        for epoch in range(start_epoch, num_epochs + 1):
            if hasattr(self.trainer, "phase_active") and not self.trainer.phase_active(
                epoch
            ):
                # Schedule exhausted: the reference raises here mid-run
                # (_base_pde_trainer.py:290-298), so any epochs it configures past
                # the last phase window (config_ihc.yaml: num_epochs=2500 vs
                # ode.train_until_epoch=2000) are unreachable. Stop cleanly after
                # the last covered epoch instead of dying at it.
                print(
                    f"[loop] no training phase covers epoch {epoch} "
                    f"(num_epochs={num_epochs}); schedule exhausted — stopping."
                )
                self.logger.log(
                    {"schedule_exhausted_at_epoch": epoch}, step=self.global_step
                )
                if epoch > start_epoch and (epoch - 1) % self.cfg.test.test_interval:
                    self._eval_guarded(self.validate_epoch, state, epoch - 1)
                break
            try:
                state = self.train_epoch(state, epoch)
            except Exception as e:
                # Same Mosaic-failure safety valve as _eval_guarded, for the
                # ode/dual-phase fused decode (nef.ode_backend: pallas). The
                # kernel fails at its first compile — i.e. on the phase's first
                # step, before any state buffer was donated — so retrying the
                # epoch on the XLA path is safe.
                ode_backend = getattr(
                    self.trainer, "ode_decoder", self.trainer.decoder
                ).backend
                if ode_backend not in ("pallas", "pallas_interpret") or not hasattr(
                    self.trainer, "fallback_to_xla_eval"
                ):
                    raise
                print(f"[loop] pallas ode backend failed ({e!r}); retrying epoch with xla")
                self.trainer.fallback_to_xla_eval()
                self.logger.log({"ode_backend": "xla_fallback"}, step=self.global_step)
                state = self.train_epoch(state, epoch)
            if self.checkpoints is not None:
                self.checkpoints.save(epoch, state, self.cfg.to_dict())
            if epoch % self.cfg.test.test_interval == 0:
                self._eval_guarded(self.validate_epoch, state, epoch)
            if epoch % self.cfg.test.test_dp_interval == 0:
                self._eval_guarded(self.validate_epoch_dp, state, epoch)
            if viz_every and epoch % viz_every == 0:
                try:
                    self.visualize_epoch(state, epoch)
                except Exception as e:  # figures must never kill a training run
                    print(f"[loop] visualization failed: {e!r}")
        self.logger.log({"train_wall_s": time.time() - t_start}, step=self.global_step)
        if self.checkpoints is not None:
            self.checkpoints.wait()
        return state
