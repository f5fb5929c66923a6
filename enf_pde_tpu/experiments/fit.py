"""Unified experiment entry point: ``python -m enf_pde_tpu.experiments.fit <config> [k=v ...]``.

Replaces the reference's per-experiment ``fit_*.py`` scripts with one CLI:

    python -m enf_pde_tpu.experiments.fit navier_stokes
    python -m enf_pde_tpu.experiments.fit navier_stokes nef.invariant_type=abs_pos seed=1
    python -m enf_pde_tpu.experiments.fit shallow_water            # + super-res eval
    python -m enf_pde_tpu.experiments.fit navier_stokes_nonmaml    # autodecoding

Like the reference entry points, input/output dimensionality and the coordinate grid
are derived from a probe batch. The shallow-water run performs the zero-shot
super-resolution evaluation on the full-resolution grid after training
(reference ``fit_shallow_water.py:63-90``).
"""

from __future__ import annotations

import os
import sys

import jax
import numpy as np

from enf_pde_tpu.builders import build_models
from enf_pde_tpu.config import Config, load_experiment_config
from enf_pde_tpu.data import get_dataloader
from enf_pde_tpu.parallel import make_mesh, shard_batch
from enf_pde_tpu.train.autodecode import AutodecodingTrainer
from enf_pde_tpu.train.checkpoint import CheckpointManager
from enf_pde_tpu.train.logging import MetricLogger
from enf_pde_tpu.train.loop import TrainLoop
from enf_pde_tpu.train.meta_sgd import MetaSGDTrainer

__all__ = ["run_experiment", "prepare"]


def prepare(cfg: Config):
    """Build loaders, coords, and models; fill in data-derived config fields."""
    train_loader, test_loader = get_dataloader(cfg.dataset)
    # Generate any missing trajectories now, before the accelerator runtime spins up
    # its thread pools (mid-training generation subprocesses can hit fork deadlocks).
    for ldr in (train_loader, test_loader):
        if hasattr(ldr, "ensure_all"):
            ldr.ensure_all()
    probe = next(iter(train_loader))
    frame = probe[0][0]
    cfg.dataset.image_shape = list(frame.shape)
    coords = train_loader.coords
    cfg.nef.num_in = int(coords.shape[-1])
    cfg.nef.num_out = int(frame.shape[-1])
    decoder, ode_model = build_models(cfg)
    return train_loader, test_loader, coords, decoder, ode_model


def run_experiment(cfg: Config):
    train_loader, test_loader, coords, decoder, ode_model = prepare(cfg)
    logger = MetricLogger(
        cfg.logging.log_dir,
        use_wandb=cfg.get_path("logging.use_wandb", False),
        wandb_kwargs={"project": cfg.get_path("proj_name", "enf-pde-tpu"), "config": cfg.to_dict()},
    )
    ckpt = (
        CheckpointManager(
            cfg.logging.log_dir,
            every_n_epochs=cfg.logging.checkpoint_every_n_epochs,
            keep_n=cfg.logging.keep_n_checkpoints,
        )
        if cfg.logging.checkpoint
        else None
    )

    mesh = make_mesh() if len(jax.devices()) > 1 else None
    shard = (lambda b: shard_batch(b, mesh)) if mesh is not None else None

    # Single-device: keep the (static) trajectory set resident on the accelerator
    # so epochs re-transfer nothing over the remote-dispatch tunnel. Multi-device
    # keeps the host path — batches are sharded across the mesh by shard_batch.
    if mesh is None and cfg.get_path("dataset.device_cache", True):
        for ldr in (train_loader, test_loader):
            if hasattr(ldr, "enable_device_cache"):
                ldr.enable_device_cache()

    if cfg.get_path("meta.meta_sgd", True):
        trainer = MetaSGDTrainer(cfg, decoder, ode_model, coords, seed=cfg.seed)
        loop = TrainLoop(trainer, train_loader, test_loader, logger, ckpt, shard_batch=shard)
        state = loop.run(cfg.training.num_epochs)

        if cfg.dataset.name == "shallow_water_low_res":
            _super_resolution_eval(cfg, state, decoder, ode_model, logger)
        return state

    return _run_autodecoding(cfg, decoder, ode_model, coords, train_loader, test_loader, logger)


def _super_resolution_eval(cfg, state, decoder, ode_model, logger):
    """Zero-shot super-resolution: validate the half-res-trained model at full res."""
    hi_cfg = cfg.copy()
    hi_cfg.dataset.name = "shallow_water"
    hi_train, hi_test = get_dataloader(hi_cfg.dataset)
    # Full-res decode is coordinate-dominated (the batch alone can't fill a mesh):
    # shard the coordinate axis across all devices (reference analogue:
    # fit_shallow_water.py:63-90 evaluates single-device).
    mesh = make_mesh() if len(jax.devices()) > 1 else None
    hi_trainer = MetaSGDTrainer(
        hi_cfg, decoder, ode_model, hi_train.coords, seed=cfg.seed, coord_mesh=mesh
    )
    mse_in, mse_out, n = 0.0, 0.0, 0
    for batch in hi_test:
        try:
            a, b = hi_trainer.val_step(state, np.asarray(batch[0]), n)
        except Exception as e:
            # The hi-res grid compiles a fresh fused-kernel shape after hours of
            # training; never lose the run's super-res result to a Mosaic failure.
            if hi_trainer.eval_decoder.backend != "pallas":
                raise
            print(f"[superres] pallas eval failed ({e!r}); retrying with xla")
            hi_trainer.fallback_to_xla_eval()
            a, b = hi_trainer.val_step(state, np.asarray(batch[0]), n)
        mse_in += float(a)
        mse_out += float(b)
        n += 1
    logger.log(
        {"superres_mse_in_t": mse_in / max(n, 1), "superres_mse_out_t": mse_out / max(n, 1)},
        echo=True,
    )


def _run_autodecoding(cfg, decoder, ode_model, coords, train_loader, test_loader, logger):
    """Non-meta training loop (reference ``nonmaml_pde_trainer.py`` semantics)."""
    import jax.numpy as jnp

    trainer = AutodecodingTrainer(cfg, decoder, ode_model, coords, seed=cfg.seed)
    logger.log(
        {"train_backend": decoder.backend, "eval_backend": trainer.eval_decoder.backend},
        echo=True,
    )
    state = trainer.init_state()
    t = cfg.training
    global_step = 0
    for epoch in range(1, cfg.training.num_epochs + 1):
        train_nef = t.nef.train_from_epoch < epoch <= t.nef.train_until_epoch
        train_ode = t.ode.train_from_epoch < epoch <= t.ode.train_until_epoch
        # Async-dispatch epoch (see train/loop.py): accumulate on device, fetch once
        # per epoch — a per-step float(loss) costs a device round trip per step.
        loss_ep, n = None, 0
        sample_loss = sample_step = None
        for traj, _, idx in train_loader:
            traj, idx = jnp.asarray(traj), jnp.asarray(idx)
            if train_nef:
                loss, state = trainer.nef_train_step(state, traj, idx)
            elif train_ode:
                loss, state = trainer.ode_train_step(state, traj, idx)
            else:
                continue
            loss_ep = loss if loss_ep is None else loss_ep + loss
            n += 1
            if global_step % cfg.logging.log_every_n_steps == 0:
                sample_loss, sample_step = loss, global_step
            global_step += 1
        if sample_loss is not None:
            logger.log({"mse_step": float(sample_loss)}, step=sample_step)
        mean_loss = float(loss_ep) / max(n, 1) if loss_ep is not None else 0.0
        logger.log({"epoch": epoch, "train_mse_epoch": mean_loss}, echo=True)

        if epoch % cfg.test.test_interval == 0:
            _autodecode_validation(cfg, trainer, state, train_loader, test_loader, logger, epoch)
    if cfg.training.num_epochs % cfg.test.test_interval != 0:
        # Final validation, unless the loop's last epoch just ran one.
        _autodecode_validation(cfg, trainer, state, train_loader, test_loader, logger, "final")
    return state


def _autodecode_validation(cfg, trainer, state, train_loader, test_loader, logger, epoch):
    """Re-fit fresh latents per dropout rate on BOTH splits, then measure rollout MSE.

    Mirrors reference ``nonmaml_pde_trainer.py:399-548``: stored-code train metrics
    (``train_mse_*_sc``), then for each dropout rate a from-scratch latent re-fit on
    the val split and on the train split.
    """
    import jax.numpy as jnp

    def _rollout_mse(st, loader):
        mse_in, mse_out, n = 0.0, 0.0, 0
        for traj, _, idx in loader:
            try:
                a, b = trainer.val_step(st, jnp.asarray(traj), jnp.asarray(idx))
            except Exception as e:
                if trainer.eval_decoder.backend != "pallas":
                    raise
                print(f"[autodecode] pallas eval failed ({e!r}); retrying with xla")
                trainer.fallback_to_xla_eval()
                a, b = trainer.val_step(st, jnp.asarray(traj), jnp.asarray(idx))
            mse_in += float(a)
            mse_out += float(b)
            n += 1
        return mse_in / max(n, 1), mse_out / max(n, 1)

    metrics = {"epoch": epoch} if isinstance(epoch, int) else {}
    # Stored-code train metrics (reference logs these as `train_mse_*_sc`).
    sc_in, sc_out = _rollout_mse(state, train_loader)
    metrics["train_mse_in_t_sc"] = sc_in
    metrics["train_mse_out_t_sc"] = sc_out

    refit_epochs = min(cfg.training.nef.train_until_epoch, cfg.get_path("test.refit_epochs", 100))
    # The train-split re-fit doubles the (already refit-dominated) validation cost;
    # by default it runs only at the final validation. ``test.refit_train_split``
    # forces it on (every validation) or off entirely.
    is_final = not isinstance(epoch, int) or epoch == cfg.training.num_epochs
    refit_train = cfg.get_path("test.refit_train_split", is_final)
    for dp in (0.0, 0.05, 0.1, 0.5):
        tag = "" if dp == 0 else f"_dp{dp}"
        val_state = trainer.refit_latents(state, test_loader, num_epochs=refit_epochs, dp=dp)
        v_in, v_out = _rollout_mse(val_state, test_loader)
        metrics[f"val_mse_in_t{tag}"] = v_in
        metrics[f"val_mse_out_t{tag}"] = v_out
        if refit_train:
            tr_state = trainer.refit_latents(state, train_loader, num_epochs=refit_epochs, dp=dp)
            t_in, t_out = _rollout_mse(tr_state, train_loader)
            metrics[f"train_mse_in_t{tag}"] = t_in
            metrics[f"train_mse_out_t{tag}"] = t_out
    logger.log(metrics, echo=True)


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(1)
    name, overrides = sys.argv[1], sys.argv[2:]
    cfg = load_experiment_config(name, overrides)
    os.makedirs(cfg.logging.log_dir, exist_ok=True)
    run_experiment(cfg)


if __name__ == "__main__":
    main()
