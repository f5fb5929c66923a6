"""High-level fit-then-forecast inference API.

The deployment shape of the framework: given a trained checkpoint, fit latents to an
observed frame (optionally sparse), roll the latent ODE forward, and decode the
forecast at *any* coordinate set — the training grid, a super-resolution grid, or
scattered query points. Decoding runs on the fused Pallas kernel when available and
can be sharded over a device mesh for large coordinate counts.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from enf_pde_tpu.builders import build_models
from enf_pde_tpu.config import Config
from enf_pde_tpu.models.decoder import decode_chunked, embed_pose_angles
from enf_pde_tpu.models.latents import latents_to_pose
from enf_pde_tpu.train.checkpoint import CheckpointManager
from enf_pde_tpu.train.meta_sgd import MetaSGDTrainer

__all__ = ["Forecaster"]


class Forecaster:
    """Fit-then-forecast on a trained meta-SGD model.

    Example:
        fc = Forecaster.from_checkpoint("outputs/navier_stokes")
        forecast = fc.forecast(frame0, num_frames=60)               # training grid
        hi_res = fc.forecast(frame0, num_frames=60, coords=hi_grid) # super-resolution
    """

    def __init__(self, cfg: Config, state, coords: np.ndarray, backend: Optional[str] = None,
                 coord_mesh="auto"):
        if backend is not None:
            cfg = cfg.copy()
            cfg.nef.backend = "xla"  # training/inner-loop path needs autodiff
            cfg.nef.eval_backend = backend
        decoder, ode_model = build_models(cfg)
        # Multi-device: shard the coordinate axis of full-grid decodes over the mesh
        # (coordinate tiles are independent — softmax is over latents). "auto" uses
        # all devices; pass None to force the single-device chunked path.
        if coord_mesh == "auto":
            from enf_pde_tpu.parallel import make_mesh

            coord_mesh = make_mesh() if len(jax.devices()) > 1 else None
        self.trainer = MetaSGDTrainer(
            cfg, decoder, ode_model, coords, seed=cfg.get_path("seed", 0),
            coord_mesh=coord_mesh,
        )
        self.cfg = cfg
        self.state = state
        self._rng = jax.random.PRNGKey(cfg.get_path("seed", 0))
        self._sharded_decode = None
        if coord_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            axis = coord_mesh.axis_names[0]
            xspec = NamedSharding(coord_mesh, PartitionSpec(None, axis, None))
            apply_fn = self.trainer.eval_decoder.apply

            @jax.jit
            def _decode(params, xs, p, a, w):
                xs = jax.lax.with_sharding_constraint(xs, xspec)
                return apply_fn(params, xs, p, a, w)

            self._sharded_decode = _decode

    @classmethod
    def from_checkpoint(
        cls,
        log_dir: str,
        cfg: Config,
        coords: np.ndarray,
        backend: Optional[str] = "pallas",
    ) -> "Forecaster":
        """Restore the latest checkpoint saved by a training run in ``log_dir``."""
        fc = cls(cfg, state=None, coords=coords, backend=backend)
        mgr = CheckpointManager(log_dir)
        fc.state = mgr.restore(fc.trainer.init_state())
        mgr.close()
        return fc

    def fit(self, frames: jnp.ndarray, dp: float = 0.0):
        """Meta-SGD latent fit to observed frames [batch, *spatial, channels].

        ``dp`` restricts the fit to a random dp-fraction of coordinates
        (sparse-observation fitting).
        """
        self._rng, key = jax.random.split(self._rng)
        return self.trainer.fit_latents(self.state, jnp.asarray(frames), rng=key, dp=dp)

    def rollout(self, latents, num_frames: int):
        """Latent-space forecast from a fitted latent pytree.

        Returns (p, a, window) trajectories, each [batch, num_frames, ...].
        """
        return self.trainer.rollout_latents(self.state, latents, num_frames)

    def decode(
        self,
        latent_traj: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
        coords: Optional[np.ndarray] = None,
        chunk_size: Optional[int] = None,
    ) -> jnp.ndarray:
        """Decode latent trajectories at arbitrary coordinates.

        Args:
            latent_traj: (p, a, window), each [batch, T, ...] (from ``rollout``).
            coords: [num_points, coord_dim]; defaults to the training grid.
            chunk_size: coordinate tile per decode step.

        Returns:
            [batch, T, num_points, num_out]
        """
        coords = jnp.asarray(coords) if coords is not None else self.trainer.coords
        chunk = chunk_size or self.cfg.training.max_num_sampled_points
        p, a, w = latent_traj
        b, t = p.shape[0], p.shape[1]
        p_fl, a_fl, w_fl = jax.tree.map(lambda x: x.reshape(-1, *x.shape[2:]), (p, a, w))
        xs = jnp.broadcast_to(coords[None], (b * t, *coords.shape))
        if self._sharded_decode is not None:
            out = self._sharded_decode(self.state.params["nef"], xs, p_fl, a_fl, w_fl)
        else:
            out = decode_chunked(
                self.trainer.eval_decoder.apply, self.state.params["nef"], xs, p_fl, a_fl, w_fl,
                chunk_size=chunk,
            )
        return out.reshape(b, t, coords.shape[0], -1)

    def forecast(
        self,
        frames: jnp.ndarray,
        num_frames: int,
        coords: Optional[np.ndarray] = None,
        dp: float = 0.0,
    ) -> jnp.ndarray:
        """Observed frames -> latent fit -> ODE rollout -> decoded forecast.

        Returns [batch, num_frames, num_points, num_out].
        """
        fitted = self.fit(frames, dp=dp)
        traj = self.rollout(fitted, num_frames)
        return self.decode(traj, coords=coords)
