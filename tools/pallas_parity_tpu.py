"""On-hardware parity spot check: fused Pallas decode vs the XLA decode path.

Builds the NS-config decoder, decodes a full 64^2 field from random latents with
``backend='xla'`` and ``backend='pallas'`` on the real TPU, and reports the max
absolute difference and the relative L2 error. The kernel computes in bf16 with f32
accumulation — the XLA path on TPU also runs bf16 matmuls by default — so agreement
is expected at bf16 resolution (~1e-2 max-abs on O(1) outputs, relative L2 ~1e-3).

Run: ``python tools/pallas_parity_tpu.py [dataset_config ...]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from enf_pde_tpu.builders import build_models, coordinate_system_for
from enf_pde_tpu.config import load_experiment_config
from enf_pde_tpu.data import planar_coords
from enf_pde_tpu.models.latents import init_latents, latents_to_pose, tile_latents


def check(config_name: str) -> float:
    cfg = load_experiment_config(config_name, [])
    cfg.nef.num_in = 2
    cfg.nef.num_out = 1
    cfg.nef.backend = "xla"
    dec_xla, _ = build_models(cfg)
    cfg.nef.backend = "pallas"
    dec_pal, _ = build_models(cfg)

    coords = jnp.asarray(planar_coords(64, 64))
    n_frames = 16
    cs = coordinate_system_for(cfg.dataset.name)
    lat = tile_latents(
        init_latents(1, cfg.nef.num_latents, cfg.nef.latent_dim, 2, 0, cs), n_frames
    )
    p, a, window = latents_to_pose(lat)
    key = jax.random.PRNGKey(0)
    p = p + 0.1 * jax.random.normal(key, p.shape)
    a = a + 0.5 * jax.random.normal(key, a.shape)
    x = jnp.broadcast_to(coords[None], (n_frames, coords.shape[0], 2))

    params = dec_xla.init(jax.random.PRNGKey(1), x[:, :64], p, a, window)
    y_xla = np.asarray(jax.jit(dec_xla.apply)(params, x, p, a, window))
    y_pal = np.asarray(jax.jit(dec_pal.apply)(params, x, p, a, window))

    # f32 oracle: the XLA path with matmuls pinned to highest precision. Both
    # production paths run bf16 matmuls; what matters is that the kernel is no
    # farther from the f32 truth than the XLA path it replaces.
    @jax.jit
    def oracle(params, x, p, a, window):
        with jax.default_matmul_precision("highest"):
            return dec_xla.apply(params, x, p, a, window)

    y_f32 = np.asarray(oracle(params, x, p, a, window))

    rel = lambda y: float(np.linalg.norm(y - y_f32) / (np.linalg.norm(y_f32) + 1e-12))
    cross = float(np.linalg.norm(y_xla - y_pal) / (np.linalg.norm(y_f32) + 1e-12))
    r_xla, r_pal = rel(y_xla), rel(y_pal)
    print(
        f"[{config_name}] rel L2 vs f32 oracle: xla(bf16)={r_xla:.3e} "
        f"pallas={r_pal:.3e}  cross={cross:.3e}  (field max {np.abs(y_f32).max():.3e})"
    )
    # The kernel must not be materially less accurate than the bf16 XLA path.
    return r_pal / max(r_xla, 1e-12)


if __name__ == "__main__":
    names = sys.argv[1:] or ["navier_stokes"]
    worst = max(check(n) for n in names)
    ok = worst < 2.0  # kernel error no more than 2x the bf16 XLA path's own error
    print(f"PARITY {'OK' if ok else 'FAIL'} (worst pallas/xla error ratio {worst:.2f})")
    sys.exit(0 if ok else 1)
