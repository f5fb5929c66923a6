"""Construction of decoder + latent-ODE models from an experiment config.

Single construction point, mirroring reference ``experiments/fitting/__init__.py``
(``get_model_pde``).
"""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from enf_pde_tpu.dynamics.mlp_ode import MLPLatentODE
from enf_pde_tpu.dynamics.ponita import PonitaLatentODE
from enf_pde_tpu.geometry.invariants import get_ca_invariant, get_sa_invariant
from enf_pde_tpu.models.decoder import EnfDecoder

__all__ = ["build_models", "coordinate_system_for"]

_POLAR_DATASETS = ("diff_sphere", "shallow_water", "shallow_water_low_res")


def coordinate_system_for(dataset_name: str) -> str:
    """Latent coordinate system per dataset (reference ``pde_trainer.py:25-30``)."""
    if dataset_name in _POLAR_DATASETS:
        return "polar"
    if dataset_name == "ihc":
        return "ball"
    return "cartesian"


def build_models(cfg) -> Tuple[EnfDecoder, nn.Module]:
    """Build the ENF decoder and the latent ODE model from a config.

    Returns:
        (decoder, ode_model). The geometry invariants are available as
        ``decoder.cross_attn_invariant`` / ``decoder.self_attn_invariant``.
    """
    sa_invariant = get_sa_invariant(cfg.nef)
    ca_invariant = get_ca_invariant(cfg.nef)

    decoder = EnfDecoder(
        num_hidden=cfg.nef.num_hidden,
        num_heads=cfg.nef.num_heads,
        num_layers=cfg.nef.num_layers,
        num_out=cfg.nef.num_out,
        latent_dim=cfg.nef.latent_dim,
        cross_attn_invariant=ca_invariant,
        self_attn_invariant=sa_invariant,
        embedding_type=cfg.nef.embedding_type,
        embedding_freq_multiplier=(
            cfg.nef.embedding_freq_multiplier_invariant,
            cfg.nef.embedding_freq_multiplier_value,
        ),
        condition_value_transform=cfg.nef.condition_value_transform,
        use_gaussian_window=cfg.nef.use_gaussian_window,
        backend=cfg.nef.get("backend", "xla"),
    )

    if cfg.node.name == "mlp":
        ode_model = MLPLatentODE(
            num_hidden=cfg.node.num_hidden,
            num_layers=cfg.node.num_layers,
            scalar_num_out=cfg.nef.latent_dim,
            vec_num_out=1,
        )
    elif cfg.node.name == "ponita":
        ode_model = PonitaLatentODE(
            num_hidden=cfg.node.num_hidden,
            num_layers=cfg.node.num_layers,
            scalar_num_out=cfg.nef.latent_dim,
            vec_num_out=1,
            invariant=sa_invariant,
            basis_dim=cfg.node.basis_dim,
            degree=cfg.node.degree,
            widening_factor=cfg.node.widening_factor,
            kernel_size=cfg.node.kernel_size,
            global_pool=False,
        )
    else:
        raise ValueError(f"Unknown ODE model: {cfg.node.name!r}")

    return decoder, ode_model
