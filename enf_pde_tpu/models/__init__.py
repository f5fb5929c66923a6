from enf_pde_tpu.models.decoder import EnfDecoder, CrossAttentionBlock, decode_chunked, embed_pose_angles
from enf_pde_tpu.models.latents import (
    init_latents,
    latents_to_pose,
    gather_latents,
    tile_latents,
    LatentParams,
)
from enf_pde_tpu.models.transformer import EquivariantTransformer

__all__ = [
    "EnfDecoder",
    "CrossAttentionBlock",
    "decode_chunked",
    "embed_pose_angles",
    "init_latents",
    "latents_to_pose",
    "gather_latents",
    "tile_latents",
    "LatentParams",
    "EquivariantTransformer",
]
