from enf_pde_tpu.ops.attention import EquivariantCrossAttention, PointwiseFFN
from enf_pde_tpu.ops.embeddings import (
    RFFNet,
    FFNEmbedding,
    PolynomialEmbedding,
    polynomial_features,
    get_embedding,
)

__all__ = [
    "EquivariantCrossAttention",
    "PointwiseFFN",
    "RFFNet",
    "FFNEmbedding",
    "PolynomialEmbedding",
    "polynomial_features",
    "get_embedding",
]
