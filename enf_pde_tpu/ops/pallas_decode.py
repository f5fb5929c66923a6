"""Fused Pallas TPU kernel for the ENF decode cross-attention, with a custom VJP.

The reference decode materializes a ``[batch, coords, latents, heads, head_dim]``
FiLM-conditioned value tensor in HBM (``equivariant_cross_attention.py:97-144``) — the
dominant memory traffic of the whole model. This kernel fuses, per coordinate tile,
entirely in VMEM:

    invariant embedding (RFF -> ReLU MLP) -> query projection
    -> logits + window bias -> softmax over latents
    -> FiLM value conditioning (second RFF MLP -> gamma/beta -> per-head mixer MLP)
    -> attention-weighted sum [-> out-projection -> block FFN -> 3-layer MLP head]

Design notes (TPU; measured on v5e):

- **The latent axis is folded into the matmul M dimension.** All dense chains run on
  ``[Z*TILE_C, width]`` operands — one large MXU matmul per layer instead of Z small
  ones, so the systolic array reaches steady state (Z is 4-25 in all experiments).
- **Linear chains and the FiLM conditioning are algebraically pre-folded** (round 3).
  Adjacent dense pairs with no nonlinearity between them (RFF-MLP dense 2 -> q
  projection; RFF-MLP dense 2 -> FiLM FFN dense 1) are pre-multiplied in XLA. More
  importantly, the FiLM gamma/beta projection, the ``[Z*T, H*D]`` elementwise
  ``v*(1+gamma)+beta`` (round 2's measured bottleneck), and the mixer's first dense
  collapse into ONE per-latent matmul ``t @ G_z + c_z`` with
  ``G_z = Wg diag(v_z) m_w1 + Wb m_w1`` built per decode call in XLA
  (``_fold_weights``) — removing ~1/4 of executed kernel FLOPs and the worst VPU
  traffic while computing the same function. Every LayerNorm's scale/bias is
  likewise folded into the matmul that consumes it, and activations are stored at
  the compute dtype between matmuls. **Measured outcome (v5e): all of this is
  wall-time neutral** — ablation profiling shows the op is bound by its ~18
  narrow-matmul (K,N <= 256) skeleton with serialized VPU interludes, not by the
  folded FLOPs (normalize-LN 8%, sincos 5%, gelu 1.5%, softmax 0%; HBM ~1% of
  bandwidth). The folds are kept: same function, less VMEM, wider tiles fit.
- **Transcendentals are polynomial.** Phase-ablation timing (tools/kernel_profile.py)
  showed the libm-grade VPU sine eating 39% of kernel time; the RFF sin/cos pair now
  uses an exact round-based range reduction + short polynomials (~1e-5 abs error,
  far below bf16 matmul resolution), and softmax statistics run on narrow per-head
  logits re-expanded over lanes by a tiny MXU matmul. Measured NS-config decode:
  24.4 M points/s/chip, ~31% analytic-model-FLOPs utilization on v5e (the remainder
  is FiLM elementwise traffic and layout changes, not MXU or transcendentals).
- **bf16 operands, f32 accumulation** (``compute_dtype``): every wide matmul casts its
  operands to bf16 (matching the trainers' default TPU matmul precision) and
  accumulates in f32. The RFF phase projection, softmax, and bias adds stay f32.
- **Geometry stays in XLA.** An earlier revision computed invariants inside the
  kernel; geometry is tiny-lane elementwise work (2-8 useful lanes of 128) and
  measured 2.3x slower in-kernel than letting XLA stream the invariant tensor from
  HBM (tens of MB, irrelevant next to compute time). The kernel consumes invariants
  latent-major (``bzci``) so the transpose fuses into the XLA producer.
- **Custom VJP**: the backward pass is a second Pallas kernel that rematerializes the
  tile forward and applies ``jax.vjp`` *inside* the kernel, accumulating key/value /
  weight gradients across coordinate tiles in VMEM and writing invariant/window
  cotangents per tile. Both kernels are wrapped in ``custom_jvp`` shields whose
  tangent rules run the XLA composition of the same math, so second-order autodiff —
  the meta-SGD outer gradient through the inner loop — works end to end (first-order
  stays fully Pallas; only the grad-of-grad terms fall back to XLA).

- **The query side collapses into per-latent logit matrices** (round 3). The folded
  q projection, the ``q.k`` contraction with the latent key, the softmax scale, and
  the per-head sum are pre-contracted in XLA into A [b, z, hid, H] / ab [b, z, H]
  (``_fold_weights``), so the kernel computes per-head logits as Z narrow
  ``[T,hid]@[hid,H]`` matmuls straight from the query RFF hidden — ~4x less
  effective MXU work than the ``[Z*T,hid]@[hid,H*D]`` projection + elementwise
  ``q*k`` + head-sum matmul it replaces. The softmax weights are broadcast back
  over head lanes by one tiny ones-matrix matmul (``_headexpand``).

Weight pytree layout is produced by ``extract_attention_weights`` /
``extract_tail_weights`` from the flax params of ``ops.attention`` modules (requires
``embedding_type='rff'``, ``condition_value_transform=True``,
``condition_invariant_embedding=False``).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_enf_decode",
    "extract_attention_weights",
    "extract_tail_weights",
    "pallas_available",
    "decode_flops_per_point",
]

# Order of weight arrays passed to the kernels (all f32; 1-D biases shipped as [1, n]).
# These are the FOLDED weights produced by ``_fold_weights`` — consecutive linear
# layers with no nonlinearity between them are pre-multiplied in XLA (see the design
# notes), so the kernel runs one matmul where the module definition has two:
_WEIGHT_NAMES = (
    "q_coeff",  # [I, hid/2]   RFF coefficients (query embedding)
    "q_w1", "q_b1",  # [hid, hid], [hid]   RFF MLP dense 1 (ReLU)
    "v_coeff",  # [I, hid/2]   RFF coefficients (value embedding)
    "v_w1", "v_b1",  # [hid, hid], [hid]   RFF MLP dense 1 (ReLU)
    "fw", "fb",  # [hid, hid], [hid]   folded (RFF MLP dense 2) @ (FiLM FFN dense 1)
    "m_w2", "m_b2",  # mixer dense 2 with the mixer LN scale/bias folded in
)
# The whole query-side tail (RFF MLP dense 2 -> inv_emb_to_q -> q.k logit dot with
# the latent key -> 1/sqrt(D) scale -> per-head sum) is folded into per-(batch,
# latent) logit matrices A [hid, H] and biases ab [H] (see ``_fold_weights``):
#
#   att[z,t,h] = scale * sum_d (hq[z,t] @ qw + qb)[h*D+d] * k[z, h*D+d]
#              = hq[z,t] @ A_z[:, h] + ab_z[h]
#
# replacing a [Z*T,hid]@[hid,H*D] matmul, a [Z*T,H*D] elementwise multiply, and a
# [Z*T,H*D]@[H*D,H] head-sum matmul with Z narrow [T,hid]@[hid,H] matmuls — ~4x
# less effective MXU work on the query side at experiment widths (H*D >= 256).
# Every LayerNorm's scale/bias is folded into the matmul that consumes it
# ((x_hat*s + b) @ W  ==  x_hat @ (diag(s) W) + b @ W): the FiLM LN into G/c, the
# mixer LN into m_w2/m_b2, the block-FFN LN into p_w2/p_b2. The kernels run
# normalize-only LayerNorms (measured: the LN elementwise was the largest
# non-matmul cost after the round-3 FiLM fold — tools/kernel_profile.py).
# The FiLM gamma/beta projection (``f_w2``/``f_b2``), the FiLM elementwise
# conditioning of the values, and the mixer's first dense (``m_w1``/``m_b1``) are
# folded into per-(batch, latent, head) matrices G [hid, H*hidm] and biases
# c [H*hidm], computed in XLA per decode call (they depend on the latent values v):
#
#   v_cond = v * (1 + t @ Wg + bg) + (t @ Wb + bb)          (FiLM, per head slice)
#   mixer_in = v_cond @ m_w1 + m_b1
#            = t @ [Wg diag(v) m_w1 + Wb m_w1]  +  [(v (1+bg) + bb) m_w1 + m_b1]
#              `------------ G ------------'       `------------ c -----------'

_TAIL_WEIGHT_NAMES = (
    "o_w", "o_b",        # attention output projection [H*D, H*D]
    "p_w1", "p_b1",      # block FFN dense 1 [H*D, H*D]
    "p_w2", "p_b2",      # block FFN dense 2 with the block LN scale/bias folded in
    "h_w1", "h_b1",      # head MLP [H*D, hid]
    "h_w2", "h_b2",      # head MLP [hid, hid]
    "h_w3", "h_b3",      # head MLP [hid, num_out]
)

_N_W = len(_WEIGHT_NAMES)
_LN_EPS = 1e-6  # flax.linen.LayerNorm default


def pallas_available() -> bool:
    """True when running on a TPU backend that can execute Mosaic kernels."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def extract_attention_weights(attn_params: Dict) -> Dict[str, jnp.ndarray]:
    """Pull the kernel's weight pytree out of flax params of EquivariantCrossAttention.

    ``attn_params`` is ``params['params']`` scoped to the attention module (the dict
    holding 'invariant_embedding_query', 'inv_emb_to_q', ...).
    """
    q = attn_params["invariant_embedding_query"]
    v = attn_params["invariant_embedding_value"]
    film = attn_params["inv_emb_to_v"]
    mixer = attn_params["inv_emb_cond_mixer"]
    return {
        "q_coeff": q["RFFEmbedding_0"]["coefficients"],
        "q_w1": q["Dense_0"]["kernel"],
        "q_b1": q["Dense_0"]["bias"],
        "q_w2": q["Dense_1"]["kernel"],
        "q_b2": q["Dense_1"]["bias"],
        "wq": attn_params["inv_emb_to_q"]["kernel"],
        "bq": attn_params["inv_emb_to_q"]["bias"],
        "v_coeff": v["RFFEmbedding_0"]["coefficients"],
        "v_w1": v["Dense_0"]["kernel"],
        "v_b1": v["Dense_0"]["bias"],
        "v_w2": v["Dense_1"]["kernel"],
        "v_b2": v["Dense_1"]["bias"],
        "f_w1": film["Dense_0"]["kernel"],
        "f_b1": film["Dense_0"]["bias"],
        "f_ln_s": film["LayerNorm_0"]["scale"],
        "f_ln_b": film["LayerNorm_0"]["bias"],
        "f_w2": film["Dense_1"]["kernel"],
        "f_b2": film["Dense_1"]["bias"],
        "m_w1": mixer["Dense_0"]["kernel"],
        "m_b1": mixer["Dense_0"]["bias"],
        "m_ln_s": mixer["LayerNorm_0"]["scale"],
        "m_ln_b": mixer["LayerNorm_0"]["bias"],
        "m_w2": mixer["Dense_1"]["kernel"],
        "m_b2": mixer["Dense_1"]["bias"],
    }


def extract_tail_weights(attn_out_proj, block_ffn, head_mlp) -> Dict[str, jnp.ndarray]:
    """Tail weights: attention out-projection + block FFN + decoder head MLP.

    Args are the flax param dicts of ``attn.out_proj``, the block's
    ``pointwise_ffn``, and the decoder's ``out_proj`` Sequential.
    """
    return {
        "o_w": attn_out_proj["kernel"],
        "o_b": attn_out_proj["bias"],
        "p_w1": block_ffn["Dense_0"]["kernel"],
        "p_b1": block_ffn["Dense_0"]["bias"],
        "p_ln_s": block_ffn["LayerNorm_0"]["scale"],
        "p_ln_b": block_ffn["LayerNorm_0"]["bias"],
        "p_w2": block_ffn["Dense_1"]["kernel"],
        "p_b2": block_ffn["Dense_1"]["bias"],
        "h_w1": head_mlp["layers_0"]["kernel"],
        "h_b1": head_mlp["layers_0"]["bias"],
        "h_w2": head_mlp["layers_2"]["kernel"],
        "h_b2": head_mlp["layers_2"]["bias"],
        "h_w3": head_mlp["layers_4"]["kernel"],
        "h_b3": head_mlp["layers_4"]["bias"],
    }


def _fold_weights(weights: Dict[str, jnp.ndarray], k: jnp.ndarray, v: jnp.ndarray,
                  num_heads: int, head_dim: int):
    """Pre-multiply linear chains and build the per-latent logit/FiLM matrices.

    All folds are plain differentiable XLA ops, so weight gradients (and the
    second-order tangents) chain through them automatically; the kernels only ever
    see the folded arrays.

    Args:
        weights: raw arrays from ``extract_attention_weights``.
        k: latent keys ``a_to_k(a)`` [b, z, H*D].
        v: latent values ``a_to_v(a)`` [b, z, H*D].

    Returns:
        (ws2, A, ab, G, c): folded weight dict in ``_WEIGHT_NAMES`` order plus the
        per-latent query-logit matrices A [b, z, hid, H] / biases ab [b, z, H] and
        the FiLM+mixer matrices G [b, z, hid, H*hidm] / biases c [b, z, H*hidm].
    """
    H, D = num_heads, head_dim
    m_w1 = weights["m_w1"]  # [D, hidm]
    hid = weights["f_w1"].shape[0]
    hidm = m_w1.shape[1]
    b, z, _ = v.shape
    hi = jax.lax.Precision.HIGHEST  # folds must not inherit the bf16 TPU default

    # Linear-chain folds (no nonlinearity between the factors).
    qw = jnp.dot(weights["q_w2"], weights["wq"], precision=hi)
    qb = jnp.dot(weights["q_b2"], weights["wq"], precision=hi) + weights["bq"]
    fw = jnp.dot(weights["v_w2"], weights["f_w1"], precision=hi)
    fb = jnp.dot(weights["v_b2"], weights["f_w1"], precision=hi) + weights["f_b1"]

    # Query-logit fold: contract the folded q projection with the latent key over
    # the head_dim axis, absorbing the 1/sqrt(D) scale (see _WEIGHT_NAMES notes).
    scale = 1.0 / np.sqrt(D)
    k4 = k.reshape(b, z, H, D)
    A = scale * jnp.einsum("xhd,bzhd->bzxh", qw.reshape(-1, H, D), k4, precision=hi)
    ab = scale * jnp.einsum("hd,bzhd->bzh", qb.reshape(H, D), k4, precision=hi)

    # FiLM + mixer-dense-1 fold. f_w2 [hid, 2*H*D]: gamma half then beta half,
    # head h occupying columns h*D:(h+1)*D of each half (reference value layout).
    f_w2 = weights["f_w2"]
    f_b2 = weights["f_b2"]
    Wg = f_w2[:, : H * D].reshape(hid, H, D)
    Wb = f_w2[:, H * D :].reshape(hid, H, D)
    bg = f_b2[: H * D].reshape(H, D)
    bb = f_b2[H * D :].reshape(H, D)
    v4 = v.reshape(b, z, H, D)

    # G[b,z,h] = Wg_h diag(v[b,z,h]) m_w1 + Wb_h m_w1   -> [hid, hidm] per head.
    G_beta = jnp.einsum("xhd,dm->hxm", Wb, m_w1, precision=hi)  # shared across (b, z)
    G = jnp.einsum("xhd,bzhd,dm->bzhxm", Wg, v4, m_w1, precision=hi) + G_beta
    G = G.transpose(0, 1, 3, 2, 4).reshape(b, z, hid, H * hidm)

    # c[b,z,h] = (v (1+bg) + bb) m_w1 + m_b1.
    c = (
        jnp.einsum("bzhd,dm->bzhm", v4 * (1.0 + bg) + bb, m_w1, precision=hi)
        + weights["m_b1"]
    )
    c = c.reshape(b, z, H * hidm)

    # Fold the FiLM LN scale/bias into G/c: (t_hat*s + b) @ G == t_hat @ (s.G) + b @ G.
    # The kernel then runs a normalize-only LN (no scale-mul / bias-add VPU passes).
    c = c + jnp.einsum("x,bzxm->bzm", weights["f_ln_b"], G, precision=hi)
    G = G * weights["f_ln_s"][:, None]

    # Fold the mixer LN scale/bias into its dense 2 the same way.
    m_w2 = weights["m_ln_s"][:, None] * weights["m_w2"]
    m_b2 = weights["m_b2"] + jnp.dot(weights["m_ln_b"], weights["m_w2"], precision=hi)

    ws2 = {
        "q_coeff": weights["q_coeff"],
        "q_w1": weights["q_w1"],
        "q_b1": weights["q_b1"],
        "v_coeff": weights["v_coeff"],
        "v_w1": weights["v_w1"],
        "v_b1": weights["v_b1"],
        "fw": fw,
        "fb": fb,
        "m_w2": m_w2,
        "m_b2": m_b2,
    }
    return ws2, A, ab, G, c


def _fold_tail_weights(tw: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Fold the block-FFN LN scale/bias into its dense 2 (static, latent-free)."""
    hi = jax.lax.Precision.HIGHEST
    return {
        "o_w": tw["o_w"], "o_b": tw["o_b"],
        "p_w1": tw["p_w1"], "p_b1": tw["p_b1"],
        "p_w2": tw["p_ln_s"][:, None] * tw["p_w2"],
        "p_b2": tw["p_b2"] + jnp.dot(tw["p_ln_b"], tw["p_w2"], precision=hi),
        "h_w1": tw["h_w1"], "h_b1": tw["h_b1"],
        "h_w2": tw["h_w2"], "h_b2": tw["h_b2"],
        "h_w3": tw["h_w3"], "h_b3": tw["h_b3"],
    }


def decode_flops_per_point(num_heads, head_dim, hidden, num_latents, inv_dim, num_out,
                           with_tail=True):
    """Analytic model FLOPs per decoded coordinate (reference math, no kernel tricks).

    Counts 2 FLOPs per MAC for the dense chains, the q*k logit dot, and (optionally)
    the fused tail. Used by bench.py to report model FLOPs utilization.
    """
    hd = num_heads * head_dim
    per_z = (
        2 * inv_dim * (hidden // 2) * 2      # two RFF projections
        + 2 * hidden * hidden * 2 * 2        # two 2-layer MLPs on the embeddings
        + 2 * hidden * hd                    # wq
        + 2 * hidden * 2 * hd                # FiLM gamma/beta
        + 2 * hidden * hidden                # FiLM FFN dense 1
        + num_heads * (2 * head_dim * hidden + 2 * hidden * head_dim)  # mixer
        + 2 * hd                             # q*k logit dot
    )
    tail = (
        2 * hd * hd * 3                      # out-proj + block FFN (2 dense)
        + 2 * hd * hidden                    # head MLP 1
        + 2 * hidden * hidden                # head MLP 2
        + 2 * hidden * num_out               # head MLP 3
    )
    return num_latents * per_z + (tail if with_tail else 0)


# --------------------------------------------------------------------------- math


class _Spec(NamedTuple):
    """Hashable static configuration of the fused decode."""

    num_heads: int
    head_dim: int
    out_dim: int       # H*D without tail, num_out with tail
    with_tail: bool
    compute_dtype: type
    tile_c: int
    tile_c_bwd: int
    interpret: bool


def _as2d(w):
    w = w.astype(jnp.float32)
    return w.reshape(1, -1) if w.ndim == 1 else w


def _mm(x, w, dt):
    """Matmul with f32 accumulation; operands cast to ``dt`` for the MXU."""
    return jnp.dot(x.astype(dt), w.astype(dt), preferred_element_type=jnp.float32)


def _normalize(x, dt):
    """Normalize-only f32 LayerNorm (scale/bias live folded in the next matmul —
    ``_fold_weights`` / ``_fold_tail_weights``); the result is stored at the compute
    dtype so downstream matmul operands need no extra cast pass and bf16 mode halves
    the VMEM temporaries (which is what lets wider coordinate tiles fit). Cross-lane
    VPU reductions measured faster here than ones-matrix MXU matmuls (tried both)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(mean)
    inv = jax.lax.rsqrt(var + _LN_EPS)
    return ((x - mean) * inv).astype(dt)


def _fast_sincos(proj):
    """Polynomial sin/cos of ``2*pi*proj`` to ~1e-5 abs error.

    The exact VPU sine dominated the fused kernel's runtime (measured 39% of the
    whole decode on v5e — tools/kernel_profile.py). RFF features feed bf16 matmuls
    (~3e-3 resolution), so polynomial trig after an exact round-based range
    reduction loses nothing. One reduction yields BOTH values via half-angle:
    with t = pi*(p - round(p)) in [-pi/2, pi/2],
    sin(2 pi p) = 2 sin(t) cos(t) and cos(2 pi p) = 1 - 2 sin(t)^2.
    """
    y = proj - jnp.round(proj)
    t = jnp.pi * y
    t2 = t * t
    s = t * (
        0.9999999995
        + t2 * (-0.1666666279 + t2 * (8.333288177e-3 + t2 * (-1.980741872e-4 + t2 * 2.601885479e-6)))
    )
    c = 1.0 + t2 * (
        -0.4999999963
        + t2 * (4.166657362e-2 + t2 * (-1.388544180e-3 + t2 * 2.423340843e-5))
    )
    return 2.0 * s * c, 1.0 - 2.0 * s * s


def _gelu(x, dt):
    """tanh-approximate gelu. A polynomial-rational variant was tried and measured
    SLOWER than the native lowering on v5e (VPU divides are expensive; Mosaic's tanh
    is already cheap) — see tools/kernel_profile.py; keep the exact path."""
    del dt
    return jax.nn.gelu(x)


def _rff_hidden(x, coeff, w1, b1, dt):
    """RFF hidden chain: sin/cos features -> ReLU dense (RFFNet dense 1).

    The RFF phase projection stays f32 (phases feed sin/cos); the wide hidden
    matmul runs at ``dt``. Coefficients are stop-gradient, matching the reference
    (``embedding/rff.py``: ``learnable_coefficients=False``). In bf16 compute mode
    the sin/cos pair uses the polynomial evaluation (see ``_fast_sincos``); strict
    f32 parity mode keeps the exact libm path. The RFFNet dense 2 is folded into
    whatever consumes it (A on the query side, fw/fb on the value side).
    """
    coeff = jax.lax.stop_gradient(coeff)
    proj = jnp.dot(x, coeff, preferred_element_type=jnp.float32)
    if dt == jnp.bfloat16:
        s, c = _fast_sincos(proj)
    else:
        s, c = jnp.sin(2 * jnp.pi * proj), jnp.cos(2 * jnp.pi * proj)
    h = jnp.concatenate([s, c], axis=-1)
    return jnp.maximum(_mm(h, w1, dt) + b1, 0.0).astype(dt)  # store at compute dtype


def _headexpand(num_heads, head_dim, dt):
    """Row-block ones [H, H*D]: broadcasts per-head scalars over that head's lanes."""
    hd = num_heads * head_dim
    i = jax.lax.broadcasted_iota(jnp.int32, (num_heads, hd), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (num_heads, hd), 1) // head_dim
    return (i == j).astype(dt)


def _tile_decode(spec: _Spec, inv3, wb3, A, ab, G, c, ws, tws):
    """Pure-jnp decode of one coordinate tile, latent axis batched into M.

    Args:
        inv3: bi-invariants [Z, T, I] (latent-major).
        wb3: additive window bias [Z, T, 1].
        A / ab: folded query-logit matrices [Z, hid, H] and biases [Z, H]
            (see ``_fold_weights`` — the latent keys k and the 1/sqrt(D) scale
            live inside them).
        G / c: folded FiLM+mixer matrices [Z, hid, H*hidm] and biases [Z, H*hidm]
            (see ``_fold_weights`` — the latent values v live inside these).
        ws / tws: weight tuples in ``_WEIGHT_NAMES`` / ``_TAIL_WEIGHT_NAMES`` order.

    Returns:
        [T, H*D] attention output, or [T, num_out] with the tail.
    """
    H, D = spec.num_heads, spec.head_dim
    HD = H * D
    dt = spec.compute_dtype
    (q_coeff, q_w1, q_b1,
     v_coeff, v_w1, v_b1, fw, fb,
     m_w2, m_b2) = ws
    Z, T, I = inv3.shape
    hidm = m_w2.shape[0]
    inv2 = inv3.reshape(Z * T, I)

    # Per-head logits straight from the query RFF hidden: one narrow [T,hid]@[hid,H]
    # matmul per latent (the folded A absorbs RFF dense 2, the q projection, the
    # q.k contraction with the key, and the softmax scale).
    hq3 = _rff_hidden(inv2, q_coeff, q_w1, q_b1, dt).reshape(Z, T, -1)
    att3 = (
        jnp.stack([_mm(hq3[z], A[z], dt) for z in range(Z)])
        + ab[:, None, :]
        + wb3
    )  # [Z, T, H]

    # Value-side embedding chain (RFF dense 2 folded into the FiLM FFN's dense 1).
    t = _normalize(
        _gelu(_mm(_rff_hidden(inv2, v_coeff, v_w1, v_b1, dt), fw, dt) + fb, dt), dt
    )

    # FiLM conditioning + mixer dense 1, folded into ONE batched-per-latent matmul:
    # t[z] @ G[z] + c[z]. Replaces the gamma/beta projection, the [Z*T, H*D]
    # elementwise FiLM (the round-2 measured bottleneck), and the per-head mixer
    # first matmul; the FiLM LN scale/bias ride inside G/c. Z is small and
    # static -> unrolled.
    t3 = t.reshape(Z, T, -1)
    pre = jnp.stack([_mm(t3[z], G[z], dt) for z in range(Z)]) + c[:, None, :]
    pre2 = pre.reshape(Z * T, H * hidm)

    # Mixer tail per head (gelu -> normalize -> dense 2 with LN folded in);
    # slices lane-aligned at hidm.
    cols = []
    for h in range(H):
        vm = _normalize(_gelu(pre2[:, h * hidm : (h + 1) * hidm], dt), dt)
        cols.append(_mm(vm, m_w2, dt) + m_b2)
    v_mix = jnp.concatenate(cols, axis=-1)  # [Z*T, H*D]

    # Softmax over latents on the NARROW [Z, T, H] logits (exp/max/sum on H lanes
    # instead of H*D — the wide-softmax variant spent ~8% of kernel time on
    # redundant lanes), then one tiny MXU matmul broadcasts the normalized weights
    # back over head lanes.
    m = jnp.max(att3, axis=0)
    pr = jnp.exp(att3 - m)
    pr = pr / jnp.sum(pr, axis=0)
    prw = jnp.dot(pr.reshape(Z * T, H).astype(dt), _headexpand(H, D, dt),
                  preferred_element_type=jnp.float32)
    y = jnp.sum(prw.reshape(Z, T, HD) * v_mix.reshape(Z, T, HD), axis=0)

    if not spec.with_tail:
        return y

    # Fused decode tail: attn out-proj -> block FFN -> gelu -> 3-layer MLP head
    # (the block LN scale/bias live folded in p_w2/p_b2).
    (o_w, o_b, p_w1, p_b1, p_w2, p_b2,
     h_w1, h_b1, h_w2, h_b2, h_w3, h_b3) = tws
    y = _mm(y, o_w, dt) + o_b
    t = _normalize(_gelu(_mm(y, p_w1, dt) + p_b1, dt), dt)
    y = _gelu(_mm(t, p_w2, dt) + p_b2, dt).astype(dt)
    h = _gelu(_mm(y, h_w1, dt) + h_b1, dt).astype(dt)
    h = _gelu(_mm(h, h_w2, dt) + h_b2, dt).astype(dt)
    return _mm(h, h_w3, dt) + h_b3


def _reference_decode(spec: _Spec, inv, wb, A, ab, G, c, ws, tws):
    """Whole-array XLA composition of the same math (second-order path + oracle).

    ``inv`` is latent-major [b, Z, C, I]; ``wb`` is [b, Z, C, 1].
    """

    def per_b(inv_b, wb_b, Ab, abb, Gb, cb):
        return _tile_decode(spec, inv_b, wb_b, Ab, abb, Gb, cb, ws, tws)

    return jax.vmap(per_b)(inv, wb, A, ab, G, c)


# ------------------------------------------------------------------- pallas: fwd


def _const_specs(arrs):
    return [
        pl.BlockSpec(a.shape, (lambda nd: (lambda bi, ci: (0,) * nd))(a.ndim),
                     memory_space=pltpu.VMEM)
        for a in arrs
    ]


def _fwd_kernel(spec: _Spec, inv_ref, wb_ref, A_ref, ab_ref, G_ref, c_ref, *rest):
    *w_refs, y_ref = rest
    ws = tuple(r[:] for r in w_refs[:_N_W])
    tws = tuple(r[:] for r in w_refs[_N_W:])
    y_ref[0] = _tile_decode(
        spec, inv_ref[0], wb_ref[0], A_ref[0], ab_ref[0], G_ref[0], c_ref[0], ws, tws
    )


def _fwd_pallas(spec: _Spec, inv, wb, A, ab, G, c, ws, tws):
    b, z, cp, i = inv.shape
    nh = spec.num_heads
    hh = G.shape[-1]
    tile = spec.tile_c
    w_list = list(ws) + list(tws)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, spec),
        grid=(b, cp // tile),
        in_specs=[
            pl.BlockSpec((1, z, tile, i), lambda bi, ci: (bi, 0, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, z, tile, 1), lambda bi, ci: (bi, 0, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, z, A.shape[2], nh), lambda bi, ci: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, z, nh), lambda bi, ci: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, z, G.shape[2], hh), lambda bi, ci: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, z, hh), lambda bi, ci: (bi, 0, 0), memory_space=pltpu.VMEM),
            *_const_specs(w_list),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, spec.out_dim), lambda bi, ci: (bi, ci, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, cp, spec.out_dim), jnp.float32),
        interpret=spec.interpret,
        compiler_params=pltpu.CompilerParams(
            # Mosaic's default 16M scoped-vmem budget is conservative (v5e has 128M
            # VMEM); the elementwise temporaries of the fused chains need ~24M.
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(inv, wb, A, ab, G, c, *w_list)


# ------------------------------------------------------------------- pallas: bwd


def _bwd_kernel(spec: _Spec, inv_ref, wb_ref, A_ref, ab_ref, G_ref, c_ref, g_ref,
                *rest):
    n_in = _N_W + (len(_TAIL_WEIGHT_NAMES) if spec.with_tail else 0)
    w_refs = rest[:n_in]
    dinv_ref, dwb_ref, dA_ref, dab_ref, dG_ref, dc_ref, *dw_refs = rest[n_in:]
    ws = tuple(r[:] for r in w_refs[:_N_W])
    tws = tuple(r[:] for r in w_refs[_N_W:])
    g = g_ref[0]

    def f(inv3, wb3, AA, aab, GG, cc, ws, tws):
        return _tile_decode(spec, inv3, wb3, AA, aab, GG, cc, ws, tws)

    _, vjp = jax.vjp(
        f, inv_ref[0], wb_ref[0], A_ref[0], ab_ref[0], G_ref[0], c_ref[0], ws, tws
    )
    dinv, dwb, dA, dab, dG, dc, dws, dtws = vjp(g)
    dw_all = list(dws) + list(dtws)

    dinv_ref[0] = dinv
    dwb_ref[0] = dwb

    first_tile = pl.program_id(1) == 0
    first_all = jnp.logical_and(pl.program_id(0) == 0, first_tile)

    @pl.when(first_tile)
    def _():
        dA_ref[0] = dA
        dab_ref[0] = dab
        dG_ref[0] = dG
        dc_ref[0] = dc

    @pl.when(jnp.logical_not(first_tile))
    def _():
        dA_ref[0] += dA
        dab_ref[0] += dab
        dG_ref[0] += dG
        dc_ref[0] += dc

    @pl.when(first_all)
    def _():
        for r, dw in zip(dw_refs, dw_all):
            r[...] = dw

    @pl.when(jnp.logical_not(first_all))
    def _():
        for r, dw in zip(dw_refs, dw_all):
            r[...] += dw


def _bwd_pallas(spec: _Spec, inv, wb, A, ab, G, c, ws, tws, g):
    b, z, cp, i = inv.shape
    nh = spec.num_heads
    hh = G.shape[-1]
    tile = spec.tile_c_bwd
    w_list = list(ws) + list(tws)

    out_shapes = (
        jax.ShapeDtypeStruct((b, z, cp, i), jnp.float32),
        jax.ShapeDtypeStruct((b, z, cp, 1), jnp.float32),
        jax.ShapeDtypeStruct(A.shape, jnp.float32),
        jax.ShapeDtypeStruct(ab.shape, jnp.float32),
        jax.ShapeDtypeStruct(G.shape, jnp.float32),
        jax.ShapeDtypeStruct(c.shape, jnp.float32),
        *[jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in w_list],
    )
    lat_spec = lambda n: pl.BlockSpec((1, z, n), lambda bi, ci: (bi, 0, 0),
                                      memory_space=pltpu.VMEM)
    A_spec = pl.BlockSpec((1, z, A.shape[2], nh), lambda bi, ci: (bi, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    G_spec = pl.BlockSpec((1, z, G.shape[2], hh), lambda bi, ci: (bi, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    tile4 = lambda n: pl.BlockSpec((1, z, tile, n), lambda bi, ci: (bi, 0, ci, 0),
                                   memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, spec),
        grid=(b, cp // tile),
        in_specs=[
            tile4(i),
            tile4(1),
            A_spec,
            lat_spec(nh),
            G_spec,
            lat_spec(hh),
            pl.BlockSpec((1, tile, spec.out_dim), lambda bi, ci: (bi, ci, 0),
                         memory_space=pltpu.VMEM),
            *_const_specs(w_list),
        ],
        out_specs=(
            tile4(i), tile4(1), A_spec, lat_spec(nh), G_spec, lat_spec(hh),
            *_const_specs(w_list),
        ),
        out_shape=out_shapes,
        interpret=spec.interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(inv, wb, A, ab, G, c, g, *w_list)
    dinv, dwb, dA, dab, dG, dc = outs[:6]
    dws = tuple(outs[6 : 6 + _N_W])
    dtws = tuple(outs[6 + _N_W :]) if tws else ()
    return dinv, dwb, dA, dab, dG, dc, dws, dtws


# --------------------------------------------------------- custom VJP (2nd order)
#
# Layering (bottom-up):
#
# - `_fwd_op` / `_bwd_op`: each Pallas kernel wrapped in a `custom_jvp` whose tangent
#   rule runs the XLA composition of the same math. JAX's linearizer cannot see
#   inside a `pallas_call`, so when higher-order autodiff inlines the custom-VJP
#   fwd/bwd bodies (jax >= 0.9 direct linearization), these wrappers keep the bodies
#   linearizable: primal values come from the kernels, tangents (and their
#   transposes, i.e. second-order gradients) from XLA.
# - `_op`: the `custom_vjp` pairing the two kernels, so plain reverse-mode (training
#   steps, inference-time latent fitting) is fully Pallas fwd + bwd.
#
# Net effect: first-order fwd+bwd run the fused kernels; the meta-SGD outer gradient
# through the inner loop (grad-of-grad) falls back to XLA exactly where second-order
# terms are required — numerically the same math either way (same `_tile_decode`).


@functools.partial(jax.custom_jvp, nondiff_argnums=(0,))
def _fwd_op(spec: _Spec, inv, wb, A, ab, G, c, ws, tws):
    return _fwd_pallas(spec, inv, wb, A, ab, G, c, ws, tws)


@_fwd_op.defjvp
def _fwd_op_jvp(spec, primals, tangents):
    y = _fwd_pallas(spec, *primals)
    _, y_dot = jax.jvp(lambda *args: _reference_decode(spec, *args), primals, tangents)
    return y, y_dot


@functools.partial(jax.custom_jvp, nondiff_argnums=(0,))
def _bwd_op(spec: _Spec, inv, wb, A, ab, G, c, ws, tws, g):
    return _bwd_pallas(spec, inv, wb, A, ab, G, c, ws, tws, g)


@_bwd_op.defjvp
def _bwd_op_jvp(spec, primals, tangents):
    out = _bwd_pallas(spec, *primals)

    def ref_grads(inv, wb, A, ab, G, c, ws, tws, g):
        _, vjp = jax.vjp(
            lambda *args: _reference_decode(spec, *args), inv, wb, A, ab, G, c, ws, tws
        )
        return vjp(g)

    _, out_dot = jax.jvp(ref_grads, primals, tangents)
    return out, out_dot


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _op(spec: _Spec, inv, wb, A, ab, G, c, ws, tws):
    return _fwd_op(spec, inv, wb, A, ab, G, c, ws, tws)


def _op_fwd(spec, inv, wb, A, ab, G, c, ws, tws):
    y = _fwd_op(spec, inv, wb, A, ab, G, c, ws, tws)
    return y, (inv, wb, A, ab, G, c, ws, tws)


def _op_bwd(spec, res, g):
    return _bwd_op(spec, *res, g)


_op.defvjp(_op_fwd, _op_bwd)


# ----------------------------------------------------------------- public entry


def fused_enf_decode(
    inv: jnp.ndarray,
    window_bias: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    weights: Dict[str, jnp.ndarray],
    num_heads: int,
    head_dim: int,
    tile_c: int = 512,
    tile_c_bwd: int = 64,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
    layout: str = "bczi",
    tail_weights: Dict[str, jnp.ndarray] | None = None,
    num_out: int | None = None,
) -> jnp.ndarray:
    """Fused ENF decode with full (second-order capable) autodiff.

    Args:
        inv: bi-invariants, [b, c, z, I] (layout="bczi") or latent-major
            [b, z, c, I] (layout="bzci" — the kernel's native layout; the bczi
            transpose fuses into the XLA producer).
        window_bias: additive logit bias, [b, c, z] resp. [b, z, c] (zeros when
            windows are off).
        k / v: latent keys/values [b, z, H*D].
        weights: see ``extract_attention_weights``.
        num_heads / head_dim: H and D (D == num_hidden).
        tile_c / tile_c_bwd: coordinate tile sizes of the forward / backward kernels
            (the backward holds VJP residuals in VMEM, so it tiles finer).
        interpret: run in the Pallas interpreter (CPU tests).
        compute_dtype: MXU operand dtype; pass ``jnp.float32`` for strict parity.
        tail_weights / num_out: fuse the decode tail (out-projection, block FFN, MLP
            head); output becomes [b, c, num_out].

    Returns:
        [b, c, H*D] attention output, or [b, c, num_out] with the tail.
    """
    if layout == "bczi":
        inv = jnp.swapaxes(inv, 1, 2)
        window_bias = jnp.swapaxes(window_bias, 1, 2)
    elif layout != "bzci":
        raise ValueError(f"unknown layout {layout!r}")
    b, z, c, i = inv.shape
    hd = num_heads * head_dim
    with_tail = tail_weights is not None

    # Pad coordinates to a tile multiple (zero invariants decode to finite garbage
    # that is sliced off; zero cotangents keep padded rows grad-silent).
    tile_bwd = min(tile_c_bwd, -(-c // 8) * 8)
    tile = max(tile_bwd, min(tile_c, -(-c // tile_bwd) * tile_bwd))
    tile = -(-tile // tile_bwd) * tile_bwd  # keep fwd/bwd tilings aligned
    # The kernel's Mosaic scoped-vmem stack scales with z*tile rows (~5.6 KB/row
    # measured on v5e against the 64M limit below): large-latent models must trade
    # coordinate-tile width for latent count or the compile OOMs — the ball configs
    # (z=25) hit exactly this at the former fixed tile (71.71M > 64M).
    max_rows = 8192
    if z * tile > max_rows:
        tile = max(tile_bwd, max_rows // z // tile_bwd * tile_bwd)
    pad = (-c) % tile
    if pad:
        inv = jnp.pad(inv, ((0, 0), (0, 0), (0, pad), (0, 0)))
        window_bias = jnp.pad(window_bias, ((0, 0), (0, 0), (0, pad)))

    # Pad the invariant feature dim to at least 8 lanes (zero rows in the RFF
    # coefficients contribute nothing; their grads are stop_gradient zeros anyway).
    i_pad = max(8, i)
    weights = dict(weights)
    if i_pad != i:
        inv = jnp.pad(inv, ((0, 0), (0, 0), (0, 0), (0, i_pad - i)))
        for name in ("q_coeff", "v_coeff"):
            weights[name] = jnp.pad(weights[name], ((0, i_pad - i), (0, 0)))

    spec = _Spec(
        num_heads=num_heads,
        head_dim=head_dim,
        out_dim=(num_out if with_tail else hd),
        with_tail=with_tail,
        compute_dtype=compute_dtype,
        tile_c=tile,
        tile_c_bwd=tile_bwd,
        interpret=interpret,
    )
    # Fold linear chains and build the per-latent logit/FiLM matrices in XLA
    # (differentiable; the kernels never see the raw keys / FiLM / mixer-dense-1
    # weights — k gradients flow through the A/ab einsums automatically).
    folded, A, ab, G, cc = _fold_weights(
        {n: weights[n].astype(jnp.float32) for n in weights},
        k.astype(jnp.float32),
        v.astype(jnp.float32),
        num_heads,
        head_dim,
    )
    ws = tuple(_as2d(folded[n]) for n in _WEIGHT_NAMES)
    if with_tail:
        folded_tail = _fold_tail_weights(
            {n: tail_weights[n].astype(jnp.float32) for n in tail_weights}
        )
        tws = tuple(_as2d(folded_tail[n]) for n in _TAIL_WEIGHT_NAMES)
    else:
        tws = ()
    y = _op(
        spec,
        inv.astype(jnp.float32),
        window_bias[..., None].astype(jnp.float32),
        A,
        ab,
        G,
        cc,
        ws,
        tws,
    )
    return y[:, :c]
