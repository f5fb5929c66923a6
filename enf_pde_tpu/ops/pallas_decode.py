"""Fused Pallas TPU kernel for the ENF decode cross-attention.

The reference decode materializes a ``[batch, coords, latents, heads, head_dim]``
FiLM-conditioned value tensor in HBM (``equivariant_cross_attention.py:97-144``) — the
dominant memory traffic of the whole model. This kernel fuses, per coordinate tile and
latent, entirely in VMEM:

    invariant embedding (RFF -> ReLU MLP) -> query projection
    -> logits + Gaussian-window bias -> online softmax over latents
    -> FiLM value conditioning (second RFF MLP -> gamma/beta -> per-head mixer MLP)
    -> attention-weighted accumulation

Layout: grid ``(batch, coord_tiles, latents)`` with the latent axis innermost; running
max / normalizer / weighted-value accumulators live in VMEM scratch across latent
steps (the flash-attention pattern; here the softmax axis is the *latent* axis, which
is small, while coordinate tiles are embarrassingly parallel). All matmuls take
``[TILE_C, width]`` x ``[width, width]`` shapes that map directly onto the MXU.

The kernel computes the *pre-projection* attention output ``y [b, c, H*D]``; the
(single) output projection and the surrounding block FFN remain in XLA where they fuse
fine. Geometry stays outside: invariants and window biases are cheap VPU math computed
by the caller, so every invariant type shares this one kernel.

Weight pytree layout produced by ``extract_attention_weights`` from the flax params of
``ops.attention.EquivariantCrossAttention`` (requires ``embedding_type='rff'``,
``condition_value_transform=True``, ``condition_invariant_embedding=False``).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_enf_decode",
    "fused_enf_decode_geom",
    "extract_attention_weights",
    "extract_tail_weights",
    "pallas_available",
]

# Order of weight arrays passed to the kernel (all f32):
_WEIGHT_NAMES = (
    "q_coeff",  # [I, hid/2]   RFF coefficients (query embedding)
    "q_w1", "q_b1",  # [hid, hid], [hid]
    "q_w2", "q_b2",  # [hid, hid], [hid]
    "wq", "bq",  # [hid, H*D], [H*D]
    "v_coeff",  # [I, hid/2]   RFF coefficients (value embedding)
    "v_w1", "v_b1",
    "v_w2", "v_b2",
    "f_w1", "f_b1",  # FiLM FFN dense 1: [hid, hid], [hid]
    "f_ln_s", "f_ln_b",  # FiLM FFN layernorm: [hid]
    "f_w2", "f_b2",  # FiLM FFN dense 2: [hid, 2*H*D], [2*H*D]
    "m_w1", "m_b1",  # mixer dense 1: [D, hid], [hid]
    "m_ln_s", "m_ln_b",  # mixer layernorm: [hid]
    "m_w2", "m_b2",  # mixer dense 2: [hid, D], [D]
)

_TAIL_WEIGHT_NAMES = (
    "o_w", "o_b",        # attention output projection [H*D, H*D]
    "p_w1", "p_b1",      # block FFN dense 1 [H*D, H*D]
    "p_ln_s", "p_ln_b",  # block FFN layernorm
    "p_w2", "p_b2",      # block FFN dense 2 [H*D, H*D]
    "h_w1", "h_b1",      # head MLP [H*D, hid]
    "h_w2", "h_b2",      # head MLP [hid, hid]
    "h_w3", "h_b3",      # head MLP [hid, num_out]
)

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


def _layernorm(x, scale, bias):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(mean)
    inv = jax.lax.rsqrt(var + _LN_EPS)
    return (x - mean) * inv * scale + bias


def _mm(x, w, dtype):
    """Matmul with f32 accumulation; operands optionally cast to bf16 for the MXU."""
    return jnp.dot(x.astype(dtype), w.astype(dtype), preferred_element_type=jnp.float32)


def _rff_mlp(x, coeff, w1, b1, w2, b2, dtype):
    """RFFNet(num_layers=2): sin/cos features -> ReLU dense -> dense.

    The RFF projection itself stays f32 (phases feed sin/cos); the wide hidden
    matmuls run at ``dtype``.
    """
    proj = (2 * jnp.pi) * jnp.dot(x, coeff, preferred_element_type=jnp.float32)
    h = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
    h = jnp.maximum(_mm(h, w1, dtype) + b1, 0.0)
    return _mm(h, w2, dtype) + b2


def _decode_kernel(
    num_heads: int,
    head_dim: int,
    num_latents: int,
    compute_dtype,
    with_tail: bool,
    # refs
    inv_ref, wb_ref, k_ref, v_ref, headblock_ref,
    q_coeff, q_w1, q_b1, q_w2, q_b2, wq, bq,
    v_coeff, v_w1, v_b1, v_w2, v_b2,
    f_w1, f_b1, f_ln_s, f_ln_b, f_w2, f_b2,
    m_w1, m_b1, m_ln_s, m_ln_b, m_w2, m_b2,
    *tail_and_out,
):
    if with_tail:
        (o_w, o_b, p_w1, p_b1, p_ln_s, p_ln_b, p_w2, p_b2,
         h_w1, h_b1, h_w2, h_b2, h_w3, h_b3, y_ref) = tail_and_out
    else:
        (y_ref,) = tail_and_out
    """One (batch, coord-tile) step of the fused decode.

    The latent axis is unrolled *inside* the program (z <= 25 in all experiments), so
    the softmax over latents runs in registers — no cross-program accumulators and no
    online-softmax bookkeeping. Per-head logit scalars are kept *expanded* over head
    lanes ([C_T, H*D], replicated across each head's D lanes) so every array keeps
    MXU/VPU-friendly 128-lane shapes; the expansion itself is one matmul with a
    block-diagonal ones matrix (``headblock_ref``).
    """
    H, D = num_heads, head_dim
    dt = compute_dtype
    scale = 1.0 / np.sqrt(D)

    m_run = None  # running max over latents [C_T, H*D]
    att_all = []
    v_all = []
    for zi in range(num_latents):
        inv = inv_ref[0, :, zi, :]  # [C_T, I]
        wb = wb_ref[0, :, zi : zi + 1]  # [C_T, 1]
        k_z = k_ref[0, zi, :, :]  # [1, H*D]
        v_z = v_ref[0, zi, :, :]  # [1, H*D]

        # --- query chain -----------------------------------------------------
        q_emb = _rff_mlp(inv, q_coeff[:], q_w1[:], q_b1[:], q_w2[:], q_b2[:], dt)
        q = _mm(q_emb, wq[:], dt) + bq[:]  # [C_T, H*D]

        # --- FiLM-conditioned value chain --------------------------------------
        v_emb = _rff_mlp(inv, v_coeff[:], v_w1[:], v_b1[:], v_w2[:], v_b2[:], dt)
        t = jax.nn.gelu(_mm(v_emb, f_w1[:], dt) + f_b1[:])
        t = _layernorm(t, f_ln_s[:], f_ln_b[:])
        gamma_beta = _mm(t, f_w2[:], dt) + f_b2[:]  # [C_T, 2*H*D]
        gamma = gamma_beta[:, : H * D]
        beta = gamma_beta[:, H * D :]
        v_cond = v_z * (1.0 + gamma) + beta  # [C_T, H*D]

        # Per-head mixer MLP, heads unrolled (H is 2-3).
        v_mixed_cols = []
        for h in range(H):
            sl = slice(h * D, (h + 1) * D)
            vm = jax.nn.gelu(_mm(v_cond[:, sl], m_w1[:], dt) + m_b1[:])
            vm = _layernorm(vm, m_ln_s[:], m_ln_b[:])
            vm = _mm(vm, m_w2[:], dt) + m_b2[:]  # [C_T, D]
            v_mixed_cols.append(vm)
        v_all.append(jnp.concatenate(v_mixed_cols, axis=-1))  # [C_T, H*D]

        # Per-head logits, expanded over head lanes (block-diagonal-ones matmul).
        att = jnp.dot(q * k_z, headblock_ref[:], preferred_element_type=jnp.float32)
        att = att * scale + wb  # [C_T, H*D]
        att_all.append(att)
        m_run = att if m_run is None else jnp.maximum(m_run, att)

    # --- softmax over latents + weighted sum, in registers -------------------------
    acc = jnp.zeros_like(att_all[0])
    norm = jnp.zeros_like(att_all[0])
    for zi in range(num_latents):
        p_z = jnp.exp(att_all[zi] - m_run)
        norm = norm + p_z
        acc = acc + p_z * v_all[zi]
    y = acc / norm

    if not with_tail:
        y_ref[0, :, :] = y
        return

    # --- fused decode tail: attn out-proj -> block FFN -> gelu -> head MLP ---------
    # Keeping the tail in VMEM avoids ~6 HBM round trips of [b, c, H*D] activations.
    y = _mm(y, o_w[:], dt) + o_b[:]
    t = jax.nn.gelu(_mm(y, p_w1[:], dt) + p_b1[:])
    t = _layernorm(t, p_ln_s[:], p_ln_b[:])
    y = _mm(t, p_w2[:], dt) + p_b2[:]
    y = jax.nn.gelu(y)
    h = jax.nn.gelu(_mm(y, h_w1[:], dt) + h_b1[:])
    h = jax.nn.gelu(_mm(h, h_w2[:], dt) + h_b2[:])
    y_ref[0, :, :] = _mm(h, h_w3[:], dt) + h_b3[:]


def _geom_kernel(
    invariant,
    use_window: bool,
    num_heads: int,
    head_dim: int,
    num_latents: int,
    compute_dtype,
    with_tail: bool,
    # refs
    x_ref, p_ref, sig_ref, k_ref, v_ref, headblock_ref,
    q_coeff, q_w1, q_b1, q_w2, q_b2, wq, bq,
    v_coeff, v_w1, v_b1, v_w2, v_b2,
    f_w1, f_b1, f_ln_s, f_ln_b, f_w2, f_b2,
    m_w1, m_b1, m_ln_s, m_ln_b, m_w2, m_b2,
    *tail_and_out,
):
    """Fully fused decode including geometry: invariants and Gaussian-window biases
    are computed in VMEM from raw coordinates and latent poses, so the only HBM
    inputs are x [C_T, d], poses, and the weights — nothing O(c*z) ever leaves VMEM.

    The geometry object is a hashable static argument; its jnp ops trace directly
    into the Mosaic kernel.
    """
    if with_tail:
        (o_w, o_b, p_w1, p_b1, p_ln_s, p_ln_b, p_w2, p_b2,
         h_w1, h_b1, h_w2, h_b2, h_w3, h_b3, y_ref) = tail_and_out
    else:
        (y_ref,) = tail_and_out

    H, D = num_heads, head_dim
    dt = compute_dtype
    scale = 1.0 / np.sqrt(D)

    x_blk = x_ref[0, :, :]  # [C_T, d]
    m_run = None
    att_all, v_all = [], []
    for zi in range(num_latents):
        pz = p_ref[0, zi : zi + 1, :]  # [1, pose_dim]
        inv = invariant(x_blk[None], pz[None])[0, :, 0, :]  # [C_T, I]
        if use_window:
            sz = sig_ref[0, zi : zi + 1, :]
            wb = invariant.gaussian_window(x_blk[None], pz[None], sz[None])[0, :, 0, :]
        else:
            wb = jnp.zeros((x_blk.shape[0], 1), jnp.float32)
        k_z = k_ref[0, zi, :, :]
        v_z = v_ref[0, zi, :, :]

        q_emb = _rff_mlp(inv, q_coeff[:], q_w1[:], q_b1[:], q_w2[:], q_b2[:], dt)
        q = _mm(q_emb, wq[:], dt) + bq[:]

        v_emb = _rff_mlp(inv, v_coeff[:], v_w1[:], v_b1[:], v_w2[:], v_b2[:], dt)
        t = jax.nn.gelu(_mm(v_emb, f_w1[:], dt) + f_b1[:])
        t = _layernorm(t, f_ln_s[:], f_ln_b[:])
        gamma_beta = _mm(t, f_w2[:], dt) + f_b2[:]
        v_cond = v_z * (1.0 + gamma_beta[:, : H * D]) + gamma_beta[:, H * D :]

        v_mixed_cols = []
        for h in range(H):
            sl = slice(h * D, (h + 1) * D)
            vm = jax.nn.gelu(_mm(v_cond[:, sl], m_w1[:], dt) + m_b1[:])
            vm = _layernorm(vm, m_ln_s[:], m_ln_b[:])
            v_mixed_cols.append(_mm(vm, m_w2[:], dt) + m_b2[:])
        v_all.append(jnp.concatenate(v_mixed_cols, axis=-1))

        att = jnp.dot(q * k_z, headblock_ref[:], preferred_element_type=jnp.float32)
        att = att * scale + wb
        att_all.append(att)
        m_run = att if m_run is None else jnp.maximum(m_run, att)

    acc = jnp.zeros_like(att_all[0])
    norm = jnp.zeros_like(att_all[0])
    for zi in range(num_latents):
        p_z = jnp.exp(att_all[zi] - m_run)
        norm = norm + p_z
        acc = acc + p_z * v_all[zi]
    y = acc / norm

    if not with_tail:
        y_ref[0, :, :] = y
        return
    y = _mm(y, o_w[:], dt) + o_b[:]
    t = jax.nn.gelu(_mm(y, p_w1[:], dt) + p_b1[:])
    t = _layernorm(t, p_ln_s[:], p_ln_b[:])
    y = _mm(t, p_w2[:], dt) + p_b2[:]
    y = jax.nn.gelu(y)
    h = jax.nn.gelu(_mm(y, h_w1[:], dt) + h_b1[:])
    h = jax.nn.gelu(_mm(h, h_w2[:], dt) + h_b2[:])
    y_ref[0, :, :] = _mm(h, h_w3[:], dt) + h_b3[:]


def fused_enf_decode_geom(
    x: jnp.ndarray,
    p: jnp.ndarray,
    sigma: jnp.ndarray,
    invariant,
    use_window: bool,
    k: jnp.ndarray,
    v: jnp.ndarray,
    weights: Dict[str, jnp.ndarray],
    num_heads: int,
    head_dim: int,
    tile_c: int = 512,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
    tail_weights: Dict[str, jnp.ndarray] | None = None,
    num_out: int | None = None,
) -> jnp.ndarray:
    """Geometry-fused decode: inputs are raw coordinates and latent poses.

    Args:
        x: query coordinates [b, c, d].
        p: latent poses (angles already embedded) [b, z, pose_dim].
        sigma: per-latent window sizes [b, z, 1].
        invariant: a geometry invariant (hashable; its jnp ops lower into the kernel).
        Other args as in ``fused_enf_decode``.
    """
    b, c, d = x.shape
    z = p.shape[1]
    hd = num_heads * head_dim
    tile_c = min(tile_c, max(8, c))
    pad_c = (-c) % tile_c
    if pad_c:
        x = jnp.pad(x, ((0, 0), (0, pad_c), (0, 0)))
    cp = c + pad_c

    headblock = jnp.kron(jnp.eye(num_heads), jnp.ones((head_dim, head_dim))).astype(jnp.float32)
    with_tail = tail_weights is not None
    kernel = functools.partial(
        _geom_kernel, invariant, use_window, num_heads, head_dim, z, compute_dtype, with_tail
    )

    def _as2d(w):
        w = w.astype(jnp.float32)
        return w.reshape(1, -1) if w.ndim == 1 else w

    w_list = [_as2d(weights[n]) for n in _WEIGHT_NAMES]
    if with_tail:
        w_list += [_as2d(tail_weights[n]) for n in _TAIL_WEIGHT_NAMES]
    w_specs = [
        pl.BlockSpec(w.shape, (lambda nd: (lambda bi, ci: (0,) * nd))(w.ndim),
                     memory_space=pltpu.VMEM)
        for w in w_list
    ]

    out_dim = num_out if with_tail else hd
    y = pl.pallas_call(
        kernel,
        grid=(b, cp // tile_c),
        in_specs=[
            pl.BlockSpec((1, tile_c, d), lambda bi, ci: (bi, ci, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, z, p.shape[-1]), lambda bi, ci: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, z, 1), lambda bi, ci: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, z, 1, hd), lambda bi, ci: (bi, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, z, 1, hd), lambda bi, ci: (bi, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, hd), lambda bi, ci: (0, 0), memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec(
            (1, tile_c, out_dim), lambda bi, ci: (bi, ci, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, cp, out_dim), jnp.float32),
        interpret=interpret,
    )(
        x.astype(jnp.float32),
        p.astype(jnp.float32),
        sigma.astype(jnp.float32),
        k[:, :, None, :].astype(jnp.float32),
        v[:, :, None, :].astype(jnp.float32),
        headblock,
        *w_list,
    )
    return y[:, :c]


def fused_enf_decode(
    inv: jnp.ndarray,
    window_bias: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    weights: Dict[str, jnp.ndarray],
    num_heads: int,
    head_dim: int,
    tile_c: int = 512,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
    layout: str = "bczi",
    tail_weights: Dict[str, jnp.ndarray] | None = None,
    num_out: int | None = None,
) -> jnp.ndarray:
    """Fused decode: attention output ``[b, c, H*D]``, or with ``tail_weights`` the
    *complete* field decode ``[b, c, num_out]`` (attention out-projection, block FFN,
    gelu, and the 3-layer MLP head all fused in VMEM).

    Args:
        inv: bi-invariants, [b, c, z, I] (layout="bczi") or latent-major
            [b, z, c, I] (layout="bzci" — preferred; avoids an HBM transpose).
        window_bias: additive logit bias, [b, c, z] resp. [b, z, c] (zeros when
            windows are off).
        k / v: latent keys/values [b, z, H*D].
        weights: see ``extract_attention_weights``.
        num_heads / head_dim: H and D (D == num_hidden).
        tile_c: coordinate tile size (multiple of 8).
        interpret: run in the Pallas interpreter (for CPU tests).
        compute_dtype: operand dtype for the wide hidden matmuls (f32 accumulate).
            bfloat16 keeps the MXU at full rate; pass jnp.float32 for strict parity.
    """
    if layout == "bzci":  # latent-major callers: restore the natural layout
        inv = jnp.transpose(inv, (0, 2, 1, 3))
        window_bias = jnp.transpose(window_bias, (0, 2, 1))
    elif layout != "bczi":
        raise ValueError(f"unknown layout {layout!r}")
    b, c, z, i = inv.shape
    hd = num_heads * head_dim
    tile_c = min(tile_c, max(8, c))

    pad_c = (-c) % tile_c
    if pad_c:
        inv = jnp.pad(inv, ((0, 0), (0, pad_c), (0, 0), (0, 0)))
        window_bias = jnp.pad(window_bias, ((0, 0), (0, pad_c), (0, 0)))
    cp = c + pad_c

    # Pad the invariant feature dim to at least 8 lanes (zero rows in the RFF
    # coefficients contribute nothing).
    i_pad = max(8, i)
    weights = dict(weights)
    if i_pad != i:
        inv = jnp.pad(inv, ((0, 0), (0, 0), (0, 0), (0, i_pad - i)))
        for name in ("q_coeff", "v_coeff"):
            wcoef = weights[name]
            weights[name] = jnp.pad(wcoef, ((0, i_pad - i), (0, 0)))

    inv_t = inv  # [B, C, Z, I] (natural layout; the kernel slices z in VMEM)
    wb_t = window_bias  # [B, C, Z]
    k_r = k[:, :, None, :]  # [B, Z, 1, H*D]
    v_r = v[:, :, None, :]

    # Block-diagonal ones: expands per-head logit sums over that head's lanes.
    headblock = jnp.kron(jnp.eye(num_heads), jnp.ones((head_dim, head_dim))).astype(jnp.float32)

    with_tail = tail_weights is not None
    kernel = functools.partial(
        _decode_kernel, num_heads, head_dim, z, compute_dtype, with_tail
    )

    def _as2d(w):
        w = w.astype(jnp.float32)
        return w.reshape(1, -1) if w.ndim == 1 else w

    w_list = [_as2d(weights[n]) for n in _WEIGHT_NAMES]
    if with_tail:
        w_list += [_as2d(tail_weights[n]) for n in _TAIL_WEIGHT_NAMES]
    w_specs = [
        pl.BlockSpec(w.shape, (lambda nd: (lambda bi, ci: (0,) * nd))(w.ndim),
                     memory_space=pltpu.VMEM)
        for w in w_list
    ]

    out_dim = num_out if with_tail else hd
    grid = (b, cp // tile_c)
    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_c, z, i_pad), lambda bi, ci: (bi, ci, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_c, z), lambda bi, ci: (bi, ci, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, z, 1, hd), lambda bi, ci: (bi, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, z, 1, hd), lambda bi, ci: (bi, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, hd), lambda bi, ci: (0, 0), memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec(
            (1, tile_c, out_dim), lambda bi, ci: (bi, ci, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, cp, out_dim), jnp.float32),
        interpret=interpret,
    )(inv_t.astype(jnp.float32), wb_t.astype(jnp.float32), k_r.astype(jnp.float32),
      v_r.astype(jnp.float32), headblock, *w_list)
    return y[:, :c]
