"""Ablation timing of the fused decode kernel phases on real TPU hardware.

Monkeypatches ``pallas_decode._tile_decode`` with variants that skip phases
(transcendentals, layernorms, softmax) to locate the bottleneck. Run on the
TPU: ``python tools/kernel_profile.py [variant ...]``.

The kernel math here mirrors the round-3 folded formulation (see
``pallas_decode._WEIGHT_NAMES``): linear chains pre-multiplied, FiLM + mixer
dense 1 folded into the per-latent ``t @ G_z + c_z`` matmul.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from enf_pde_tpu.ops import pallas_decode as pd

B, Z, C, I, HID, H, D, OUT = 480, 4, 4096, 8, 128, 2, 128, 1
# Width-scaling study (PARITY.md: the kernel is inter-stage-latency bound at the
# reference's widths, so MFU should rise with wider matmuls at fixed schedule):
# KP_HID / KP_D / KP_H / KP_Z / KP_B override the workload dims.
HID = int(os.environ.get("KP_HID", HID))
D = int(os.environ.get("KP_D", D))
H = int(os.environ.get("KP_H", H))
Z = int(os.environ.get("KP_Z", Z))
B = int(os.environ.get("KP_B", B))
HDIM = H * D


def _rand_weights(key):
    ks = iter(jax.random.split(key, 48))
    # Raw (unfolded) weights — fused_enf_decode folds them internally.
    shapes = {
        "q_coeff": (I, HID // 2), "q_w1": (HID, HID), "q_b1": (HID,),
        "q_w2": (HID, HID), "q_b2": (HID,), "wq": (HID, HDIM), "bq": (HDIM,),
        "v_coeff": (I, HID // 2), "v_w1": (HID, HID), "v_b1": (HID,),
        "v_w2": (HID, HID), "v_b2": (HID,),
        "f_w1": (HID, HID), "f_b1": (HID,), "f_ln_s": (HID,), "f_ln_b": (HID,),
        "f_w2": (HID, 2 * HDIM), "f_b2": (2 * HDIM,),
        "m_w1": (D, HID), "m_b1": (HID,), "m_ln_s": (HID,), "m_ln_b": (HID,),
        "m_w2": (HID, D), "m_b2": (D,),
    }
    tails = {
        "o_w": (HDIM, HDIM), "o_b": (HDIM,),
        "p_w1": (HDIM, HDIM), "p_b1": (HDIM,), "p_ln_s": (HDIM,), "p_ln_b": (HDIM,),
        "p_w2": (HDIM, HDIM), "p_b2": (HDIM,),
        "h_w1": (HDIM, HID), "h_b1": (HID,), "h_w2": (HID, HID), "h_b2": (HID,),
        "h_w3": (HID, OUT), "h_b3": (OUT,),
    }
    mk = lambda shp: 0.1 * jax.random.normal(next(ks), shp, jnp.float32)
    return {k: mk(v) for k, v in shapes.items()}, {k: mk(v) for k, v in tails.items()}


def _time(fn, iters=5):
    np.asarray(fn())  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = np.asarray(fn())
    return (time.perf_counter() - t0) / iters


_orig = pd._tile_decode


def make_ablated(no_sincos=False, no_softmax=False):
    """Reimplementation of the folded _tile_decode with switchable phases."""

    def tile(spec, inv3, wb3, A, ab, G, c, ws, tws):
        H, D = spec.num_heads, spec.head_dim
        HD = H * D
        dt = spec.compute_dtype
        (q_coeff, q_w1, q_b1,
         v_coeff, v_w1, v_b1, fw, fb,
         m_w2, m_b2) = ws
        Z, T, I = inv3.shape
        hidm = m_w2.shape[0]
        inv2 = inv3.reshape(Z * T, I)

        def rff_hidden(x, coeff, w1, b1):
            coeff = jax.lax.stop_gradient(coeff)
            proj = jnp.dot(x, coeff, preferred_element_type=jnp.float32)
            if no_sincos:
                h = jnp.concatenate([proj, proj], axis=-1)
            else:
                s, cc = pd._fast_sincos(proj)
                h = jnp.concatenate([s, cc], axis=-1)
            return jnp.maximum(pd._mm(h, w1, dt) + b1, 0.0).astype(dt)

        hq3 = rff_hidden(inv2, q_coeff, q_w1, q_b1).reshape(Z, T, -1)
        att3 = (
            jnp.stack([pd._mm(hq3[z], A[z], dt) for z in range(Z)])
            + ab[:, None, :]
            + wb3
        )
        t = pd._normalize(
            jax.nn.gelu(pd._mm(rff_hidden(inv2, v_coeff, v_w1, v_b1), fw, dt) + fb), dt
        )
        t3 = t.reshape(Z, T, -1)
        pre = jnp.stack([pd._mm(t3[z], G[z], dt) for z in range(Z)]) + c[:, None, :]
        pre2 = pre.reshape(Z * T, H * hidm)
        cols = []
        for h in range(H):
            vm = pd._normalize(jax.nn.gelu(pre2[:, h * hidm : (h + 1) * hidm]), dt)
            cols.append(pd._mm(vm, m_w2, dt) + m_b2)
        v_mix = jnp.concatenate(cols, axis=-1)
        if no_softmax:
            pr = att3
        else:
            m = jnp.max(att3, axis=0)
            pr = jnp.exp(att3 - m)
            pr = pr / jnp.sum(pr, axis=0)
        prw = jnp.dot(pr.reshape(Z * T, H).astype(dt), pd._headexpand(H, D, dt),
                      preferred_element_type=jnp.float32)
        y = jnp.sum(prw.reshape(Z, T, HD) * v_mix.reshape(Z, T, HD), axis=0)
        if not spec.with_tail:
            return y
        (o_w, o_b, p_w1, p_b1, p_w2, p_b2,
         h_w1, h_b1, h_w2, h_b2, h_w3, h_b3) = tws
        y = pd._mm(y, o_w, dt) + o_b
        t = pd._normalize(jax.nn.gelu(pd._mm(y, p_w1, dt) + p_b1), dt)
        y = jax.nn.gelu(pd._mm(t, p_w2, dt) + p_b2).astype(dt)
        h = jax.nn.gelu(pd._mm(y, h_w1, dt) + h_b1).astype(dt)
        h = jax.nn.gelu(pd._mm(h, h_w2, dt) + h_b2).astype(dt)
        return pd._mm(h, h_w3, dt) + h_b3

    return tile


def make_blockdiag_mixer():
    """Variant: one block-diagonal mixer dense-2 matmul instead of H per-head ones.

    Measures whether merging the per-head [Z*T,hidm]@[hidm,D] matmuls into a single
    [Z*T,H*hidm]@[H*hidm,H*D] (zeros off-diagonal — 2x the FLOPs at H=2, but one
    pipeline stage) beats the loop. The gelu+LN stays per head (per-head LN stats).
    """

    def tile(spec, inv3, wb3, A, ab, G, c, ws, tws):
        H, D = spec.num_heads, spec.head_dim
        HD = H * D
        dt = spec.compute_dtype
        (q_coeff, q_w1, q_b1,
         v_coeff, v_w1, v_b1, fw, fb,
         m_w2, m_b2) = ws
        Z, T, I = inv3.shape
        hidm = m_w2.shape[0]
        inv2 = inv3.reshape(Z * T, I)

        def rff_hidden(x, coeff, w1, b1):
            coeff = jax.lax.stop_gradient(coeff)
            proj = jnp.dot(x, coeff, preferred_element_type=jnp.float32)
            s, cc = pd._fast_sincos(proj)
            h = jnp.concatenate([s, cc], axis=-1)
            return jnp.maximum(pd._mm(h, w1, dt) + b1, 0.0).astype(dt)

        hq3 = rff_hidden(inv2, q_coeff, q_w1, q_b1).reshape(Z, T, -1)
        att3 = (
            jnp.stack([pd._mm(hq3[z], A[z], dt) for z in range(Z)])
            + ab[:, None, :]
            + wb3
        )
        t = pd._normalize(
            jax.nn.gelu(pd._mm(rff_hidden(inv2, v_coeff, v_w1, v_b1), fw, dt) + fb), dt
        )
        t3 = t.reshape(Z, T, -1)
        pre = jnp.stack([pd._mm(t3[z], G[z], dt) for z in range(Z)]) + c[:, None, :]
        pre2 = pre.reshape(Z * T, H * hidm)
        vms = [
            pd._normalize(jax.nn.gelu(pre2[:, h * hidm : (h + 1) * hidm]), dt)
            for h in range(H)
        ]
        vm_all = jnp.concatenate(vms, axis=-1)  # [Z*T, H*hidm]
        bi = jax.lax.broadcasted_iota(jnp.int32, (H * hidm, HD), 0) // hidm
        bj = jax.lax.broadcasted_iota(jnp.int32, (H * hidm, HD), 1) // D
        m_w2_blk = jnp.where(
            bi == bj, jnp.tile(m_w2, (H, H)), 0.0
        ).astype(dt)
        v_mix = pd._mm(vm_all, m_w2_blk, dt) + jnp.tile(m_b2, (1, H))
        m = jnp.max(att3, axis=0)
        pr = jnp.exp(att3 - m)
        pr = pr / jnp.sum(pr, axis=0)
        prw = jnp.dot(pr.reshape(Z * T, H).astype(dt), pd._headexpand(H, D, dt),
                      preferred_element_type=jnp.float32)
        y = jnp.sum(prw.reshape(Z, T, HD) * v_mix.reshape(Z, T, HD), axis=0)
        if not spec.with_tail:
            return y
        (o_w, o_b, p_w1, p_b1, p_w2, p_b2,
         h_w1, h_b1, h_w2, h_b2, h_w3, h_b3) = tws
        y = pd._mm(y, o_w, dt) + o_b
        t = pd._normalize(jax.nn.gelu(pd._mm(y, p_w1, dt) + p_b1), dt)
        y = jax.nn.gelu(pd._mm(t, p_w2, dt) + p_b2).astype(dt)
        h = jax.nn.gelu(pd._mm(y, h_w1, dt) + h_b1).astype(dt)
        h = jax.nn.gelu(pd._mm(h, h_w2, dt) + h_b2).astype(dt)
        return pd._mm(h, h_w3, dt) + h_b3

    return tile


def make_split(parts=2):
    """Variant: run the tile body on ``parts`` independent sub-tiles.

    The documented bottleneck is serialized VPU interludes between the ~18
    narrow matmuls. Two independent half-tile chains expose ILP: Mosaic's
    scheduler can overlap one half's VPU work (normalize/gelu/sincos) with the
    other half's MXU matmuls. Same math, same FLOPs.
    """

    def tile(spec, inv3, wb3, A, ab, G, c, ws, tws):
        Z, T, I = inv3.shape
        h = T // parts
        outs = [
            _orig(spec, inv3[:, p * h : (p + 1) * h], wb3[:, p * h : (p + 1) * h],
                  A, ab, G, c, ws, tws)
            for p in range(parts)
        ]
        return jnp.concatenate(outs, axis=0)

    return tile


def make_variant(no_trans=False, no_ln=False):
    def _ident_ln(x, dt):
        return x.astype(dt)

    def variant(spec, inv3, wb3, A, ab, G, c, ws, tws):
        import enf_pde_tpu.ops.pallas_decode as m

        saved = {}
        if no_ln:
            saved["_normalize"] = m._normalize
            m._normalize = _ident_ln
        try:
            if no_trans:
                import jax.nn as jnn
                real_gelu = jnn.gelu
                jnn.gelu = lambda x: x * (0.5 + 0.25 * x)
                try:
                    return _orig(spec, inv3, wb3, A, ab, G, c, ws, tws)
                finally:
                    jnn.gelu = real_gelu
            return _orig(spec, inv3, wb3, A, ab, G, c, ws, tws)
        finally:
            if no_ln:
                m._normalize = saved["_normalize"]

    return variant


def run(name, tile_c=512, patch=None, **kw):
    if patch is not None:
        pd._tile_decode = patch
    try:
        key = jax.random.PRNGKey(0)
        ws, tws = _rand_weights(key)
        inv = jax.random.normal(key, (B, C, Z, I), jnp.float32)
        wb = jax.random.normal(key, (B, C, Z), jnp.float32)
        kk = jax.random.normal(key, (B, Z, HDIM), jnp.float32)
        vv = jax.random.normal(key, (B, Z, HDIM), jnp.float32)

        @jax.jit
        def f(inv, wb, kk, vv, ws, tws):
            y = pd.fused_enf_decode(
                inv, wb, kk, vv, ws, num_heads=H, head_dim=D,
                tile_c=tile_c, tail_weights=tws, num_out=OUT, **kw,
            )
            return jnp.sum(y)

        dt = _time(lambda: f(inv, wb, kk, vv, ws, tws))
        pts = B * C / dt
        flops = pd.decode_flops_per_point(H, D, HID, Z, I, OUT)
        print(f"{name:28s} {dt*1e3:8.1f} ms  {pts/1e6:7.2f} Mpts/s  "
              f"MFU={100*pts*flops/197e12:5.1f}%", flush=True)
    finally:
        pd._tile_decode = _orig


if __name__ == "__main__":
    print(f"workload: B={B} Z={Z} C={C} I={I} HID={HID} H={H} D={D}", flush=True)
    which = set(sys.argv[1:])
    variants = {
        "baseline-512": dict(),
        "tile-256": dict(tile_c=256),
        "tile-1024": dict(tile_c=1024),
        "tile-2048": dict(tile_c=2048),
        "no-gelu": dict(patch=make_variant(no_trans=True)),
        "no-layernorm": dict(patch=make_variant(no_ln=True)),
        "no-gelu-no-ln": dict(patch=make_variant(no_trans=True, no_ln=True)),
        "blockdiag-mixer": dict(patch=make_blockdiag_mixer()),
        "split-2": dict(patch=make_split(2)),
        "split-4": dict(patch=make_split(4)),
        "split-2-tile-1024": dict(patch=make_split(2), tile_c=1024),
        "no-sincos": dict(patch=make_ablated(no_sincos=True)),
        "no-softmax": dict(patch=make_ablated(no_softmax=True)),
        "no-sincos-softmax": dict(patch=make_ablated(no_sincos=True, no_softmax=True)),
    }
    for name, kw in variants.items():
        if which and name not in which:
            continue
        run(name, **kw)
