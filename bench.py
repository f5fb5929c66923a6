"""Benchmark: ENF decode throughput (coordinate points/sec/chip) on the flagship model.

Workload: full-field decode of Navier-Stokes rollouts — 960 frames x 64^2
coordinates with the paper's NS decoder (hidden 128, 2 heads, 4 latents), the shape of
the reference's validation/rollout decode (its dominant inference cost).

- baseline: the reference's OWN decoder module (imported from the read-only
  checkout, constructed as its NS experiment does) timed on the same chip with its
  val-decode pattern — a host-side Python loop over coordinate chunks calling a
  jitted apply per chunk (reference ``pde_trainer.py:393-402`` deliberately leaves
  this un-jitted end to end). Falls back to this repo's jitted XLA chunk path
  (the pre-round-5 self-referential anchor, still recorded as ``vs_xla_chunk``).
- ours: the TPU-native path — one jitted program; scan-tiled coordinates; bfloat16
  matmuls with f32 logits/softmax; the fused Pallas decode kernel when available.

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline"}.
The remaining north-star metrics (analytic model-FLOPs utilization of the decode, and
meta-SGD train-step rate on the NS config) go to stderr and ``BENCH_EXTRA.json``.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persist compiles across invocations: the driver runs this benchmark at round end
# in a fresh process (often a fresh container), and the decode/train-step programs
# take minutes of remote TPU compile cold. Harmless on CPU.
import os as _os

jax.config.update(
    "jax_compilation_cache_dir",
    _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".jax_cache"),
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

# bf16 peak of one TPU v5e chip (MXU); used for the analytic MFU estimate.
_V5E_PEAK_FLOPS = 197e12


def _build(backend: str = "xla"):
    from enf_pde_tpu.builders import build_models
    from enf_pde_tpu.config import load_experiment_config
    from enf_pde_tpu.data import planar_coords
    from enf_pde_tpu.models.latents import init_latents, latents_to_pose, tile_latents

    cfg = load_experiment_config("navier_stokes", [f"nef.backend={backend}"])
    cfg.nef.num_in = 2
    cfg.nef.num_out = 1
    decoder, _ = build_models(cfg)

    coords = jnp.asarray(planar_coords(64, 64))
    n_frames = 8 * 60  # batch x (train + out horizon) frames, reference NS protocol
    lat = tile_latents(
        init_latents(1, cfg.nef.num_latents, cfg.nef.latent_dim, 2, 0, "cartesian"), n_frames
    )
    p, a, window = latents_to_pose(lat)
    key = jax.random.PRNGKey(0)
    # Perturb latents so nothing folds to constants.
    p = p + 0.1 * jax.random.normal(key, p.shape)
    a = a + 0.1 * jax.random.normal(key, a.shape)
    x = jnp.broadcast_to(coords[None], (n_frames, coords.shape[0], 2))

    params = decoder.init(jax.random.PRNGKey(1), x[:, :64], p, a, window)
    return decoder, params, x, p, a, window


def _time(fn, *args, warmup=1, iters=3):
    """Wall time per call, synchronized by fetching a scalar reduction.

    ``block_until_ready`` is unreliable on relayed TPU platforms and full-array
    fetches are transfer-bound, so every benchmarked function returns a scalar that we
    pull to the host.
    """
    for _ in range(warmup):
        np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = np.asarray(fn(*args))
    return (time.perf_counter() - t0) / iters


_sum = jax.jit(lambda xs: sum(jnp.sum(x) for x in xs))


def bench_baseline(decoder, params, x, p, a, window, chunk=512):
    """Reference-style: host-side Python chunk loop around a per-chunk jitted apply."""
    apply_jit = jax.jit(decoder.apply)

    def run():
        outs = []
        for i in range(0, x.shape[1], chunk):
            outs.append(apply_jit(params, x[:, i : i + chunk], p, a, window))
        return _sum(outs)

    return _time(run)


def bench_reference_decode(x, p, a, window, chunk=512):
    """The reference's OWN decoder on the same workload (VERDICT r4 weak #5).

    Imports ``enf.models.EquivariantCrossAttentionNeF`` from the read-only
    reference checkout, constructs it exactly as the reference NS experiment
    does (``experiments/fitting/__init__.py:25-39`` with
    ``config_navier_stokes.yaml``'s nef block), and times it with the
    reference's val-decode pattern — a host-side chunk loop around a jitted
    apply (``pde_trainer.py:393-402``). This anchors ``vs_baseline`` to the
    reference running on the same chip instead of to our own XLA chunk path.
    """
    import os
    import sys

    ref_root = "/root/reference"
    if not os.path.isdir(ref_root):
        raise RuntimeError("reference checkout not present")
    if ref_root not in sys.path:
        sys.path.insert(0, ref_root)
    from enf.models import EquivariantCrossAttentionNeF
    from enf.steerable_attention.invariant.rel_pos_periodic import (
        RelativePosition2DPeriodic,
    )

    ref = EquivariantCrossAttentionNeF(
        num_hidden=128,
        num_heads=2,
        num_layers=0,
        num_out=1,
        latent_dim=16,
        self_attn_invariant=RelativePosition2DPeriodic(num_dims=2),
        cross_attn_invariant=RelativePosition2DPeriodic(num_dims=2),
        embedding_type="rff",
        embedding_freq_multiplier=[0.05, 0.1],
        condition_value_transform=True,
        use_gaussian_window=True,
    )
    params = ref.init(jax.random.PRNGKey(2), x[:, :64], p, a, window)
    apply_jit = jax.jit(ref.apply)

    def run():
        outs = []
        for i in range(0, x.shape[1], chunk):
            outs.append(apply_jit(params, x[:, i : i + chunk], p, a, window))
        return _sum(outs)

    return _time(run)


def bench_ours(decoder, params, x, p, a, window, chunk=2048):
    """One jitted program, scan-tiled coordinates, bf16 matmuls."""
    from enf_pde_tpu.models.decoder import decode_chunked

    @jax.jit
    def run(params, x, p, a, window):
        with jax.default_matmul_precision("bfloat16"):
            out = decode_chunked(decoder.apply, params, x, p, a, window, chunk_size=chunk)
            return jnp.sum(out)

    return _time(run, params, x, p, a, window)


def bench_train_step(backend: str = "xla", ode_backend: str = None):
    """Meta-SGD dual train step (2nd-order inner loop + rollout + decode), NS config.

    Matches the shape of the round-1 prose measurement: batch 4, 512 sampled points,
    3 inner steps, 10-frame rollout. ``ode_backend='pallas'`` routes the
    rollout decode through the fused kernel (``nef.ode_backend``), the
    production default for the first-order ode/dual-phase decode. The ode
    backend is always pinned explicitly — the NS config now ships
    ``ode_backend: pallas``, and letting that default leak in would make the
    ``train_step_s`` baseline silently measure the pallas path too, breaking
    cross-round comparability.
    """
    from enf_pde_tpu.builders import build_models
    from enf_pde_tpu.config import load_experiment_config
    from enf_pde_tpu.data import planar_coords
    from enf_pde_tpu.train.meta_sgd import MetaSGDTrainer

    cfg = load_experiment_config(
        "navier_stokes",
        [
            "dataset.batch_size=4",
            "training.max_num_sampled_points=512",
            f"nef.backend={backend}",
            f"nef.ode_backend={ode_backend or backend}",
        ],
    )
    cfg.nef.num_in = 2
    cfg.nef.num_out = 1
    decoder, ode_model = build_models(cfg)
    coords = jnp.asarray(planar_coords(64, 64))
    trainer = MetaSGDTrainer(cfg, decoder, ode_model, coords, seed=0)
    state = trainer.init_state()
    traj = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (4, 10, 64, 64, 1))

    # Keep functional purity for timing: rebind state each call outside the timer.
    holder = {"state": state}

    def run():
        loss, new_state = trainer.dual_train_step(holder["state"], traj)
        holder["state"] = new_state
        return loss

    return _time(run, warmup=2, iters=5)


def _claim_tpu():
    """Preempt any in-flight experiment before touching the device.

    The axon TPU serializes across processes: if the experiment runner
    (``tools/run_experiments_r3.sh``) has a fit in flight when the driver invokes
    this benchmark at round end, every op here would block forever waiting for the
    chip. Pause the runner cooperatively (it checks ``/tmp/pause_r3`` between
    fits) and stop in-flight TPU processes — identified by an EXACT argv element
    match via /proc, never a substring pattern (a substring could match an
    unrelated shell wrapper). Interrupted fits resume from their DONE markers /
    orbax checkpoints on the next runner start. Set BENCH_NO_PREEMPT=1 to skip.
    """
    import os
    import signal

    if os.environ.get("BENCH_NO_PREEMPT"):
        return
    open("/tmp/pause_r3", "w").close()
    exact = {"enf_pde_tpu.experiments.fit", "tools/run_reference_baseline.py",
             "tools/kernel_profile.py", "tools/train_backend_timing.py"}
    me = os.getpid()
    deadline = time.time() + 120
    while time.time() < deadline:
        victims = []
        for d in os.listdir("/proc"):
            if not d.isdigit() or int(d) == me:
                continue
            try:
                argv = open(f"/proc/{d}/cmdline", "rb").read().decode().split("\0")
            except OSError:
                continue
            if any(a in exact for a in argv):
                victims.append(int(d))
        if not victims:
            return
        for pid in victims:
            try:
                os.kill(pid, signal.SIGTERM)
            except OSError:
                pass
        time.sleep(5)
    print("warning: TPU processes survived preemption window", file=sys.stderr)


def _release_tpu():
    """Undo ``_claim_tpu``'s pause flag so the experiment queue resumes.

    Round 3 left ``/tmp/pause_r3`` behind after the driver's bench run, which
    silently froze the restoration queue for a whole round (VERDICT r3 weak #1 /
    next-round #9). Registered via ``finally`` in ``main`` so it runs on success,
    exception, and SystemExit alike.
    """
    import os

    if os.environ.get("BENCH_NO_PREEMPT"):
        return
    try:
        os.unlink("/tmp/pause_r3")
    except OSError:
        pass


def main():
    try:
        _run()
    finally:
        _release_tpu()


def _run():
    _claim_tpu()
    backend = "xla"
    try:
        from enf_pde_tpu.ops.pallas_decode import pallas_available

        if pallas_available():
            backend = "pallas"
    except Exception:
        pass

    decoder, params, x, p, a, window = _build("xla")
    n_points = x.shape[0] * x.shape[1]

    t_base = bench_baseline(decoder, params, x, p, a, window)
    pipeline = 4  # async launches per timed iteration: amortizes the ~30 ms
    # relayed-dispatch overhead of this platform (the baseline's python chunk loop
    # already pipelines its many per-chunk launches).
    if backend == "pallas":
        decoder_p, *_ = _build("pallas")

        @jax.jit
        def run_pallas(params, x, p, a, window):
            # The fused kernel tiles the coordinate axis internally.
            return jnp.sum(decoder_p.apply(params, x, p, a, window))

        def run():
            outs = [run_pallas(params, x, p, a, window) for _ in range(pipeline)]
            return _sum(outs)

        t_ours = _time(run) / pipeline
    else:
        t_ours = bench_ours(decoder, params, x, p, a, window)

    pts_base = n_points / t_base
    pts_ours = n_points / t_ours

    # Honest baseline: the reference's own decoder module on the same chip.
    # Falls back to the internal XLA chunk path if the reference checkout is
    # absent or its import/compile fails (never break the driver contract).
    pts_ref = None
    try:
        t_ref = bench_reference_decode(x, p, a, window)
        pts_ref = n_points / t_ref
    except Exception as e:
        print(f"reference decode baseline unavailable: {e!r}", file=sys.stderr)
    vs_baseline = pts_ours / pts_ref if pts_ref else pts_ours / pts_base

    # ------- extra north-star metrics (stderr + side file; stdout stays one line) --
    from enf_pde_tpu.ops.pallas_decode import decode_flops_per_point

    flops_per_point = decode_flops_per_point(
        num_heads=decoder.num_heads,
        head_dim=decoder.num_hidden,
        hidden=decoder.num_hidden,
        num_latents=p.shape[1],
        inv_dim=decoder.cross_attn_invariant.dim,
        num_out=decoder.num_out,
    )
    on_tpu = backend == "pallas"
    extra = {
        "decode_backend": backend,
        # Anchors: "reference" = the reference's own decoder timed on this chip
        # (bench_reference_decode); "xla_chunk" = this repo's jitted chunk path
        # (kept for cross-round comparability of the old self-referential ratio).
        "baseline_anchor": "reference" if pts_ref else "xla_chunk",
        "reference_decode_points_per_sec": round(pts_ref, 1) if pts_ref else None,
        "vs_xla_chunk": round(pts_ours / pts_base, 3),
        # Timing mode: the pallas path overlaps `pipeline` async dispatches per timed
        # iteration and divides by it (the baseline's per-chunk python loop already
        # pipelines its many launches); recorded so numbers are comparable across rounds.
        "pipeline_depth": pipeline if backend == "pallas" else 1,
        "decode_points_per_sec": round(pts_ours, 1),
        "decode_model_flops_per_point": flops_per_point,
        "decode_mfu_pct": round(100 * pts_ours * flops_per_point / _V5E_PEAK_FLOPS, 2)
        if on_tpu
        else None,
        "train_step_s": None,
        "train_steps_per_sec": None,
    }
    try:
        t_step = bench_train_step("xla")
        extra["train_step_s"] = round(t_step, 4)
        extra["train_steps_per_sec"] = round(1.0 / t_step, 3)
    except Exception as e:  # never let the extras break the driver contract
        extra["train_step_error"] = repr(e)
    if on_tpu:
        try:
            t_step_p = bench_train_step("xla", ode_backend="pallas")
            extra["train_step_ode_pallas_s"] = round(t_step_p, 4)
        except Exception as e:
            extra["train_step_ode_pallas_error"] = repr(e)
    print(json.dumps(extra), file=sys.stderr)
    try:
        with open("BENCH_EXTRA.json", "w") as f:
            json.dump(extra, f, indent=1)
    except OSError:
        pass

    print(
        json.dumps(
            {
                "metric": "enf_decode_throughput",
                "value": round(pts_ours, 1),
                "unit": "coord-points/sec/chip",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
