"""Utils tests: numeric equivariance checker, visualization smoke, step timer."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from enf_pde_tpu.geometry import PonitaPos2D, Ponita2D
from enf_pde_tpu.geometry.invariants import (
    BallInvariant,
    BallLatInvariant,
    RelativeLatitudePeriodic,
    RelativePositionPolarPeriodic,
)
from enf_pde_tpu.models import EnfDecoder, init_latents, latents_to_pose
from enf_pde_tpu.utils import (
    StepTimer,
    equivariance_errors,
    equivariance_errors_2d,
    plot_ball_rollout,
    plot_planar_rollout,
    plot_sphere_rollout,
)


def _make_decoder(invariant, use_gaussian_window=True):
    return EnfDecoder(
        num_hidden=16,
        num_heads=2,
        num_layers=0,
        num_out=1,
        latent_dim=8,
        cross_attn_invariant=invariant,
        self_attn_invariant=invariant,
        embedding_type="rff",
        embedding_freq_multiplier=(0.5, 2.0),
        condition_value_transform=True,
        use_gaussian_window=use_gaussian_window,
    )


@pytest.mark.slow  # the checker stays fast-covered by test_equivariance_checker_ball;
# the planar (2d) variant also runs on hardware in every planar training run
def test_equivariance_checker_flags_correctly():
    dec = EnfDecoder(
        num_hidden=16,
        num_heads=2,
        num_layers=0,
        num_out=1,
        latent_dim=8,
        cross_attn_invariant=PonitaPos2D(),
        self_attn_invariant=Ponita2D(),
        embedding_type="rff",
        embedding_freq_multiplier=(0.5, 2.0),
        condition_value_transform=True,
        use_gaussian_window=True,
    )
    lat = init_latents(2, 4, 8, num_pos_dims=2, num_ori_dims=1)
    p, a, w = latents_to_pose(lat)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 2), minval=-1, maxval=1)
    params = dec.init(jax.random.PRNGKey(1), x, p, a, w)

    errs = equivariance_errors_2d(
        dec.apply, params, x, p, a, w, has_orientation=True, periodic=False
    )
    assert errs["translation"] < 1e-4
    assert errs["rotation"] < 1e-4

    # A broken decode (coords shifted, poses NOT shifted) must be flagged.
    shifted_only_coords = dec.apply(params, x + 0.3, p, a, w)
    base = dec.apply(params, x, p, a, w)
    assert float(jnp.abs(shifted_only_coords - base).max()) > 1e-3


def _sphere_coords(key, b, n):
    k1, k2 = jax.random.split(key)
    phi = jax.random.uniform(k1, (b, n), minval=0.0, maxval=2 * np.pi)
    theta = jax.random.uniform(k2, (b, n), minval=0.2, maxval=np.pi - 0.2)
    return jnp.stack([phi, theta], axis=-1)


@pytest.mark.slow  # the checker machinery stays fast-covered by the planar and
# ball variants; this adds the two S^2 invariants (two decoders, many programs)
def test_equivariance_checker_sphere():
    for inv, expect_rotation in (
        (RelativePositionPolarPeriodic(), True),
        (RelativeLatitudePeriodic(), False),
    ):
        dec = _make_decoder(inv)
        lat = init_latents(2, 8, 8, num_pos_dims=2, num_ori_dims=0, coordinate_system="polar")
        p, a, w = latents_to_pose(lat)
        x = _sphere_coords(jax.random.PRNGKey(0), 2, 32)
        params = dec.init(jax.random.PRNGKey(1), x, p, a, w)
        errs = equivariance_errors(
            dec.apply, params, x, p, a, w, invariant=inv, coordinate_system="polar"
        )
        assert errs["longitude"] < 1e-3
        assert ("rotation" in errs) == expect_rotation
        if expect_rotation:
            assert errs["rotation"] < 1e-3


def test_equivariance_checker_ball():
    key = jax.random.PRNGKey(0)
    x_dir = _sphere_coords(key, 2, 32)
    r = jax.random.uniform(jax.random.PRNGKey(3), (2, 32, 1), minval=0.05, maxval=0.95)
    x = jnp.concatenate([x_dir, r], axis=-1)

    # ball_lat: longitude shift is an exact symmetry.
    inv = BallLatInvariant()
    dec = _make_decoder(inv)
    lat = init_latents(2, 4, 8, num_pos_dims=4, num_ori_dims=0, coordinate_system="ball")
    p, a, w = latents_to_pose(lat)
    params = dec.init(jax.random.PRNGKey(1), x, p, a, w)
    errs = equivariance_errors(
        dec.apply, params, x, p, a, w, invariant=inv, coordinate_system="ball"
    )
    assert errs["longitude"] < 1e-3

    # ball (Euler poses), window disabled: the R -> R Q^T recomposition preserves the
    # attention invariant exactly, so the decode must match to float tolerance.
    inv = BallInvariant()
    dec = _make_decoder(inv, use_gaussian_window=False)
    params = dec.init(jax.random.PRNGKey(2), x, p, a, w)
    errs = equivariance_errors(
        dec.apply, params, x, p, a, w, invariant=inv, coordinate_system="ball"
    )
    assert errs["rotation"] < 1e-3

    # With the window on, the reference's Euler-window quirk (ball.py:36-52) breaks
    # exact equivariance; the checker must still return a finite, larger error.
    dec_w = _make_decoder(inv, use_gaussian_window=True)
    params_w = dec_w.init(jax.random.PRNGKey(2), x, p, a, w)
    errs_w = equivariance_errors(
        dec_w.apply, params_w, x, p, a, w, invariant=inv, coordinate_system="ball"
    )
    assert np.isfinite(errs_w["rotation"])


def test_visualization_smoke(tmp_path):
    gt = np.random.RandomState(0).rand(4, 8, 8, 1).astype(np.float32)
    pred = gt + 0.01
    p_traj = np.random.RandomState(1).uniform(-1, 1, (4, 3, 3)).astype(np.float32)
    f1 = plot_planar_rollout(gt, pred, str(tmp_path / "planar.png"), p_traj)
    gt_s = np.random.RandomState(0).rand(3, 12, 6, 1).astype(np.float32)
    f2 = plot_sphere_rollout(gt_s, gt_s, str(tmp_path / "sphere.png"))
    gt_b = np.random.RandomState(0).rand(3, 8, 6, 6, 1).astype(np.float32)
    f3 = plot_ball_rollout(gt_b, gt_b, str(tmp_path / "ball.png"))
    import os

    for f in (f1, f2, f3):
        assert os.path.exists(f) and os.path.getsize(f) > 1000


def test_step_timer():
    t = StepTimer(ema=0.5)
    assert t.tick() is None
    import time

    time.sleep(0.01)
    dt = t.tick()
    assert dt is not None and dt > 0.005
    assert t.throughput(100) > 0
