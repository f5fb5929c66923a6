"""End-to-end training smoke tests on a tiny planar-diffusion problem.

Checks the reference's core training behaviors: the meta-SGD inner loop descends, the
nef phase reduces reconstruction loss, the ode phase reduces rollout loss, and the
jitted val step returns finite in-t/out-t MSEs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enf_pde_tpu.builders import build_models
from enf_pde_tpu.config import Config
from enf_pde_tpu.data.diffusion_plane import generate_diffusion_trajectories
from enf_pde_tpu.data import planar_coords
from enf_pde_tpu.models.latents import latents_to_pose
from enf_pde_tpu.train.meta_sgd import MetaSGDTrainer

SIZE = 16


def tiny_cfg(**over):
    cfg = Config(
        {
            "dataset": {
                "name": "diffusion_plane",
                "batch_size": 2,
                "traj_len_train": 5,
                "traj_len_out_horizon": 3,
            },
            "nef": {
                "num_in": 2,
                "num_out": 1,
                "num_layers": 0,
                "num_hidden": 16,
                "num_heads": 2,
                "condition_value_transform": True,
                "latent_dim": 8,
                "num_latents": 4,
                "gaussian_window": -1,
                "optimize_gaussian_window": False,
                "use_gaussian_window": True,
                "embedding_type": "rff",
                "embedding_freq_multiplier_invariant": 0.05,
                "embedding_freq_multiplier_value": 0.01,
                "invariant_type": "ponita",
            },
            "node": {
                "name": "ponita",
                "num_layers": 2,
                "num_hidden": 16,
                "widening_factor": 2,
                "kernel_size": "global",
                "degree": 2,
                "basis_dim": 8,
                "dt": 1,
                "method": "euler",
            },
            "training": {
                "num_epochs": 2,
                "max_num_sampled_points": 64,
                "ode": {"train_from_epoch": 1, "train_until_epoch": 100},
                "nef": {"train_from_epoch": 0, "fit_on_num_steps": 2, "train_until_epoch": 1},
            },
            "test": {"test_interval": 100, "test_dp_interval": 100},
            "meta": {
                "num_inner_steps": 3,
                "inner_learning_rate_p": 1.0,
                "inner_learning_rate_a": 5.0,
                "inner_learning_rate_window": 0.0,
                "learning_rate_meta_sgd": 1e-4,
                "noise_pos_inner_loop": 0.0,
            },
            "optimizer": {
                "learning_rate_enf": 1e-4,
                "learning_rate_codes": 0.0,
            },
        }
    )
    for k, v in over.items():
        cfg.set_path(k, v)
    return cfg


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    decoder, ode_model = build_models(cfg)
    coords = planar_coords(SIZE, SIZE)
    trainer = MetaSGDTrainer(cfg, decoder, ode_model, coords, seed=0)
    state = trainer.init_state()
    traj = generate_diffusion_trajectories(np.arange(2), size=SIZE)[:, :8]
    # Normalize to O(1) for a stable smoke test.
    traj = traj / (np.abs(traj).max() + 1e-8)
    return cfg, trainer, state, jnp.asarray(traj)


def test_state_structure(setup):
    _, trainer, state, _ = setup
    assert set(state.params.keys()) == {"nef", "autodecoder", "meta_sgd_lrs", "ode"}
    assert state.params["meta_sgd_lrs"]["a"].shape == (8,)
    assert "p_ori" in state.params["meta_sgd_lrs"]  # ponita has orientation
    assert state.params["autodecoder"]["p_pos"].shape == (1, 4, 2)


def test_inner_loop_descends(setup):
    """The 3-step latent fit should reduce reconstruction loss on the query mask."""
    _, trainer, state, traj = setup
    frames = traj[:, 0]
    rng = jax.random.PRNGKey(42)

    def query_loss_with_steps(k):
        inner = trainer.inner_loop
        old_steps = trainer.inner_cfg
        # Rebuild with k steps.
        from enf_pde_tpu.train.inner_loop import InnerLoopConfig, make_inner_loop

        cfg_k = InnerLoopConfig(k, old_steps.max_num_sampled_points, False, 0.0)
        loop_k = make_inner_loop(trainer.decoder.apply, trainer.coords, cfg_k)
        loss, _ = loop_k(
            state.params["nef"], state.params["meta_sgd_lrs"], state.params["autodecoder"],
            frames, rng,
        )
        return float(loss)

    l0 = query_loss_with_steps(0)
    l3 = query_loss_with_steps(3)
    assert np.isfinite(l0) and np.isfinite(l3)
    assert l3 < l0, f"inner loop did not descend: {l0} -> {l3}"


def _copy(state):
    return jax.tree.map(lambda x: x.copy(), state)


def test_nef_step_improves_and_updates(setup):
    _, trainer, state, traj = setup
    losses = []
    s = _copy(state)
    for _ in range(8):
        loss, s = trainer.nef_train_step(s, traj)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], f"nef loss did not improve: {losses}"
    # meta lrs should have moved
    moved = jnp.abs(s.params["meta_sgd_lrs"]["a"] - state.params["meta_sgd_lrs"]["a"]).max()
    assert float(moved) > 0


@pytest.mark.slow
def test_ode_and_dual_steps_run(setup):
    _, trainer, state, traj = setup
    loss_o, s = trainer.ode_train_step(_copy(state), traj)
    assert np.isfinite(float(loss_o))
    # ODE step must not touch nef params. (Steps donate their input state, so pull
    # values to host before feeding `s` onward.)
    leaf0 = np.asarray(jax.tree_util.tree_leaves(state.params["nef"])[0])
    leaf1 = np.asarray(jax.tree_util.tree_leaves(s.params["nef"])[0])
    np.testing.assert_array_equal(leaf0, leaf1)

    loss_d, s2 = trainer.dual_train_step(s, traj)
    assert np.isfinite(float(loss_d))
    leaf2 = np.asarray(jax.tree_util.tree_leaves(s2.params["nef"])[0])
    assert np.abs(leaf2 - leaf1).max() > 0


def test_val_step_finite_and_dp_variants(setup):
    _, trainer, state, traj = setup
    mse_in, mse_out = trainer.val_step(state, traj)
    assert np.isfinite(float(mse_in)) and np.isfinite(float(mse_out))
    mse_in_dp, mse_out_dp = trainer.val_step_dp[0.5](state, traj)
    assert np.isfinite(float(mse_in_dp)) and np.isfinite(float(mse_out_dp))


def test_phase_scheduling(setup):
    cfg, trainer, _, _ = setup
    step, nef, ode = trainer.select_train_step(1)
    assert nef and not ode and step is trainer.nef_train_step
    step, nef, ode = trainer.select_train_step(2)
    assert ode and not nef and step is trainer.ode_train_step
    # Past the last phase window (ode until 100): the reference raises mid-run
    # (_base_pde_trainer.py:290-298), making configured epochs past the schedule
    # unreachable (config_ihc.yaml: 2500 epochs vs ode until 2000). We expose the
    # hole via phase_active so TrainLoop stops cleanly instead.
    assert trainer.phase_active(100) and not trainer.phase_active(101)
    with pytest.raises(ValueError, match="No training phase"):
        trainer.select_train_step(101)


def test_ode_weight_decay_knob(setup):
    """optimizer.weight_decay_ode defaults to adamw's 1e-4 (reference-implicit);
    raising it changes only the ODE update (out_t knob, diff_sphere_out_t_note.md)."""
    import copy as _copy_mod

    from enf_pde_tpu.train.state import make_optimizers

    cfg, trainer, state, _ = setup
    params = state.params["ode"]
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)

    def ode_update(c):
        opts = make_optimizers(c)
        opt_state = opts.ode.init(params)
        upd, _ = opts.ode.update(grads, opt_state, params)
        return upd

    base = ode_update(cfg)
    cfg_default = _copy_mod.deepcopy(cfg)
    cfg_default.optimizer.weight_decay_ode = 1e-4
    same = ode_update(cfg_default)
    for a, b in zip(jax.tree_util.tree_leaves(base), jax.tree_util.tree_leaves(same)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    cfg_wd = _copy_mod.deepcopy(cfg)
    cfg_wd.optimizer.weight_decay_ode = 1e-2
    heavy = ode_update(cfg_wd)
    diffs = [
        np.abs(np.asarray(a) - np.asarray(b)).max()
        for a, b in zip(jax.tree_util.tree_leaves(base), jax.tree_util.tree_leaves(heavy))
    ]
    assert max(diffs) > 0  # decay term scales with params, so updates must differ


def test_loop_stops_cleanly_when_schedule_exhausted(setup, tmp_path):
    """num_epochs past the last phase window must end the run, not crash it.

    Regression: the 2500-epoch ihc_full run died at epoch 2001 with
    'No training phase active' after 2.5 h (ode window ends at 2000, mirroring
    the reference's own dead config_ihc.yaml tail).
    """
    cfg, trainer, state, traj = setup
    from enf_pde_tpu.train.logging import MetricLogger
    from enf_pde_tpu.train.loop import TrainLoop

    cfg.training.ode.train_until_epoch = 2  # schedule covers epochs 1-2 only
    cfg.test.test_interval = 2
    cfg.test.test_dp_interval = 10**9
    cfg.test.test_equiv_at_epoch = 10**9
    cfg.logging = {"log_every_n_steps": 100}  # fixture cfg has no logging section
    loader = [(traj, np.arange(traj.shape[0]))]
    logger = MetricLogger(str(tmp_path))
    loop = TrainLoop(trainer, loader, loader, logger=logger, checkpoints=None)
    out = loop.run(5, state=_copy(state))  # asks for 5 epochs; 3-5 uncovered
    assert out is not None
    lines = (tmp_path / "metrics.jsonl").read_text().splitlines()
    assert any("schedule_exhausted_at_epoch" in ln for ln in lines)


@pytest.mark.slow
def test_second_order_grads_through_inner_loop(setup):
    """Outer grads w.r.t. nef params must include the path through inner updates.

    With zero inner LRs the inner loop is a no-op; the outer grad should then differ
    from the grad with nonzero inner LRs (i.e. the inner path contributes).
    """
    _, trainer, state, traj = setup
    rng = jax.random.PRNGKey(7)
    frames = traj[:, 0]

    def outer_loss(nef_params, lrs):
        loss, _ = trainer.inner_loop(
            nef_params, lrs, state.params["autodecoder"], frames, rng
        )
        return loss

    lrs = state.params["meta_sgd_lrs"]
    zero_lrs = jax.tree.map(jnp.zeros_like, lrs)
    g_with = jax.grad(outer_loss)(state.params["nef"], lrs)
    g_zero = jax.grad(outer_loss)(state.params["nef"], zero_lrs)
    diff = jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(jnp.abs(x).sum()),
        jax.tree.map(lambda a, b: a - b, g_with, g_zero),
        0.0,
    )
    assert diff > 0, "second-order path through the inner loop is missing"

    # And the loss must be differentiable w.r.t. the learned inner LRs.
    g_lrs = jax.grad(lambda l: outer_loss(state.params["nef"], l))(lrs)
    assert float(jnp.abs(g_lrs["a"]).sum()) > 0


def test_inner_loop_unroll_parity(setup):
    """`meta.inner_unroll` is a pure scheduling knob: the unrolled inner loop must
    match the scanned one bitwise in loss, fitted latents, and second-order grads."""
    _, trainer, state, traj = setup
    from enf_pde_tpu.train.inner_loop import make_inner_loop

    frames = traj[:, 0]
    rng = jax.random.PRNGKey(11)
    loops = {
        u: make_inner_loop(
            trainer.decoder.apply, trainer.coords, trainer.inner_cfg._replace(unroll=u)
        )
        for u in (False, True)
    }

    out = {}
    for u, loop in loops.items():
        def outer(nef_params, lrs):
            loss, lat = loop(nef_params, lrs, state.params["autodecoder"], frames, rng)
            return loss, lat

        (loss, lat), grads = jax.value_and_grad(outer, has_aux=True)(
            state.params["nef"], state.params["meta_sgd_lrs"]
        )
        out[u] = (float(loss), lat, grads)

    assert out[True][0] == pytest.approx(out[False][0], rel=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(out[True][1]), jax.tree_util.tree_leaves(out[False][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(out[True][2]), jax.tree_util.tree_leaves(out[False][2])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
