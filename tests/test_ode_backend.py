"""ode/dual-phase fused-decode opt-in (``nef.ode_backend``).

The rollout decode in ``MetaSGDTrainer._ode_loss`` sits outside the K-step inner
loop, so its gradients are first-order VJPs and the fused Pallas kernel can serve
them during training while the second-order nef phase stays on XLA (VERDICT r3
next-round #5). These tests pin:

- the opt-in wiring (``resolve_ode_backend``, ``ode_decoder`` clone),
- numerical parity of the ode and dual train steps between the default path and
  the opted-in path (which also exercises the wrt-ode-only gradient restructure
  of ``_ode_train_step``),
- the Mosaic-failure degrade path covering the ode decoder.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enf_pde_tpu.builders import build_models
from enf_pde_tpu.data import planar_coords
from enf_pde_tpu.data.diffusion_plane import generate_diffusion_trajectories
from enf_pde_tpu.train.meta_sgd import MetaSGDTrainer

from test_train_e2e import SIZE, tiny_cfg


def _make_trainer(**over):
    cfg = tiny_cfg(**over)
    decoder, ode_model = build_models(cfg)
    return MetaSGDTrainer(cfg, decoder, ode_model, planar_coords(SIZE, SIZE), seed=0)


@pytest.fixture(scope="module")
def traj():
    t = generate_diffusion_trajectories(np.arange(2), size=SIZE)[:, :8]
    return jnp.asarray(t / (np.abs(t).max() + 1e-8))


def test_default_keeps_train_decoder():
    trainer = _make_trainer()
    assert trainer.ode_decoder is trainer.decoder


def test_opt_in_clones_ode_decoder():
    trainer = _make_trainer(**{"nef.ode_backend": "pallas_interpret"})
    assert trainer.ode_decoder is not trainer.decoder
    assert trainer.ode_decoder.backend == "pallas_interpret"
    assert trainer.decoder.backend == "xla"


def test_ode_step_parity(traj):
    base = _make_trainer()
    fused = _make_trainer(**{"nef.ode_backend": "pallas_interpret"})

    loss_b, state_b = base.ode_train_step(base.init_state(), traj)
    loss_f, state_f = fused.ode_train_step(fused.init_state(), traj)

    np.testing.assert_allclose(float(loss_b), float(loss_f), rtol=1e-4)
    # The applied update (ode params only) must match across paths: same loss
    # surface, same optimizer — the wrt-ode-only grad is the same subgraph.
    for a, b in zip(
        jax.tree.leaves(state_b.params["ode"]), jax.tree.leaves(state_f.params["ode"])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)
    # And the params the ode phase never touches must be bit-identical.
    for a, b in zip(
        jax.tree.leaves(state_b.params["nef"]), jax.tree.leaves(state_f.params["nef"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow  # ode_step_parity keeps this path's fast coverage; the dual step
# additionally has on-TPU parity evidence (results/r4/ode_backend_check_*.json)
def test_dual_step_parity(traj):
    base = _make_trainer()
    fused = _make_trainer(**{"nef.ode_backend": "pallas_interpret"})

    loss_b, state_b = base.dual_train_step(base.init_state(), traj)
    loss_f, state_f = fused.dual_train_step(fused.init_state(), traj)

    np.testing.assert_allclose(float(loss_b), float(loss_f), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(state_b.params), jax.tree.leaves(state_f.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


@pytest.mark.slow  # the Mosaic-failure degrade path stays fast-covered by
# tests/test_eval_fallback.py; this adds the ode-decoder-specific clone check
def test_fallback_degrades_ode_decoder(traj):
    trainer = _make_trainer(**{"nef.ode_backend": "pallas_interpret"})
    trainer.fallback_to_xla_eval()
    assert trainer.ode_decoder.backend == "xla"
    loss, _ = trainer.ode_train_step(trainer.init_state(), traj)
    assert np.isfinite(float(loss))
