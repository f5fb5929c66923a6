"""Pallas-eval fallback: a Mosaic failure at validation must degrade to XLA, not die.

Covers the guard added for production runs (``train/loop.py::_eval_guarded`` and
``MetaSGDTrainer.fallback_to_xla_eval``): the eval decoder swaps to the numerically
equivalent XLA path and the validation metrics are preserved.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from enf_pde_tpu.builders import build_models
from enf_pde_tpu.data import planar_coords
from enf_pde_tpu.data.diffusion_plane import generate_diffusion_trajectories
from enf_pde_tpu.train.loop import TrainLoop
from enf_pde_tpu.train.meta_sgd import MetaSGDTrainer

from test_train_e2e import SIZE, tiny_cfg


@pytest.fixture(scope="module")
def pallas_eval_setup():
    cfg = tiny_cfg(**{"nef.eval_backend": "pallas_interpret"})
    decoder, ode_model = build_models(cfg)
    trainer = MetaSGDTrainer(cfg, decoder, ode_model, planar_coords(SIZE, SIZE), seed=0)
    state = trainer.init_state()
    traj = generate_diffusion_trajectories(np.arange(2), size=SIZE)[:, :8]
    traj = traj / (np.abs(traj).max() + 1e-8)
    return trainer, state, jnp.asarray(traj)


def test_fallback_preserves_val_metrics(pallas_eval_setup):
    trainer, state, traj = pallas_eval_setup
    assert trainer.eval_decoder.backend == "pallas_interpret"
    a1, b1 = trainer.val_step(state, traj, 0)

    trainer.fallback_to_xla_eval()
    assert trainer.eval_decoder.backend == "xla"
    a2, b2 = trainer.val_step(state, traj, 0)

    np.testing.assert_allclose(float(a1), float(a2), rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(float(b1), float(b2), rtol=1e-3, atol=1e-6)


def test_eval_guarded_retries_once(pallas_eval_setup):
    trainer, state, traj = pallas_eval_setup
    # Re-arm the pallas eval backend (the previous test may have swapped it).
    trainer.eval_decoder = trainer.decoder.clone(backend="pallas_interpret")
    trainer._build_steps()

    logged = []
    loop = TrainLoop.__new__(TrainLoop)  # guard only touches trainer/logger/step
    loop.trainer = trainer
    loop.global_step = 7
    loop.logger = type("L", (), {"log": lambda self, d, **kw: logged.append(d)})()

    calls = {"n": 0}

    def flaky_validate(state, epoch):
        calls["n"] += 1
        if trainer.eval_decoder.backend == "pallas_interpret":
            raise RuntimeError("synthetic Mosaic failure")
        return trainer.val_step(state, traj, 0)

    a, b = loop._eval_guarded(flaky_validate, state, 1)
    assert calls["n"] == 2  # failed once, retried once after the swap
    assert trainer.eval_decoder.backend == "xla"
    assert np.isfinite(float(a)) and np.isfinite(float(b))
    assert {"eval_backend": "xla_fallback"} in logged


def test_guard_passthrough_on_xla_backend(pallas_eval_setup):
    """With an XLA eval decoder the guard must not intercept real errors."""
    trainer, state, traj = pallas_eval_setup
    trainer.fallback_to_xla_eval()
    assert trainer.eval_decoder.backend == "xla"

    loop = TrainLoop.__new__(TrainLoop)
    loop.trainer = trainer
    loop.global_step = 0
    loop.logger = type("L", (), {"log": lambda self, d, **kw: None})()

    with pytest.raises(RuntimeError, match="real bug"):
        loop._eval_guarded(lambda *a: (_ for _ in ()).throw(RuntimeError("real bug")))
