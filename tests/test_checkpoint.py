"""Checkpoint save/restore round trip on the meta-SGD train state."""

import jax
import jax.numpy as jnp
import numpy as np

from enf_pde_tpu.builders import build_models
from enf_pde_tpu.data import planar_coords
from enf_pde_tpu.train.checkpoint import CheckpointManager
from enf_pde_tpu.train.meta_sgd import MetaSGDTrainer

from tests.test_train_e2e import tiny_cfg, SIZE


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_cfg()
    decoder, ode_model = build_models(cfg)
    trainer = MetaSGDTrainer(cfg, decoder, ode_model, planar_coords(SIZE, SIZE), seed=0)
    state = trainer.init_state()

    mgr = CheckpointManager(str(tmp_path), every_n_epochs=1, keep_n=2)
    mgr.save(3, state, cfg.to_dict())
    mgr.wait()
    assert mgr.latest_epoch() == 3

    fresh = trainer.init_state()
    # Perturb so restore provably overwrites.
    fresh = fresh.replace(params=jax.tree.map(lambda x: x + 1.0, fresh.params))
    restored = mgr.restore(fresh)

    for a, b in zip(
        jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(restored.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Optimizer state trees restore too.
    for a, b in zip(
        jax.tree_util.tree_leaves(state.nef_opt_state),
        jax.tree_util.tree_leaves(restored.nef_opt_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_metrics_helpers():
    from enf_pde_tpu.utils import iou, mse, psnr

    a = jnp.ones((2, 4, 4, 1))
    assert float(mse(a, a)) == 0.0
    p = psnr(a, a)
    assert p.shape == (2,) and float(p.min()) > 70
    occ = np.array([[1.0, -1.0, 1.0], [1.0, 1.0, 1.0]])
    np.testing.assert_allclose(iou(occ, occ), 1.0)
    np.testing.assert_allclose(iou(occ, -occ), [0.0, 0.0], atol=1e-9)
