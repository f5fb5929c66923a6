"""Sharding tests on the virtual 8-device CPU mesh.

Validate that (a) the data-parallel train step produces the same numerics as the
single-device step, and (b) coordinate-sharded decode matches unsharded decode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enf_pde_tpu.data import planar_coords
from enf_pde_tpu.data.diffusion_plane import generate_diffusion_trajectories
from enf_pde_tpu.builders import build_models
from enf_pde_tpu.models.latents import latents_to_pose, tile_latents
from enf_pde_tpu.parallel import (
    data_sharding,
    make_mesh,
    shard_batch,
    shard_train_step,
    sharded_decode,
)
from enf_pde_tpu.train.meta_sgd import MetaSGDTrainer

from tests.test_train_e2e import tiny_cfg, SIZE

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    cfg.dataset.batch_size = 8
    decoder, ode_model = build_models(cfg)
    coords = planar_coords(SIZE, SIZE)
    trainer = MetaSGDTrainer(cfg, decoder, ode_model, coords, seed=0)
    state = trainer.init_state()
    traj = generate_diffusion_trajectories(np.arange(8), size=SIZE)[:, :8]
    traj = traj / (np.abs(traj).max() + 1e-8)
    return cfg, trainer, state, jnp.asarray(traj)


def test_mesh_creation():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


@pytest.mark.slow
def test_sharded_nef_step_matches_single_device(setup):
    cfg, trainer, state, traj = setup
    mesh = make_mesh()

    # Steps donate their input state; use independent copies.
    copy = lambda s: jax.tree.map(lambda x: x.copy(), s)
    loss_ref, state_ref = trainer.nef_train_step(copy(state), traj)

    sharded_step = shard_train_step(trainer._nef_train_step, mesh)
    batch = shard_batch(traj, mesh)
    loss_sh, state_sh = sharded_step(copy(state), batch)

    np.testing.assert_allclose(float(loss_ref), float(loss_sh), rtol=1e-4)
    leaves_ref = jax.tree_util.tree_leaves(state_ref.params["nef"])
    leaves_sh = jax.tree_util.tree_leaves(state_sh.params["nef"])
    for a, b in zip(leaves_ref, leaves_sh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6)


def test_sharded_ode_step_runs(setup):
    cfg, trainer, state, traj = setup
    mesh = make_mesh()
    sharded_step = shard_train_step(trainer._ode_train_step, mesh)
    state_copy = jax.tree.map(lambda x: x.copy(), state)
    loss, new_state = sharded_step(state_copy, shard_batch(traj, mesh))
    assert np.isfinite(float(loss))


def test_coordinate_sharded_decode_matches(setup):
    cfg, trainer, state, traj = setup
    mesh = make_mesh()
    decoder = trainer.decoder

    lat = tile_latents(state.params["autodecoder"], 2)
    p, a, w = latents_to_pose(lat)
    coords = jnp.asarray(planar_coords(SIZE, SIZE))[None].repeat(2, axis=0)  # N=256 % 8 == 0

    ref = decoder.apply(state.params["nef"], coords, p, a, w)
    dec = sharded_decode(decoder.apply, mesh)
    out = dec(state.params["nef"], coords, p, a, w)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=2e-5, atol=2e-5)


def test_2d_mesh_data_by_coord_decode(setup):
    """Combined 2D mesh: batch over 'data' x coordinates over 'coord'."""
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from functools import partial

    cfg, trainer, state, traj = setup
    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("data", "coord"))
    decoder = trainer.decoder

    from enf_pde_tpu.models.latents import latents_to_pose, tile_latents
    from enf_pde_tpu.data import planar_coords

    lat = tile_latents(state.params["autodecoder"], 4)
    p, a, w = latents_to_pose(lat)
    coords = jnp.asarray(planar_coords(SIZE, SIZE))[None].repeat(4, axis=0)

    ref = decoder.apply(state.params["nef"], coords, p, a, w)

    repl = NamedSharding(mesh, P())
    xspec = NamedSharding(mesh, P("data", "coord", None))
    lspec = NamedSharding(mesh, P("data", None, None))

    @partial(
        jax.jit,
        in_shardings=(repl, xspec, lspec, lspec, lspec),
        out_shardings=xspec,
    )
    def decode(params, x, p, a, w):
        return decoder.apply(params, x, p, a, w)

    out = decode(state.params["nef"], coords, p, a, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_val_step_coord_mesh_matches_chunked(setup):
    """val_step with a coordinate mesh (super-res eval path) == chunked single-device."""
    cfg, trainer, state, traj = setup
    decoder, ode_model = build_models(cfg)
    mesh_trainer = MetaSGDTrainer(
        cfg, decoder, ode_model, planar_coords(SIZE, SIZE), seed=0, coord_mesh=make_mesh()
    )
    a0, b0 = trainer.val_step(state, traj, 0)
    a1, b1 = mesh_trainer.val_step(state, traj, 0)
    np.testing.assert_allclose(float(a1), float(a0), rtol=1e-5)
    np.testing.assert_allclose(float(b1), float(b0), rtol=1e-5)
