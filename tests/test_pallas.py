"""Fused Pallas decode kernel vs the XLA attention oracle (interpret mode on CPU)."""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from enf_pde_tpu.geometry import (
    BallInvariant,
    NormRelativePositionND,
    PonitaPos2D,
    RelativePositionPeriodic,
    RelativePositionPolarPeriodic,
)
from enf_pde_tpu.models import EnfDecoder
from enf_pde_tpu.models.latents import init_latents, latents_to_pose, tile_latents
from enf_pde_tpu.ops import EquivariantCrossAttention

B, N, Z, D, H, LAT = 2, 64, 4, 32, 2, 8


def _attn(backend, invariant, use_window=True, num_heads=H):
    return EquivariantCrossAttention(
        num_hidden=D,
        num_heads=num_heads,
        invariant=invariant,
        embedding_type="rff",
        embedding_freq_multiplier=(0.5, 2.0),
        condition_value_transform=True,
        condition_invariant_embedding=False,
        project_heads=True,
        use_gaussian_window=use_window,
        backend=backend,
    )


def _check_parity(invariant, x, p, use_window=True, num_heads=H, atol=2e-5):
    a = jax.random.normal(jax.random.PRNGKey(2), (x.shape[0], p.shape[1], LAT))
    sigma = jnp.full((x.shape[0], p.shape[1], 1), 1.0)
    ref_attn = _attn("xla", invariant, use_window, num_heads)
    params = ref_attn.init(jax.random.PRNGKey(3), x, p, a, sigma)
    ref = ref_attn.apply(params, x, p, a, sigma)

    pal_attn = _attn("pallas_interpret", invariant, use_window, num_heads)
    out = pal_attn.apply(params, x, p, a, sigma)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=atol)


def test_kernel_parity_norm_rel_pos():
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, 2))
    p = jax.random.normal(jax.random.PRNGKey(1), (B, Z, 2))
    _check_parity(NormRelativePositionND(2), x, p)


def test_kernel_parity_periodic():
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, N, 2), minval=-1, maxval=1)
    p = jax.random.uniform(jax.random.PRNGKey(1), (B, Z, 2), minval=-1, maxval=1)
    _check_parity(RelativePositionPeriodic(2), x, p)


def test_kernel_parity_ponita_pose():
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, N, 2), minval=-1, maxval=1)
    p_pos = jax.random.uniform(jax.random.PRNGKey(1), (B, Z, 2), minval=-1, maxval=1)
    th = jax.random.uniform(jax.random.PRNGKey(2), (B, Z, 1), minval=0, maxval=2 * np.pi)
    p = jnp.concatenate([p_pos, jnp.cos(th), jnp.sin(th)], axis=-1)
    _check_parity(PonitaPos2D(), x, p)


def test_kernel_parity_sphere_window():
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, N, 2), minval=0.1, maxval=3.0)
    p = jax.random.uniform(jax.random.PRNGKey(1), (B, Z, 2), minval=0.1, maxval=3.0)
    _check_parity(RelativePositionPolarPeriodic(), x, p)


def test_kernel_parity_no_window():
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, 2))
    p = jax.random.normal(jax.random.PRNGKey(1), (B, Z, 2))
    _check_parity(NormRelativePositionND(2), x, p, use_window=False)


def test_kernel_parity_three_heads_ball():
    """IHC shape: 3 heads, ball invariant with 4D latent poses."""
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, N, 3), minval=0.1, maxval=1.0)
    lat = init_latents(B, Z, LAT, num_pos_dims=4, num_ori_dims=0, coordinate_system="ball")
    p, _, _ = latents_to_pose(lat)
    _check_parity(BallInvariant(), x, p, num_heads=3)


@pytest.mark.slow  # regression pin for the z=25 scoped-vmem tile cap; 646 coords
# through interpret mode is the fast suite's single most expensive kernel case
def test_kernel_parity_large_latent_count_tile_cap():
    """z=25 (the ihc configs) triggers the scoped-vmem coordinate-tile cap.

    The fused kernel's Mosaic stack scales with z*tile rows; at z=25 the former
    fixed 512-wide tile compiled to a 71.71M scoped allocation > the 64M budget
    on v5e (ihc64 s0 validation died, round 3). fused_enf_decode now shrinks the
    tile for large-z models — this pins numerics through the capped-tile path
    (646 coords: several capped tiles plus a ragged remainder).
    """
    z_big = 25
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, 646, 3), minval=0.1, maxval=1.0)
    lat = init_latents(B, z_big, LAT, num_pos_dims=4, num_ori_dims=0, coordinate_system="ball")
    p, _, _ = latents_to_pose(lat)
    _check_parity(BallInvariant(), x, p, num_heads=3)


def test_kernel_parity_ragged_coords():
    """Coordinate counts that don't divide the tile size exercise padding/masking."""
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 37, 2))
    p = jax.random.normal(jax.random.PRNGKey(1), (B, Z, 2))
    _check_parity(NormRelativePositionND(2), x, p)


def test_full_decoder_parity_pallas():
    """EnfDecoder end to end: pallas backend output equals xla backend output."""
    ca = sa = RelativePositionPeriodic(2)

    def mk(backend):
        return EnfDecoder(
            num_hidden=D,
            num_heads=H,
            num_layers=0,
            num_out=3,
            latent_dim=LAT,
            cross_attn_invariant=ca,
            self_attn_invariant=sa,
            embedding_type="rff",
            embedding_freq_multiplier=(0.5, 2.0),
            condition_value_transform=True,
            use_gaussian_window=True,
            backend=backend,
        )

    x = jax.random.uniform(jax.random.PRNGKey(0), (B, N, 2), minval=-1, maxval=1)
    lat = init_latents(B, Z, LAT, num_pos_dims=2, num_ori_dims=0)
    p, a, w = latents_to_pose(lat)
    a = a + 0.1 * jax.random.normal(jax.random.PRNGKey(4), a.shape)

    ref_dec = mk("xla")
    params = ref_dec.init(jax.random.PRNGKey(1), x, p, a, w)
    ref = ref_dec.apply(params, x, p, a, w)
    out = mk("pallas_interpret").apply(params, x, p, a, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=3e-5)


# ------------------------------------------------------------------- gradients


def _mk_decoder(backend, num_out=3):
    ca = sa = RelativePositionPeriodic(2)
    return EnfDecoder(
        num_hidden=D,
        num_heads=H,
        num_layers=0,
        num_out=num_out,
        latent_dim=LAT,
        cross_attn_invariant=ca,
        self_attn_invariant=sa,
        embedding_type="rff",
        embedding_freq_multiplier=(0.5, 2.0),
        condition_value_transform=True,
        use_gaussian_window=True,
        backend=backend,
    )


def _grad_setup():
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, N, 2), minval=-1, maxval=1)
    lat = init_latents(B, Z, LAT, num_pos_dims=2, num_ori_dims=0)
    p, a, w = latents_to_pose(lat)
    p = p + 0.05 * jax.random.normal(jax.random.PRNGKey(3), p.shape)
    a = a + 0.1 * jax.random.normal(jax.random.PRNGKey(4), a.shape)
    target = jax.random.normal(jax.random.PRNGKey(5), (B, N, 3))
    params = _mk_decoder("xla").init(jax.random.PRNGKey(1), x, p, a, w)
    return x, p, a, w, target, params


@pytest.mark.slow
def test_kernel_grad_parity_first_order():
    """Custom-VJP grads (params, poses, contexts, windows) match the XLA backend."""
    x, p, a, w, target, params = _grad_setup()

    def loss(backend):
        dec = _mk_decoder(backend)

        def fn(params, p, a, w):
            out = dec.apply(params, x, p, a, w)
            return jnp.mean((out - target) ** 2)

        return jax.grad(fn, argnums=(0, 1, 2, 3))(params, p, a, w)

    g_ref = loss("xla")
    g_pal = loss("pallas_interpret")
    flat_ref, _ = jax.flatten_util.ravel_pytree(g_ref)
    flat_pal, _ = jax.flatten_util.ravel_pytree(g_pal)
    np.testing.assert_allclose(np.asarray(flat_pal), np.asarray(flat_ref), rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_kernel_grad_parity_second_order():
    """Meta-SGD pattern: outer grad through an inner latent-SGD step matches XLA."""
    x, p, a, w, target, params = _grad_setup()

    def outer(backend):
        dec = _mk_decoder(backend)

        def inner_loss(latents, params):
            out = dec.apply(params, x, *latents)
            return jnp.mean((out - target) ** 2)

        def outer_loss(params):
            latents = (p, a, w)
            g = jax.grad(inner_loss)(latents, params)
            latents = jax.tree.map(lambda l, gi: l - 0.5 * gi, latents, g)
            return inner_loss(latents, params)

        return jax.grad(outer_loss)(params)

    g_ref = outer("xla")
    g_pal = outer("pallas_interpret")
    flat_ref, _ = jax.flatten_util.ravel_pytree(g_ref)
    flat_pal, _ = jax.flatten_util.ravel_pytree(g_pal)
    # Second-order values mix the kernel's in-VJP math with flax-module math whose
    # f32 op order differs (e.g. layernorm variance); tolerate that rounding.
    np.testing.assert_allclose(np.asarray(flat_pal), np.asarray(flat_ref), rtol=2e-3, atol=1e-3)
