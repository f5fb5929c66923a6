"""Decoder, latent table, and transformer tests (shapes, equivariance, chunking)."""

import jax
import jax.numpy as jnp
import numpy as np

from enf_pde_tpu.geometry import (
    Ponita2D,
    PonitaPos2D,
    RelativePositionPeriodic,
)
from enf_pde_tpu.models import (
    EnfDecoder,
    EquivariantTransformer,
    decode_chunked,
    gather_latents,
    init_latents,
    latents_to_pose,
    tile_latents,
)

B, N, Z, D, H, LAT = 2, 24, 4, 16, 2, 8


def _decoder(invariant_type="rel_pos_periodic", num_layers=0, use_window=True):
    if invariant_type == "rel_pos_periodic":
        ca = sa = RelativePositionPeriodic(2)
    elif invariant_type == "ponita":
        ca, sa = PonitaPos2D(), Ponita2D()
    else:
        raise ValueError(invariant_type)
    return EnfDecoder(
        num_hidden=D,
        num_heads=H,
        num_layers=num_layers,
        num_out=3,
        latent_dim=LAT,
        cross_attn_invariant=ca,
        self_attn_invariant=sa,
        embedding_type="rff",
        embedding_freq_multiplier=(0.5, 2.0),
        condition_value_transform=True,
        use_gaussian_window=use_window,
    )


def _latents(num_ori=0, num_signals=B):
    lat = init_latents(
        num_signals=num_signals,
        num_latents=Z,
        latent_dim=LAT,
        num_pos_dims=2,
        num_ori_dims=num_ori,
        coordinate_system="cartesian",
    )
    return latents_to_pose(lat)


def test_decoder_shapes():
    dec = _decoder()
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, N, 2), minval=-1, maxval=1)
    p, a, w = _latents()
    params = dec.init(jax.random.PRNGKey(1), x, p, a, w)
    out = dec.apply(params, x, p, a, w)
    assert out.shape == (B, N, 3)


def test_decoder_with_self_attention_layers():
    dec = _decoder(num_layers=2)
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, N, 2), minval=-1, maxval=1)
    p, a, w = _latents()
    params = dec.init(jax.random.PRNGKey(1), x, p, a, w)
    assert dec.apply(params, x, p, a, w).shape == (B, N, 3)


def test_decoder_translation_equivariance_periodic():
    """Shifting latent poses and queries together leaves the decoded field unchanged."""
    dec = _decoder("rel_pos_periodic")
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, N, 2), minval=-1, maxval=1)
    p, a, w = _latents()
    params = dec.init(jax.random.PRNGKey(1), x, p, a, w)
    out = dec.apply(params, x, p, a, w)
    shift = jnp.array([0.31, -0.12])
    out_shift = dec.apply(params, x + shift, p + shift, a, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_shift), atol=2e-4)


def test_decoder_se2_equivariance_ponita():
    """Rotating latent poses (positions + orientations) rotates the decoded field."""
    dec = _decoder("ponita")
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, N, 2), minval=-1, maxval=1)
    lat = init_latents(B, Z, LAT, num_pos_dims=2, num_ori_dims=1)
    p, a, w = latents_to_pose(lat)
    params = dec.init(jax.random.PRNGKey(1), x, p, a, w)
    out = dec.apply(params, x, p, a, w)

    th = np.pi / 5
    R = jnp.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    x_rot = x @ R.T
    p_rot = jnp.concatenate([p[..., :2] @ R.T, p[..., 2:] + th], axis=-1)
    out_rot = dec.apply(params, x_rot, p_rot, a, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_rot), atol=2e-4)


def test_decode_chunked_matches_full():
    dec = _decoder()
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, 50, 2), minval=-1, maxval=1)
    p, a, w = _latents()
    params = dec.init(jax.random.PRNGKey(1), x, p, a, w)
    full = dec.apply(params, x, p, a, w)
    chunked = decode_chunked(dec.apply, params, x, p, a, w, chunk_size=16)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked), rtol=1e-5, atol=1e-5)

    jitted = jax.jit(
        lambda prm, xc: decode_chunked(dec.apply, prm, xc, p, a, w, chunk_size=16)
    )
    np.testing.assert_allclose(np.asarray(full), np.asarray(jitted(params, x)), rtol=1e-5, atol=1e-5)


def test_latent_init_layout():
    lat = init_latents(3, 4, LAT, num_pos_dims=2, num_ori_dims=1, coordinate_system="cartesian")
    assert lat["p_pos"].shape == (3, 4, 2)
    assert lat["p_ori"].shape == (3, 4, 1)
    assert lat["a"].shape == (3, 4, LAT)
    assert lat["gaussian_window"].shape == (3, 4, 1)
    # Window defaults to latent spacing: num_pos_dims / latents_per_dim = 2/2.
    np.testing.assert_allclose(lat["gaussian_window"], 1.0)
    np.testing.assert_allclose(lat["a"], 1.0)

    polar = init_latents(1, 18, LAT, num_pos_dims=2, num_ori_dims=0, coordinate_system="polar")
    assert polar["p_pos"].shape == (1, 18, 2)
    assert float(polar["p_pos"][..., 0].max()) <= 2 * np.pi
    assert float(polar["p_pos"][..., 1].max()) <= np.pi

    ball = init_latents(1, 25, LAT, num_pos_dims=4, num_ori_dims=0, coordinate_system="ball")
    assert ball["p_pos"].shape == (1, 25, 4)
    np.testing.assert_allclose(ball["p_pos"][..., 3], 0.75)
    np.testing.assert_allclose(ball["gaussian_window"], 1.0)


def test_gather_and_tile_latents():
    lat = init_latents(4, Z, LAT, num_pos_dims=2, num_ori_dims=0)
    sub = gather_latents(lat, jnp.array([0, 2]))
    assert sub["a"].shape == (2, Z, LAT)
    meta = init_latents(1, Z, LAT, num_pos_dims=2, num_ori_dims=0)
    tiled = tile_latents(meta, 5)
    assert tiled["p_pos"].shape == (5, Z, 2)


def test_transformer_forward_and_pooling():
    inv = RelativePositionPeriodic(2)
    tf = EquivariantTransformer(
        num_hidden=D,
        num_heads=H,
        num_layers=2,
        num_out=5,
        self_attn_invariant=inv,
        embedding_type="rff",
        embedding_freq_multiplier=(0.5, 2.0),
        condition_value_transform=True,
        global_pooling=True,
    )
    p, a, w = _latents()
    params = tf.init(jax.random.PRNGKey(0), (p, a, w))
    out = tf.apply(params, (p, a, w))
    assert out.shape == (B, 5)
