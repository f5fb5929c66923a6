"""Tests for embeddings and the equivariant cross-attention op.

The attention op is checked against a handwritten einsum oracle that recomputes the
reference semantics (FiLM value conditioning, window-as-logit-bias, softmax over
latents) directly from the flax parameter dict.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enf_pde_tpu.geometry import NormRelativePositionND, RelativePositionPeriodic
from enf_pde_tpu.ops import EquivariantCrossAttention, RFFNet, get_embedding, polynomial_features

B, N, Z, D, H = 2, 16, 4, 32, 2
LAT = 8


def test_rffnet_shapes_and_stopgrad():
    net = RFFNet(in_dim=3, output_dim=D, hidden_dim=D, num_layers=2, std=0.5)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3))
    params = net.init(jax.random.PRNGKey(1), x)
    y = net.apply(params, x)
    assert y.shape == (B, N, D)

    # Fixed coefficients receive zero cotangent.
    grads = jax.grad(lambda p: jnp.sum(net.apply(p, x) ** 2))(params)
    coeff_grad = grads["params"]["RFFEmbedding_0"]["coefficients"]
    assert np.abs(coeff_grad).max() == 0.0


def test_rff_frequency_scale():
    """Larger std -> higher-frequency features (larger gradient wrt input)."""
    x = jnp.linspace(-1, 1, 256)[None, :, None]

    def roughness(std):
        net = RFFNet(in_dim=1, output_dim=1, hidden_dim=64, num_layers=2, std=std)
        params = net.init(jax.random.PRNGKey(0), x)
        y = net.apply(params, x)[0, :, 0]
        return float(jnp.mean(jnp.abs(jnp.diff(y))))

    assert roughness(2.0) > 3 * roughness(0.02)


def test_polynomial_features_degree():
    x = jax.random.normal(jax.random.PRNGKey(0), (5, 3))
    f = polynomial_features(x, degree=2)
    assert f.shape == (5, 3 + 9 + 27)
    np.testing.assert_allclose(f[:, 3:12], (x[:, :, None] * x[:, None, :]).reshape(5, 9), rtol=1e-6)


@pytest.mark.parametrize("etype", ["rff", "ffn", "polynomial"])
def test_embedding_factory(etype):
    emb = get_embedding(etype, num_in=2, num_hidden=16, num_emb_dim=16, freq_multiplier=2.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, 2))
    params = emb.init(jax.random.PRNGKey(1), x)
    assert emb.apply(params, x).shape == (B, N, 16)


def _make_attn(condition_value=True, use_window=True, project_heads=True, invariant=None):
    invariant = invariant or NormRelativePositionND(2)
    return EquivariantCrossAttention(
        num_hidden=D,
        num_heads=H,
        invariant=invariant,
        embedding_type="rff",
        embedding_freq_multiplier=(0.5, 2.0),
        condition_value_transform=condition_value,
        condition_invariant_embedding=False,
        project_heads=project_heads,
        use_gaussian_window=use_window,
    )


def _inputs(key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 4)
    x = jax.random.normal(ks[0], (B, N, 2))
    p = jax.random.normal(ks[1], (B, Z, 2))
    a = jax.random.normal(ks[2], (B, Z, LAT))
    sigma = jnp.ones((B, Z, 1))
    return x, p, a, sigma


def _dense(params, x):
    return x @ params["kernel"] + params["bias"]


def _rffnet_oracle(params, x):
    h = (2 * jnp.pi) * (x @ params["RFFEmbedding_0"]["coefficients"])
    h = jnp.concatenate([jnp.sin(h), jnp.cos(h)], axis=-1)
    h = jax.nn.relu(_dense(params["Dense_0"], h))
    return _dense(params["Dense_1"], h)


def _pointwise_ffn_oracle(params, x):
    h = jax.nn.gelu(_dense(params["Dense_0"], x))
    mean = h.mean(axis=-1, keepdims=True)
    var = h.var(axis=-1, keepdims=True)
    h = (h - mean) / jnp.sqrt(var + 1e-6)
    h = h * params["LayerNorm_0"]["scale"] + params["LayerNorm_0"]["bias"]
    return _dense(params["Dense_1"], h)


def test_attention_matches_einsum_oracle():
    """End-to-end check of the attention op against a from-scratch recomputation."""
    attn = _make_attn()
    x, p, a, sigma = _inputs()
    params = attn.init(jax.random.PRNGKey(3), x, p, a, sigma)
    out = attn.apply(params, x, p, a, sigma)
    assert out.shape == (B, N, D)

    pr = params["params"]
    inv = attn.invariant(x, p)
    q = _dense(pr["inv_emb_to_q"], _rffnet_oracle(pr["invariant_embedding_query"], inv))
    k = _dense(pr["a_to_k"], a)
    v = _dense(pr["a_to_v"], a)

    emb_v = _rffnet_oracle(pr["invariant_embedding_value"], inv)
    gamma_beta = _pointwise_ffn_oracle(pr["inv_emb_to_v"], emb_v)
    gamma, beta = jnp.split(gamma_beta, 2, axis=-1)
    v = v[:, None] * (1 + gamma) + beta
    v = v.reshape(*v.shape[:-1], H, D)
    v = _pointwise_ffn_oracle(pr["inv_emb_cond_mixer"], v)

    q = q.reshape(*q.shape[:-1], H, D)
    k = k.reshape(*k.shape[:-1], H, D)
    att = jnp.einsum("bczhd,bzhd->bczh", q, k) / jnp.sqrt(D)
    att = att + attn.invariant.gaussian_window(x, p, sigma)
    att = jax.nn.softmax(att, axis=-2)
    y = jnp.einsum("bczh,bczhd->bchd", att, v).reshape(B, N, H * D)
    expected = _dense(pr["out_proj"], y)

    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=2e-5, atol=2e-5)


def test_attention_softmax_over_latents():
    """With one latent, attention weights are 1 regardless of window/logits."""
    attn = _make_attn(condition_value=False, use_window=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, 2))
    p = jnp.zeros((B, 1, 2))
    a = jax.random.normal(jax.random.PRNGKey(1), (B, 1, LAT))
    params = attn.init(jax.random.PRNGKey(2), x, p, a, None)
    out = attn.apply(params, x, p, a, None)
    # Without value conditioning and a single latent the output is coordinate-independent.
    assert float(jnp.std(out, axis=1).max()) < 1e-5


def test_attention_no_head_projection_width():
    attn = _make_attn(project_heads=False)
    x, p, a, sigma = _inputs()
    params = attn.init(jax.random.PRNGKey(0), x, p, a, sigma)
    assert attn.apply(params, x, p, a, sigma).shape == (B, N, H * D)


def test_attention_gaussian_window_localizes():
    """A tiny window means each coordinate attends to its nearest latent only."""
    inv = NormRelativePositionND(2)
    attn = _make_attn(condition_value=False, use_window=True, invariant=inv)
    p = jnp.array([[[-0.5, -0.5], [0.5, 0.5]]])  # two far-apart latents
    x = p + 1e-3  # queries right at the latents
    a = jnp.array([[[1.0] * LAT, [-1.0] * LAT]])
    sigma = jnp.full((1, 2, 1), 0.05)
    params = attn.init(jax.random.PRNGKey(0), x, p, a, sigma)

    out = attn.apply(params, x, p, a, sigma)
    # The two outputs should mirror the two distinct latent contexts.
    assert float(jnp.abs(out[0, 0] - out[0, 1]).max()) > 1e-3


def test_attention_jit_and_grad():
    attn = _make_attn()
    x, p, a, sigma = _inputs()
    params = attn.init(jax.random.PRNGKey(0), x, p, a, sigma)

    @jax.jit
    def loss(params, a):
        return jnp.mean(attn.apply(params, x, p, a, sigma) ** 2)

    g = jax.grad(loss, argnums=1)(params, a)
    assert g.shape == a.shape
    assert jnp.all(jnp.isfinite(g))
