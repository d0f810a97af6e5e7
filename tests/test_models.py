"""Tiny-config model tests: shapes, jit, determinism (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdiffuse_tpu.models import (AutoencoderKL, CLIPTextModel,
                                    CLIPVisionModel, TINY_TEXT, TINY_UNET,
                                    TINY_VAE, TINY_VISION, UNet2DCondition)


def test_clip_text_shapes_and_determinism():
    model = CLIPTextModel(TINY_TEXT)
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, TINY_TEXT.vocab_size, size=(2, 77)))
    params = model.init(jax.random.PRNGKey(0), ids)
    out = model.apply(params, ids)
    assert out.shape == (2, 77, TINY_TEXT.hidden_size)
    out2 = jax.jit(model.apply)(params, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_clip_text_causality():
    """Changing a later token must not affect earlier positions (causal mask)."""
    model = CLIPTextModel(TINY_TEXT)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, TINY_TEXT.vocab_size, size=(1, 77)))
    params = model.init(jax.random.PRNGKey(0), ids)
    a = model.apply(params, ids)
    ids2 = ids.at[0, 50].set((ids[0, 50] + 1) % TINY_TEXT.vocab_size)
    b = model.apply(params, ids2)
    np.testing.assert_allclose(np.asarray(a[0, :50]), np.asarray(b[0, :50]),
                               atol=1e-5)
    assert np.abs(np.asarray(a[0, 50:]) - np.asarray(b[0, 50:])).max() > 1e-6


def test_clip_vision_all_patch_projection():
    model = CLIPVisionModel(TINY_VISION)
    img = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, TINY_VISION.image_size, TINY_VISION.image_size, 3)).astype(
            np.float32))
    params = model.init(jax.random.PRNGKey(0), img)
    out = model.apply(params, img)
    # The reference projects ALL tokens (cls + patches), not the pooled one.
    assert out.shape == (1, TINY_VISION.num_positions,
                         TINY_VISION.projection_dim)


def test_unet_shapes_jit():
    model = UNet2DCondition(TINY_UNET)
    lat = jnp.zeros((2, 16, 16, 4))
    t = jnp.full((2,), 500.0)
    ctx = jnp.zeros((2, 77, TINY_UNET.cross_attention_dim))
    params = model.init(jax.random.PRNGKey(0), lat, t, ctx)
    out = jax.jit(model.apply)(params, lat, t, ctx)
    assert out.shape == (2, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_context_sensitivity():
    """Cross-attention must make the output depend on the text context."""
    model = UNet2DCondition(TINY_UNET)
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.normal(size=(1, 16, 16, 4)).astype(np.float32))
    t = jnp.full((1,), 100.0)
    ctx1 = jnp.asarray(rng.normal(size=(1, 77, 32)).astype(np.float32))
    ctx2 = jnp.asarray(rng.normal(size=(1, 77, 32)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), lat, t, ctx1)
    a = model.apply(params, lat, t, ctx1)
    b = model.apply(params, lat, t, ctx2)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6


def test_unet_timestep_sensitivity():
    model = UNet2DCondition(TINY_UNET)
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.normal(size=(1, 16, 16, 4)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(1, 77, 32)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), lat, jnp.full((1,), 1.0), ctx)
    a = model.apply(params, lat, jnp.full((1,), 1.0), ctx)
    b = model.apply(params, lat, jnp.full((1,), 900.0), ctx)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6


def test_vae_roundtrip_shapes():
    model = AutoencoderKL(TINY_VAE)
    img = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), img, jax.random.PRNGKey(1))
    mean, logvar = model.apply(params, img, method=model.encode)
    f = 2**(len(TINY_VAE.block_channels) - 1)
    assert mean.shape == (1, 32 // f, 32 // f, TINY_VAE.latent_channels)
    assert logvar.shape == mean.shape
    dec = model.apply(params, mean, method=model.decode)
    assert dec.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(dec)).all()


def test_vae_sampling_uses_key():
    from flexdiffuse_tpu.models import sample_latents
    mean = jnp.zeros((1, 4, 4, 4))
    logvar = jnp.zeros((1, 4, 4, 4))
    a = sample_latents(mean, logvar, jax.random.PRNGKey(0))
    b = sample_latents(mean, logvar, jax.random.PRNGKey(1))
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-3


def test_timestep_embedding_properties():
    from flexdiffuse_tpu.models.unet import timestep_embedding
    emb = timestep_embedding(jnp.asarray([0.0, 500.0]), 320)
    assert emb.shape == (2, 320)
    # t=0: cos half = 1, sin half = 0 (flip_sin_to_cos puts cos first).
    np.testing.assert_allclose(np.asarray(emb[0, :160]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 160:]), 0.0, atol=1e-6)
