"""SDXL backbone tests (tiny configs): dual encoding, added cond, pipeline."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdiffuse_tpu.models.configs import (TINY_BIGG_TEXT, TINY_SDXL_UNET,
                                            TINY_TEXT, TINY_VAE)
from flexdiffuse_tpu.models.clip import CLIPTextModel
from flexdiffuse_tpu.models.sdxl import (SDXLTextEncoder, sdxl_guidance,
                                         time_ids, tween_sdxl_context)
from flexdiffuse_tpu.models.unet import UNet2DCondition
from flexdiffuse_tpu.models.vae import AutoencoderKL
from flexdiffuse_tpu.pipeline import FlexPipeline
from flexdiffuse_tpu.text.tokenizer import FakeTokenizer


@pytest.fixture(scope='module')
def dual_encoder():
    k = jax.random.PRNGKey(0)
    enc1 = CLIPTextModel(TINY_TEXT)
    p1 = enc1.init(k, jnp.zeros((1, 77), jnp.int32))
    enc2 = CLIPTextModel(TINY_BIGG_TEXT)
    p2 = enc2.init(k, jnp.zeros((1, 77), jnp.int32),
                   output='penultimate_and_pooled')
    return SDXLTextEncoder(enc1, p1, enc2, p2, FakeTokenizer())


def test_penultimate_differs_from_final():
    k = jax.random.PRNGKey(0)
    m = CLIPTextModel(TINY_TEXT)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 1000, (1, 77)))
    p = m.init(k, ids)
    final = m.apply(p, ids, output='final')
    penult = m.apply(p, ids, output='penultimate')
    assert final.shape == penult.shape
    assert np.abs(np.asarray(final) - np.asarray(penult)).max() > 1e-4


def test_pooled_uses_eos_position():
    k = jax.random.PRNGKey(0)
    m = CLIPTextModel(TINY_BIGG_TEXT)
    tk = FakeTokenizer()
    p = m.init(k, jnp.asarray(tk('x')), output='penultimate_and_pooled')
    a = m.apply(p, jnp.asarray(tk('a cat')),
                output='penultimate_and_pooled')[1]
    b = m.apply(p, jnp.asarray(tk('a cat sat')),
                output='penultimate_and_pooled')[1]
    assert a.shape == (1, TINY_BIGG_TEXT.projection_dim)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6


def test_dual_encoder_concat_width(dual_encoder):
    ctx, pooled = dual_encoder.encode(['a deer', 'a bear'])
    assert ctx.shape == (2, 77,
                         TINY_TEXT.hidden_size + TINY_BIGG_TEXT.hidden_size)
    assert pooled.shape == (2, TINY_BIGG_TEXT.projection_dim)


def test_sdxl_guidance_and_pipeline(dual_encoder):
    k = jax.random.PRNGKey(0)
    unet = UNet2DCondition(TINY_SDXL_UNET)
    # Cross-attn width = concat of the two tiny encoders' hidden sizes.
    ctx_dim = TINY_TEXT.hidden_size + TINY_BIGG_TEXT.hidden_size
    ac = {'text_embeds': jnp.zeros((2, TINY_SDXL_UNET.addition_pooled_dim)),
          'time_ids': jnp.zeros((2, 6))}
    up = unet.init(k, jnp.zeros((2, 8, 8, 4)), jnp.zeros((2,)),
                   jnp.zeros((2, 77, ctx_dim)), ac)
    vae = AutoencoderKL(TINY_VAE)
    vp = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)

    from flexdiffuse_tpu.models.sdxl import SDXL_LATENT_SCALE
    pipe = FlexPipeline(unet, up, vae, vp, scheduler='euler',
                        latent_scale=SDXL_LATENT_SCALE)
    g = sdxl_guidance(dual_encoder, 'a deer', negative_prompt='blurry',
                      guidance_scale=5.0, size=(64, 64))
    assert g.pooled is not None and g.time_ids.shape == (1, 6)
    out = pipe(g, steps=3, init_size=(64, 64), output_type='np',
               key=jax.random.PRNGKey(1))
    assert out.images.shape[0] == 1
    assert np.isfinite(out.images).all()


def test_added_cond_affects_output(dual_encoder):
    """Different pooled conditioning must change the UNet output."""
    k = jax.random.PRNGKey(0)
    unet = UNet2DCondition(TINY_SDXL_UNET)
    ctx = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 77, TINY_SDXL_UNET.cross_attention_dim)).astype(np.float32))
    lat = jnp.asarray(np.random.default_rng(1).normal(
        size=(1, 8, 8, 4)).astype(np.float32))
    d = TINY_SDXL_UNET.addition_pooled_dim
    ac1 = {'text_embeds': jnp.zeros((1, d)), 'time_ids': time_ids((64, 64))}
    ac2 = {'text_embeds': jnp.ones((1, d)), 'time_ids': time_ids((64, 64))}
    p = unet.init(k, lat, jnp.zeros((1,)), ctx, ac1)
    a = unet.apply(p, lat, jnp.full((1,), 500.0), ctx, ac1)
    b = unet.apply(p, lat, jnp.full((1,), 500.0), ctx, ac2)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6


def test_time_ids_affect_output(dual_encoder):
    k = jax.random.PRNGKey(0)
    unet = UNet2DCondition(TINY_SDXL_UNET)
    ctx = jnp.zeros((1, 77, TINY_SDXL_UNET.cross_attention_dim))
    lat = jnp.zeros((1, 8, 8, 4))
    d = TINY_SDXL_UNET.addition_pooled_dim
    ac1 = {'text_embeds': jnp.zeros((1, d)), 'time_ids': time_ids((64, 64))}
    ac2 = {'text_embeds': jnp.zeros((1, d)),
           'time_ids': time_ids((1024, 1024))}
    p = unet.init(k, lat, jnp.zeros((1,)), ctx, ac1)
    a = unet.apply(p, lat, jnp.full((1,), 500.0), ctx, ac1)
    b = unet.apply(p, lat, jnp.full((1,), 500.0), ctx, ac2)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6


def test_tween_sdxl_context_blends_l_half_only(dual_encoder):
    from flexdiffuse_tpu.guidance import Tweener, GuidanceParams
    ctx, _ = dual_encoder.encode('a deer')
    patches = jnp.asarray(np.random.default_rng(2).normal(
        size=(40, TINY_TEXT.hidden_size)).astype(np.float32))
    tw = Tweener(GuidanceParams.ui_defaults())
    l = TINY_TEXT.hidden_size
    out = tween_sdxl_context(tw, ctx, patches[None], l_dim=l)
    assert out.shape == ctx.shape
    # bigG half untouched; L half modified.
    np.testing.assert_array_equal(np.asarray(out[..., l:]),
                                  np.asarray(ctx[..., l:]))
    assert np.abs(np.asarray(out[..., :l]) -
                  np.asarray(ctx[..., :l])).max() > 1e-6


def test_tween_sdxl_context_batched_rows_independent(dual_encoder):
    """Each batch row gets its own tween (ADVICE r1: row 0's tween must not
    broadcast over rows 1..B-1)."""
    from flexdiffuse_tpu.guidance import Tweener, GuidanceParams
    ctx, _ = dual_encoder.encode(['a deer', 'a bear in a forest'])
    patches = jnp.asarray(np.random.default_rng(3).normal(
        size=(40, TINY_TEXT.hidden_size)).astype(np.float32))
    tw = Tweener(GuidanceParams.ui_defaults())
    l = TINY_TEXT.hidden_size
    out = tween_sdxl_context(tw, ctx, patches[None], l_dim=l)
    assert out.shape == ctx.shape
    # Row i must equal tweening row i alone.
    for i in range(ctx.shape[0]):
        solo = tween_sdxl_context(tw, ctx[i:i + 1], patches[None], l_dim=l)
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(solo[0]),
                                   atol=1e-6)
    # The two rows' L halves are genuinely different blends.
    assert np.abs(np.asarray(out[0, :, :l]) -
                  np.asarray(out[1, :, :l])).max() > 1e-6


def test_sdxl_composition_end_to_end(dual_encoder):
    """SDXL regional composition: per-row pooled conditioning through the
    pipeline (closes docs/STATUS.md gap #3)."""
    from flexdiffuse_tpu.composition import EntitySchema, Schema
    from flexdiffuse_tpu.models.sdxl import (SDXL_LATENT_SCALE,
                                             encode_schema_sdxl)

    k = jax.random.PRNGKey(0)
    unet = UNet2DCondition(TINY_SDXL_UNET)
    ctx_dim = TINY_TEXT.hidden_size + TINY_BIGG_TEXT.hidden_size
    ac = {'text_embeds': jnp.zeros((2, TINY_SDXL_UNET.addition_pooled_dim)),
          'time_ids': jnp.zeros((2, 6))}
    up = unet.init(k, jnp.zeros((2, 8, 8, 4)), jnp.zeros((2,)),
                   jnp.zeros((2, 77, ctx_dim)), ac)
    vae = AutoencoderKL(TINY_VAE)
    vp = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
    pipe = FlexPipeline(unet, up, vae, vp, scheduler='euler',
                        latent_scale=SDXL_LATENT_SCALE)

    schema = Schema('a forest', '', '', (0.0, 1.0), [
        EntitySchema('a bear', (0, 0), (32, 32)),
        EntitySchema('a deer', (32, 32), (32, 32)),
    ])
    f = pipe.vae_scale
    g = encode_schema_sdxl(schema, dual_encoder, (64 // f, 64 // f),
                           guidance_scale=5.0, size=(64, 64), scale=f)
    assert g.pooled_stack.shape[0] == 3  # bg + 2 entities
    out = pipe(g, steps=3, init_size=(64, 64), output_type='np',
               key=jax.random.PRNGKey(2))
    assert out.images.shape[0] == 1
    assert np.isfinite(out.images).all()
