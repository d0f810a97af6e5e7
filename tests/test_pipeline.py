"""End-to-end pipeline tests with tiny models on CPU (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from flexdiffuse_tpu.composition import EntitySchema, Schema, encode_schema
from flexdiffuse_tpu.models import (AutoencoderKL, TINY_UNET, TINY_VAE,
                                    UNet2DCondition)
from flexdiffuse_tpu.pipeline import (CompositeGuidance, FlexPipeline,
                                      SimpleGuidance, entity_masks)

T, D = 77, 32
SIZE = 64  # pixel size; latent 8x8 with the tiny 3-level VAE? (2 levels -> /2)


@pytest.fixture(scope='module')
def pipe():
    unet = UNet2DCondition(TINY_UNET)
    vae = AutoencoderKL(TINY_VAE)
    k = jax.random.PRNGKey(0)
    lat = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, T, D))
    unet_params = unet.init(k, lat, jnp.zeros((1,)), ctx)
    vae_params = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
    return FlexPipeline(unet, unet_params, vae, vae_params, scheduler='pndm')


def _simple_guide(batch=1, scale=8.0, seed=0):
    rng = np.random.default_rng(seed)
    emb = jnp.asarray(rng.normal(size=(batch, T, D)).astype(np.float32))
    unc = jnp.asarray(rng.normal(size=(1, T, D)).astype(np.float32))
    return SimpleGuidance(embeddings=emb, uncond=unc,
                          guidance_scale=jnp.float32(scale), cfg=scale > 1.0)


def test_txt2img_end_to_end(pipe):
    out = pipe(_simple_guide(), steps=4, init_size=(SIZE, SIZE),
               key=jax.random.PRNGKey(1))
    assert len(out.images) == 1
    img = out.images[0]
    assert isinstance(img, Image.Image)
    assert img.size == (SIZE, SIZE)
    assert out.nsfw_content_detected == [False]
    assert out['sample'] is out.images  # reference Runner compat quirk


def test_txt2img_batch_np_output(pipe):
    out = pipe(_simple_guide(batch=2), steps=3, init_size=(SIZE, SIZE),
               output_type='np', key=jax.random.PRNGKey(2))
    arr = out.images
    assert arr.shape[0] == 2 and arr.shape[-1] == 3
    assert np.isfinite(arr).all() and arr.min() >= 0 and arr.max() <= 1


def test_seed_determinism_and_variation(pipe):
    a = pipe(_simple_guide(), steps=3, init_size=(SIZE, SIZE),
             output_type='np', key=jax.random.PRNGKey(7)).images
    b = pipe(_simple_guide(), steps=3, init_size=(SIZE, SIZE),
             output_type='np', key=jax.random.PRNGKey(7)).images
    c = pipe(_simple_guide(), steps=3, init_size=(SIZE, SIZE),
             output_type='np', key=jax.random.PRNGKey(8)).images
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 1e-4


def test_img2img_path(pipe):
    # Pass a preprocessed [-1,1] NHWC array directly (a PIL input would be
    # resized to 512² by `preprocess` — correct for real models, but the
    # tiny 2-level VAE would then run mid attention over 65k tokens).
    init = np.random.default_rng(0).uniform(-1, 1,
                                            size=(1, SIZE, SIZE, 3)).astype(
                                                np.float32)
    out = pipe(_simple_guide(), steps=4, init_image=init, strength=0.6,
               output_type='np', key=jax.random.PRNGKey(3))
    assert np.isfinite(out.images).all()


def test_img2img_strength_no_recompile(pipe):
    """Changing strength must hit the same compiled executable (traced
    t_start) — asserted via jit cache stats."""
    init = np.zeros((1, SIZE, SIZE, 3), np.float32)
    g = _simple_guide()
    pipe(g, steps=4, init_image=init, strength=0.3,
         key=jax.random.PRNGKey(0))
    misses0 = pipe._sample._cache_size()
    pipe(g, steps=4, init_image=init, strength=0.9,
         key=jax.random.PRNGKey(0))
    assert pipe._sample._cache_size() == misses0


def test_strength_validation(pipe):
    with pytest.raises(ValueError):
        pipe(_simple_guide(), steps=2, strength=1.5)


def test_debug_mode_collects_steps(pipe):
    out = pipe(_simple_guide(), steps=3, init_size=(SIZE, SIZE), debug=True,
               output_type='np', key=jax.random.PRNGKey(4))
    # PNDM: steps+1 scan steps recorded from t_start=0.
    assert out.images.shape[0] == 4


def test_guidance_scale_changes_output(pipe):
    a = pipe(_simple_guide(scale=8.0), steps=3, init_size=(SIZE, SIZE),
             output_type='np', key=jax.random.PRNGKey(5)).images
    b = pipe(_simple_guide(scale=2.0), steps=3, init_size=(SIZE, SIZE),
             output_type='np', key=jax.random.PRNGKey(5)).images
    assert np.abs(a - b).max() > 1e-5


def test_composite_guidance_end_to_end(pipe):
    class Enc:
        def prompt(self, p):
            rng = np.random.default_rng(abs(hash(p)) % 2**32)
            return jnp.asarray(rng.normal(size=(1, T, D)).astype(np.float32))

    schema = Schema(
        'a forest', 'photo', 'painting', (0.0, 1.0), [
            EntitySchema('a bear', (0, 32), (32, 32)),
            EntitySchema('a deer', (32, 32), (32, 32)),
        ])
    lat_hw = (SIZE // pipe.vae_scale, SIZE // pipe.vae_scale)
    guide = encode_schema(schema, Enc(), lat_hw, guidance_scale=8.0)
    assert guide.num_entities == 2
    out = pipe(guide, steps=3, init_size=(SIZE, SIZE), output_type='np',
               key=jax.random.PRNGKey(6))
    assert out.images.shape[0] == 1
    assert np.isfinite(out.images).all()


def test_composite_entity_blend_affects_region_only():
    """With a fake UNet, entity blending must only alter masked positions."""
    class FakeUNet:
        def apply(self, params, lat, t, ctx):
            # eps depends on the context's mean so entities differ from bg.
            return jnp.ones_like(lat) * jnp.mean(ctx, axis=(1, 2))[:, None,
                                                                   None, None]

    rng = np.random.default_rng(0)
    bg = jnp.asarray(rng.normal(size=(1, T, D)).astype(np.float32))
    ent = jnp.asarray(rng.normal(size=(1, T, D)).astype(np.float32))
    unc = jnp.zeros((1, T, D))
    masks = entity_masks([((0, 0), (4, 4))], (8, 8))
    g = CompositeGuidance(background=bg, entities=ent, masks=masks,
                          blends=jnp.asarray([1.0]), uncond=unc,
                          guidance_scale=jnp.float32(1.0), cfg=False)
    lat = jnp.zeros((1, 8, 8, 4))
    eps = g.noise_pred(lambda l, t, c, a=None: FakeUNet().apply(None, l, t, c), lat,
                       jnp.float32(1.0))
    bg_val = float(jnp.mean(bg))
    ent_val = float(jnp.mean(ent))
    got = np.asarray(eps[0, :, :, 0])
    np.testing.assert_allclose(got[:4, :4], ent_val, atol=1e-5)
    np.testing.assert_allclose(got[4:, :], bg_val, atol=1e-5)
    np.testing.assert_allclose(got[:4, 4:], bg_val, atol=1e-5)


def test_style_interpolation_changes_background():
    class FakeUNet:
        def apply(self, params, lat, t, ctx):
            return jnp.ones_like(lat) * jnp.mean(ctx, axis=(1, 2))[:, None,
                                                                   None, None]

    bg = jnp.zeros((1, T, D))
    style_a = jnp.ones((1, T, D))
    style_b = -jnp.ones((1, T, D))
    g = CompositeGuidance(background=bg, entities=jnp.zeros((0, T, D)),
                          masks=jnp.zeros((0, 8, 8, 1)),
                          blends=jnp.zeros((0,)), uncond=jnp.zeros((1, T, D)),
                          guidance_scale=jnp.float32(1.0),
                          style_start=style_a, style_end=style_b,
                          style_range=jnp.asarray([0.0, 1.0]),
                          style_strength=jnp.float32(1.0), cfg=False)
    fn = lambda l, t, c, a=None: FakeUNet().apply(None, l, t, c)
    lat = jnp.zeros((1, 8, 8, 4))
    at0 = g.noise_pred(fn, lat, jnp.float32(1.0), progress=jnp.float32(0.0))
    at1 = g.noise_pred(fn, lat, jnp.float32(1.0), progress=jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(at0), 1.0, atol=1e-5)   # style_a
    np.testing.assert_allclose(np.asarray(at1), -1.0, atol=1e-5)  # style_b


def test_schema_json_roundtrip():
    s = Schema('bg', 'a', 'b', (0.0, 1.0),
               [EntitySchema('e', (0, 8), (8, 8), 0.5)])
    s2 = Schema.from_json(s.json())
    assert s2 == s
