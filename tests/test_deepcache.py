"""DeepCache tests (models/unet.py cache_mode + pipeline integration).

Beyond-reference accelerator (Ma et al. 2023, "DeepCache: Accelerating
Diffusion Models for Free"): reuse the deep UNet feature across denoise
steps, recomputing only the shallow levels. The split is constructed so a
'use' call with a cache saved at the SAME (latents, t) is bit-identical to
the full forward — the only approximation is reusing a cache across steps.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdiffuse_tpu.models import (AutoencoderKL, TINY_UNET, TINY_VAE,
                                    UNet2DCondition)

TINY3 = dataclasses.replace(TINY_UNET, block_channels=(16, 32, 64),
                            attention_levels=(True, True, False))


def _init(cfg, key=0, in_ch=4):
    unet = UNet2DCondition(cfg)
    params = unet.init(jax.random.PRNGKey(key), jnp.zeros((1, 8, 8, in_ch)),
                       jnp.zeros((1,)), jnp.zeros((1, 77, 32)))
    return unet, params


def _inputs(b=2, hw=8, seed=0):
    rng = np.random.default_rng(seed)
    lat = jnp.asarray(rng.normal(size=(b, hw, hw, 4)).astype(np.float32))
    t = jnp.full((b,), 7.0, jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(b, 77, 32)).astype(np.float32))
    return lat, t, ctx


@pytest.mark.parametrize('cfg', [TINY_UNET, TINY3],
                         ids=['2-level', '3-level'])
def test_save_then_use_same_step_bit_identical(cfg):
    """full == save's eps, and use(cache saved at the same step) == full:
    the shallow recompute + splice reproduces the full forward exactly."""
    unet, params = _init(cfg)
    lat, t, ctx = _inputs()
    full = unet.apply(params, lat, t, ctx)
    eps_s, cache = unet.apply(params, lat, t, ctx, cache_mode='save')
    np.testing.assert_array_equal(np.asarray(full), np.asarray(eps_s))
    eps_u, cache2 = unet.apply(params, lat, t, ctx, deep_cache=cache,
                               cache_mode='use')
    np.testing.assert_array_equal(np.asarray(full), np.asarray(eps_u))
    np.testing.assert_array_equal(np.asarray(cache), np.asarray(cache2))


def test_use_with_stale_cache_differs_but_finite():
    unet, params = _init(TINY_UNET)
    lat, t, ctx = _inputs()
    _, cache = unet.apply(params, lat, t, ctx, cache_mode='save')
    lat2, t2, _ = _inputs(seed=1)
    full2 = unet.apply(params, lat2, t2, ctx)
    eps_u, _ = unet.apply(params, lat2, t2, ctx, deep_cache=cache,
                          cache_mode='use')
    assert np.isfinite(np.asarray(eps_u)).all()
    assert np.abs(np.asarray(eps_u) - np.asarray(full2)).max() > 1e-8


def test_cache_shape_is_decoder_entry():
    """depth=1 cache = hidden state entering the shallowest decoder level:
    full latent resolution, block_channels[1] channels."""
    unet, params = _init(TINY3)
    lat, t, ctx = _inputs()
    _, cache = unet.apply(params, lat, t, ctx, cache_mode='save')
    assert cache.shape == (2, 8, 8, TINY3.block_channels[1])


def test_use_mode_requires_cache():
    unet, params = _init(TINY_UNET)
    lat, t, ctx = _inputs()
    with pytest.raises(ValueError, match='deep_cache'):
        unet.apply(params, lat, t, ctx, cache_mode='use')


def _tiny_pipe(**kw):
    from flexdiffuse_tpu.pipeline import FlexPipeline
    k = jax.random.PRNGKey(0)
    unet = UNet2DCondition(TINY_UNET)
    up = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                   jnp.zeros((1, 77, 32)))
    vae = AutoencoderKL(TINY_VAE)
    vp = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
    return FlexPipeline(unet, up, vae, vp, scheduler='pndm', **kw)


def _guidance():
    from flexdiffuse_tpu.pipeline.guides import SimpleGuidance
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(1, 77, 32)).astype(np.float32))
    unc = jnp.asarray(rng.normal(size=(1, 77, 32)).astype(np.float32))
    return SimpleGuidance(embeddings=emb, uncond=unc,
                          guidance_scale=jnp.float32(7.5), cfg=True)


def test_pipeline_interval_one_matches_baseline():
    """interval=1 → every row is a 'save' row → identical images."""
    base = _tiny_pipe()
    dc = _tiny_pipe(deepcache=1)
    g = _guidance()
    key = jax.random.PRNGKey(42)
    a = base(g, init_size=(32, 32), steps=4, key=key)['images']
    b = dc(g, init_size=(32, 32), steps=4, key=key)['images']
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipeline_interval_two_runs_and_differs():
    base = _tiny_pipe()
    dc = _tiny_pipe(deepcache=2)
    g = _guidance()
    key = jax.random.PRNGKey(42)
    a = np.asarray(base(g, init_size=(32, 32), steps=4, key=key)['images'])
    b = np.asarray(dc(g, init_size=(32, 32), steps=4, key=key)['images'])
    assert b.shape == a.shape
    assert np.isfinite(b).all()
    assert np.abs(a - b).max() > 0  # shallow steps approximate


def test_pipeline_deepcache_img2img():
    """t_start > 0: the cadence anchors at the first active row (which must
    be a full 'save' row — the cache carry starts as zeros)."""
    dc = _tiny_pipe(deepcache=2)
    g = _guidance()
    rng = np.random.default_rng(3)
    init = rng.uniform(-1, 1, size=(1, 32, 32, 3)).astype(np.float32)
    out = dc(g, init_image=init, strength=0.5, steps=4,
             key=jax.random.PRNGKey(1))['images']
    assert np.isfinite(np.asarray(out)).all()


def test_deepcache_dp_sweep_on_mesh():
    """The cache rides the sharded scan carry: an 8-seed DP sweep with a
    deepcache pipeline compiles under the mesh and stays finite."""
    from flexdiffuse_tpu.parallel import make_mesh, seed_sweep_keys
    from flexdiffuse_tpu.parallel.sweep import sweep

    pipe = _tiny_pipe(deepcache=2)
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(1, 77, 32)).astype(np.float32))
    unc = jnp.asarray(rng.normal(size=(1, 77, 32)).astype(np.float32))
    keys = seed_sweep_keys(1337, 8)
    mesh = make_mesh(model_parallel=1)
    imgs = sweep(pipe, emb, unc, keys, steps=3, init_size=(32, 32),
                 mesh=mesh)
    assert imgs.shape == (8, 32, 32, 3)
    assert np.isfinite(imgs).all()
    assert np.abs(imgs[0] - imgs[1]).max() > 1e-6
