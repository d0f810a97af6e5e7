"""CFG interval (Kynkäänniemi et al. 2024): guidance only for denoise
progress in [cfg_from, cfg_to]; rows outside run the UNet cond-only at
half batch.

Beyond-reference accelerator (the reference applies CFG at every step,
pipeline/guide.py:46-64). Exactness anchor: CFG with guidance_scale == 1
equals the cond-only prediction (u + 1·(c − u) = c), so an interval run at
scale 1 must match the full-CFG run to fp rounding — that pins the branch
plumbing without needing a quality judgment.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdiffuse_tpu.models import (AutoencoderKL, TINY_UNET, TINY_VAE,
                                    UNet2DCondition)
from flexdiffuse_tpu.pipeline import FlexPipeline
from flexdiffuse_tpu.pipeline.guides import SimpleGuidance


def _tiny_pipe(**kw):
    k = jax.random.PRNGKey(0)
    unet = UNet2DCondition(TINY_UNET)
    up = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                   jnp.zeros((1, 77, 32)))
    vae = AutoencoderKL(TINY_VAE)
    vp = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
    return FlexPipeline(unet, up, vae, vp, scheduler='pndm', **kw)


def _guidance(scale=7.5, **kw):
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(1, 77, 32)).astype(np.float32))
    unc = jnp.asarray(rng.normal(size=(1, 77, 32)).astype(np.float32))
    return SimpleGuidance(embeddings=emb, uncond=unc,
                          guidance_scale=jnp.float32(scale), cfg=True, **kw)


def _latents(pipe, g, key=42, steps=4, **kw):
    out = pipe(g, init_size=(32, 32), steps=steps,
               key=jax.random.PRNGKey(key), output_type='latent', **kw)
    return np.asarray(out['images'])


def test_full_interval_equivalent():
    """[0, 1] covers every row → the CFG branch is always taken and
    computes the same math as no-interval. On TPU the outputs are
    bit-identical (verified on chip); on CPU `lax.cond` changes XLA's
    fusion boundaries so rounding shifts ~1e-5 relative — tolerance
    covers that, the structure is what's under test."""
    pipe = _tiny_pipe()
    a = _latents(pipe, _guidance())
    b = _latents(pipe, _guidance(cfg_interval=True, cfg_from=0.0,
                                 cfg_to=1.0))
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-4)


def test_scale_one_equivalence():
    """At guidance_scale == 1 the cond-only branch is mathematically the
    CFG branch; any interval must reproduce the full run (fp rounding:
    u + (c − u) vs c)."""
    pipe = _tiny_pipe()
    a = _latents(pipe, _guidance(scale=1.0 + 1e-9))
    b = _latents(pipe, _guidance(scale=1.0 + 1e-9, cfg_interval=True,
                                 cfg_from=0.25, cfg_to=0.75))
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_interval_changes_output_and_stays_finite():
    pipe = _tiny_pipe()
    a = _latents(pipe, _guidance())
    b = _latents(pipe, _guidance(cfg_interval=True, cfg_from=0.0,
                                 cfg_to=0.5))
    assert np.isfinite(b).all()
    assert np.abs(a - b).max() > 1e-6


def test_retune_interval_no_recompile():
    """The bounds are traced: moving the interval reuses the executable."""
    pipe = _tiny_pipe()
    _ = _latents(pipe, _guidance(cfg_interval=True, cfg_from=0.0,
                                 cfg_to=0.5))
    misses0 = pipe._sample._cache_size()
    _ = _latents(pipe, _guidance(cfg_interval=True, cfg_from=0.3,
                                 cfg_to=0.9))
    assert pipe._sample._cache_size() == misses0


def test_deepcache_composition_scale_one():
    """interval × deepcache: the cond-only save/use rows ride the tiled/
    sliced half-batch cache — at scale 1 the result must match the
    deepcache run without an interval.

    Interval *transitions* force a full save row (pipeline/flex.py), so
    scale-1 equivalence with the no-interval baseline only holds when the
    transition lands on a row the cadence would save anyway — pick the
    bound from the schedule's actual row-progress values (a mid-run row at
    an even offset) and leave cfg_to=1.0 so there is no exit transition."""
    pipe = _tiny_pipe(deepcache=2)
    sched = pipe.schedule(6)
    length = int(sched.length)
    prog = np.arange(length) / (length - 1)
    s = (length // 2) & ~1          # even row near the middle: cadence save
    assert s >= 2
    cfg_from = float((prog[s - 1] + prog[s]) / 2)
    a = _latents(pipe, _guidance(scale=1.0 + 1e-9), steps=6)
    b = _latents(pipe, _guidance(scale=1.0 + 1e-9, cfg_interval=True,
                                 cfg_from=cfg_from, cfg_to=1.0), steps=6)
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_deepcache_composition_img2img_finite():
    pipe = _tiny_pipe(deepcache=2)
    rng = np.random.default_rng(3)
    init = rng.uniform(-1, 1, size=(1, 32, 32, 3)).astype(np.float32)
    out = pipe(_guidance(cfg_interval=True, cfg_from=0.0, cfg_to=0.6),
               init_image=init, strength=0.5, steps=6,
               key=jax.random.PRNGKey(1))['images']
    assert np.isfinite(np.asarray(out)).all()


def test_composite_interval_without_deepcache_works():
    from flexdiffuse_tpu.pipeline.guides import (CompositeGuidance,
                                                 entity_masks)
    pipe = _tiny_pipe()
    hw = 32 // pipe.vae_scale
    rng = np.random.default_rng(0)
    mk = lambda n: jnp.asarray(  # noqa: E731
        rng.normal(size=(n, 77, 32)).astype(np.float32))
    g = CompositeGuidance(background=mk(1), entities=mk(1),
                          masks=entity_masks([((0, 0), (hw // 2, hw // 2))],
                                             (hw, hw)),
                          blends=jnp.asarray([0.8]), uncond=mk(1),
                          guidance_scale=jnp.float32(7.5),
                          cfg_interval=True, cfg_from=0.0,
                          cfg_to=jnp.float32(0.5))
    out = pipe(g, init_size=(32, 32), steps=4,
               key=jax.random.PRNGKey(7), output_type='latent')['images']
    assert np.isfinite(np.asarray(out)).all()


def test_composite_interval_with_deepcache_raises():
    from flexdiffuse_tpu.pipeline.guides import (CompositeGuidance,
                                                 entity_masks)
    pipe = _tiny_pipe(deepcache=2)
    hw = 32 // pipe.vae_scale
    rng = np.random.default_rng(0)
    mk = lambda n: jnp.asarray(  # noqa: E731
        rng.normal(size=(n, 77, 32)).astype(np.float32))
    g = CompositeGuidance(background=mk(1), entities=mk(1),
                          masks=entity_masks([((0, 0), (hw // 2, hw // 2))],
                                             (hw, hw)),
                          blends=jnp.asarray([0.8]), uncond=mk(1),
                          guidance_scale=jnp.float32(7.5),
                          cfg_interval=True)
    with pytest.raises(ValueError, match='cfg_interval'):
        pipe(g, init_size=(32, 32), steps=4, key=jax.random.PRNGKey(7))
