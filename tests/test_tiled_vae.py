"""Tiled VAE tests (ops/tiled_vae.py + FlexPipeline integration).

Beyond-reference capability: bounded-memory VAE for very large canvases
(the reference's only memory lever is attention slicing, which does not
touch the VAE — /root/reference/pipeline/flex.py:85-110).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdiffuse_tpu.ops.tiled_vae import tile_starts, tiled_apply


def test_tile_starts_cover_and_clamp():
    assert tile_starts(16, 16, 12) == [0]           # fits in one tile
    assert tile_starts(8, 16, 12) == [0]
    s = tile_starts(40, 16, 12)
    assert s[0] == 0 and s[-1] == 40 - 16           # flush last tile
    covered = set()
    for y in s:
        covered.update(range(y, y + 16))
    assert covered == set(range(40))                # full coverage


def test_tiled_apply_pointwise_exact():
    """Any 1×1-receptive-field fn is EXACT under cross-fading (overlapping
    tiles agree everywhere, so the normalized blend is the value itself)."""
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 24, 40, 3)),
                    jnp.float32)
    out = tiled_apply(lambda t: t * 2.0 + 1.0, x, tile=16, overlap=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2 + 1,
                               rtol=1e-6, atol=1e-6)


def test_tiled_apply_upscale_and_downscale_exact():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 24, 24, 2)), jnp.float32)
    # 2× nearest upsample per tile (local → exact under blending)
    up = tiled_apply(lambda t: jnp.repeat(jnp.repeat(t, 2, 1), 2, 2), x,
                     tile=16, overlap=8, out_num=2, out_den=1)
    full = jnp.repeat(jnp.repeat(x, 2, 1), 2, 2)
    assert up.shape == full.shape
    np.testing.assert_allclose(np.asarray(up), np.asarray(full), atol=1e-5)
    # 2× average-pool downsample (local within even tiles → exact)
    down = tiled_apply(
        lambda t: t.reshape(1, t.shape[1] // 2, 2, t.shape[2] // 2, 2,
                            2).mean((2, 4)),
        x, tile=16, overlap=8, out_num=1, out_den=2)
    fulld = x.reshape(1, 12, 2, 12, 2, 2).mean((2, 4))
    np.testing.assert_allclose(np.asarray(down), np.asarray(fulld),
                               atol=1e-5)


def test_tiled_apply_wide_short_canvas():
    """One spatial dim smaller than the tile while the other exceeds it
    (e.g. a 448×2048 px canvas → 56×256 latent at tile=64): the per-axis
    effective tile size must clamp, not crash on a mask-shape mismatch."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 56, 256, 4)), jnp.float32)
    out = tiled_apply(lambda t: t * 2.0, x, tile=64, overlap=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2,
                               rtol=1e-6, atol=1e-6)
    # Tall-narrow transpose of the same scenario.
    xt = jnp.transpose(x, (0, 2, 1, 3))
    outt = tiled_apply(lambda t: t + 1.0, xt, tile=64, overlap=8)
    np.testing.assert_allclose(np.asarray(outt), np.asarray(xt) + 1,
                               rtol=1e-6, atol=1e-6)
    # Upscaling fn on a wide-short canvas (decoder-shaped usage).
    up = tiled_apply(lambda t: jnp.repeat(jnp.repeat(t, 2, 1), 2, 2), x,
                     tile=64, overlap=8, out_num=2, out_den=1)
    full = jnp.repeat(jnp.repeat(x, 2, 1), 2, 2)
    np.testing.assert_allclose(np.asarray(up), np.asarray(full), atol=1e-5)


def test_tiled_apply_pytree_outputs():
    x = jnp.ones((1, 24, 24, 2), jnp.float32)
    mean, logvar = tiled_apply(lambda t: (t * 3.0, t - 1.0), x,
                               tile=16, overlap=8)
    np.testing.assert_allclose(np.asarray(mean), 3.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(logvar), 0.0, atol=1e-6)


def test_tiled_apply_single_tile_passthrough():
    x = jnp.ones((1, 8, 8, 2))
    calls = []

    def fn(t):
        calls.append(t.shape)
        return t

    out = tiled_apply(fn, x, tile=16, overlap=8)
    assert calls == [(1, 8, 8, 2)]                  # untiled fast path
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_tiled_apply_rejects_bad_overlap():
    with pytest.raises(ValueError):
        tiled_apply(lambda t: t, jnp.ones((1, 64, 64, 1)), tile=16,
                    overlap=16)


@pytest.fixture(scope='module')
def tiny_vae():
    from flexdiffuse_tpu.models import TINY_VAE, AutoencoderKL
    vae = AutoencoderKL(TINY_VAE)
    k = jax.random.PRNGKey(0)
    params = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
    return vae, params


def test_tiled_vae_decode_close_to_full(tiny_vae):
    """Seam error is bounded: the decoder's receptive field crosses tile
    borders, so tiled ≠ full bitwise — but the cross-fade keeps the
    blended output close on a [0,1]-scale image."""
    vae, params = tiny_vae
    lat = jnp.asarray(
        np.random.default_rng(2).normal(size=(1, 16, 16,
                                              vae.config.latent_channels)),
        jnp.float32)
    decode = lambda z: vae.apply(params, z, method=type(vae).decode)
    full = np.asarray(decode(lat))
    tiled = np.asarray(tiled_apply(decode, lat, tile=8, overlap=4,
                                   out_num=2, out_den=1))
    assert tiled.shape == full.shape
    assert np.abs(tiled - full).mean() < 0.15


def test_pipeline_tiled_generation_end_to_end():
    """FlexPipeline(vae_tile=...) drives txt2img + img2img through the
    tiled encode/decode paths and produces the right-sized images."""
    from flexdiffuse_tpu.models import (TINY_TEXT, TINY_UNET, TINY_VAE,
                                        AutoencoderKL, UNet2DCondition)
    from flexdiffuse_tpu.pipeline import FlexPipeline, SimpleGuidance

    k = jax.random.PRNGKey(0)
    unet = UNet2DCondition(TINY_UNET)
    unet_params = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                            jnp.zeros((1, 77, TINY_TEXT.hidden_size)))
    vae = AutoencoderKL(TINY_VAE)
    vae_params = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
    pipe = FlexPipeline(unet, unet_params, vae, vae_params,
                        vae_tile=8, vae_tile_overlap=2)
    assert pipe.vae_scale == 2

    n_tile_calls = []
    orig = pipe._decode

    def spy(params, z):
        n_tile_calls.append(z.shape)
        return orig(params, z)

    pipe._decode = spy
    ctx = jnp.zeros((1, 77, TINY_TEXT.hidden_size), jnp.float32)
    g = SimpleGuidance(embeddings=ctx, uncond=ctx,
                       guidance_scale=jnp.float32(1.0), cfg=False)
    # 64×64 px → 32×32 latent > 8-tile → tiled decode engages (5×5 tiles)
    out = pipe(g, steps=2, init_size=(64, 64),
               key=jax.random.PRNGKey(1))
    img = out.images[0]
    assert img.size == (64, 64)
    assert len(n_tile_calls) > 1
    assert all(s[1] == 8 and s[2] == 8 for s in n_tile_calls)

    # img2img rides the tiled ENCODE path too. A preprocessed array keeps
    # the 64×64 canvas (a PIL init would be preprocess-resized to 512 long
    # side — reference encode/clip.py:15-39 semantics).
    init = np.random.default_rng(3).uniform(
        -1, 1, size=(1, 64, 64, 3)).astype(np.float32)
    out2 = pipe(g, steps=2, init_image=init, strength=0.5,
                key=jax.random.PRNGKey(2))
    assert out2.images[0].size == (64, 64)
