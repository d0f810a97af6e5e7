"""Latent inpainting tests (addition over the reference)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdiffuse_tpu.models import (AutoencoderKL, TINY_UNET, TINY_VAE,
                                    UNet2DCondition)
from flexdiffuse_tpu.pipeline import FlexPipeline, SimpleGuidance

T, D, SIZE = 77, 32, 64


@pytest.fixture(scope='module')
def pipe():
    k = jax.random.PRNGKey(0)
    unet = UNet2DCondition(TINY_UNET)
    up = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                   jnp.zeros((1, T, D)))
    vae = AutoencoderKL(TINY_VAE)
    vp = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
    return FlexPipeline(unet, up, vae, vp, scheduler='pndm')


def _guide(seed=0):
    rng = np.random.default_rng(seed)
    return SimpleGuidance(
        embeddings=jnp.asarray(rng.normal(size=(1, T, D)).astype(
            np.float32)),
        uncond=jnp.asarray(rng.normal(size=(1, T, D)).astype(np.float32)),
        guidance_scale=jnp.float32(8.0), cfg=True)


def _init():
    return np.random.default_rng(1).uniform(
        -1, 1, size=(1, SIZE, SIZE, 3)).astype(np.float32)


def test_mask_requires_init_image(pipe):
    with pytest.raises(ValueError):
        pipe(_guide(), steps=2, mask=np.ones((SIZE, SIZE), np.float32))


def test_keep_all_mask_returns_vae_roundtrip():
    """mask = 0 everywhere → every step re-anchors to the init latents, so
    the output is exactly the VAE roundtrip of the init image. Euler's
    terminal σ is exactly 0 so the check is bit-near (PNDM's terminal level
    is its final_alpha_cumprod, checked separately with tolerance)."""
    k = jax.random.PRNGKey(0)
    unet = UNet2DCondition(TINY_UNET)
    up = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                   jnp.zeros((1, T, D)))
    vae = AutoencoderKL(TINY_VAE)
    vp = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
    p = FlexPipeline(unet, up, vae, vp, scheduler='euler')
    init = _init()
    key = jax.random.PRNGKey(3)
    out = p(_guide(), steps=4, init_image=init, strength=1.0,
            mask=np.zeros((SIZE, SIZE), np.float32), output_type='np',
            key=key).images
    # Reference value: encode (with the same sub-key the pipeline derives)
    # then decode directly.
    _, k_enc, _, _ = jax.random.split(key, 4)
    z = p._encode(p.vae_params, jnp.asarray(init), k_enc)
    expect = np.asarray(p._decode(p.vae_params, z))
    np.testing.assert_allclose(out, expect, atol=1e-4)


@pytest.mark.parametrize('kind', ['pndm', 'euler', 'dpmpp', 'unipc'])
def test_half_mask_keeps_half_latents(pipe, kind):
    """Latent-level check (the VAE's global mid-attention makes *decoded*
    pixels everywhere depend on all latents, so the kept region is asserted
    pre-decode): the masked-0 half must equal the init latents exactly; the
    regenerate half must differ."""
    from flexdiffuse_tpu import schedulers

    k = jax.random.PRNGKey(0)
    unet = UNet2DCondition(TINY_UNET)
    up = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                   jnp.zeros((1, T, D)))
    vae = AutoencoderKL(TINY_VAE)
    vp = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
    p = FlexPipeline(unet, up, vae, vp, scheduler=kind)

    init = _init()
    key = jax.random.PRNGKey(5)
    key, k_enc, k_noise, k_scan = jax.random.split(key, 4)
    schedule = p.schedule(4)
    z = p._encode(p.vae_params, jnp.asarray(init), k_enc)
    init_ts, t_start = schedulers.init_timestep_info(schedule, 1.0, 4)
    noise = jax.random.normal(k_noise, z.shape, jnp.float32)
    lat0 = schedulers.add_noise(schedule, z, noise, init_ts)
    h, w = z.shape[1:3]
    mask = jnp.zeros((1, h, w, 1), jnp.float32).at[:, :, w // 2:, :].set(1.0)
    state0 = schedulers.init_state(schedule, lat0.shape, lat0.dtype)
    final, _ = p._sample(p.unet_params, schedule, state0, _guide(), lat0,
                         jnp.int32(t_start), jnp.float32(0.0), k_scan,
                         init_latents=z, mask=mask, inpaint=True)
    final = np.asarray(final)
    zref = np.asarray(z)
    # Kept half == init latents at the scheduler's terminal level: exactly
    # clean for euler/dpmpp (σ→0); PNDM's terminal alpha-bar is acp[0], so
    # √(1−acp[0]) ≈ 2.9% noise std remains — matching its own final step.
    tol = 0.2 if kind == 'pndm' else 1e-5
    np.testing.assert_allclose(final[:, :, :w // 2], zref[:, :, :w // 2],
                               atol=tol)
    # Regenerated half differs a lot more than any terminal noise.
    assert np.abs(final[:, :, w // 2:] - zref[:, :, w // 2:]).max() > 0.5


def test_full_mask_equals_plain_img2img_shape(pipe):
    init = _init()
    out = pipe(_guide(), steps=3, init_image=init, strength=0.7,
               mask=np.ones((SIZE, SIZE), np.float32), output_type='np',
               key=jax.random.PRNGKey(6)).images
    assert out.shape[0] == 1 and np.isfinite(out).all()


def test_anchor_noise_matches_step_output_levels():
    """anchor_noise must return the init at the VP level each scheduler step
    OUTPUTS — including PNDM's warm-up quirk (counter 1 re-steps the stashed
    sample to timesteps[i] itself, one level noisier than position i+1)."""
    from flexdiffuse_tpu import schedulers
    sch = schedulers.make('pndm', 6)
    one = jnp.ones((1, 2, 2, 1))
    zero = jnp.zeros_like(one)
    ts = np.asarray(sch.timesteps).astype(int)
    acp = np.asarray(sch.alphas_cumprod)
    for i in range(sch.length):
        for counter in (0, 1, 2):
            got = float(np.asarray(schedulers.anchor_noise(
                sch, one, zero, jnp.int32(i), jnp.int32(counter)))[0, 0, 0, 0])
            t_out = ts[i] if counter == 1 else ts[i] - sch.ratio
            # pndm's terminal transfer uses final_alpha_cumprod = acp[0].
            expect = (float(np.sqrt(sch.final_alpha_cumprod)) if t_out < 0
                      else float(np.sqrt(acp[t_out])))
            np.testing.assert_allclose(got, expect, rtol=1e-6,
                                       err_msg=f'i={i} c={counter}')


def test_rgb_ndarray_mask_accepted(pipe):
    """A loaded RGB mask (H, W, 3) must collapse to one channel, not crash."""
    init = _init()
    rgb_mask = np.zeros((SIZE, SIZE, 3), np.float32)
    rgb_mask[:, SIZE // 2:] = 1.0
    out = pipe(_guide(), steps=2, init_image=init, strength=1.0,
               mask=rgb_mask, output_type='np',
               key=jax.random.PRNGKey(8)).images
    assert out.shape[0] == 1 and np.isfinite(out).all()


class TestInpaintingCheckpoint:
    """Native 9-channel inpainting-UNet conditioning (runwayml-style)."""

    def _pipe(self):
        import dataclasses
        from flexdiffuse_tpu.models import (TINY_UNET, TINY_VAE,
                                            AutoencoderKL, UNet2DCondition)
        from flexdiffuse_tpu.pipeline import FlexPipeline
        cfg9 = dataclasses.replace(TINY_UNET, in_channels=9)
        unet = UNet2DCondition(cfg9)
        k = jax.random.PRNGKey(0)
        up = unet.init(k, jnp.zeros((1, 8, 8, 9)), jnp.zeros((1,)),
                       jnp.zeros((1, 77, 32)))
        vae = AutoencoderKL(TINY_VAE)
        vp = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
        return FlexPipeline(unet, up, vae, vp, scheduler='pndm')

    def test_nine_channel_generation(self):
        from flexdiffuse_tpu.pipeline.guides import SimpleGuidance
        pipe = self._pipe()
        rng = np.random.default_rng(0)
        g = SimpleGuidance(
            embeddings=jnp.asarray(rng.normal(size=(1, 77, 32)),
                                   jnp.float32),
            uncond=jnp.asarray(rng.normal(size=(1, 77, 32)), jnp.float32),
            guidance_scale=jnp.float32(7.5))
        init = rng.uniform(-1, 1, size=(1, 32, 32, 3)).astype(np.float32)
        mask = np.zeros((32, 32), np.float32)
        mask[:, 16:] = 1.0
        out = pipe(g, steps=3, init_image=init, mask=mask,
                   output_type='np', key=jax.random.PRNGKey(1))
        assert out.images.shape == (1, 32, 32, 3)
        assert np.isfinite(out.images).all()
        # A different mask must change the conditioning (same seed).
        mask2 = np.zeros((32, 32), np.float32)
        mask2[16:, :] = 1.0
        out2 = pipe(g, steps=3, init_image=init, mask=mask2,
                    output_type='np', key=jax.random.PRNGKey(1))
        assert np.abs(out.images - out2.images).max() > 1e-6
        # Identical call is reproducible (one compiled program).
        out3 = pipe(g, steps=3, init_image=init, mask=mask,
                    output_type='np', key=jax.random.PRNGKey(1))
        np.testing.assert_array_equal(out.images, out3.images)

    def test_requires_init_image_and_simple_guidance(self):
        import pytest
        from flexdiffuse_tpu.pipeline.guides import (CompositeGuidance,
                                                     entity_masks)
        pipe = self._pipe()
        mask = np.ones((32, 32), np.float32)
        g = CompositeGuidance(
            background=jnp.zeros((1, 77, 32)),
            entities=jnp.zeros((1, 77, 32)),
            masks=entity_masks([((0, 0), (2, 2))], (16, 16)),
            blends=jnp.asarray([0.5]), uncond=jnp.zeros((1, 77, 32)),
            guidance_scale=jnp.float32(7.5))
        init = np.zeros((1, 32, 32, 3), np.float32)
        with pytest.raises(ValueError, match='SimpleGuidance'):
            pipe(g, steps=2, init_image=init, mask=mask)

    def test_nine_channel_strength(self):
        """strength < 1 anchors to the noised original (diffusers inpaint
        semantics); different strengths give different trajectories."""
        from flexdiffuse_tpu.pipeline.guides import SimpleGuidance
        pipe = self._pipe()
        rng = np.random.default_rng(5)
        g = SimpleGuidance(
            embeddings=jnp.asarray(rng.normal(size=(1, 77, 32)),
                                   jnp.float32),
            uncond=jnp.asarray(rng.normal(size=(1, 77, 32)), jnp.float32),
            guidance_scale=jnp.float32(7.5))
        init = rng.uniform(-1, 1, size=(1, 32, 32, 3)).astype(np.float32)
        mask = np.ones((32, 32), np.float32)
        outs = {}
        for s in (0.4, 1.0):
            out = pipe(g, steps=4, init_image=init, mask=mask, strength=s,
                       output_type='np', key=jax.random.PRNGKey(2))
            assert np.isfinite(out.images).all()
            outs[s] = out.images
        assert np.abs(outs[0.4] - outs[1.0]).max() > 1e-6
