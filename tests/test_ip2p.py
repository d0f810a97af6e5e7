"""InstructPix2Pix instruction-editing tests (beyond-reference model
family; Brooks et al. 2023 — 8-channel UNets conditioned on the unnoised
input-image latents, dual text/image CFG)."""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdiffuse_tpu.pipeline import InstructPix2PixGuidance

T, D = 77, 32


def _guidance(b=1, s_txt=7.5, s_img=1.5, seed=0, hw=(8, 8)):
    rng = np.random.default_rng(seed)
    return InstructPix2PixGuidance(
        embeddings=jnp.asarray(rng.normal(size=(b, T, D)), jnp.float32),
        uncond=jnp.asarray(rng.normal(size=(1, T, D)), jnp.float32),
        image_latents=jnp.asarray(rng.normal(size=(1,) + hw + (4,)),
                                  jnp.float32),
        guidance_scale=jnp.float32(s_txt),
        image_guidance_scale=jnp.float32(s_img))


class TestGuidanceMath:
    """The three-row layout and the dual-CFG combine, against a spy
    noise_fn that records exactly what the UNet would see."""

    def test_row_layout_and_combine(self):
        g = _guidance(s_txt=3.0, s_img=2.0)
        lat = jnp.asarray(
            np.random.default_rng(1).normal(size=(1, 8, 8, 4)), jnp.float32)
        seen = {}

        def noise_fn(lat3, t, ctx, *a, **kw):
            seen['lat'] = lat3
            seen['ctx'] = ctx
            seen['t'] = t
            # Distinct per-row outputs: fold the conditioning channels and
            # the context mean in so every row differs.
            return (lat3[..., :4] + lat3[..., 4:] +
                    ctx.mean(axis=(1, 2))[:, None, None, None])

        out = g.noise_pred(noise_fn, lat, jnp.float32(10.0))
        lat3, ctx = seen['lat'], seen['ctx']
        assert lat3.shape == (3, 8, 8, 4 + 4)
        assert seen['t'].shape == (3,)
        # Row 0 (uncond): zero image channels; rows 1-2 carry the latents.
        np.testing.assert_array_equal(np.asarray(lat3[0, ..., 4:]), 0.0)
        np.testing.assert_allclose(np.asarray(lat3[1, ..., 4:]),
                                   np.asarray(g.image_latents[0]), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(lat3[1]),
                                      np.asarray(lat3[2]))
        # All rows see the SAME noisy latents in the first 4 channels.
        for r in range(3):
            np.testing.assert_array_equal(np.asarray(lat3[r, ..., :4]),
                                          np.asarray(lat[0]))
        # Context: [uncond, uncond, text].
        np.testing.assert_array_equal(np.asarray(ctx[0]), np.asarray(ctx[1]))
        np.testing.assert_array_equal(np.asarray(ctx[2]),
                                      np.asarray(g.embeddings[0]))
        # Combine: eps_u + s_img*(eps_i - eps_u) + s_txt*(eps_f - eps_i).
        eps = np.asarray(noise_fn(lat3, seen['t'], ctx))
        want = eps[0] + 2.0 * (eps[1] - eps[0]) + 3.0 * (eps[2] - eps[1])
        np.testing.assert_allclose(np.asarray(out[0]), want, rtol=1e-5)

    def test_unit_scales_reduce_to_full_row(self):
        """s_txt = s_img = 1 telescopes to eps_f exactly."""
        g = _guidance(s_txt=1.0, s_img=1.0)
        lat = jnp.ones((1, 8, 8, 4), jnp.float32)

        def noise_fn(lat3, t, ctx, *a, **kw):
            return lat3[..., :4] * ctx.mean(axis=(1, 2))[:, None, None, None]

        out = g.noise_pred(noise_fn, lat, jnp.float32(1.0))
        img = jnp.broadcast_to(g.image_latents, lat.shape)
        full = noise_fn(jnp.concatenate([lat, img], -1), None, g.embeddings)
        np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                                   rtol=1e-6)

    def test_batched_rows(self):
        g = _guidance(b=2)
        lat = jnp.asarray(
            np.random.default_rng(2).normal(size=(2, 8, 8, 4)), jnp.float32)
        shapes = {}

        def noise_fn(lat3, t, ctx, *a, **kw):
            shapes['lat'] = lat3.shape
            shapes['ctx'] = ctx.shape
            return lat3[..., :4]

        out = g.noise_pred(noise_fn, lat, jnp.float32(5.0))
        assert shapes['lat'] == (6, 8, 8, 8)
        assert shapes['ctx'] == (6, T, D)
        assert out.shape == (2, 8, 8, 4)


# ---------------------------------------------------------------------------
# Runner.edit e2e with a tiny 8-channel UNet


@pytest.fixture(scope='module')
def edit_runner(tmp_path_factory):
    from flexdiffuse_tpu.models import (AutoencoderKL, CLIPTextModel,
                                        CLIPVisionModel, TINY_TEXT,
                                        TINY_UNET, TINY_VAE, TINY_VISION,
                                        UNet2DCondition)
    from flexdiffuse_tpu.config import RunConfig
    from flexdiffuse_tpu.runner import Runner
    from tests.test_tokenizer_and_runner import FakeTokenizer

    k = jax.random.PRNGKey(0)
    text = CLIPTextModel(TINY_TEXT)
    text_params = text.init(k, jnp.zeros((1, 77), jnp.int32))
    vision = CLIPVisionModel(TINY_VISION)
    vision_params = vision.init(k, jnp.zeros((1, 32, 32, 3)))
    cfg8 = dataclasses.replace(TINY_UNET, in_channels=8)
    unet = UNet2DCondition(cfg8)
    unet_params = unet.init(k, jnp.zeros((1, 8, 8, 8)), jnp.zeros((1,)),
                            jnp.zeros((1, 77, TINY_TEXT.hidden_size)))
    vae = AutoencoderKL(TINY_VAE)
    vae_params = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
    out_dir = str(tmp_path_factory.mktemp('outputs'))
    return Runner.from_models(text, text_params, vision, vision_params,
                              unet, unet_params, vae, vae_params,
                              FakeTokenizer(),
                              config=RunConfig(output_dir=out_dir))


def _image(size=64, seed=3):
    """Pre-preprocessed [-1, 1] NHWC array (a PIL input would be resized to
    512² by reference-semantics `preprocess` — too heavy for tiny tests)."""
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, size=(1, size, size, 3)).astype(np.float32)


def test_edit_e2e(edit_runner):
    imgs, grid = edit_runner.edit('make it winter', _image(), steps=3,
                                  seed=11)
    assert len(imgs) == 1
    assert imgs[0].size == (64, 64)
    assert grid is not None
    files = os.listdir(edit_runner.output_dir)
    assert any('edit_st3_gs7_igs150_se11' in f for f in files)


def test_edit_reproducible_and_scale_sensitive(edit_runner):
    a, _ = edit_runner.edit('add snow', _image(), steps=3, seed=5,
                            save=False)
    b, _ = edit_runner.edit('add snow', _image(), steps=3, seed=5,
                            save=False)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    # Image-guidance scale is traced: changing it changes the output
    # (and must not recompile — same shapes, same program).
    c, _ = edit_runner.edit('add snow', _image(), steps=3, seed=5,
                            save=False, image_guidance_scale=5.0)
    assert np.abs(np.asarray(a[0]).astype(np.int32) -
                  np.asarray(c[0]).astype(np.int32)).max() > 0


def test_edit_input_image_conditions_output(edit_runner):
    a, _ = edit_runner.edit('p', _image(seed=1), steps=3, seed=9, save=False)
    b, _ = edit_runner.edit('p', _image(seed=2), steps=3, seed=9, save=False)
    assert np.abs(np.asarray(a[0]).astype(np.int32) -
                  np.asarray(b[0]).astype(np.int32)).max() > 0


def test_edit_rejects_4_channel_unet(tmp_path):
    from tests.test_tokenizer_and_runner import FakeTokenizer
    from flexdiffuse_tpu.models import (AutoencoderKL, CLIPTextModel,
                                        CLIPVisionModel, TINY_TEXT,
                                        TINY_UNET, TINY_VAE, TINY_VISION,
                                        UNet2DCondition)
    from flexdiffuse_tpu.config import RunConfig
    from flexdiffuse_tpu.runner import Runner
    k = jax.random.PRNGKey(0)
    text = CLIPTextModel(TINY_TEXT)
    tp = text.init(k, jnp.zeros((1, 77), jnp.int32))
    vision = CLIPVisionModel(TINY_VISION)
    vp = vision.init(k, jnp.zeros((1, 32, 32, 3)))
    unet = UNet2DCondition(TINY_UNET)
    up = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                   jnp.zeros((1, 77, TINY_TEXT.hidden_size)))
    vae = AutoencoderKL(TINY_VAE)
    vaep = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
    r = Runner.from_models(text, tp, vision, vp, unet, up, vae, vaep,
                           FakeTokenizer(),
                           config=RunConfig(output_dir=str(tmp_path)))
    with pytest.raises(ValueError, match='8-channel'):
        r.edit('x', _image(), steps=2)


def test_edit_unbatched_hwc_array_gains_batch_dim(edit_runner):
    """ADVICE r4: a bare [H, W, 3] array must behave like [1, H, W, 3],
    not silently misread (64, 3) as (h, w)."""
    batched = _image(seed=7)
    a, _ = edit_runner.edit('p', batched, steps=2, seed=4, save=False)
    b, _ = edit_runner.edit('p', batched[0], steps=2, seed=4, save=False)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


def test_edit_rejects_bad_array_rank(edit_runner):
    with pytest.raises(ValueError, match=r'\[1, H, W, 3\]'):
        edit_runner.edit('p', np.zeros((64, 64), np.float32), steps=2,
                         save=False)
    with pytest.raises(ValueError, match=r'\[1, H, W, 3\]'):
        edit_runner.edit('p', np.zeros((1, 64, 64, 4), np.float32), steps=2,
                         save=False)
