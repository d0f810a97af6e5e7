"""FreeU tests (models/unet.py fourier_filter + freeu decoder knob).

Beyond-reference feature (published FreeU recipe): backbone half-channel
amplification + Fourier skip attenuation at the two deepest decoder levels.
No weights change — the knob is a static module attribute.
"""
import jax
import jax.numpy as jnp
import numpy as np

from flexdiffuse_tpu.models import (TINY_TEXT, TINY_UNET,
                                    UNet2DCondition)
from flexdiffuse_tpu.models.unet import fourier_filter


def test_fourier_filter_identity_at_scale_one():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 8, 4)),
                    jnp.float32)
    y = fourier_filter(x, threshold=1, scale=1.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_fourier_filter_scale_zero_kills_dc():
    """scale=0 removes the lowest frequencies — a constant image maps to
    ~zero while a high-frequency checkerboard survives."""
    const = jnp.ones((1, 8, 8, 1), jnp.float32)
    y = fourier_filter(const, threshold=1, scale=0.0)
    assert np.abs(np.asarray(y)).max() < 1e-5
    checker = jnp.asarray(
        np.indices((8, 8)).sum(0) % 2, jnp.float32)[None, :, :, None] * 2 - 1
    yc = fourier_filter(checker, threshold=1, scale=0.0)
    np.testing.assert_allclose(np.asarray(yc), np.asarray(checker),
                               atol=1e-5)


def _unet_out(freeu):
    k = jax.random.PRNGKey(0)
    unet = UNet2DCondition(TINY_UNET, freeu=freeu)
    lat = jnp.zeros((1, 8, 8, 4))
    t = jnp.zeros((1,))
    ctx = jnp.zeros((1, 77, TINY_TEXT.hidden_size))
    params = UNet2DCondition(TINY_UNET).init(k, lat, t, ctx)
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, (1, 8, 8, 4))
    return np.asarray(unet.apply(params, x, jnp.full((1,), 500.0), ctx))


def test_freeu_neutral_settings_match_baseline():
    base = _unet_out(None)
    neutral = _unet_out((1.0, 1.0, 1.0, 1.0))
    np.testing.assert_allclose(neutral, base, atol=1e-4)


def test_freeu_changes_output_without_new_params():
    base = _unet_out(None)
    freeu = _unet_out((1.5, 1.6, 0.9, 0.2))
    assert np.abs(freeu - base).max() > 1e-4
    assert np.isfinite(freeu).all()


def test_runner_enable_disable_freeu_round_trip(tmp_path):
    from flexdiffuse_tpu.models import (TINY_VAE, AutoencoderKL,
                                        CLIPTextModel, CLIPVisionModel,
                                        TINY_VISION)
    from flexdiffuse_tpu.runner import Runner
    from flexdiffuse_tpu.config import RunConfig
    from flexdiffuse_tpu.text.tokenizer import FakeTokenizer

    k = jax.random.PRNGKey(0)
    text = CLIPTextModel(TINY_TEXT)
    text_params = text.init(k, jnp.zeros((1, 77), jnp.int32))
    vision = CLIPVisionModel(TINY_VISION)
    vision_params = vision.init(k, jnp.zeros((1, 32, 32, 3)))
    unet = UNet2DCondition(TINY_UNET)
    unet_params = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                            jnp.zeros((1, 77, TINY_TEXT.hidden_size)))
    vae = AutoencoderKL(TINY_VAE)
    vae_params = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
    runner = Runner.from_models(text, text_params, vision, vision_params,
                                unet, unet_params, vae, vae_params,
                                FakeTokenizer(),
                                config=RunConfig(output_dir=str(tmp_path)))

    base, _ = runner.gen(prompt='a cat', steps=2, init_size=(32, 32),
                         samples=1, seed=9, save=False)
    runner.enable_freeu()
    assert runner.pipe.unet.freeu == (1.5, 1.6, 0.9, 0.2)
    on, _ = runner.gen(prompt='a cat', steps=2, init_size=(32, 32),
                       samples=1, seed=9, save=False)
    assert np.abs(np.asarray(base[0], np.int16) -
                  np.asarray(on[0], np.int16)).max() > 0
    runner.disable_freeu()
    off, _ = runner.gen(prompt='a cat', steps=2, init_size=(32, 32),
                        samples=1, seed=9, save=False)
    np.testing.assert_array_equal(np.asarray(base[0]), np.asarray(off[0]))
