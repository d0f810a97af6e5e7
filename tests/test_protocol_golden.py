"""Seeded experiment-protocol integration golden (SURVEY.md §4).

Runs the reference README's exact protocol parameters (seed 1337, strength
0.6, steps 30, guidance 8, threshold 0.25/0.75, clustered 0.25, linear
0.0–0.5, max guidance 0.35 — README.md:252-267) end-to-end through Runner
with tiny models and pins the output pixels. The real-weight version of this
protocol lives in tools/experiments.py; this golden catches any regression
in the full embed→tween→denoise→decode chain.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), 'goldens',
                      'protocol_t2i.npy')


@pytest.fixture(scope='module')
def runner(tmp_path_factory):
    from flexdiffuse_tpu.models import (AutoencoderKL, CLIPTextModel,
                                        CLIPVisionModel, TINY_TEXT, TINY_UNET,
                                        TINY_VAE, TINY_VISION,
                                        UNet2DCondition)
    from flexdiffuse_tpu.runner import Runner
    from flexdiffuse_tpu.config import RunConfig
    from flexdiffuse_tpu.text.tokenizer import FakeTokenizer

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
    out = str(tmp_path_factory.mktemp('protocol'))
    return Runner.from_models(text, tp, vision, vp, unet, up, vae, vaep,
                              FakeTokenizer(),
                              config=RunConfig(output_dir=out))


def test_protocol_golden(runner):
    imgs, grid = runner.gen(
        prompt='Deer colorful, fantasy, intricate, highly detailed',
        guide='colorful fantasy painting',
        guide_threshold_mult=0.25, guide_threshold_floor=0.75,
        guide_clustered=0.25, guide_linear=(0.0, 0.5),
        guide_max_guidance=0.35, guide_header_max=0.0,
        guide_mode=1, guide_reuse=True,
        strength=0.6, steps=30, guidance_scale=8,
        samples=1, seed=1337, init_size=(64, 64), save=False)
    got = np.asarray(imgs[0], np.uint8)
    if not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.save(GOLDEN, got)
        pytest.skip(f'golden generated at {GOLDEN}; rerun to verify')
    ref = np.load(GOLDEN)
    # Bit-exact on CPU: same platform, same seeds, same compiled program.
    np.testing.assert_array_equal(got, ref)
