"""LCM few-step sampling (schedulers/lcm.py + the guidance-embedding UNet).

Beyond-reference surface: the latent-consistency sampler LCM checkpoints
and LCM-LoRA adapters are distilled for. The trajectory is diffed against a
hand-written numpy transcription of the published consistency update rule
(the same oracle strategy the other schedulers use, SURVEY.md §4).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdiffuse_tpu import schedulers
from flexdiffuse_tpu.schedulers.base import SchedulerConfig, alphas_cumprod

SIGMA_DATA = 0.5


def test_timestep_grid_matches_diffusers_formula():
    """4/8-step grids from the 50-step distillation sub-schedule."""
    s = schedulers.make('lcm', 4)
    np.testing.assert_array_equal(np.asarray(s.timesteps),
                                  [999.0, 759.0, 519.0, 279.0])
    np.testing.assert_array_equal(np.asarray(s.prev_tr),
                                  [759.0, 519.0, 279.0, -1.0])
    s8 = schedulers.make('lcm', 8)
    np.testing.assert_array_equal(
        np.asarray(s8.timesteps),
        [999.0, 879.0, 759.0, 639.0, 519.0, 399.0, 279.0, 159.0])


def test_steps_capped_by_original():
    with pytest.raises(ValueError):
        schedulers.make('lcm', 51)


def _oracle_step(acp, x, eps, t, prev_t, noise, scaling=10.0):
    """Numpy transcription of the LCM consistency update."""
    ap_t = acp[t]
    x0 = (x - np.sqrt(1.0 - ap_t) * eps) / np.sqrt(ap_t)
    scaled = t * scaling
    c_skip = SIGMA_DATA**2 / (scaled**2 + SIGMA_DATA**2)
    c_out = scaled / np.sqrt(scaled**2 + SIGMA_DATA**2)
    denoised = c_out * x0 + c_skip * x
    if prev_t < 0:
        return denoised
    ap_prev = acp[prev_t]
    return np.sqrt(ap_prev) * denoised + np.sqrt(1.0 - ap_prev) * noise


def test_trajectory_matches_oracle():
    steps = 4
    s = schedulers.make('lcm', steps)
    acp = alphas_cumprod(SchedulerConfig(kind='lcm'))
    rng = np.random.default_rng(0)
    shape = (1, 4, 4, 4)
    x = rng.normal(size=shape).astype(np.float32)
    x_ref = x.copy()
    state = schedulers.init_state(s, shape, jnp.float32)
    for i in range(steps):
        eps = rng.normal(size=shape).astype(np.float32) * 0.3
        key = jax.random.PRNGKey(100 + i)
        state, x_new = schedulers.step(s, state, jnp.asarray(eps),
                                       jnp.int32(i), jnp.int32(i),
                                       jnp.asarray(x), key, 0.0)
        noise = np.asarray(jax.random.normal(key, shape, jnp.float32))
        t = int(np.asarray(s.timesteps)[i])
        prev_t = int(np.asarray(s.prev_tr)[i])
        x_ref = _oracle_step(acp, x_ref, eps, t, prev_t, noise)
        x = np.asarray(x_new)
        np.testing.assert_allclose(x, x_ref, rtol=0, atol=2e-5)
    assert np.isfinite(x).all()


def test_guidance_scale_embedding_formula():
    from flexdiffuse_tpu.models.unet import guidance_scale_embedding
    dim, w = 256, 7.0
    emb = np.asarray(guidance_scale_embedding(jnp.float32(w), dim))
    half = dim // 2
    e = np.log(10000.0) / (half - 1)
    freqs = np.exp(np.arange(half) * -e).astype(np.float32)
    args = (np.float32(w) * np.float32(1000.0) * freqs).astype(np.float32)
    ref = np.concatenate([np.sin(args), np.cos(args)]).astype(np.float32)
    # fp32 exp() rounding differs ~1.6e-6 relative between XLA and numpy;
    # the w·1000 argument amplifies that to |Δarg| ≤ ~0.012 → the same
    # bound on sin/cos. (torch's fp32 pipeline carries the identical
    # sensitivity — the embedding is only ever consumed through a learned
    # projection.)
    np.testing.assert_allclose(emb[0], ref, rtol=0, atol=2e-2)
    assert emb.shape == (1, dim)


@pytest.fixture(scope='module')
def lcm_pipe():
    """Tiny guidance-embedded (full-LCM-style) pipeline."""
    from flexdiffuse_tpu.models import AutoencoderKL, TINY_VAE, UNet2DCondition
    from flexdiffuse_tpu.models.configs import UNetConfig
    from flexdiffuse_tpu.pipeline import FlexPipeline
    cfg = UNetConfig(block_channels=(8, 16), layers_per_block=1,
                     attention_levels=(True, True), num_heads=2,
                     cross_attention_dim=16, norm_groups=4,
                     time_cond_proj_dim=32)
    unet = UNet2DCondition(cfg)
    vae = AutoencoderKL(TINY_VAE)
    k = jax.random.PRNGKey(0)
    lat = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 77, 16))
    tc = jnp.zeros((1, 32))
    up = unet.init(k, lat, jnp.zeros((1,)), ctx, timestep_cond=tc)
    vp = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
    return FlexPipeline(unet, up, vae, vp, scheduler='lcm')


def _guide(batch=1, scale=8.0):
    from flexdiffuse_tpu.pipeline import SimpleGuidance
    rng = np.random.default_rng(3)
    emb = jnp.asarray(rng.normal(size=(batch, 77, 16)).astype(np.float32))
    unc = jnp.asarray(rng.normal(size=(1, 77, 16)).astype(np.float32))
    return SimpleGuidance(embeddings=emb, uncond=unc,
                          guidance_scale=jnp.float32(scale), cfg=scale > 1.0)


def test_lcm_txt2img_end_to_end(lcm_pipe):
    """Full-LCM flow: guidance embedding auto-built, CFG off, 4 steps."""
    out = lcm_pipe(_guide(), steps=4, init_size=(64, 64),
                   key=jax.random.PRNGKey(1), output_type='np')
    img = np.asarray(out['sample'])
    assert img.shape == (1, 64, 64, 3)
    assert np.isfinite(img).all()


def test_lcm_img2img(lcm_pipe):
    img = np.full((1, 64, 64, 3), 0.5, np.float32)  # pre-scaled [-1,1] NHWC
    out = lcm_pipe(_guide(), steps=4, init_image=img, strength=0.6,
                   init_size=(64, 64), key=jax.random.PRNGKey(2),
                   output_type='np')
    assert np.isfinite(np.asarray(out['sample'])).all()


def test_lcm_lora_style_cfg_pipeline():
    """LCM scheduler on a STANDARD UNet (the LCM-LoRA flow): ordinary CFG
    stays on — only guidance-embedded checkpoints disable it."""
    from flexdiffuse_tpu.models import (AutoencoderKL, TINY_UNET, TINY_VAE,
                                        UNet2DCondition)
    from flexdiffuse_tpu.pipeline import FlexPipeline
    unet = UNet2DCondition(TINY_UNET)
    vae = AutoencoderKL(TINY_VAE)
    k = jax.random.PRNGKey(0)
    up = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                   jnp.zeros((1, 77, 32)))
    vp = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
    pipe = FlexPipeline(unet, up, vae, vp, scheduler='lcm')
    from flexdiffuse_tpu.pipeline import SimpleGuidance
    rng = np.random.default_rng(5)
    g = SimpleGuidance(
        embeddings=jnp.asarray(rng.normal(size=(1, 77, 32)), jnp.float32),
        uncond=jnp.asarray(rng.normal(size=(1, 77, 32)), jnp.float32),
        guidance_scale=jnp.float32(1.5), cfg=True)
    out = pipe(g, steps=4, init_size=(64, 64), key=jax.random.PRNGKey(3),
               output_type='np')
    assert np.isfinite(np.asarray(out['sample'])).all()


def test_converter_cond_proj():
    """Synthetic HF state dict with time_embedding.cond_proj converts into
    the exact init tree of a guidance-embedded UNet."""
    import torch

    from flexdiffuse_tpu.models import UNet2DCondition
    from flexdiffuse_tpu.models.configs import UNetConfig
    from flexdiffuse_tpu.weights.convert import convert_unet
    cfg = UNetConfig(block_channels=(8, 16), layers_per_block=1,
                     attention_levels=(True, True), num_heads=2,
                     cross_attention_dim=16, norm_groups=4,
                     time_cond_proj_dim=32)
    unet = UNet2DCondition(cfg)
    k = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(
        lambda kk: unet.init(kk, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                             jnp.zeros((1, 77, 16)),
                             timestep_cond=jnp.zeros((1, 32))), k)['params']

    from flexdiffuse_tpu.weights.convert import _dense
    w = torch.arange(32 * 8, dtype=torch.float32).reshape(8, 32)
    got = _dense({'time_embedding.cond_proj.weight': w},
                 'time_embedding.cond_proj', bias=False)
    assert got['kernel'].shape == (32, 8)
    np.testing.assert_array_equal(np.asarray(got['kernel']),
                                  w.numpy().T)
    assert shapes['time_cond_proj']['kernel'].shape == (32, 8)
