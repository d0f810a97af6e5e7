"""v-prediction (SD2.x 768-v) scheduler support + SD2.1 geometry pins.

The conversion identity: with x_t = √ᾱ·x₀ + √(1−ᾱ)·ε and
v = √ᾱ·ε − √(1−ᾱ)·x₀, the recovered ε must equal the true ε exactly —
checked analytically per scheduler space, then end-to-end: a v-mode run
whose model emits the v corresponding to an ε-mode model must reproduce the
ε-mode trajectory bit-for-bit.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdiffuse_tpu import schedulers

KINDS = ['ddim', 'pndm', 'lms', 'euler', 'euler_a', 'dpmpp', 'unipc',
         'ddpm']


def _make(kind, steps, v=False):
    cfg = schedulers.SchedulerConfig(
        kind=kind, prediction_type='v_prediction' if v else 'epsilon')
    return schedulers.make(kind, steps, cfg)


@pytest.mark.parametrize('kind', KINDS)
def test_conversion_recovers_epsilon_analytically(kind):
    sch = _make(kind, 8, v=True)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
    for i in [0, 3, 7]:
        if kind in ('lms', 'euler', 'euler_a'):
            sigma = float(sch.sigmas[i])
            sample = x0 + sigma * eps          # σ-space carry
            # v is defined on the VP-scaled input: √ᾱ = 1/√(σ²+1).
            sa = 1.0 / np.sqrt(sigma**2 + 1.0)
            so = sigma * sa
            v = sa * eps - so * x0
        else:
            if kind in ('dpmpp', 'unipc'):
                sa, so = float(sch.vp_alpha[i]), float(sch.vp_sigma[i])
            else:
                t = int(sch.timesteps[i])
                ap = float(sch.alphas_cumprod[t])
                sa, so = np.sqrt(ap), np.sqrt(1.0 - ap)
            sample = sa * x0 + so * eps
            v = sa * eps - so * x0
        got = schedulers.convert_v_prediction(sch, v, jnp.int32(i), sample)
        np.testing.assert_allclose(np.asarray(got), np.asarray(eps),
                                   atol=2e-5, rtol=1e-5,
                                   err_msg=f'{kind} pos {i}')


def _v_from_eps(sch, kind, eps, i, sample):
    """Inverse of convert_v_prediction (what a v-model would emit)."""
    if kind in ('lms', 'euler', 'euler_a'):
        sigma = sch.sigmas[i]
        return (eps - sample * sigma / (sigma**2 + 1.0)) * jnp.sqrt(
            sigma**2 + 1.0)
    if kind in ('dpmpp', 'unipc'):
        return (eps - sch.vp_sigma[i] * sample) / sch.vp_alpha[i]
    t = jnp.clip(sch.timesteps[i].astype(jnp.int32), 0,
                 sch.num_train_timesteps - 1)
    ap = sch.alphas_cumprod[t]
    return (eps - jnp.sqrt(1.0 - ap) * sample) / jnp.sqrt(ap)


@pytest.mark.parametrize('kind', KINDS)
def test_v_mode_reproduces_eps_mode_trajectory(kind):
    steps = 6
    sch_e = _make(kind, steps)
    sch_v = _make(kind, steps, v=True)
    rng = np.random.default_rng(1)
    lat0 = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
    # A fixed pseudo-model: ε depends deterministically on the step index.
    eps_tab = jnp.asarray(
        rng.normal(size=(sch_e.length, 1, 4, 4, 4)).astype(np.float32))

    def run(sch, as_v):
        state = schedulers.init_state(sch, lat0.shape, lat0.dtype)
        lat = lat0
        for i in range(sch.length):
            ii = jnp.int32(i)
            out = eps_tab[i]
            if as_v:
                out = _v_from_eps(sch, kind, out, ii, lat)
            state, lat = schedulers.step(sch, state, out, ii, ii, lat,
                                         jax.random.PRNGKey(i), 0.0)
        return np.asarray(lat)

    np.testing.assert_allclose(run(sch_v, True), run(sch_e, False),
                               atol=1e-4, rtol=1e-4)


def test_bad_prediction_type_rejected():
    with pytest.raises(ValueError, match='prediction_type'):
        schedulers.make(
            'ddim', 8, schedulers.SchedulerConfig(prediction_type='sample'))


def test_sd21_geometry_pins():
    """SD2.1 (stabilityai/stable-diffusion-2-1): published param counts."""
    from flexdiffuse_tpu.models import (OPENCLIP_H_TEXT, SD21_UNET,
                                        CLIPTextModel, UNet2DCondition)
    unet = UNet2DCondition(SD21_UNET)
    shapes = jax.eval_shape(
        lambda k: unet.init(k, jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,)),
                            jnp.zeros((1, 77, 1024))), jax.random.PRNGKey(0))
    n = sum(int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(shapes))
    assert n == 865_910_724
    # 64-wide heads: 5/10/20/20 per level.
    assert [SD21_UNET.heads_for(c) for c in SD21_UNET.block_channels] == \
        [5, 10, 20, 20]
    clip = CLIPTextModel(OPENCLIP_H_TEXT)
    cs = jax.eval_shape(lambda k: clip.init(k, jnp.zeros((1, 77), jnp.int32)),
                        jax.random.PRNGKey(0))
    cn = sum(int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(cs))
    assert cn == 340_387_840


def test_v_prediction_pipeline_smoke():
    from flexdiffuse_tpu.models import (AutoencoderKL, TINY_UNET, TINY_VAE,
                                        UNet2DCondition)
    from flexdiffuse_tpu.pipeline import FlexPipeline
    from flexdiffuse_tpu.pipeline.guides import SimpleGuidance
    k = jax.random.PRNGKey(0)
    unet = UNet2DCondition(TINY_UNET)
    up = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                   jnp.zeros((1, 77, 32)))
    vae = AutoencoderKL(TINY_VAE)
    vp = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
    pipe = FlexPipeline(
        unet, up, vae, vp, scheduler='ddim',
        scheduler_config=schedulers.SchedulerConfig(
            kind='ddim', prediction_type='v_prediction'))
    g = SimpleGuidance(embeddings=jnp.zeros((1, 77, 32)),
                       uncond=jnp.zeros((1, 77, 32)),
                       guidance_scale=jnp.float32(7.5))
    out = pipe(g, steps=3, init_size=(32, 32), output_type='np')
    assert np.isfinite(out.images).all()
    # And it actually changes the result vs epsilon mode.
    pipe_e = FlexPipeline(unet, up, vae, vp, scheduler='ddim')
    out_e = pipe_e(g, steps=3, init_size=(32, 32), output_type='np')
    assert np.abs(out.images - out_e.images).max() > 1e-6
