"""CFG rescale (Lin et al. 2023) + zero-terminal-SNR beta rescale.

Both are ecosystem-compat knobs for checkpoints trained with them
(e.g. zero-SNR v-pred fine-tunes): ``guidance_rescale`` pulls the CFG
noise prediction back toward the cond prediction's std; the beta rescale
makes the last train step pure noise.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdiffuse_tpu.pipeline.guides import SimpleGuidance, rescale_cfg
from flexdiffuse_tpu.schedulers.base import (SchedulerConfig, make_betas,
                                             alphas_cumprod,
                                             rescale_zero_terminal_snr)


def test_rescale_cfg_phi_zero_is_identity():
    k = jax.random.PRNGKey(0)
    eps = jax.random.normal(k, (2, 8, 8, 4))
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    out = rescale_cfg(eps, cond, jnp.float32(0.0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(eps))


def test_rescale_cfg_phi_one_matches_cond_std():
    k = jax.random.PRNGKey(0)
    cond = jax.random.normal(k, (2, 8, 8, 4))
    eps = cond * 3.0   # CFG-inflated scale
    out = np.asarray(rescale_cfg(eps, cond, jnp.float32(1.0)))
    for b in range(2):
        np.testing.assert_allclose(out[b].std(), np.asarray(cond)[b].std(),
                                   rtol=1e-4)


def test_simple_guidance_rescale_plumbs():
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(1, 77, 16)).astype(np.float32))
    unc = jnp.asarray(rng.normal(size=(1, 77, 16)).astype(np.float32))

    def noise_fn(lat, t, ctx, added=None, ip=None, tcond=None):
        # context-dependent fake eps so cond/uncond rows differ
        return lat * jnp.mean(ctx, axis=(1, 2))[:, None, None, None]

    lat = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    g0 = SimpleGuidance(embeddings=emb, uncond=unc,
                        guidance_scale=jnp.float32(8.0), cfg=True)
    g7 = g0.replace(rescale=True, guidance_rescale=jnp.float32(0.7))
    e0 = np.asarray(g0.noise_pred(noise_fn, lat, jnp.float32(500)))
    e7 = np.asarray(g7.noise_pred(noise_fn, lat, jnp.float32(500)))
    assert np.isfinite(e7).all()
    assert np.abs(e0 - e7).max() > 1e-6
    # rescale off (the default, static gate) must be bit-identical to the
    # pre-feature output — and build a reduction-free graph (the round-4
    # regression: even phi=0 rescale changed padded-batch numerics).
    e00 = np.asarray(g0.replace(guidance_rescale=jnp.float32(0.0))
                     .noise_pred(noise_fn, lat, jnp.float32(500)))
    np.testing.assert_array_equal(e0, e00)


def test_rescale_gate_guard_rejects_silent_noop():
    """A concrete nonzero phi without the static ``rescale`` flag would
    silently never apply — construction must reject it (traced phi and
    the phi=0 default stay allowed)."""
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(1, 77, 16)).astype(np.float32))
    unc = jnp.asarray(rng.normal(size=(1, 77, 16)).astype(np.float32))
    g = SimpleGuidance(embeddings=emb, uncond=unc,
                       guidance_scale=jnp.float32(8.0), cfg=True)
    with pytest.raises(ValueError, match='rescale'):
        g.replace(guidance_rescale=jnp.float32(0.7))
    with pytest.raises(ValueError, match='rescale'):
        SimpleGuidance(embeddings=emb, uncond=unc,
                       guidance_scale=jnp.float32(8.0), cfg=True,
                       guidance_rescale=0.7)
    # allowed: flag set, phi zero, or phi traced (e.g. under jit)
    g.replace(rescale=True, guidance_rescale=jnp.float32(0.7))
    g.replace(guidance_rescale=jnp.float32(0.0))
    jax.jit(lambda gd: gd.noise_pred(
        lambda lat, t, ctx, added=None, ip=None, tcond=None: lat,
        jnp.zeros((1, 8, 8, 4)), jnp.float32(500)))(g)


def test_zero_snr_terminal_alpha_bar():
    cfg = SchedulerConfig(rescale_betas_zero_snr=True)
    acp = alphas_cumprod(cfg)
    # Terminal SNR ≈ 0 (floored at 1e-12 — see rescale_zero_terminal_snr's
    # note on exact-limit x0 recovery through the ε interface).
    assert acp[-1] == pytest.approx(0.0, abs=2e-12)
    # Initial value preserved vs the unrescaled schedule.
    base = alphas_cumprod(SchedulerConfig())
    assert acp[0] == pytest.approx(base[0], rel=1e-6)
    # Monotone decreasing, all betas in (0, 1].
    assert (np.diff(acp) < 0).all()
    betas = make_betas(cfg)
    assert (betas > 0).all() and (betas <= 1).all()


def test_zero_snr_off_by_default():
    np.testing.assert_array_equal(make_betas(SchedulerConfig()),
                                  make_betas(SchedulerConfig(
                                      rescale_betas_zero_snr=False)))


def test_zero_snr_pipeline_v_pred_finite():
    """A v-pred tiny pipeline with zero-SNR betas denoises to finite
    latents (the epsilon conversion never divides by sqrt(acp))."""
    from flexdiffuse_tpu import schedulers
    from flexdiffuse_tpu.models import (SD14_VAE, TINY_UNET, TINY_VAE,
                                        AutoencoderKL, UNet2DCondition)
    from flexdiffuse_tpu.pipeline import FlexPipeline
    k = jax.random.PRNGKey(0)
    unet = UNet2DCondition(TINY_UNET)
    up = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                   jnp.zeros((1, 77, 32)))
    vae = AutoencoderKL(TINY_VAE)
    vp = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
    cfg = schedulers.SchedulerConfig(kind='ddim',
                                     prediction_type='v_prediction',
                                     rescale_betas_zero_snr=True,
                                     clip_sample=False)
    pipe = FlexPipeline(unet, up, vae, vp, scheduler='ddim',
                        scheduler_config=cfg)
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(1, 77, 32)).astype(np.float32))
    g = SimpleGuidance(embeddings=emb, uncond=jnp.zeros_like(emb),
                       guidance_scale=jnp.float32(7.0), cfg=True,
                       rescale=True, guidance_rescale=jnp.float32(0.7))
    out = pipe(g, steps=4, init_size=(64, 64),
               key=jax.random.PRNGKey(3), output_type='latent')
    assert np.isfinite(np.asarray(out.images)).all()


def test_trailing_timestep_spacing():
    from flexdiffuse_tpu.schedulers.base import spaced_timesteps
    cfg = SchedulerConfig(timestep_spacing='trailing')
    ts = spaced_timesteps(cfg, 25)
    assert ts[0] == 999 and ts[-1] == 39          # starts at T-1
    assert (np.diff(ts) == -40).all()
    lead = spaced_timesteps(SchedulerConfig(), 25, offset=1)
    assert lead[0] == 961 and lead[-1] == 1       # the historical spacing
    with pytest.raises(ValueError):
        spaced_timesteps(SchedulerConfig(timestep_spacing='nope'), 25)


def test_trailing_ddim_schedule_denoises():
    from flexdiffuse_tpu import schedulers
    cfg = SchedulerConfig(kind='ddim', timestep_spacing='trailing',
                          rescale_betas_zero_snr=True,
                          prediction_type='v_prediction', clip_sample=False)
    sch = schedulers.make('ddim', 8, config=cfg)
    assert float(sch.timesteps[0]) == 999.0
    state = schedulers.init_state(sch, (1, 8, 8, 4), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    for i in range(8):
        eps = jnp.zeros_like(x)   # v=0 prediction
        state, x = schedulers.step(sch, state, eps, jnp.int32(i),
                                   jnp.int32(i), x,
                                   jax.random.PRNGKey(i), jnp.float32(0.0))
    assert np.isfinite(np.asarray(x)).all()
