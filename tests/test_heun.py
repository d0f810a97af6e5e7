"""Heun scheduler tests: sequential k-diffusion oracle + pipeline drive.

The oracle is an independent, stateful re-expression of the published
k-diffusion ``sample_heun`` update (predict with Euler, correct with the
trapezoidal mean of the two derivatives, terminal σ=0 transition Euler-only).
The product scheduler is an interleaved-row scan program — trajectory
equality is evidence the redesign preserved the math.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdiffuse_tpu import schedulers


def _fake(x, t, pattern):
    """Deterministic fake model output — depends on sample and timestep."""
    return np.tanh(x) * 0.3 + np.cos(t / 17.0) * pattern


class OracleHeun:
    """Sequential k-diffusion Heun over an explicit σ list (with terminal 0).
    One call per σ transition; evaluates the model at the step start and at
    the Euler-predicted endpoint."""

    def __init__(self, sigmas, timesteps):
        self.sigmas = sigmas          # [N+1], trailing 0
        self.timesteps = timesteps    # [N]

    def run(self, x, pattern):
        outs = []
        for k in range(len(self.sigmas) - 1):
            s0, s1 = self.sigmas[k], self.sigmas[k + 1]
            d1 = _fake(x, self.timesteps[k], pattern)
            x2 = x + d1 * (s1 - s0)
            if s1 == 0.0:
                x = x2
            else:
                d2 = _fake(x2, self.timesteps[k + 1], pattern)
                x = x + 0.5 * (d1 + d2) * (s1 - s0)
            outs.append(x.copy())
        return x, outs


@pytest.mark.parametrize('karras', [False, True])
def test_heun_matches_sequential_oracle(karras):
    steps = 8
    cfg = schedulers.SchedulerConfig(kind='heun', use_karras_sigmas=karras)
    sch = schedulers.make('heun', steps, cfg)
    assert sch.length == 2 * steps - 1
    assert sch.rows_per_step == 2

    rows_sig = np.asarray(sch.sigmas, np.float64)
    rows_ts = np.asarray(sch.timesteps, np.float64)
    # De-interleave the tables back to per-step lists for the oracle.
    step_sigmas = np.concatenate([rows_sig[0:1], rows_sig[1::2]])
    step_ts = np.concatenate([rows_ts[0:1], rows_ts[1::2]])
    assert len(step_sigmas) == steps + 1 and step_sigmas[-1] == 0.0

    rng = np.random.default_rng(3)
    shape = (2, 5)
    pattern = rng.normal(size=shape)
    x0 = rng.normal(size=shape) * float(step_sigmas[0])

    x_ref, ref_outs = OracleHeun(step_sigmas, step_ts).run(x0.copy(),
                                                           pattern)

    x = jnp.asarray(x0, jnp.float32)
    state = schedulers.init_state(sch, shape, jnp.float32)
    corrected = []
    for i in range(sch.length):
        eps = jnp.asarray(_fake(np.asarray(x, np.float64), rows_ts[i],
                                pattern), jnp.float32)
        state, x = schedulers.step(sch, state, eps, jnp.int32(i),
                                   jnp.int32(i), x, None, 0.0)
        if i % 2 == 1 or i == sch.length - 1:   # corrector / terminal rows
            corrected.append(np.asarray(x, np.float64))
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=2e-4, atol=2e-5)
    assert len(corrected) == len(ref_outs)
    for k, (got, ref) in enumerate(zip(corrected, ref_outs)):
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5,
                                   err_msg=f'step {k}')


def test_heun_add_noise_rows():
    sch = schedulers.make('heun', 8)
    x = jnp.ones((1, 4))
    n = jnp.ones((1, 4))
    # step index k noises at σ_k (row 2k)
    got = schedulers.add_noise(sch, x, n, 8)  # init_timestep=steps → σ0
    np.testing.assert_allclose(np.asarray(got),
                               1.0 + float(sch.sigmas[0]), rtol=1e-6)
    got2 = schedulers.add_noise(sch, x, n, 5)  # → step 3 → row 6
    np.testing.assert_allclose(np.asarray(got2),
                               1.0 + float(sch.sigmas[6]), rtol=1e-6)


def _tiny_pipe(scheduler):
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
                        scheduler=scheduler)
    ctx = jnp.full((1, 77, TINY_TEXT.hidden_size), 0.1, jnp.float32)
    g = SimpleGuidance(embeddings=ctx, uncond=jnp.zeros_like(ctx),
                       guidance_scale=jnp.float32(4.0), cfg=True)
    return pipe, g


def test_heun_pipeline_txt2img_img2img_inpaint():
    pipe, g = _tiny_pipe('heun')
    out = pipe(g, steps=3, init_size=(32, 32), key=jax.random.PRNGKey(1))
    img = out.images[0]
    assert img.size == (32, 32)
    # seed-reproducible
    out2 = pipe(g, steps=3, init_size=(32, 32), key=jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(img), np.asarray(out2.images[0]))

    # img2img exercises the row-scaled t_start + σ-row add_noise. A
    # preprocessed [-1,1] array keeps the 32×32 canvas (a PIL init would be
    # preprocess-resized to 512 — reference encode/clip.py:15-39).
    rng = np.random.default_rng(5)
    init = rng.uniform(-1, 1, size=(1, 32, 32, 3)).astype(np.float32)
    o_i2i = pipe(g, steps=4, init_image=init, strength=0.5,
                 key=jax.random.PRNGKey(2))
    assert o_i2i.images[0].size == (32, 32)
    full = pipe(g, steps=4, init_image=init, strength=1.0,
                key=jax.random.PRNGKey(2))
    assert np.abs(np.asarray(o_i2i.images[0], np.int16) -
                  np.asarray(full.images[0], np.int16)).max() > 0

    # latent inpainting rides anchor_noise's σ-row arithmetic
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    o_inp = pipe(g, steps=3, init_image=init, strength=1.0, mask=mask,
                 key=jax.random.PRNGKey(3))
    assert o_inp.images[0].size == (32, 32)
