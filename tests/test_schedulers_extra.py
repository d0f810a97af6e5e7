"""Euler + DPM-Solver++ 2M scheduler tests (additions over the reference trio)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdiffuse_tpu import schedulers

SHAPE = (1, 4, 8, 8)


def test_registry_has_new_kinds():
    for kind in ('euler', 'dpmpp', 'unipc', 'ddpm'):
        sch = schedulers.make(kind, 10)
        assert sch.length == 10


def test_euler_perfect_model_recovers_x0():
    """With ε = (x − x₀)/σ the Euler chain lands exactly on x₀."""
    sch = schedulers.make('euler', 20)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, SHAPE).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=SHAPE).astype(np.float32))
    x = x0 + noise * sch.sigmas[0]
    for i in range(20):
        sigma = sch.sigmas[i]
        eps = (x - x0) / sigma
        _, x = schedulers.step(sch, (), eps, jnp.int32(i), jnp.int32(i), x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-4)


def test_dpmpp_perfect_model_recovers_x0():
    """With the exact ε for a fixed x₀ the DPM++ chain converges to x₀."""
    sch = schedulers.make('dpmpp', 12)
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, SHAPE).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=SHAPE).astype(np.float32))
    x = sch.vp_alpha[0] * x0 + sch.vp_sigma[0] * noise
    state = schedulers.init_state(sch, SHAPE, jnp.float32)
    for i in range(12):
        eps = (x - sch.vp_alpha[i] * x0) / sch.vp_sigma[i]
        state, x = schedulers.step(sch, state, eps, jnp.int32(i),
                                   jnp.int32(i), x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-3)


def test_dpmpp_constant_x0_trajectory_is_analytic():
    """With a constant x₀ prediction, every DPM++ step is exact:
    x_i = α_i·c + (σ_i/σ_0)·(x_0 − α_0·c). Catches wrong-space sample
    coefficients (e.g. Karras-σ ratios instead of VP-σ ratios) that the
    final-step recovery test cannot see."""
    steps = 10
    sch = schedulers.make('dpmpp', steps)
    c = jnp.full(SHAPE, 0.37)
    x = sch.vp_alpha[0] * c + sch.vp_sigma[0] * jnp.ones(SHAPE)
    x0_start = x
    state = schedulers.init_state(sch, SHAPE, jnp.float32)
    for i in range(steps - 1):  # last step is the x₀ snap, checked elsewhere
        eps = (x - sch.vp_alpha[i] * c) / sch.vp_sigma[i]
        state, x = schedulers.step(sch, state, eps, jnp.int32(i),
                                   jnp.int32(i), x)
        expect = (sch.vp_alpha[i + 1] * c +
                  (sch.vp_sigma[i + 1] / sch.vp_sigma[0]) *
                  (x0_start - sch.vp_alpha[0] * c))
        np.testing.assert_allclose(np.asarray(x), np.asarray(expect),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f'step {i}')


def test_dpmpp_img2img_zero_strength_min_noise():
    """strength→0 with offset-0 schedulers must not wrap to max noise."""
    sch = schedulers.make('dpmpp', 20)
    it, t_start = schedulers.init_timestep_info(sch, 0.0, 20)
    assert it == 0 and t_start == 20
    x = jnp.ones(SHAPE)
    noisy = schedulers.add_noise(sch, x, jnp.ones(SHAPE), it)
    # Noised at the LOWEST timestep: stays close to the input.
    assert float(jnp.abs(noisy - x).max()) < 0.35


def test_dpmpp_second_order_uses_history():
    """Step 1..L-2 must depend on the previous x₀ (true multistep)."""
    sch = schedulers.make('dpmpp', 8)
    x = jnp.ones(SHAPE)
    eps = jnp.full(SHAPE, 0.3)
    s_a = (jnp.zeros(SHAPE),)
    s_b = (jnp.full(SHAPE, 5.0),)
    _, a = schedulers.step(sch, s_a, eps, jnp.int32(3), jnp.int32(3), x)
    _, b = schedulers.step(sch, s_b, eps, jnp.int32(3), jnp.int32(3), x)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6
    # First step (counter 0) must NOT use the bogus initial history.
    _, a0 = schedulers.step(sch, s_a, eps, jnp.int32(0), jnp.int32(0), x)
    _, b0 = schedulers.step(sch, s_b, eps, jnp.int32(0), jnp.int32(0), x)
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(b0))


def test_dpmpp_final_step_returns_x0_pred():
    sch = schedulers.make('dpmpp', 6)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=SHAPE).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=SHAPE).astype(np.float32))
    i = 5
    state = (jnp.zeros(SHAPE),)
    _, out = schedulers.step(sch, state, eps, jnp.int32(i), jnp.int32(i), x)
    x0 = (x - sch.vp_sigma[i] * eps) / sch.vp_alpha[i]
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-5)


@pytest.mark.parametrize('kind', ['euler', 'dpmpp', 'unipc', 'ddpm'])
def test_img2img_noising(kind):
    sch = schedulers.make(kind, 30)
    it, ts = schedulers.init_timestep_info(sch, 0.6, 30)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=SHAPE).astype(np.float32))
    n = jnp.asarray(rng.normal(size=SHAPE).astype(np.float32))
    noisy = schedulers.add_noise(sch, x, n, it)
    assert np.isfinite(np.asarray(noisy)).all()


def test_pipeline_runs_with_new_schedulers():
    from flexdiffuse_tpu.models import (AutoencoderKL, TINY_UNET, TINY_VAE,
                                        UNet2DCondition)
    from flexdiffuse_tpu.pipeline import FlexPipeline, SimpleGuidance

    k = jax.random.PRNGKey(0)
    unet = UNet2DCondition(TINY_UNET)
    up = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                   jnp.zeros((1, 77, 32)))
    vae = AutoencoderKL(TINY_VAE)
    vp = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
    rng = np.random.default_rng(0)
    g = SimpleGuidance(
        embeddings=jnp.asarray(rng.normal(size=(1, 77, 32)).astype(
            np.float32)),
        uncond=jnp.asarray(rng.normal(size=(1, 77, 32)).astype(np.float32)),
        guidance_scale=jnp.float32(8.0), cfg=True)
    for kind in ('euler', 'dpmpp', 'unipc', 'ddpm'):
        pipe = FlexPipeline(unet, up, vae, vp, scheduler=kind)
        out = pipe(g, steps=3, init_size=(64, 64), output_type='np',
                   key=jax.random.PRNGKey(1))
        assert np.isfinite(out.images).all(), kind


def test_karras_sigma_option():
    """use_karras_sigmas: rho-7 spacing, monotone, endpoints match; the
    perfect-model recovery still holds (schedule-shape independent)."""
    from flexdiffuse_tpu.schedulers import SchedulerConfig

    for kind in ('euler', 'dpmpp'):
        cfg = SchedulerConfig(kind=kind, use_karras_sigmas=True)
        sch = schedulers.make(kind, 12, cfg)
        std = schedulers.make(kind, 12)
        sig_k = np.asarray(sch.sigmas)[:12]
        sig_s = np.asarray(std.sigmas)[:12]
        assert (np.diff(sig_k) < 0).all()
        np.testing.assert_allclose(sig_k[0], sig_s[0], rtol=1e-4)
        # Karras spends more of the schedule at low noise.
        assert np.median(sig_k) < np.median(sig_s)
        assert np.isfinite(np.asarray(sch.timesteps)).all()

    # Exact-recovery property carries over to the Karras spacing.
    cfg = SchedulerConfig(kind='euler', use_karras_sigmas=True)
    sch = schedulers.make('euler', 20, cfg)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, SHAPE).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=SHAPE).astype(np.float32))
    x = x0 + noise * sch.sigmas[0]
    for i in range(20):
        eps = (x - x0) / sch.sigmas[i]
        _, x = schedulers.step(sch, (), eps, jnp.int32(i), jnp.int32(i), x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-4)


class TestEulerAncestral:
    def _make(self, steps=8, karras=False):
        from flexdiffuse_tpu import schedulers
        return schedulers.make(
            'euler_a', steps,
            schedulers.SchedulerConfig(kind='euler_a',
                                       use_karras_sigmas=karras))

    def test_step_matches_hand_oracle(self):
        """One step against the k-diffusion/diffusers ancestral formulas."""
        from flexdiffuse_tpu import schedulers
        sch = self._make()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
        eps = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
        key = jax.random.PRNGKey(7)
        i = 2
        _, got = schedulers.step(sch, (), eps, jnp.int32(i), jnp.int32(i),
                                 x, key, 0.0)
        s_from = float(sch.sigmas[i])
        s_to = float(sch.sigmas[i + 1])
        up2 = s_to**2 * (s_from**2 - s_to**2) / s_from**2
        s_down = np.sqrt(s_to**2 - up2)
        noise = np.asarray(jax.random.normal(key, x.shape, jnp.float32))
        ref = np.asarray(x) + np.asarray(eps) * (s_down - s_from) \
            + noise * np.sqrt(up2)
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)

    def test_final_step_deterministic_and_lands_on_x0(self):
        from flexdiffuse_tpu import schedulers
        sch = self._make()
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
        eps = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
        i = sch.length - 1
        outs = [
            np.asarray(
                schedulers.step(sch, (), eps, jnp.int32(i), jnp.int32(i), x,
                                jax.random.PRNGKey(s), 0.0)[1])
            for s in (0, 1)
        ]
        # σ_to = 0: no ancestral noise → key-independent, = x − σ·ε = x0.
        np.testing.assert_array_equal(outs[0], outs[1])
        s_from = float(sch.sigmas[i])
        np.testing.assert_allclose(outs[0],
                                   np.asarray(x) - s_from * np.asarray(eps),
                                   atol=1e-5)

    def test_keys_change_intermediate_steps(self):
        from flexdiffuse_tpu import schedulers
        sch = self._make()
        x = jnp.ones((1, 4, 4, 4))
        eps = jnp.zeros((1, 4, 4, 4))
        a = schedulers.step(sch, (), eps, jnp.int32(1), jnp.int32(1), x,
                            jax.random.PRNGKey(0), 0.0)[1]
        b = schedulers.step(sch, (), eps, jnp.int32(1), jnp.int32(1), x,
                            jax.random.PRNGKey(1), 0.0)[1]
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6

    def test_variance_preserved_marginal(self):
        """σ_down² + σ_up² = σ_to²: the post-step marginal std is exactly
        σ_to when the incoming state carries σ_from."""
        sch = self._make(steps=6)
        sig = np.asarray(sch.sigmas)
        for i in range(5):
            s_from, s_to = sig[i], sig[i + 1]
            up2 = s_to**2 * (s_from**2 - s_to**2) / s_from**2
            down2 = s_to**2 - up2
            assert up2 >= -1e-12
            np.testing.assert_allclose(down2 + up2, s_to**2, rtol=1e-6)

    def test_pipeline_smoke_and_karras(self):
        from flexdiffuse_tpu import schedulers
        from flexdiffuse_tpu.models import (AutoencoderKL, TINY_UNET,
                                            TINY_VAE, UNet2DCondition)
        from flexdiffuse_tpu.pipeline import FlexPipeline
        from flexdiffuse_tpu.pipeline.guides import SimpleGuidance
        k = jax.random.PRNGKey(0)
        unet = UNet2DCondition(TINY_UNET)
        up = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                       jnp.zeros((1, 77, 32)))
        vae = AutoencoderKL(TINY_VAE)
        vp = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
        g = SimpleGuidance(embeddings=jnp.zeros((1, 77, 32)),
                           uncond=jnp.zeros((1, 77, 32)),
                           guidance_scale=jnp.float32(7.5))
        for cfg in (None,
                    schedulers.SchedulerConfig(kind='euler_a',
                                               use_karras_sigmas=True)):
            pipe = FlexPipeline(unet, up, vae, vp, scheduler='euler_a',
                                scheduler_config=cfg)
            out = pipe(g, steps=3, init_size=(32, 32), output_type='np')
            assert np.isfinite(out.images).all()
            # Same seed → identical; different seed → different.
            out2 = pipe(g, steps=3, init_size=(32, 32), output_type='np')
            np.testing.assert_array_equal(out.images, out2.images)
            out3 = pipe(g, steps=3, init_size=(32, 32), output_type='np',
                        key=jax.random.PRNGKey(9))
            assert np.abs(out3.images - out.images).max() > 1e-6
        # img2img path (σ-space add_noise) runs too.
        init = np.zeros((1, 32, 32, 3), np.float32)
        pipe = FlexPipeline(unet, up, vae, vp, scheduler='euler_a')
        out = pipe(g, steps=4, init_image=init, strength=0.5,
                   output_type='np')
        assert np.isfinite(out.images).all()
