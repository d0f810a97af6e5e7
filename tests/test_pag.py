"""PAG — Perturbed-Attention Guidance (Ahn et al. 2024) tests.

Beyond-reference quality feature: an extra cond batch row runs with
identity self-attention in selected transformer layers (the pre-``to_out``
identity output is exactly ``v``, so on this architecture the perturbed
row is a per-row ``where`` on tensors already computed), and the noise
prediction adds ``pag_scale·(eps_cond − eps_perturbed)``.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdiffuse_tpu.models import (TINY_TEXT, TINY_UNET, TINY_VAE,
                                    AutoencoderKL, UNet2DCondition)
from flexdiffuse_tpu.models.unet import CrossAttention, pag_selected
from flexdiffuse_tpu.pipeline import FlexPipeline
from flexdiffuse_tpu.pipeline.guides import SimpleGuidance


# ---------------------------------------------------------------- layer sel
def test_pag_selected_patterns():
    assert pag_selected(('mid',), 'mid_attn')
    assert pag_selected(('down_1',), 'down_1_attn_0')
    assert pag_selected(('down_1',), 'down_1_attn_1')
    assert not pag_selected(('down_1',), 'down_0_attn_1')
    assert pag_selected(('up_2_attn_1',), 'up_2_attn_1')
    assert not pag_selected(('up_2_attn_1',), 'up_2_attn_0')
    assert not pag_selected(None, 'mid_attn')
    assert not pag_selected((), 'mid_attn')


# ------------------------------------------------- identity-attention where
def _identity_expected(params, x):
    """Identity self-attention == to_out(to_v(x)) (heads merge back to v)."""
    wv = params['params']['to_v']['kernel']
    wo = params['params']['to_out']['kernel']
    bo = params['params']['to_out']['bias']
    return np.asarray(x @ wv @ wo + bo)


def test_cross_attention_pag_identity_standard():
    k = jax.random.PRNGKey(0)
    attn = CrossAttention(query_dim=16, num_heads=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 16))
    params = attn.init(k, x, None)
    out = attn.apply(params, x, None, pag_mask=jnp.ones((2,)))
    np.testing.assert_allclose(np.asarray(out),
                               _identity_expected(params, np.asarray(x)),
                               atol=1e-5)
    # mask 0 = the plain attention output, bit-exact.
    base = attn.apply(params, x, None)
    masked = attn.apply(params, x, None, pag_mask=jnp.zeros((2,)))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(masked))


def test_cross_attention_pag_identity_channel_major():
    k = jax.random.PRNGKey(0)
    attn = CrossAttention(query_dim=16, num_heads=2, channel_major=True)
    b, s, d = 2, 12, 16
    x_std = jax.random.normal(jax.random.PRNGKey(1), (b, s, d))
    # [B, S, C] → channel-major [C, B·S] (b-major minor flattening).
    x_cm = x_std.transpose(2, 0, 1).reshape(d, b * s)
    params = attn.init(k, x_cm, None, batch=b)
    out = attn.apply(params, x_cm, None, batch=b,
                     pag_mask=jnp.asarray([0.0, 1.0]))
    out_std = np.asarray(out).reshape(d, b, s).transpose(1, 2, 0)
    expected = _identity_expected(params, np.asarray(x_std))
    base = attn.apply(params, x_cm, None, batch=b)
    base_std = np.asarray(base).reshape(d, b, s).transpose(1, 2, 0)
    # Row 0 unperturbed, row 1 identity.
    np.testing.assert_array_equal(out_std[0], base_std[0])
    np.testing.assert_allclose(out_std[1], expected[1], atol=1e-5)


def test_cross_attention_pag_ignores_cross_attn():
    """pag_mask must only bite self-attention (context None)."""
    k = jax.random.PRNGKey(0)
    attn = CrossAttention(query_dim=16, num_heads=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 16))
    params = attn.init(k, x, ctx)
    base = attn.apply(params, x, ctx)
    masked = attn.apply(params, x, ctx, pag_mask=jnp.ones((2,)))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(masked))


# ------------------------------------------------------------- UNet masking
def _tiny_unet_io(batch):
    lat = jax.random.normal(jax.random.PRNGKey(7), (batch, 8, 8, 4))
    t = jnp.full((batch,), 500.0)
    ctx = jax.random.normal(jax.random.PRNGKey(8),
                            (batch, 77, TINY_TEXT.hidden_size))
    return lat, t, ctx


def test_unet_pag_mask_zero_matches_baseline():
    lat, t, ctx = _tiny_unet_io(2)
    params = UNet2DCondition(TINY_UNET).init(jax.random.PRNGKey(0), lat, t,
                                             ctx)
    base = UNet2DCondition(TINY_UNET).apply(params, lat, t, ctx)
    pag = UNet2DCondition(TINY_UNET, pag_layers=('mid', 'down_0')).apply(
        params, lat, t, ctx, pag_mask=jnp.zeros((2,)))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(pag))
    # No mask given at all → also the baseline program.
    none = UNet2DCondition(TINY_UNET, pag_layers=('mid',)).apply(
        params, lat, t, ctx)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(none))


def test_unet_pag_mask_perturbs_only_masked_rows():
    lat, t, ctx = _tiny_unet_io(2)
    params = UNet2DCondition(TINY_UNET).init(jax.random.PRNGKey(0), lat, t,
                                             ctx)
    base = np.asarray(UNet2DCondition(TINY_UNET).apply(params, lat, t, ctx))
    out = np.asarray(
        UNet2DCondition(TINY_UNET, pag_layers=('down_0',)).apply(
            params, lat, t, ctx, pag_mask=jnp.asarray([0.0, 1.0])))
    np.testing.assert_array_equal(out[0], base[0])
    assert np.abs(out[1] - base[1]).max() > 1e-6
    assert np.isfinite(out).all()


# --------------------------------------------------------- guidance formula
def _fake_noise_fn(lat, t, ctx, added=None, ip=None, tcond=None,
                   pag_mask=None):
    """Row value = mean(ctx) + 10·pag_mask — distinguishes every row kind."""
    val = jnp.mean(ctx, axis=(1, 2))
    if pag_mask is not None:
        val = val + 10.0 * pag_mask
    return jnp.broadcast_to(val[:, None, None, None],
                            lat.shape[:1] + (8, 8, 4))


def test_simple_guidance_pag_formula_with_cfg():
    emb = jnp.full((1, 77, 16), 3.0)
    unc = jnp.full((1, 77, 16), 1.0)
    g = SimpleGuidance(embeddings=emb, uncond=unc,
                       guidance_scale=jnp.float32(8.0), cfg=True,
                       pag=True, pag_scale=jnp.float32(2.0))
    lat = jnp.zeros((1, 8, 8, 4))
    out = np.asarray(g.noise_pred(_fake_noise_fn, lat, jnp.float32(500)))
    # eps_u=1, eps_c=3, eps_p=3+10=13 → 1 + 8·(3−1) + 2·(3−13) = −3.
    np.testing.assert_allclose(out, -3.0, atol=1e-5)


def test_simple_guidance_pag_formula_without_cfg():
    emb = jnp.full((1, 77, 16), 3.0)
    g = SimpleGuidance(embeddings=emb, uncond=jnp.zeros_like(emb),
                       guidance_scale=jnp.float32(1.0), cfg=False,
                       pag=True, pag_scale=jnp.float32(0.5))
    lat = jnp.zeros((1, 8, 8, 4))
    out = np.asarray(g.noise_pred(_fake_noise_fn, lat, jnp.float32(500)))
    # eps_c=3, eps_p=13 → 3 + 0.5·(3−13) = −2.
    np.testing.assert_allclose(out, -2.0, atol=1e-5)


def test_simple_guidance_pag_scale_zero_matches_plain_cfg():
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(2, 77, 16)).astype(np.float32))
    unc = jnp.asarray(rng.normal(size=(1, 77, 16)).astype(np.float32))
    lat = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    plain = SimpleGuidance(embeddings=emb, uncond=unc,
                           guidance_scale=jnp.float32(8.0), cfg=True)
    pag0 = plain.replace(pag=True, pag_scale=jnp.float32(0.0))
    a = np.asarray(plain.noise_pred(_fake_noise_fn, lat, jnp.float32(1)))
    b = np.asarray(pag0.noise_pred(_fake_noise_fn, lat, jnp.float32(1)))
    np.testing.assert_array_equal(a, b)


# ------------------------------------------------------------ pipeline e2e
def _tiny_pipe(**kw):
    k = jax.random.PRNGKey(0)
    unet = UNet2DCondition(TINY_UNET, **kw)
    up = UNet2DCondition(TINY_UNET).init(
        k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 77, TINY_TEXT.hidden_size)))
    vae = AutoencoderKL(TINY_VAE)
    vp = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
    return FlexPipeline(unet, up, vae, vp, scheduler='pndm')


def _tiny_guidance(**kw):
    rng = np.random.default_rng(3)
    emb = jnp.asarray(
        rng.normal(size=(1, 77, TINY_TEXT.hidden_size)).astype(np.float32))
    unc = jnp.asarray(
        rng.normal(size=(1, 77, TINY_TEXT.hidden_size)).astype(np.float32))
    return SimpleGuidance(embeddings=emb, uncond=unc,
                          guidance_scale=jnp.float32(7.0), cfg=True, **kw)


def test_pipeline_pag_e2e_runs_and_differs():
    pipe = _tiny_pipe(pag_layers=('mid',))
    g = _tiny_guidance(pag=True, pag_scale=jnp.float32(3.0))
    out = pipe(g, steps=3, init_size=(16, 16), key=jax.random.PRNGKey(5),
               output_type='latent')
    lat = np.asarray(out.images)
    assert lat.shape == (1, 8, 8, 4) and np.isfinite(lat).all()
    base = _tiny_pipe()(_tiny_guidance(), steps=3, init_size=(16, 16),
                        key=jax.random.PRNGKey(5), output_type='latent')
    assert np.abs(lat - np.asarray(base.images)).max() > 1e-6


def test_pipeline_pag_composes_with_deepcache():
    pipe = _tiny_pipe(pag_layers=('down_0',))
    # deepcache needs cache_depth < levels; TINY_UNET has 2 levels → 1 ok.
    pipe_dc = FlexPipeline(pipe.unet, pipe.unet_params, pipe.vae,
                           pipe.vae_params, scheduler='pndm', deepcache=2)
    g = _tiny_guidance(pag=True, pag_scale=jnp.float32(2.0))
    out = pipe_dc(g, steps=4, init_size=(16, 16),
                  key=jax.random.PRNGKey(5), output_type='latent')
    assert np.isfinite(np.asarray(out.images)).all()


def test_pipeline_pag_requires_pag_layers():
    pipe = _tiny_pipe()   # no pag_layers on the UNet
    g = _tiny_guidance(pag=True, pag_scale=jnp.float32(2.0))
    with pytest.raises(ValueError, match='pag_layers'):
        pipe(g, steps=2, init_size=(16, 16), key=jax.random.PRNGKey(0))


def test_pipeline_pag_rejects_deepcache_plus_interval():
    pipe = _tiny_pipe(pag_layers=('mid',))
    pipe_dc = FlexPipeline(pipe.unet, pipe.unet_params, pipe.vae,
                           pipe.vae_params, scheduler='pndm', deepcache=2)
    g = _tiny_guidance(pag=True, pag_scale=jnp.float32(2.0),
                       cfg_interval=True, cfg_from=jnp.float32(0.0),
                       cfg_to=jnp.float32(0.5))
    with pytest.raises(ValueError, match='PAG composes'):
        pipe_dc(g, steps=4, init_size=(16, 16), key=jax.random.PRNGKey(0))


def test_pipeline_pag_composes_with_cfg_interval():
    pipe = _tiny_pipe(pag_layers=('mid',))
    g = _tiny_guidance(pag=True, pag_scale=jnp.float32(2.0),
                       cfg_interval=True, cfg_from=jnp.float32(0.0),
                       cfg_to=jnp.float32(0.5))
    out = pipe(g, steps=4, init_size=(16, 16), key=jax.random.PRNGKey(5),
               output_type='latent')
    assert np.isfinite(np.asarray(out.images)).all()


# ------------------------------------------------------------ runner surface
def test_runner_pag_round_trip(tmp_path):
    from flexdiffuse_tpu.config import RunConfig
    from flexdiffuse_tpu.models import (TINY_VISION, CLIPTextModel,
                                        CLIPVisionModel)
    from flexdiffuse_tpu.runner import Runner
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
    # pag_scale on gen auto-enables the published ('mid',) layer set.
    on, _ = runner.gen(prompt='a cat', steps=2, init_size=(32, 32),
                       samples=1, seed=9, save=False, pag_scale=3.0)
    assert runner.pipe.unet.pag_layers == ('mid',)
    assert np.abs(np.asarray(base[0], np.int16) -
                  np.asarray(on[0], np.int16)).max() > 0
    runner.disable_pag()
    assert runner.pipe.unet.pag_layers is None
    off, _ = runner.gen(prompt='a cat', steps=2, init_size=(32, 32),
                        samples=1, seed=9, save=False)
    np.testing.assert_array_equal(np.asarray(base[0]), np.asarray(off[0]))
