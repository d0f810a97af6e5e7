"""Sequence-parallel generation: ≥1024² end-to-end on the 8-device virtual
mesh, exact vs the single-device pipeline (VERDICT r1 #3).

Model geometry is sized so 1024² pixels → 64×64 latents → 4096-token level-0
self-attention: large enough to engage ring attention (sp_min_seq default)
while staying CPU-fast. The SP pipeline shards latent rows over all 8
devices; convs/norms partition via GSPMD, the 4096-token attentions ride the
ring (512 tokens resident per device).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdiffuse_tpu.models import UNet2DCondition, AutoencoderKL
from flexdiffuse_tpu.models.configs import UNetConfig, VAEConfig
from flexdiffuse_tpu.parallel import make_sp_mesh, sp_pipeline
from flexdiffuse_tpu.pipeline import FlexPipeline, SimpleGuidance

# 5-level VAE → vae_scale 16 → 1024² px = 64² latents; level-0 attention at
# 4096 tokens with 1 head.
SP_VAE = VAEConfig(block_channels=(8, 8, 8, 8, 8), layers_per_block=1,
                   norm_groups=4)
SP_UNET = UNetConfig(block_channels=(16, 32), layers_per_block=1,
                     attention_levels=(True, False), num_heads=1,
                     cross_attention_dim=16, norm_groups=4)
T = 77


@pytest.fixture(scope='module')
def models():
    unet = UNet2DCondition(SP_UNET)
    vae = AutoencoderKL(SP_VAE)
    k = jax.random.PRNGKey(0)
    up = unet.init(k, jnp.zeros((1, 64, 64, 4)), jnp.zeros((1,)),
                   jnp.zeros((1, T, SP_UNET.cross_attention_dim)))
    vp = vae.init(k, jnp.zeros((1, 32, 32, 3)), k)
    return unet, up, vae, vp


def _guide(seed=0, scale=7.0):
    rng = np.random.default_rng(seed)
    d = SP_UNET.cross_attention_dim
    return SimpleGuidance(
        embeddings=jnp.asarray(rng.normal(size=(1, T, d)).astype(np.float32)),
        uncond=jnp.asarray(rng.normal(size=(1, T, d)).astype(np.float32)),
        guidance_scale=jnp.float32(scale), cfg=True)


def test_sp_1024_end_to_end_exact_vs_single_device(models):
    unet, up, vae, vp = models
    assert len(jax.devices()) == 8
    mesh = make_sp_mesh()

    ref_pipe = FlexPipeline(unet, up, vae, vp, scheduler='ddim')
    sp_pipe = sp_pipeline(unet, up, vae, vp, mesh=mesh, scheduler='ddim')

    kwargs = dict(steps=2, init_size=(1024, 1024), output_type='np',
                  key=jax.random.PRNGKey(7))
    ref = ref_pipe(_guide(), **kwargs).images
    got = sp_pipe(_guide(), **kwargs).images

    assert got.shape == (1, 1024, 1024, 3)
    assert np.isfinite(got).all()
    # Ring attention reorders the softmax accumulation; everything else is
    # the same fp32 math → tight tolerance.
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_sp_attention_actually_rides_the_ring(models):
    """The SP pipeline's level-0 self-attention must hit ring_attention —
    guard against the dispatcher silently falling back."""
    from flexdiffuse_tpu.ops import attention as A
    import flexdiffuse_tpu.ops.ring_attention as R

    calls = []
    orig = R.ring_attention

    def spy(q, k, v, mesh, axis, scale=None):
        calls.append((q.shape, axis))
        return orig(q, k, v, mesh, axis, scale)

    R.ring_attention = spy
    try:
        mesh = make_sp_mesh()
        unet, up, vae, vp = models
        pipe = sp_pipeline(unet, up, vae, vp, mesh=mesh, scheduler='ddim')
        pipe(_guide(seed=1), steps=1, init_size=(1024, 1024),
             output_type='np', key=jax.random.PRNGKey(3))
    finally:
        R.ring_attention = orig
    assert calls, 'ring attention was never engaged'
    shapes = {c[0] for c in calls}
    assert any(s[-2] == 4096 for s in shapes), shapes
    assert all(c[1] == 'seq' for c in calls)


def test_sp_img2img_matches_single_device(models):
    unet, up, vae, vp = models
    mesh = make_sp_mesh()
    ref_pipe = FlexPipeline(unet, up, vae, vp, scheduler='ddim')
    sp_pipe = sp_pipeline(unet, up, vae, vp, mesh=mesh, scheduler='ddim')
    rng = np.random.default_rng(5)
    init = rng.uniform(-1, 1, size=(1, 1024, 1024, 3)).astype(np.float32)
    kwargs = dict(steps=3, strength=0.7, output_type='np',
                  key=jax.random.PRNGKey(11))
    ref = ref_pipe(_guide(2), init_image=init, **kwargs).images
    got = sp_pipe(_guide(2), init_image=init, **kwargs).images
    np.testing.assert_allclose(got, ref, atol=2e-4)
