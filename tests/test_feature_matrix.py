"""Feature-interaction matrix (VERDICT r4 #7).

Every ALLOWED combination of the acceleration/quality features
(DeepCache, CFG-interval, PAG, ToMe, highres fix, SP) runs the product
path end-to-end and must produce finite output; every FORBIDDEN
combination must raise its documented error. The authoritative table
lives in docs/STATUS.md §feature-interaction-matrix — keep both in sync.

Rules implemented in pipeline/flex.py / parallel/sp.py:
* PAG + (DeepCache AND CFG-interval) — forbidden (3-row stack breaks the
  half-batch cache layout), pipeline/flex.py:582-591.
* CompositeGuidance + DeepCache + CFG-interval — forbidden (stack rows
  interleave per batch item), pipeline/flex.py:569-576.
* ToMe + SP — forbidden (global top-r gather vs row-sharded sequence),
  pipeline/flex.py:143-148.
* Everything else composes (ToMe is UNet-local; hires fix is two plain
  pipeline passes, so per-pass rules apply unchanged).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdiffuse_tpu.models import (TINY_UNET, TINY_VAE, AutoencoderKL,
                                    UNet2DCondition)
from flexdiffuse_tpu.pipeline import FlexPipeline
from flexdiffuse_tpu.pipeline.guides import SimpleGuidance

CTX = TINY_UNET.cross_attention_dim


@pytest.fixture(scope='module')
def parts():
    k = jax.random.PRNGKey(0)
    unet = UNet2DCondition(TINY_UNET)
    up = unet.init(k, jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,)),
                   jnp.zeros((1, 77, CTX)))
    vae = AutoencoderKL(TINY_VAE)
    vp = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(1, 77, CTX)).astype(np.float32))
    unc = jnp.asarray(rng.normal(size=(1, 77, CTX)).astype(np.float32))
    return unet, up, vae, vp, emb, unc


def _pipe(parts, pipe_kw=None, unet_kw=None):
    unet, up, vae, vp, _, _ = parts
    if unet_kw:
        unet = unet.clone(**unet_kw)
    return FlexPipeline(unet, up, vae, vp, scheduler='pndm',
                        **(pipe_kw or {}))


def _guide(parts, **kw):
    _, _, _, _, emb, unc = parts
    g = SimpleGuidance(embeddings=emb, uncond=unc,
                       guidance_scale=jnp.float32(8.0), cfg=True)
    return g.replace(**kw) if kw else g


INTERVAL = dict(cfg_interval=True, cfg_from=jnp.float32(0.0),
                cfg_to=jnp.float32(0.6))
PAG = dict(pag=True, pag_scale=jnp.float32(3.0))
# ToMe engages only on ≥256-token grids (resolve_r multiple-of-128 rule):
# run at 128×128 images → 16×16 latents → 256 tokens with min_seq 256.
TOME = dict(tome=(0.5, 256))
PAGL = dict(pag_layers=('mid',))

ALLOWED = {
    'deepcache2_tome': (dict(deepcache=2), TOME, {}),
    'deepcache3_interval': (dict(deepcache=3), {}, INTERVAL),
    'pag_deepcache2': (dict(deepcache=2), PAGL, PAG),
    'pag_interval': ({}, PAGL, {**PAG, **INTERVAL}),
    'pag_tome': ({}, {**PAGL, **TOME}, PAG),
    'deepcache3_interval_tome': (dict(deepcache=3), TOME, INTERVAL),
    'pag_deepcache2_tome': (dict(deepcache=2), {**PAGL, **TOME}, PAG),
}


@pytest.mark.parametrize('name', sorted(ALLOWED))
def test_allowed_combo_runs(parts, name):
    pipe_kw, unet_kw, guide_kw = ALLOWED[name]
    pipe = _pipe(parts, pipe_kw, unet_kw)
    out = pipe(_guide(parts, **guide_kw), steps=4, init_size=(128, 128),
               key=jax.random.PRNGKey(3), output_type='latent')
    lat = np.asarray(out.images)
    assert np.isfinite(lat).all(), name
    assert np.abs(lat).max() > 0, name


def test_forbidden_pag_deepcache_interval(parts):
    pipe = _pipe(parts, dict(deepcache=2), PAGL)
    with pytest.raises(ValueError, match='not both at once'):
        pipe(_guide(parts, **PAG, **INTERVAL), steps=4,
             init_size=(128, 128), output_type='latent')


def test_forbidden_composite_deepcache_interval(parts):
    from flexdiffuse_tpu.pipeline.guides import (CompositeGuidance,
                                                 entity_masks)
    unet, up, vae, vp, emb, unc = parts
    pipe = _pipe(parts, dict(deepcache=2))
    g = CompositeGuidance(
        background=emb, entities=emb, masks=entity_masks(
            [((0, 0), (4, 4))], (16, 16)),
        blends=jnp.ones((1,)), uncond=unc,
        guidance_scale=jnp.float32(8.0), **INTERVAL)
    with pytest.raises(ValueError, match='composes with deepcache only'):
        pipe(g, steps=4, init_size=(128, 128), output_type='latent')


def test_forbidden_tome_sp(parts):
    from flexdiffuse_tpu.parallel import make_sp_mesh
    unet, up, vae, vp, _, _ = parts
    with pytest.raises(ValueError, match='sequence parallelism'):
        FlexPipeline(unet.clone(**TOME), up, vae, vp, scheduler='pndm',
                     sp_mesh=make_sp_mesh())


def test_hires_deepcache_tome_stack(tmp_path):
    """The plausible user stack VERDICT r4 names: hires fix + DeepCache +
    ToMe through the Runner (two pipeline passes, both accelerated)."""
    from flexdiffuse_tpu.config import RunConfig
    from flexdiffuse_tpu.models import (TINY_TEXT, TINY_VISION,
                                        CLIPTextModel, CLIPVisionModel)
    from flexdiffuse_tpu.runner import Runner
    from tests.test_tokenizer_and_runner import FakeTokenizer
    k = jax.random.PRNGKey(0)
    text = CLIPTextModel(TINY_TEXT)
    tp = text.init(k, jnp.zeros((1, 77), jnp.int32))
    vision = CLIPVisionModel(TINY_VISION)
    vip = vision.init(k, jnp.zeros((1, 32, 32, 3)))
    unet = UNet2DCondition(TINY_UNET)
    up = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                   jnp.zeros((1, 77, TINY_TEXT.hidden_size)))
    vae = AutoencoderKL(TINY_VAE)
    vp = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
    r = Runner.from_models(text, tp, vision, vip, unet, up, vae, vp,
                           FakeTokenizer(),
                           config=RunConfig(output_dir=str(tmp_path)))
    r.enable_deepcache(2)
    r.enable_tome(0.5, 256)
    # Base pass 128² (256 tokens — ToMe engages), hires pass 256².
    imgs, _ = r.gen(prompt='a deer', steps=3, init_size=(128, 128),
                    samples=1, seed=9, save=False, hires_scale=2.0,
                    hires_strength=0.6)
    assert imgs[0].size == (256, 256)
