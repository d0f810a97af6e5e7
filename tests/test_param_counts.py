"""Full-size geometry gates: param counts must match the real checkpoints.

Without weights on disk, the strongest guard that our full-size models will
accept converted SD-1.4 / CLIP ViT-L/14 checkpoints is exact parameter-count
parity: the SD-1.x UNet/VAE counts are pinned constants of the diffusers
architecture; the CLIP towers are compared against a torch CLIPModel built
at ViT-L/14 geometry (offline, random init — only shapes matter).
"""
import jax
import jax.numpy as jnp
import pytest

from flexdiffuse_tpu.models import (AutoencoderKL, CLIPTextModel,
                                    CLIPVisionModel, SD14_UNET, SD14_VAE,
                                    UNet2DCondition)
from flexdiffuse_tpu.models.configs import (CLIP_VIT_L14_TEXT,
                                            CLIP_VIT_L14_VISION)

# Pinned public constants of the SD-1.x architecture.
SD1X_UNET_PARAMS = 859_520_964
SD1X_VAE_PARAMS = 83_653_863


def _count(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def test_unet_param_count_matches_sd1x():
    unet = UNet2DCondition(SD14_UNET)
    shapes = jax.eval_shape(
        lambda: unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 4)),
                          jnp.zeros((1,)), jnp.zeros((1, 77, 768))))
    assert _count(shapes) == SD1X_UNET_PARAMS


def test_vae_param_count_matches_sd1x():
    vae = AutoencoderKL(SD14_VAE)
    shapes = jax.eval_shape(
        lambda: vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                         jax.random.PRNGKey(0)))
    assert _count(shapes) == SD1X_VAE_PARAMS


@pytest.mark.parametrize('tower', ['text', 'vision'])
def test_clip_param_counts_match_hf(tower):
    transformers = pytest.importorskip('transformers')
    torch = pytest.importorskip('torch')
    cfg = transformers.CLIPConfig(
        text_config=dict(vocab_size=49408, hidden_size=768,
                         intermediate_size=3072, num_hidden_layers=12,
                         num_attention_heads=12,
                         max_position_embeddings=77),
        vision_config=dict(hidden_size=1024, intermediate_size=4096,
                           num_hidden_layers=24, num_attention_heads=16,
                           image_size=224, patch_size=14),
        projection_dim=768)
    with torch.device('meta'):  # shapes only, no 1.7GB allocation
        hf = transformers.CLIPModel(cfg)
    if tower == 'text':
        want = sum(p.numel() for p in hf.text_model.parameters())
        model = CLIPTextModel(CLIP_VIT_L14_TEXT)
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 77), jnp.int32)))
    else:
        want = (sum(p.numel() for p in hf.vision_model.parameters()) +
                sum(p.numel() for p in hf.visual_projection.parameters()))
        model = CLIPVisionModel(CLIP_VIT_L14_VISION)
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 224, 224, 3))))
    assert _count(shapes) == want
