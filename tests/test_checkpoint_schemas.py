"""Converters vs. real checkpoint key schemas (VERDICT r2 task 2).

Round 1's advisor found a converter bug class (2-D ``proj_in`` tensors
crashing ``_conv``) that only a *real* checkpoint's key schema would reveal —
the previous tests roundtripped flax-initialized trees, which by construction
agree with the converter's assumptions. These tests close that hole offline:
``tests/checkpoint_manifests.py`` pins the exact key-name+shape schemas of
the public artifacts the product loads (SD-1.4 UNet/VAE per
``/root/reference/utils.py:61-66``, CLIP ViT-L/14, SD-2.1, SDXL-base,
SD-1.5 ControlNet, IP-Adapter), synthetic state dicts are generated from
them, and every converter must (a) consume every parameter key — nothing
silently ignored, (b) produce exactly the model's init-time param tree.
The manifest generators themselves are cross-checked against the models'
public param counts and, for CLIP, against the installed ``transformers``
module structure.
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flexdiffuse_tpu.models import configs
from flexdiffuse_tpu.weights import convert

from tests import checkpoint_manifests as man


class TrackingSD(dict):
    """State dict recording which keys the converter actually read."""

    def __init__(self, manifest, dtype=np.float16):
        super().__init__({
            k: np.zeros(shape, dtype)
            for k, shape in manifest.items()
        })
        self.read = set()

    def __getitem__(self, key):
        self.read.add(key)
        return super().__getitem__(key)

    def unread(self):
        return set(self.keys()) - self.read


def _tree_shapes(tree, prefix=()):
    """Flatten a pytree-of-dicts to {path: shape}."""
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_shapes(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(v.shape)
    return out


def _assert_matches_init(converted, module, *init_args, **init_kwargs):
    init = lambda k, *a: module.init(k, *a, **init_kwargs)
    shapes = jax.eval_shape(init, jax.random.PRNGKey(0), *init_args)
    want = _tree_shapes(shapes['params'])
    got = _tree_shapes(converted)
    missing = set(want) - set(got)
    extra = set(got) - set(want)
    assert not missing, f'converter missing params: {sorted(missing)[:10]}'
    assert not extra, f'converter produced extra params: {sorted(extra)[:10]}'
    bad = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not bad, f'shape mismatches: {dict(list(bad.items())[:10])}'


IGNORABLE = ('position_ids',)  # non-parameter buffers in old checkpoints


def _assert_fully_consumed(sd: TrackingSD, allowed_unread=()):
    unread = sd.unread()
    unread = {
        k
        for k in unread
        if not k.endswith(IGNORABLE) and k not in allowed_unread
    }
    assert not unread, f'converter ignored checkpoint keys: {sorted(unread)[:10]}'


# ---------------------------------------------------------------------------
# Manifest generator self-checks


@pytest.mark.parametrize('name, build', [
    ('sd14_unet', man.sd14_unet_manifest),
    ('sd14_vae', man.sd14_vae_manifest),
    ('clip_vit_l14', man.clip_vit_l14_manifest),
    ('sdxl_unet', man.sdxl_unet_manifest),
])
def test_manifest_param_counts(name, build):
    """The generators reproduce the public param counts exactly — evidence
    the schemas (not just our reading of them) are right."""
    assert man.param_count(build()) == man.PARAM_COUNTS[name]


def test_clip_manifest_matches_transformers():
    """Cross-validate the CLIP manifest against the installed transformers
    ``CLIPModel`` module structure (meta device: zero memory)."""
    torch = pytest.importorskip('torch')
    from transformers import CLIPConfig, CLIPModel
    cfg = CLIPConfig(
        text_config={
            'hidden_size': 768, 'num_hidden_layers': 12,
            'num_attention_heads': 12, 'intermediate_size': 3072,
            'vocab_size': 49408, 'max_position_embeddings': 77,
        },
        vision_config={
            'hidden_size': 1024, 'num_hidden_layers': 24,
            'num_attention_heads': 16, 'intermediate_size': 4096,
            'image_size': 224, 'patch_size': 14,
        },
        projection_dim=768,
    )
    with torch.device('meta'):
        model = CLIPModel(cfg)
    got = {k: tuple(v.shape) for k, v in model.state_dict().items()}
    want = man.clip_vit_l14_manifest()
    strip = lambda d: {
        k: v
        for k, v in d.items() if not k.endswith('position_ids')
    }
    assert strip(got) == strip(want)


# ---------------------------------------------------------------------------
# UNet family


def _unet_init_args(config, image=64):
    hw = image // 8
    lat = jnp.zeros((1, hw, hw, config.in_channels))
    t = jnp.zeros((1,))
    ctx = jnp.zeros((1, 77, config.cross_attention_dim))
    if config.addition_embed:
        added = {
            'text_embeds': jnp.zeros((1, config.addition_pooled_dim)),
            'time_ids': jnp.zeros((1, config.num_time_ids)),
        }
        return lat, t, ctx, added
    return lat, t, ctx


@pytest.mark.parametrize('manifest, config', [
    (man.sd14_unet_manifest, configs.SD14_UNET),
    (man.sd21_unet_manifest, configs.SD21_UNET),
    (man.sdxl_unet_manifest, configs.SDXL_UNET),
    (man.sdxl_refiner_unet_manifest, configs.SDXL_REFINER_UNET),
])
def test_unet_schema(manifest, config):
    from flexdiffuse_tpu.models import UNet2DCondition
    sd = TrackingSD(manifest())
    params = convert.convert_unet(sd, config)
    _assert_fully_consumed(sd)
    _assert_matches_init(params, UNet2DCondition(config),
                         *_unet_init_args(config))


@pytest.mark.parametrize('modern_attn', [False, True])
def test_vae_schema(modern_attn):
    from flexdiffuse_tpu.models import AutoencoderKL
    sd = TrackingSD(man.vae_manifest(modern_attn=modern_attn))
    params = convert.convert_vae(sd, configs.SD14_VAE)
    _assert_fully_consumed(sd)
    vae = AutoencoderKL(configs.SD14_VAE)
    shapes = jax.eval_shape(
        lambda k: vae.init(k, jnp.zeros((1, 32, 32, 3)),
                           jax.random.PRNGKey(1)), jax.random.PRNGKey(0))
    want = _tree_shapes(shapes['params'])
    got = _tree_shapes(params)
    assert set(got) == set(want)
    assert all(got[k] == want[k] for k in want)


# ---------------------------------------------------------------------------
# CLIP family


def test_clip_text_schema_vit_l14():
    """Text converter over the *full* CLIPModel dict (how load_clip calls it):
    consumes the whole text tower, ignores only the vision tower +
    projections + logit_scale."""
    from flexdiffuse_tpu.models import CLIPTextModel
    full = man.clip_vit_l14_manifest()
    sd = TrackingSD(full)
    params = convert.convert_clip_text(sd, configs.CLIP_VIT_L14_TEXT)
    vision_side = {
        k
        for k in full
        if k.startswith('vision_model.') or k in ('visual_projection.weight',
                                                  'logit_scale',
                                                  'text_projection.weight')
    }
    _assert_fully_consumed(sd, allowed_unread=vision_side)
    _assert_matches_init(params, CLIPTextModel(configs.CLIP_VIT_L14_TEXT),
                         jnp.zeros((1, 77), jnp.int32))


def test_clip_vision_schema_vit_l14():
    from flexdiffuse_tpu.models import CLIPVisionModel
    full = man.clip_vit_l14_manifest()
    sd = TrackingSD(full)
    params = convert.convert_clip_vision(sd, configs.CLIP_VIT_L14_VISION)
    text_side = {
        k
        for k in full
        if k.startswith('text_model.') or k in ('text_projection.weight',
                                                'logit_scale')
    }
    _assert_fully_consumed(sd, allowed_unread=text_side)
    _assert_matches_init(params, CLIPVisionModel(configs.CLIP_VIT_L14_VISION),
                         jnp.zeros((1, 224, 224, 3)))


def test_clip_model_fully_covered():
    """Every parameter tensor in the ViT-L/14 file is consumed by exactly
    one of the two converters (no tensor falls through the cracks)."""
    full = man.clip_vit_l14_manifest()
    sd_t = TrackingSD(full)
    convert.convert_clip_text(sd_t, configs.CLIP_VIT_L14_TEXT)
    sd_v = TrackingSD(full)
    convert.convert_clip_vision(sd_v, configs.CLIP_VIT_L14_VISION)
    leftover = {
        k
        for k in full if k not in sd_t.read and k not in sd_v.read
        and not k.endswith('position_ids')
    }
    # text_projection is unused by SD-1.x by design (the pipeline consumes
    # last hidden states, not pooled embeddings — reference encode/clip.py
    # uses text_model outputs directly); logit_scale is contrastive-training
    # state.
    assert leftover == {'text_projection.weight', 'logit_scale'}


@pytest.mark.parametrize('manifest, config', [
    (man.sd21_text_encoder_manifest, configs.OPENCLIP_H_TEXT),
    (man.sdxl_text_encoder_2_manifest, configs.OPENCLIP_BIGG_TEXT),
])
def test_text_encoder_schema(manifest, config):
    from flexdiffuse_tpu.models import CLIPTextModel
    sd = TrackingSD(manifest())
    params = convert.convert_clip_text(sd, config)
    _assert_fully_consumed(sd)
    model = CLIPTextModel(config)
    ids = jnp.zeros((1, 77), jnp.int32)
    if config.projection_dim:
        # text_projection only materializes on the pooled call path (the
        # one SDXL uses) — init through it so the tree carries the param.
        _assert_matches_init(params, model, ids,
                             output='penultimate_and_pooled')
    else:
        _assert_matches_init(params, model, ids)


# ---------------------------------------------------------------------------
# ControlNet


def test_controlnet_schema():
    from flexdiffuse_tpu.models.controlnet import ControlNetModel
    sd = TrackingSD(man.controlnet_sd15_manifest())
    params = convert.convert_controlnet(sd, configs.SD14_UNET)
    _assert_fully_consumed(sd)
    model = ControlNetModel(configs.SD14_UNET)
    hw = 4
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, hw, hw, 4)), jnp.zeros((1,)),
                            jnp.zeros((1, 77, 768)),
                            jnp.zeros((1, hw * 8, hw * 8, 3)))
    want = _tree_shapes(shapes['params'])
    got = _tree_shapes(params)
    assert set(got) == set(want), (sorted(set(want) - set(got))[:5],
                                   sorted(set(got) - set(want))[:5])
    assert all(got[k] == want[k] for k in want)


# ---------------------------------------------------------------------------
# IP-Adapter


def test_ip_adapter_schema():
    from flexdiffuse_tpu.models.ip_adapter import (ImageProjection,
                                                   attn2_layer_order,
                                                   convert_ip_adapter)
    manifest = man.ip_adapter_sd15_manifest()
    sd = TrackingSD(manifest)
    proj_params, layer_map = convert_ip_adapter(sd, configs.SD14_UNET)
    # The per-layer weights are consumed via items() iteration (invisible to
    # the tracker): full consumption = every manifest ip_adapter.* tensor
    # surfaces in the layer map.
    n_ip = sum(k.startswith('ip_adapter.') for k in manifest)
    assert sum(len(v) for v in layer_map.values()) == n_ip
    _assert_fully_consumed(
        sd, allowed_unread={k for k in manifest if k.startswith('ip_adapter.')})

    proj = ImageProjection(context_dim=768, num_tokens=4)
    shapes = jax.eval_shape(proj.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 1024)))
    assert _tree_shapes(proj_params) == _tree_shapes(shapes['params'])

    order = attn2_layer_order(configs.SD14_UNET)
    assert list(layer_map) == order
    assert len(order) == 16
    # Checkpoint order is down (320,320,640,640,1280,1280), up (1280×3,
    # 640×3, 320×3), mid (1280); kernels arrive transposed to [in, out].
    chans = [320, 320, 640, 640, 1280, 1280, 1280, 1280, 1280, 640, 640,
             640, 320, 320, 320, 1280]
    for path, ch in zip(order, chans):
        leaves = layer_map[path]
        assert leaves['to_k_ip']['kernel'].shape == (768, ch), path
        assert leaves['to_v_ip']['kernel'].shape == (768, ch), path


def test_ip_adapter_dense_reindex():
    """Re-exports that renumber ip_adapter indices densely (0..15) must map
    onto the same layer order."""
    from flexdiffuse_tpu.models.ip_adapter import (attn2_layer_order,
                                                   convert_ip_adapter)
    base = man.ip_adapter_sd15_manifest()
    renum = {}
    for k, shape in base.items():
        if k.startswith('ip_adapter.'):
            _, idx, rest = k.split('.', 2)
            renum[f'ip_adapter.{(int(idx) - 1) // 2}.{rest}'] = shape
        else:
            renum[k] = shape
    sd = TrackingSD(renum)
    _, layer_map = convert_ip_adapter(sd, configs.SD14_UNET)
    assert list(layer_map) == attn2_layer_order(configs.SD14_UNET)
