"""Weight conversion parity: our Flax CLIP vs. HF torch CLIP (tiny, random).

This is the real numerics gate (SURVEY.md §7.2): build a tiny torch CLIPModel
with transformers (offline, random init), convert its state dict with our
converter, and require our Flax towers to reproduce its outputs within fp32
tolerance — including the reference's nonstandard all-patch vision path
(encode/clip.py:86-100).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip('torch')
transformers = pytest.importorskip('transformers')

from flexdiffuse_tpu.models import CLIPTextModel, CLIPVisionModel
from flexdiffuse_tpu.models.configs import CLIPTextConfig, CLIPVisionConfig
from flexdiffuse_tpu.weights import convert


@pytest.fixture(scope='module')
def hf_clip():
    cfg = transformers.CLIPConfig(
        text_config=dict(vocab_size=500, hidden_size=32,
                         intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=4, max_position_embeddings=77,
                         projection_dim=24),
        vision_config=dict(hidden_size=40, intermediate_size=80,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=32, patch_size=8, projection_dim=24),
        projection_dim=24)
    torch.manual_seed(0)
    model = transformers.CLIPModel(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return model, sd


def test_text_tower_parity(hf_clip):
    model, sd = hf_clip
    cfg = CLIPTextConfig(vocab_size=500, hidden_size=32, num_layers=2,
                         num_heads=4, max_positions=77, intermediate_size=64)
    params = {'params': convert.convert_clip_text(sd, cfg)}
    flax_model = CLIPTextModel(cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 500, size=(2, 77))
    with torch.no_grad():
        ref = model.text_model(
            torch.tensor(ids))[0].numpy()  # reference encode/clip.py:64-65
    got = np.asarray(flax_model.apply(params, jnp.asarray(ids)))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_clip_skip_penultimate_norm_parity(hf_clip):
    """clip_skip taps the penultimate hidden state and applies
    final_layer_norm (the diffusers/A1111 SD1.x convention)."""
    model, sd = hf_clip
    cfg = CLIPTextConfig(vocab_size=500, hidden_size=32, num_layers=2,
                         num_heads=4, max_positions=77, intermediate_size=64)
    params = {'params': convert.convert_clip_text(sd, cfg)}
    flax_model = CLIPTextModel(cfg)

    rng = np.random.default_rng(2)
    ids = rng.integers(0, 500, size=(1, 77))
    with torch.no_grad():
        out = model.text_model(torch.tensor(ids), output_hidden_states=True)
        ref = model.text_model.final_layer_norm(
            out.hidden_states[-2]).numpy()
    got = np.asarray(
        flax_model.apply(params, jnp.asarray(ids), output='penultimate_norm'))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)
    # And it differs from the raw un-normed tap (the SDXL path).
    raw = np.asarray(
        flax_model.apply(params, jnp.asarray(ids), output='penultimate'))
    assert not np.allclose(got, raw, atol=1e-3)


def test_linear_projection_conv_equivalence():
    """use_linear_projection checkpoints (SD2.x/SDXL) store transformer
    proj_in/proj_out as 2-D Linear tensors; the converter must emit the
    numerically identical 1×1 conv kernel (ADVICE r1, high)."""
    rng = np.random.default_rng(3)
    w = rng.normal(size=(12, 8)).astype(np.float32)   # Linear [out, in]
    b = rng.normal(size=(12,)).astype(np.float32)
    out = convert._conv({'p.weight': w, 'p.bias': b}, 'p')
    assert out['kernel'].shape == (1, 1, 8, 12)
    x = rng.normal(size=(2, 4, 4, 8)).astype(np.float32)
    got = np.einsum('bhwi,io->bhwo', x, out['kernel'][0, 0]) + out['bias']
    ref = x @ w.T + b
    np.testing.assert_allclose(got, ref, atol=1e-5)
    # 4-D conv weights still take the transpose path.
    w4 = rng.normal(size=(12, 8, 3, 3)).astype(np.float32)
    out4 = convert._conv({'p.weight': w4, 'p.bias': b}, 'p')
    assert out4['kernel'].shape == (3, 3, 8, 12)


def test_vision_tower_all_patch_parity(hf_clip):
    model, sd = hf_clip
    cfg = CLIPVisionConfig(hidden_size=40, num_layers=2, num_heads=4,
                           image_size=32, patch_size=8, intermediate_size=80,
                           projection_dim=24)
    params = {'params': convert.convert_clip_vision(sd, cfg)}
    flax_model = CLIPVisionModel(cfg)

    rng = np.random.default_rng(1)
    img = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        # Reproduce the reference's exact nonstandard path
        # (encode/clip.py:86-100): all-token post-LN + projection.
        hs = model.vision_model.embeddings(torch.tensor(img))
        hs = model.vision_model.pre_layrnorm(hs)
        enc = model.vision_model.encoder(inputs_embeds=hs)
        pooled = model.vision_model.post_layernorm(enc[0])
        ref = model.visual_projection(pooled).numpy()
    got = np.asarray(
        flax_model.apply(params, jnp.asarray(img.transpose(0, 2, 3, 1))))
    assert got.shape == ref.shape  # [1, 17, 24] = cls + 16 patches
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_unet_converter_roundtrip_shapes():
    """Synthesize a diffusers-named state dict from our own tiny UNet params
    (inverse mapping) and check the converter reproduces the exact tree."""
    from flexdiffuse_tpu.models import TINY_UNET, UNet2DCondition
    model = UNet2DCondition(TINY_UNET)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                        jnp.zeros((1,)), jnp.zeros((1, 77, 32)))['params']

    sd = {}

    def emit(prefix, tree):
        for k, v in tree.items():
            name = f'{prefix}.{k}' if prefix else k
            if isinstance(v, dict):
                emit(name, v)
            else:
                sd[name] = np.asarray(v)

    # Build torch-layout state dict by inverting our conversion rules.
    def torchify(tree, path=''):
        out = {}
        for k, v in tree.items():
            p = f'{path}/{k}' if path else k
            if isinstance(v, dict):
                if set(v) == {'kernel'} or set(v) == {'kernel', 'bias'}:
                    kern = np.asarray(v['kernel'])
                    if kern.ndim == 4:
                        out[k] = {'weight': kern.transpose(3, 2, 0, 1)}
                    else:
                        out[k] = {'weight': kern.T}
                    if 'bias' in v:
                        out[k]['bias'] = np.asarray(v['bias'])
                elif set(v) == {'scale', 'bias'}:
                    out[k] = {
                        'weight': np.asarray(v['scale']),
                        'bias': np.asarray(v['bias'])
                    }
                else:
                    out[k] = torchify(v, p)
            else:
                out[k] = np.asarray(v)
        return out

    t = torchify(params)

    # Map our flat names to diffusers names.
    def put(dst, src):
        node = t
        for part in src.split('/'):
            node = node[part]
        emit(dst, node) if isinstance(node, dict) else sd.update({dst: node})

    put('time_embedding.linear_1', 'time_embed_1')
    put('time_embedding.linear_2', 'time_embed_2')
    put('conv_in', 'conv_in')
    put('conv_norm_out', 'norm_out')
    put('conv_out', 'conv_out')
    cfg = TINY_UNET
    n = len(cfg.block_channels)

    def put_attn(dst, src):
        a = t
        for part in src.split('/'):
            a = a[part]
        emit(f'{dst}.norm', a['norm'])
        emit(f'{dst}.proj_in', a['proj_in'])
        emit(f'{dst}.proj_out', a['proj_out'])
        blk = a['blocks_0']
        for attn in ('attn1', 'attn2'):
            for proj in ('to_q', 'to_k', 'to_v'):
                emit(f'{dst}.transformer_blocks.0.{attn}.{proj}',
                     blk[attn][proj])
            emit(f'{dst}.transformer_blocks.0.{attn}.to_out.0',
                 blk[attn]['to_out'])
        for nrm in ('norm1', 'norm2', 'norm3'):
            emit(f'{dst}.transformer_blocks.0.{nrm}', blk[nrm])
        emit(f'{dst}.transformer_blocks.0.ff.net.0.proj',
             blk['ff']['proj_in'])
        emit(f'{dst}.transformer_blocks.0.ff.net.2', blk['ff']['proj_out'])

    for i in range(n):
        for j in range(cfg.layers_per_block):
            put(f'down_blocks.{i}.resnets.{j}', f'down_{i}_res_{j}')
            if cfg.attention_levels[i]:
                put_attn(f'down_blocks.{i}.attentions.{j}',
                         f'down_{i}_attn_{j}')
        if i != n - 1:
            put(f'down_blocks.{i}.downsamplers.0.conv',
                f'down_{i}_downsample/conv')
    put('mid_block.resnets.0', 'mid_res_0')
    put('mid_block.resnets.1', 'mid_res_1')
    put_attn('mid_block.attentions.0', 'mid_attn')
    for i in range(n):
        level = n - 1 - i
        for j in range(cfg.layers_per_block + 1):
            put(f'up_blocks.{i}.resnets.{j}', f'up_{i}_res_{j}')
            if cfg.attention_levels[level]:
                put_attn(f'up_blocks.{i}.attentions.{j}', f'up_{i}_attn_{j}')
        if i != n - 1:
            put(f'up_blocks.{i}.upsamplers.0.conv', f'up_{i}_upsample/conv')

    got = convert.convert_unet(sd, cfg)

    flat_got = jax.tree_util.tree_leaves_with_path(got)
    flat_ref = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(params))
    assert len(flat_got) == len(flat_ref)
    for k, v in flat_got:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(v, flat_ref[ks], atol=1e-6,
                                   err_msg=f'mismatch at {ks}')


@pytest.mark.parametrize('tower', ['text', 'vision'])
def test_full_vit_l14_geometry_parity(tower):
    """Round-2 VERDICT #5: the tiny-geometry parity above leaves layer-count/
    width-dependent bugs uncovered; run the converter + towers once at the
    REAL ViT-L/14 geometry (random weights, CPU — slow but one-shot).

    Builds only the requested tower at full size to bound memory/time.
    """
    from flexdiffuse_tpu.models.configs import (CLIP_VIT_L14_TEXT,
                                                CLIP_VIT_L14_VISION)
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    if tower == 'text':
        tcfg = transformers.CLIPTextConfig(
            vocab_size=49408, hidden_size=768, intermediate_size=3072,
            num_hidden_layers=12, num_attention_heads=12,
            max_position_embeddings=77, projection_dim=768)
        model = transformers.CLIPTextModel(tcfg).eval()
        sd = {f'text_model.{k}' if not k.startswith('text_model') else k: v
              .detach().numpy() for k, v in model.state_dict().items()}
        cfg = CLIP_VIT_L14_TEXT
        params = {'params': convert.convert_clip_text(sd, cfg)}
        flax_model = CLIPTextModel(cfg)
        ids = rng.integers(0, 49408, size=(1, 77))
        with torch.no_grad():
            ref = model.text_model(torch.tensor(ids))[0].numpy()
        got = np.asarray(flax_model.apply(params, jnp.asarray(ids)))
    else:
        vcfg = transformers.CLIPVisionConfig(
            hidden_size=1024, intermediate_size=4096, num_hidden_layers=24,
            num_attention_heads=16, image_size=224, patch_size=14,
            projection_dim=768)
        model = transformers.CLIPVisionModelWithProjection(vcfg).eval()
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        cfg = CLIP_VIT_L14_VISION
        params = {'params': convert.convert_clip_vision(sd, cfg)}
        flax_model = CLIPVisionModel(cfg)
        img = rng.normal(size=(1, 3, 224, 224)).astype(np.float32) * 0.5
        with torch.no_grad():
            hs = model.vision_model.embeddings(torch.tensor(img))
            hs = model.vision_model.pre_layrnorm(hs)
            enc = model.vision_model.encoder(inputs_embeds=hs)
            pooled = model.vision_model.post_layernorm(enc[0])
            ref = model.visual_projection(pooled).numpy()
        got = np.asarray(
            flax_model.apply(params, jnp.asarray(img.transpose(0, 2, 3, 1))))
        assert got.shape == (1, 257, 768)   # reference encode/clip.py:96-100
    # Full depth accumulates more fp32 reorder drift than the tiny tower.
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_vision_pooled_output_parity(hf_clip):
    """output='pooled' (IP-Adapter's image-encoder path) matches HF's
    CLS-pooled projected image_embeds."""
    model, sd = hf_clip
    cfg = CLIPVisionConfig(hidden_size=40, num_layers=2, num_heads=4,
                           image_size=32, patch_size=8, intermediate_size=80,
                           projection_dim=24)
    params = {'params': convert.convert_clip_vision(sd, cfg)}
    flax_model = CLIPVisionModel(cfg)
    rng = np.random.default_rng(4)
    img = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        out = model.vision_model(torch.tensor(img))
        ref = model.visual_projection(out.pooler_output).numpy()
    got = np.asarray(
        flax_model.apply(params, jnp.asarray(img.transpose(0, 2, 3, 1)),
                         output='pooled'))
    assert got.shape == (1, 24)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)
