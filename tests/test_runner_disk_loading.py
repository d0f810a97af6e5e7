"""End-to-end disk-loading path: Runner(model_root=...) from a synthesized
HF-layout snapshot (safetensors + tokenizer files) at tiny scale.

This is the path real weights take (load_clip/load_sd conversion + msgpack
caching + CLIPTokenizer.from_dir) — `Runner.from_models` bypasses it, so
this test is the only end-to-end coverage of checkpoint loading.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdiffuse_tpu.config import RunConfig
from flexdiffuse_tpu.models.configs import (CLIPTextConfig, CLIPVisionConfig,
                                            TINY_UNET, TINY_VAE)
from flexdiffuse_tpu.runner import Runner

pytest.importorskip('transformers')
pytest.importorskip('safetensors')


def _mini_bpe_files(dst):
    """ASCII char-level vocab — enough for smoke prompts."""
    vocab = {}
    for c in 'abcdefghijklmnopqrstuvwxyz0123456789{}!?.,':
        vocab[c] = len(vocab)
        vocab[c + '</w>'] = len(vocab)
    vocab['<|startoftext|>'] = len(vocab)
    vocab['<|endoftext|>'] = len(vocab)
    os.makedirs(dst, exist_ok=True)
    with open(os.path.join(dst, 'vocab.json'), 'w') as f:
        json.dump(vocab, f)
    with open(os.path.join(dst, 'merges.txt'), 'w') as f:
        f.write('#version: 0.2\n')
    return len(vocab)


@pytest.fixture(scope='module')
def model_root(tmp_path_factory):
    import torch
    import transformers
    from safetensors.numpy import save_file

    from tests.test_weights_vae_load import _synth_vae_sd
    root = tmp_path_factory.mktemp('models')
    cfg = RunConfig()

    # --- CLIP snapshot: a real (tiny) torch CLIPModel state dict.
    clip_dir = root / cfg.clip_model.split('/')[-1]
    os.makedirs(clip_dir)
    vocab_size = _mini_bpe_files(str(clip_dir))
    torch.manual_seed(0)
    hf = transformers.CLIPModel(transformers.CLIPConfig(
        text_config=dict(vocab_size=vocab_size, hidden_size=32,
                         intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=4, max_position_embeddings=77,
                         projection_dim=24),
        vision_config=dict(hidden_size=40, intermediate_size=80,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=32, patch_size=8, projection_dim=24),
        projection_dim=24)).eval()
    sd = {k: np.ascontiguousarray(v.numpy())
          for k, v in hf.state_dict().items()}
    save_file(sd, str(clip_dir / 'model.safetensors'))

    # --- SD snapshot: torchified tiny UNet + VAE state dicts.
    sd_dir = root / cfg.sd_model.split('/')[-1]
    from flexdiffuse_tpu.models import AutoencoderKL, UNet2DCondition
    k = jax.random.PRNGKey(0)
    unet = UNet2DCondition(TINY_UNET)
    up = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                   jnp.zeros((1, 77, 32)))['params']
    vae = AutoencoderKL(TINY_VAE)
    vp = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)['params']

    # Invert the conversion rules into diffusers names (UNet).
    unet_sd = {}

    def leaf(dst, node):
        if 'kernel' in node:
            kern = np.asarray(node['kernel'])
            unet_sd[f'{dst}.weight'] = np.ascontiguousarray(
                kern.transpose(3, 2, 0, 1) if kern.ndim == 4 else kern.T)
            if 'bias' in node:
                unet_sd[f'{dst}.bias'] = np.asarray(node['bias'])
        elif 'scale' in node:
            unet_sd[f'{dst}.weight'] = np.asarray(node['scale'])
            unet_sd[f'{dst}.bias'] = np.asarray(node['bias'])
        else:
            for kk, vv in node.items():
                leaf(f'{dst}.{kk}' if kk not in ('to_out',) else
                     f'{dst}.to_out.0', vv)

    def attn(dst, node):
        for a in ('attn1', 'attn2'):
            for proj in ('to_q', 'to_k', 'to_v'):
                leaf(f'{dst}.{a}.{proj}', node[a][proj])
            leaf(f'{dst}.{a}.to_out.0', node[a]['to_out'])
        for nrm in ('norm1', 'norm2', 'norm3'):
            leaf(f'{dst}.{nrm}', node[nrm])
        leaf(f'{dst}.ff.net.0.proj', node['ff']['proj_in'])
        leaf(f'{dst}.ff.net.2', node['ff']['proj_out'])

    leaf('time_embedding.linear_1', up['time_embed_1'])
    leaf('time_embedding.linear_2', up['time_embed_2'])
    leaf('conv_in', up['conv_in'])
    leaf('conv_norm_out', up['norm_out'])
    leaf('conv_out', up['conv_out'])
    n = len(TINY_UNET.block_channels)
    for i in range(n):
        for j in range(TINY_UNET.layers_per_block):
            for kk, vv in up[f'down_{i}_res_{j}'].items():
                leaf(f'down_blocks.{i}.resnets.{j}.{kk}', vv)
            if TINY_UNET.attention_levels[i]:
                node = up[f'down_{i}_attn_{j}']
                leaf(f'down_blocks.{i}.attentions.{j}.norm', node['norm'])
                leaf(f'down_blocks.{i}.attentions.{j}.proj_in',
                     node['proj_in'])
                leaf(f'down_blocks.{i}.attentions.{j}.proj_out',
                     node['proj_out'])
                attn(f'down_blocks.{i}.attentions.{j}.transformer_blocks.0',
                     node['blocks_0'])
        if i != n - 1:
            leaf(f'down_blocks.{i}.downsamplers.0.conv',
                 up[f'down_{i}_downsample']['conv'])
    for kk, vv in up['mid_res_0'].items():
        leaf(f'mid_block.resnets.0.{kk}', vv)
    for kk, vv in up['mid_res_1'].items():
        leaf(f'mid_block.resnets.1.{kk}', vv)
    leaf('mid_block.attentions.0.norm', up['mid_attn']['norm'])
    leaf('mid_block.attentions.0.proj_in', up['mid_attn']['proj_in'])
    leaf('mid_block.attentions.0.proj_out', up['mid_attn']['proj_out'])
    attn('mid_block.attentions.0.transformer_blocks.0',
         up['mid_attn']['blocks_0'])
    for i in range(n):
        level = n - 1 - i
        for j in range(TINY_UNET.layers_per_block + 1):
            for kk, vv in up[f'up_{i}_res_{j}'].items():
                leaf(f'up_blocks.{i}.resnets.{j}.{kk}', vv)
            if TINY_UNET.attention_levels[level]:
                node = up[f'up_{i}_attn_{j}']
                leaf(f'up_blocks.{i}.attentions.{j}.norm', node['norm'])
                leaf(f'up_blocks.{i}.attentions.{j}.proj_in',
                     node['proj_in'])
                leaf(f'up_blocks.{i}.attentions.{j}.proj_out',
                     node['proj_out'])
                attn(f'up_blocks.{i}.attentions.{j}.transformer_blocks.0',
                     node['blocks_0'])
        if i != n - 1:
            leaf(f'up_blocks.{i}.upsamplers.0.conv',
                 up[f'up_{i}_upsample']['conv'])

    os.makedirs(sd_dir / 'unet')
    save_file(unet_sd, str(sd_dir / 'unet' /
                           'diffusion_pytorch_model.safetensors'))
    vae_sd = _synth_vae_sd(vp)
    os.makedirs(sd_dir / 'vae')
    save_file({k: np.ascontiguousarray(v) for k, v in vae_sd.items()},
              str(sd_dir / 'vae' / 'diffusion_pytorch_model.safetensors'))
    return str(root)


def test_runner_loads_from_disk_and_generates(model_root, tmp_path):
    text_cfg = CLIPTextConfig(vocab_size=86, hidden_size=32, num_layers=2,
                              num_heads=4, intermediate_size=64)
    vision_cfg = CLIPVisionConfig(hidden_size=40, num_layers=2, num_heads=4,
                                  image_size=32, patch_size=8,
                                  intermediate_size=80, projection_dim=24)
    runner = Runner(model_root=model_root,
                    config=RunConfig(output_dir=str(tmp_path)),
                    dtype=jnp.float32,
                    text_config=text_cfg, vision_config=vision_cfg,
                    unet_config=TINY_UNET, vae_config=TINY_VAE)
    imgs, grid = runner.gen(prompt='a deer', steps=2, init_size=(64, 64),
                            samples=1, seed=7, save=False)
    assert len(imgs) == 1
    # Conversion caches were written beside the snapshots.
    cfg = RunConfig()
    clip_dir = os.path.join(model_root, cfg.clip_model.split('/')[-1])
    sd_dir = os.path.join(model_root, cfg.sd_model.split('/')[-1])
    import glob
    assert glob.glob(os.path.join(clip_dir, 'flexdiffuse_tpu_clip_*.msgpack'))
    assert glob.glob(os.path.join(sd_dir, 'flexdiffuse_tpu_sd_*.msgpack'))
    # Second load comes from the cache and generates identically.
    runner2 = Runner(model_root=model_root,
                     config=RunConfig(output_dir=str(tmp_path)),
                     dtype=jnp.float32,
                     text_config=text_cfg, vision_config=vision_cfg,
                     unet_config=TINY_UNET, vae_config=TINY_VAE)
    imgs2, _ = runner2.gen(prompt='a deer', steps=2, init_size=(64, 64),
                           samples=1, seed=7, save=False)
    np.testing.assert_array_equal(np.asarray(imgs[0]), np.asarray(imgs2[0]))
