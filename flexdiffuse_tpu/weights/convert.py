"""HF checkpoint → Flax pytree conversion (pure renaming + transposes).

The reference pulls ``CompVis/stable-diffusion-v1-4`` and
``openai/clip-vit-large-patch14`` through diffusers/transformers
(utils.py:61-66). Here we convert those checkpoints' tensors directly into
the param trees of :mod:`flexdiffuse_tpu.models` — no torch at runtime, one
conversion pass cached as an orbax/msgpack checkpoint (see ``load.py``).

Layout rules:
* torch ``Linear``  [out, in]        → linen ``Dense`` kernel [in, out]
* torch ``Conv2d``  [out, in, kh, kw]→ linen ``Conv`` kernel [kh, kw, in, out]
* torch norm ``weight``/``bias``     → linen ``scale``/``bias``
* HF's ``pre_layrnorm`` (sic) maps to our ``pre_layernorm``.

All functions take a flat ``dict[str, np.ndarray]`` state dict.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from flexdiffuse_tpu.models.configs import (CLIPTextConfig, CLIPVisionConfig,
                                            UNetConfig, VAEConfig)

SD = Dict[str, np.ndarray]


def _dense(sd: SD, name: str, bias: bool = True) -> dict:
    out = {'kernel': np.asarray(sd[f'{name}.weight']).T}
    if bias:
        out['bias'] = np.asarray(sd[f'{name}.bias'])
    return out


def _conv(sd: SD, name: str, bias: bool = True) -> dict:
    w = np.asarray(sd[f'{name}.weight'])
    if w.ndim == 2:
        # use_linear_projection checkpoints (SD2.x / SDXL-base) store the
        # transformer proj_in/proj_out as Linear [out, in]; our model keeps
        # a Conv(1,1), so emit the numerically identical 1×1 kernel.
        w = w.T[None, None]
    else:
        w = w.transpose(2, 3, 1, 0)
    out = {'kernel': w}
    if bias:
        out['bias'] = np.asarray(sd[f'{name}.bias'])
    return out


def _norm(sd: SD, name: str) -> dict:
    return {
        'scale': np.asarray(sd[f'{name}.weight']),
        'bias': np.asarray(sd[f'{name}.bias'])
    }


def _clip_encoder(sd: SD, prefix: str, num_layers: int) -> dict:
    enc = {}
    for i in range(num_layers):
        p = f'{prefix}.layers.{i}'
        enc[f'layers_{i}'] = {
            'self_attn': {
                k: _dense(sd, f'{p}.self_attn.{k}')
                for k in ('q_proj', 'k_proj', 'v_proj', 'out_proj')
            },
            'layer_norm1': _norm(sd, f'{p}.layer_norm1'),
            'layer_norm2': _norm(sd, f'{p}.layer_norm2'),
            'mlp': {
                'fc1': _dense(sd, f'{p}.mlp.fc1'),
                'fc2': _dense(sd, f'{p}.mlp.fc2'),
            },
        }
    return enc


def convert_clip_text(sd: SD, config: CLIPTextConfig) -> dict:
    """``text_model.*`` of an HF CLIPModel → :class:`CLIPTextModel` params.

    Also maps ``text_projection`` when present (SDXL's second encoder is a
    ``CLIPTextModelWithProjection``)."""
    p = 'text_model'
    out = {
        'token_embedding': {
            'embedding':
                np.asarray(sd[f'{p}.embeddings.token_embedding.weight'])
        },
        'position_embedding':
            np.asarray(sd[f'{p}.embeddings.position_embedding.weight']),
        'encoder': _clip_encoder(sd, f'{p}.encoder', config.num_layers),
        'final_layer_norm': _norm(sd, f'{p}.final_layer_norm'),
    }
    if config.projection_dim:
        # CLIPTextModelWithProjection (SDXL's second encoder): the pooled
        # projection is part of the model; a checkpoint without it is
        # mismatched, so index unconditionally rather than skip silently.
        out['text_projection'] = {
            'kernel': np.asarray(sd['text_projection.weight']).T
        }
    return out


def convert_clip_vision(sd: SD, config: CLIPVisionConfig) -> dict:
    """``vision_model.*`` + ``visual_projection`` → :class:`CLIPVisionModel`."""
    p = 'vision_model'
    return {
        'class_embedding':
            np.asarray(sd[f'{p}.embeddings.class_embedding']),
        'patch_embedding': {
            'kernel':
                np.asarray(sd[f'{p}.embeddings.patch_embedding.weight']
                           ).transpose(2, 3, 1, 0)
        },
        'position_embedding':
            np.asarray(sd[f'{p}.embeddings.position_embedding.weight']),
        'pre_layernorm': _norm(sd, f'{p}.pre_layrnorm'),  # HF's typo
        'encoder': _clip_encoder(sd, f'{p}.encoder', config.num_layers),
        'post_layernorm': _norm(sd, f'{p}.post_layernorm'),
        'visual_projection': {
            'kernel': np.asarray(sd['visual_projection.weight']).T
        },
    }


def _resnet(sd: SD, p: str, temb: bool = True) -> dict:
    out = {
        'norm1': _norm(sd, f'{p}.norm1'),
        'conv1': _conv(sd, f'{p}.conv1'),
        'norm2': _norm(sd, f'{p}.norm2'),
        'conv2': _conv(sd, f'{p}.conv2'),
    }
    if temb and f'{p}.time_emb_proj.weight' in sd:
        out['time_emb_proj'] = _dense(sd, f'{p}.time_emb_proj')
    if f'{p}.conv_shortcut.weight' in sd:
        out['conv_shortcut'] = _conv(sd, f'{p}.conv_shortcut')
    return out


def _transformer2d(sd: SD, p: str, depth: int) -> dict:
    out = {
        'norm': _norm(sd, f'{p}.norm'),
        'proj_in': _conv(sd, f'{p}.proj_in'),
        'proj_out': _conv(sd, f'{p}.proj_out'),
    }
    for i in range(depth):
        b = f'{p}.transformer_blocks.{i}'
        out[f'blocks_{i}'] = {
            'attn1': _attn(sd, f'{b}.attn1'),
            'attn2': _attn(sd, f'{b}.attn2'),
            'norm1': _norm(sd, f'{b}.norm1'),
            'norm2': _norm(sd, f'{b}.norm2'),
            'norm3': _norm(sd, f'{b}.norm3'),
            'ff': {
                'proj_in': _dense(sd, f'{b}.ff.net.0.proj'),
                'proj_out': _dense(sd, f'{b}.ff.net.2'),
            },
        }
    return out


def _attn(sd: SD, p: str) -> dict:
    return {
        'to_q': _dense(sd, f'{p}.to_q', bias=False),
        'to_k': _dense(sd, f'{p}.to_k', bias=False),
        'to_v': _dense(sd, f'{p}.to_v', bias=False),
        'to_out': _dense(sd, f'{p}.to_out.0'),
    }


def convert_unet(sd: SD, config: UNetConfig) -> dict:
    """diffusers ``UNet2DConditionModel`` state dict → :class:`UNet2DCondition`."""
    out: dict = {
        'time_embed_1': _dense(sd, 'time_embedding.linear_1'),
        'time_embed_2': _dense(sd, 'time_embedding.linear_2'),
        'conv_in': _conv(sd, 'conv_in'),
        'norm_out': _norm(sd, 'conv_norm_out'),
        'conv_out': _conv(sd, 'conv_out'),
    }
    if config.addition_embed:
        out['add_embed_1'] = _dense(sd, 'add_embedding.linear_1')
        out['add_embed_2'] = _dense(sd, 'add_embedding.linear_2')
    if config.time_cond_proj_dim:
        # LCM guidance-embedding projection (bias-free).
        out['time_cond_proj'] = _dense(sd, 'time_embedding.cond_proj',
                                       bias=False)
    n = len(config.block_channels)
    for i in range(n):
        for j in range(config.layers_per_block):
            out[f'down_{i}_res_{j}'] = _resnet(sd,
                                               f'down_blocks.{i}.resnets.{j}')
            if config.attention_levels[i]:
                out[f'down_{i}_attn_{j}'] = _transformer2d(
                    sd, f'down_blocks.{i}.attentions.{j}',
                    config.depth_at(i))
        if i != n - 1:
            out[f'down_{i}_downsample'] = {
                'conv': _conv(sd, f'down_blocks.{i}.downsamplers.0.conv')
            }
    out['mid_res_0'] = _resnet(sd, 'mid_block.resnets.0')
    out['mid_res_1'] = _resnet(sd, 'mid_block.resnets.1')
    out['mid_attn'] = _transformer2d(sd, 'mid_block.attentions.0',
                                     config.depth_mid())
    for i in range(n):
        level = n - 1 - i
        for j in range(config.layers_per_block + 1):
            out[f'up_{i}_res_{j}'] = _resnet(sd, f'up_blocks.{i}.resnets.{j}')
            if config.attention_levels[level]:
                out[f'up_{i}_attn_{j}'] = _transformer2d(
                    sd, f'up_blocks.{i}.attentions.{j}',
                    config.depth_at(level))
        if i != n - 1:
            out[f'up_{i}_upsample'] = {
                'conv': _conv(sd, f'up_blocks.{i}.upsamplers.0.conv')
            }
    return out


def _vae_attn(sd: SD, p: str) -> dict:
    """VAE mid attention; handles both old (query/key/value/proj_attn) and
    new (to_q/to_k/to_v/to_out.0) diffusers naming."""
    if f'{p}.to_q.weight' in sd:
        names = ('to_q', 'to_k', 'to_v', 'to_out.0')
    else:
        names = ('query', 'key', 'value', 'proj_attn')
    ours = ('to_q', 'to_k', 'to_v', 'to_out')
    out = {}
    for theirs, mine in zip(names, ours):
        w = np.asarray(sd[f'{p}.{theirs}.weight'])
        if w.ndim == 4:  # some checkpoints store 1x1 convs
            w = w[:, :, 0, 0]
        out[mine] = {'kernel': w.T, 'bias': np.asarray(sd[f'{p}.{theirs}.bias'])}
    out['group_norm'] = _norm(sd, f'{p}.group_norm')
    return out


def convert_vae(sd: SD, config: VAEConfig) -> dict:
    """diffusers ``AutoencoderKL`` state dict → :class:`AutoencoderKL` params."""
    n = len(config.block_channels)
    enc: dict = {'conv_in': _conv(sd, 'encoder.conv_in'),
                 'norm_out': _norm(sd, 'encoder.conv_norm_out'),
                 'conv_out': _conv(sd, 'encoder.conv_out')}
    for i in range(n):
        for j in range(config.layers_per_block):
            enc[f'down_{i}_res_{j}'] = _resnet(
                sd, f'encoder.down_blocks.{i}.resnets.{j}', temb=False)
        if i != n - 1:
            enc[f'down_{i}_downsample'] = _conv(
                sd, f'encoder.down_blocks.{i}.downsamplers.0.conv')
    enc['mid_res_0'] = _resnet(sd, 'encoder.mid_block.resnets.0', temb=False)
    enc['mid_res_1'] = _resnet(sd, 'encoder.mid_block.resnets.1', temb=False)
    enc['mid_attn'] = _vae_attn(sd, 'encoder.mid_block.attentions.0')

    dec: dict = {'conv_in': _conv(sd, 'decoder.conv_in'),
                 'norm_out': _norm(sd, 'decoder.conv_norm_out'),
                 'conv_out': _conv(sd, 'decoder.conv_out')}
    for i in range(n):
        for j in range(config.layers_per_block + 1):
            dec[f'up_{i}_res_{j}'] = _resnet(
                sd, f'decoder.up_blocks.{i}.resnets.{j}', temb=False)
        if i != n - 1:
            dec[f'up_{i}_upsample'] = _conv(
                sd, f'decoder.up_blocks.{i}.upsamplers.0.conv')
    dec['mid_res_0'] = _resnet(sd, 'decoder.mid_block.resnets.0', temb=False)
    dec['mid_res_1'] = _resnet(sd, 'decoder.mid_block.resnets.1', temb=False)
    dec['mid_attn'] = _vae_attn(sd, 'decoder.mid_block.attentions.0')

    return {
        'encoder': enc,
        'decoder': dec,
        'quant_conv': _conv(sd, 'quant_conv'),
        'post_quant_conv': _conv(sd, 'post_quant_conv'),
    }


def convert_controlnet(sd: SD, config) -> dict:
    """diffusers ``ControlNetModel`` state dict → :class:`ControlNetModel`.

    The body reuses the UNet rename rules (same block naming by design,
    models/controlnet.py); the ControlNet-specific pieces are the
    conditioning embedding and the per-skip zero convolutions.
    """
    out: dict = {
        'time_embed_1': _dense(sd, 'time_embedding.linear_1'),
        'time_embed_2': _dense(sd, 'time_embedding.linear_2'),
        'conv_in': _conv(sd, 'conv_in'),
    }
    if config.addition_embed:
        # SDXL controlnets carry the text_time addition embedding.
        out['add_embed_1'] = _dense(sd, 'add_embedding.linear_1')
        out['add_embed_2'] = _dense(sd, 'add_embedding.linear_2')
    ce = {'conv_in': _conv(sd, 'controlnet_cond_embedding.conv_in'),
          'conv_out': _conv(sd, 'controlnet_cond_embedding.conv_out')}
    i = 0
    while f'controlnet_cond_embedding.blocks.{i}.weight' in sd:
        ce[f'block_{i}'] = _conv(sd, f'controlnet_cond_embedding.blocks.{i}')
        i += 1
    out['cond_embed'] = ce

    n = len(config.block_channels)
    for i in range(n):
        for j in range(config.layers_per_block):
            out[f'down_{i}_res_{j}'] = _resnet(sd,
                                               f'down_blocks.{i}.resnets.{j}')
            if config.attention_levels[i]:
                out[f'down_{i}_attn_{j}'] = _transformer2d(
                    sd, f'down_blocks.{i}.attentions.{j}', config.depth_at(i))
        if i != n - 1:
            out[f'down_{i}_downsample'] = {
                'conv': _conv(sd, f'down_blocks.{i}.downsamplers.0.conv')
            }
    out['mid_res_0'] = _resnet(sd, 'mid_block.resnets.0')
    out['mid_res_1'] = _resnet(sd, 'mid_block.resnets.1')
    out['mid_attn'] = _transformer2d(sd, 'mid_block.attentions.0',
                                     config.depth_mid())
    k = 0
    while f'controlnet_down_blocks.{k}.weight' in sd:
        out[f'zero_conv_{k}'] = _conv(sd, f'controlnet_down_blocks.{k}')
        k += 1
    out['zero_conv_mid'] = _conv(sd, 'controlnet_mid_block')
    return out
