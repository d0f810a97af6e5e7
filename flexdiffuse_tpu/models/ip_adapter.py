"""IP-Adapter (Ye et al. 2023) — decoupled image-prompt attention.

Beyond-reference capability, and the modern sibling of FlexDiffuse's own
novelty: where the reference maps CLIP patch embeddings onto the text
tokens by cosine similarity (guidance.py:23-85, the Tweener), IP-Adapter
attends over projected image tokens through dedicated per-layer
``to_k_ip``/``to_v_ip`` projections, decoupled from the text K/V:

    attn_out = attn(q, K_text, V_text) + scale · attn(q, K_ip, V_ip)

This module holds the image-projection head (CLIP pooled image embedding →
``ip_tokens`` context tokens); the per-layer projections live inside
:class:`~flexdiffuse_tpu.models.unet.CrossAttention` (``ip_adapter=True``
configs). The scale is a traced scalar — swapping image prompts or scales
never recompiles the sampling scan.
"""
from __future__ import annotations

import re
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from flexdiffuse_tpu.models.configs import UNetConfig

Array = jax.Array


class ImageProjection(nn.Module):
    """CLIP pooled image embedding ``[B, D_img]`` → ``[B, N, D_ctx]``."""

    context_dim: int
    num_tokens: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, embed: Array) -> Array:
        b = embed.shape[0]
        x = nn.Dense(self.num_tokens * self.context_dim, name='proj',
                     dtype=self.dtype)(embed.astype(self.dtype))
        x = x.reshape(b, self.num_tokens, self.context_dim)
        return nn.LayerNorm(epsilon=1e-5, name='norm', dtype=self.dtype)(x)


class PerceiverAttention(nn.Module):
    """One Resampler cross-attention: learned latents attend over
    ``concat(image tokens, latents)`` (the official IP-Adapter Plus
    perceiver block, including its split softmax scale — ``1/√√d`` applied
    to both q and k so the product is the usual ``1/√d``)."""

    dim: int
    dim_head: int = 64
    heads: int = 12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, latents: Array) -> Array:
        inner = self.dim_head * self.heads
        x = nn.LayerNorm(epsilon=1e-5, name='norm1', dtype=self.dtype)(x)
        lat = nn.LayerNorm(epsilon=1e-5, name='norm2',
                           dtype=self.dtype)(latents)
        b, n, _ = lat.shape
        q = nn.Dense(inner, use_bias=False, name='to_q',
                     dtype=self.dtype)(lat)
        kv_in = jnp.concatenate([x, lat], axis=-2)
        kv = nn.Dense(inner * 2, use_bias=False, name='to_kv',
                      dtype=self.dtype)(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads_first(t):
            return t.reshape(b, t.shape[1], self.heads,
                             self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads_first(q), heads_first(k), heads_first(v)
        scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(self.dim_head,
                                                    jnp.float32)))
        w = jnp.einsum('bhnd,bhmd->bhnm', (q * scale).astype(jnp.float32),
                       (k * scale).astype(jnp.float32))
        w = jax.nn.softmax(w, axis=-1).astype(v.dtype)
        out = jnp.einsum('bhnm,bhmd->bhnd', w, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return nn.Dense(self.dim, use_bias=False, name='to_out',
                        dtype=self.dtype)(out)


class Resampler(nn.Module):
    """IP-Adapter Plus image projection: ``num_queries`` learned latents
    refined over ``depth`` perceiver blocks against the image encoder's
    penultimate patch tokens, then projected to the UNet context dim.

    ``[B, 1+P, embed_dim] -> [B, num_queries, output_dim]``.
    """

    output_dim: int
    dim: int = 768
    depth: int = 4
    dim_head: int = 64
    heads: int = 12
    num_queries: int = 16
    ff_mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, embeds: Array) -> Array:
        b = embeds.shape[0]
        latents = self.param('latents', nn.initializers.normal(1.0),
                             (1, self.num_queries, self.dim))
        lat = jnp.broadcast_to(latents.astype(self.dtype),
                               (b, self.num_queries, self.dim))
        x = nn.Dense(self.dim, name='proj_in',
                     dtype=self.dtype)(embeds.astype(self.dtype))
        for i in range(self.depth):
            lat = lat + PerceiverAttention(self.dim, self.dim_head,
                                           self.heads, dtype=self.dtype,
                                           name=f'layers_{i}_attn')(x, lat)
            h = nn.LayerNorm(epsilon=1e-5, name=f'layers_{i}_ff_norm',
                             dtype=self.dtype)(lat)
            h = nn.Dense(self.dim * self.ff_mult, use_bias=False,
                         name=f'layers_{i}_ff_1', dtype=self.dtype)(h)
            h = nn.Dense(self.dim, use_bias=False, name=f'layers_{i}_ff_2',
                         dtype=self.dtype)(nn.gelu(h, approximate=False))
            lat = lat + h
        out = nn.Dense(self.output_dim, name='proj_out',
                       dtype=self.dtype)(lat)
        return nn.LayerNorm(epsilon=1e-5, name='norm_out',
                            dtype=self.dtype)(out)


def attn2_layer_order(config: UNetConfig):
    """Cross-attention layer paths in diffusers' ``attn_processors`` order.

    diffusers assigns ``down_blocks`` and ``up_blocks`` ModuleLists before
    ``mid_block``, so ``named_children`` — and therefore the
    ``attn_processors`` enumeration the official IP-Adapter checkpoints are
    keyed by — walks **down → up → mid (last)**. (The same down/up/mid-last
    index map appears in the ComfyUI/A1111 IP-Adapter loaders for SD1.5:
    6 input + 9 output + 1 middle.)
    """
    paths = []

    def block(head: str, level: int, depth=None):
        depth = config.depth_at(level) if depth is None else depth
        for d in range(depth):
            paths.append((head, f'blocks_{d}', 'attn2'))

    n = len(config.block_channels)
    for i in range(n):
        for j in range(config.layers_per_block):
            if config.attention_levels[i]:
                block(f'down_{i}_attn_{j}', i)
    for i in range(n):
        level = n - 1 - i
        for j in range(config.layers_per_block + 1):
            if config.attention_levels[level]:
                block(f'up_{i}_attn_{j}', level)
    block('mid_attn', n - 1, depth=config.depth_mid())
    return paths


def convert_ip_layers(sd: Dict[str, np.ndarray], config: UNetConfig):
    """Per-layer ``to_k_ip``/``to_v_ip`` map for a UNet config.

    Collects per-index projections and maps sorted indices onto the attn2
    enumeration (official ckpts use odd indices 1,3,5,…; some re-exports
    renumber densely — order is what matters). Kernels in flax ``[in, out]``
    layout.
    """
    per_idx: Dict[int, dict] = {}
    for key, val in sd.items():
        m = re.match(r'ip_adapter\.(\d+)\.to_([kv])_ip\.weight$', key)
        if m:
            per_idx.setdefault(int(m.group(1)), {})[
                f'to_{m.group(2)}_ip'] = {'kernel': np.asarray(val).T}
    order = attn2_layer_order(config)
    indices = sorted(per_idx)
    if len(indices) != len(order):
        raise ValueError(
            f'IP-Adapter has {len(indices)} attention layers but this UNet '
            f'config has {len(order)} cross-attention layers')
    return dict(zip(order, (per_idx[i] for i in indices)))


def build_image_proj(sd: Dict[str, np.ndarray], config: UNetConfig,
                     dtype=jnp.float32):
    """Image-projection head for whichever variant the checkpoint is.

    Returns ``(module, params, num_tokens, input_kind)`` where
    ``input_kind`` tells the caller what to feed the module:

    * ``'pooled'`` — base checkpoints (``image_proj.proj.*``): the image
      encoder's CLS-pooled projected embedding ``[B, D]``.
    * ``'penultimate'`` — Plus/SDXL-plus checkpoints
      (``image_proj.latents`` + perceiver layers): the encoder's
      second-to-last hidden states ``[B, 1+P, D]``.
    """
    if 'image_proj.latents' in sd:
        lat = np.asarray(sd['image_proj.latents'])
        dim, nq = lat.shape[-1], lat.shape[1]
        out_w = np.asarray(sd['image_proj.proj_out.weight'])
        if out_w.shape[0] != config.cross_attention_dim:
            raise ValueError(
                f'Resampler output dim {out_w.shape[0]} != UNet '
                f'cross-attention dim {config.cross_attention_dim} — '
                'adapter does not match this base model')
        inner = np.asarray(sd['image_proj.layers.0.0.to_q.weight']).shape[0]
        depth = 0
        while f'image_proj.layers.{depth}.0.to_q.weight' in sd:
            depth += 1
        ff1 = np.asarray(sd['image_proj.layers.0.1.1.weight'])
        params = {
            'latents': lat,
            'proj_in': {
                'kernel': np.asarray(sd['image_proj.proj_in.weight']).T,
                'bias': np.asarray(sd['image_proj.proj_in.bias'])},
            'proj_out': {'kernel': out_w.T,
                         'bias': np.asarray(sd['image_proj.proj_out.bias'])},
            'norm_out': {
                'scale': np.asarray(sd['image_proj.norm_out.weight']),
                'bias': np.asarray(sd['image_proj.norm_out.bias'])},
        }
        for i in range(depth):
            pre = f'image_proj.layers.{i}'
            params[f'layers_{i}_attn'] = {
                'norm1': {'scale': np.asarray(sd[f'{pre}.0.norm1.weight']),
                          'bias': np.asarray(sd[f'{pre}.0.norm1.bias'])},
                'norm2': {'scale': np.asarray(sd[f'{pre}.0.norm2.weight']),
                          'bias': np.asarray(sd[f'{pre}.0.norm2.bias'])},
                'to_q': {'kernel': np.asarray(sd[f'{pre}.0.to_q.weight']).T},
                'to_kv': {
                    'kernel': np.asarray(sd[f'{pre}.0.to_kv.weight']).T},
                'to_out': {
                    'kernel': np.asarray(sd[f'{pre}.0.to_out.weight']).T},
            }
            params[f'layers_{i}_ff_norm'] = {
                'scale': np.asarray(sd[f'{pre}.1.0.weight']),
                'bias': np.asarray(sd[f'{pre}.1.0.bias'])}
            params[f'layers_{i}_ff_1'] = {
                'kernel': np.asarray(sd[f'{pre}.1.1.weight']).T}
            params[f'layers_{i}_ff_2'] = {
                'kernel': np.asarray(sd[f'{pre}.1.3.weight']).T}
        # Official checkpoints use 64-wide heads; fall back to one head for
        # sub-64 inner dims (tiny test geometries).
        dim_head = 64 if inner % 64 == 0 and inner >= 64 else inner
        module = Resampler(output_dim=out_w.shape[0], dim=dim, depth=depth,
                           dim_head=dim_head, heads=inner // dim_head,
                           num_queries=nq, ff_mult=ff1.shape[0] // dim,
                           dtype=dtype)
        return module, {'params': params}, nq, 'penultimate'

    if 'image_proj.proj.weight' not in sd:
        raise ValueError(
            'unsupported IP-Adapter variant: neither image_proj.proj.weight '
            '(base) nor image_proj.latents (Plus Resampler) present — '
            'FaceID checkpoints are not supported')
    proj_w = np.asarray(sd['image_proj.proj.weight'])
    if proj_w.shape[0] % config.cross_attention_dim:
        raise ValueError(
            f'image_proj output dim {proj_w.shape[0]} is not a multiple of '
            f'the UNet cross-attention dim {config.cross_attention_dim} — '
            'adapter does not match this base model')
    proj = {
        'proj': {'kernel': proj_w.T,
                 'bias': np.asarray(sd['image_proj.proj.bias'])},
        'norm': {'scale': np.asarray(sd['image_proj.norm.weight']),
                 'bias': np.asarray(sd['image_proj.norm.bias'])},
    }
    tokens = proj_w.shape[0] // config.cross_attention_dim
    module = ImageProjection(config.cross_attention_dim, tokens, dtype=dtype)
    return module, {'params': proj}, tokens, 'pooled'


def convert_ip_adapter(sd: Dict[str, np.ndarray], config: UNetConfig):
    """Back-compat wrapper (base checkpoints): → ``(image_proj params,
    per-layer map)``. New code should use :func:`build_image_proj` +
    :func:`convert_ip_layers`, which also handle Plus (Resampler)
    checkpoints."""
    module, params, _, kind = build_image_proj(sd, config)
    if kind != 'pooled':
        raise ValueError('convert_ip_adapter handles base checkpoints only;'
                         ' use build_image_proj for Plus (Resampler) ones')
    return params['params'], convert_ip_layers(sd, config)


def merge_ip_weights(unet_params, layer_map) -> dict:
    """Insert the per-layer ``to_k_ip``/``to_v_ip`` params into (a copy of)
    a UNet param tree (the base checkpoint's tree lacks them; an
    ``ip_adapter=True`` module picks them up at apply time)."""
    params = jax.tree_util.tree_map(lambda x: x, unet_params)
    root = params['params'] if 'params' in params else params
    for path, leaves in layer_map.items():
        node = root
        for part in path:
            if part not in node:
                raise KeyError(
                    f'UNet tree lacks {"/".join(path)} — mismatched '
                    'IP-Adapter / UNet geometry')
            node = node[part]
        node.update(leaves)
    return params
