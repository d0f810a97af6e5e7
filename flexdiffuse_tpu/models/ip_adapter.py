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

    def block(head: str, level: int):
        for d in range(config.depth_at(level)):
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
    block('mid_attn', n - 1)
    return paths


def convert_ip_adapter(sd: Dict[str, np.ndarray], config: UNetConfig):
    """Official IP-Adapter state dict → (image_proj params, per-layer map).

    Accepts both the nested torch layout (flattened by
    ``weights.load.load_state_dict`` to ``image_proj.*`` / ``ip_adapter.*``)
    and safetensors exports with the same names. Returns
    ``(image_proj_params, {layer_path: {'to_k_ip': kernel, 'to_v_ip': ...}})``
    with kernels already in flax ``[in, out]`` layout.
    """
    if 'image_proj.proj.weight' not in sd:
        raise ValueError(
            'unsupported IP-Adapter variant: no image_proj.proj.weight — '
            'Plus/FaceID checkpoints use a perceiver Resampler image '
            'projection, which is not implemented (base checkpoints only)')
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
    # Collect per-index to_k_ip/to_v_ip and map sorted indices onto the
    # attn2 enumeration (official ckpts use odd indices 1,3,5,…; some
    # re-exports renumber densely — order is what matters).
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
    return proj, dict(zip(order, (per_idx[i] for i in indices)))


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
