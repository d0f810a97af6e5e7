"""ControlNet (Zhang et al. 2023) — spatial conditioning for the SD UNet.

Beyond-reference capability: a trainable copy of the UNet's down+mid path
whose per-skip zero-initialized 1×1 convolutions emit residuals that are
added onto the base UNet's skip connections (diffusers ``ControlNetModel``
semantics; reference anchor: the reference has no spatial conditioning at
all — its only spatial control is the composition prototype,
composition/guide.py).

TPU-native design: the control branch is a pure Flax module sharing this
repo's UNet building blocks *and parameter naming*, so weight conversion
reuses the same rename rules; the whole (controlnet → UNet) step remains
one jitted program inside the sampling scan — conditioning scale is a
traced scalar, control images swap without recompiling.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from flexdiffuse_tpu.models.configs import UNetConfig
from flexdiffuse_tpu.models.unet import (embed_timestep, resolve_approx_gelu,
                                         resolve_channel_major, run_down_mid)

Array = jax.Array

# Conditioning-embedding channel ramp (diffusers
# ControlNetConditioningEmbedding default block_out_channels).
COND_EMBED_CHANNELS = (16, 32, 96, 256)


class ConditioningEmbedding(nn.Module):
    """Control image (pixel space, [0, 1]) → latent-resolution features."""

    out_channels: int
    channels: Tuple[int, ...] = COND_EMBED_CHANNELS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond: Array) -> Array:
        h = nn.Conv(self.channels[0], (3, 3), padding=1, name='conv_in',
                    dtype=self.dtype)(cond.astype(self.dtype))
        h = nn.silu(h)
        for i in range(len(self.channels) - 1):
            h = nn.Conv(self.channels[i], (3, 3), padding=1,
                        name=f'block_{2 * i}', dtype=self.dtype)(h)
            h = nn.silu(h)
            h = nn.Conv(self.channels[i + 1], (3, 3), strides=2, padding=1,
                        name=f'block_{2 * i + 1}', dtype=self.dtype)(h)
            h = nn.silu(h)
        # Zero-initialized: an untrained ControlNet is an exact no-op.
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       name='conv_out', dtype=self.dtype,
                       kernel_init=nn.initializers.zeros)(h)


class ControlNetModel(nn.Module):
    """``(latents, t, context, cond_image, scale) → (down_residuals, mid)``.

    Geometry mirrors the paired UNet's down+mid path (``config`` is the same
    :class:`UNetConfig`); ``cond_image`` is ``[B or 1, H, W, 3]`` in [0, 1]
    at pixel resolution (8× the latent grid).
    """

    config: UNetConfig
    dtype: jnp.dtype = jnp.float32
    norm_dtype: jnp.dtype = jnp.float32
    # Conditioning-embedding ramp: len-1 stride-2 convs bridge the pixel →
    # latent resolution gap (SD: ÷8 → the 4-entry default; tiny test VAEs
    # use shorter ramps).
    cond_channels: Tuple[int, ...] = COND_EMBED_CHANNELS
    # Transformer-interior orientation / gelu flavor (models/unet.py);
    # None → auto.
    channel_major: Optional[bool] = None
    approx_gelu: Optional[bool] = None

    @nn.compact
    def __call__(self, latents: Array, t: Array, context: Array,
                 cond: Array, scale: Array = 1.0,
                 added_cond=None) -> Tuple[Tuple[Array, ...], Array]:
        cfg = self.config
        ch0 = cfg.block_channels[0]
        # Shared down+mid path (params created here under the same names the
        # UNet uses — models/unet.py run_down_mid); SDXL controlnets get
        # their text_time addition embedding through the same helper.
        temb = embed_timestep(cfg, t, added_cond, self.dtype)

        h = nn.Conv(ch0, (3, 3), padding=1, name='conv_in',
                    dtype=self.dtype)(latents.astype(self.dtype))
        cond_feat = ConditioningEmbedding(ch0, self.cond_channels,
                                          dtype=self.dtype,
                                          name='cond_embed')(cond)
        h = h + jnp.broadcast_to(cond_feat, h.shape)
        h, skips = run_down_mid(
            cfg, h, temb, context, self.dtype, self.norm_dtype,
            channel_major=resolve_channel_major(self.channel_major),
            approx_gelu=resolve_approx_gelu(self.approx_gelu, self.dtype))

        scale = jnp.asarray(scale, self.dtype)
        down_res = tuple(
            nn.Conv(s.shape[-1], (1, 1), name=f'zero_conv_{k}',
                    dtype=self.dtype,
                    kernel_init=nn.initializers.zeros)(s) * scale
            for k, s in enumerate(skips))
        mid_res = nn.Conv(h.shape[-1], (1, 1), name='zero_conv_mid',
                          dtype=self.dtype,
                          kernel_init=nn.initializers.zeros)(h) * scale
        return down_res, mid_res
