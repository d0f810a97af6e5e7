"""AutoencoderKL (SD v1.x VAE) in Flax linen — NHWC, bf16 compute.

Encode/decode endpoints of the latent pipeline (reference:
``vae.encode().latent_dist.sample()`` at pipeline/flex.py:189-192 and
``vae.decode()`` at flex.py:112-124). The 0.18215 latent scaling lives in the
pipeline, not here, mirroring the reference.

Geometry matches the SD v1.x checkpoint: 4 encoder levels (128/256/512/512,
2 resnets each), single-head mid attention, decoder with 3 resnets per level.
The VAE's stride-2 downsampling uses the torch asymmetric right/bottom pad.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from flexdiffuse_tpu.models.configs import VAEConfig
from flexdiffuse_tpu.ops.attention import attention

Array = jax.Array


class VAEResnet(nn.Module):
    out_channels: int
    norm_groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        gn = lambda name: nn.GroupNorm(self.norm_groups, epsilon=1e-6,
                                       name=name, dtype=jnp.float32)
        h = nn.silu(gn('norm1')(x)).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name='conv1',
                    dtype=self.dtype)(h)
        h = nn.silu(gn('norm2')(h)).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name='conv2',
                    dtype=self.dtype)(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name='conv_shortcut',
                        dtype=self.dtype)(x.astype(self.dtype))
        return x + h


class VAEAttention(nn.Module):
    """Single-head spatial self-attention (mid-block)."""

    channels: int
    norm_groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        residual = x
        y = nn.GroupNorm(self.norm_groups, epsilon=1e-6, name='group_norm',
                         dtype=jnp.float32)(x).astype(self.dtype)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, name='to_q', dtype=self.dtype)(y)
        k = nn.Dense(c, name='to_k', dtype=self.dtype)(y)
        v = nn.Dense(c, name='to_v', dtype=self.dtype)(y)
        # Routed through the dispatcher: at 512² decode this is a 4096-token
        # single-head attention — the flash kernel avoids the 64MB score
        # matrix; short sequences use the fused XLA path.
        out = attention(q[:, None], k[:, None], v[:, None], c**-0.5)[:, 0]
        out = nn.Dense(c, name='to_out', dtype=self.dtype)(out)
        return residual + out.reshape(b, h, w, c)


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: Array) -> Array:
        cfg = self.config
        x = pixels.astype(self.dtype)
        h = nn.Conv(cfg.block_channels[0], (3, 3), padding=1, name='conv_in',
                    dtype=self.dtype)(x)
        for i, ch in enumerate(cfg.block_channels):
            for j in range(cfg.layers_per_block):
                h = VAEResnet(ch, cfg.norm_groups, dtype=self.dtype,
                              name=f'down_{i}_res_{j}')(h)
            if i != len(cfg.block_channels) - 1:
                # torch VAE downsample: asymmetric (0,1,0,1) pad + stride 2.
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=2, padding='VALID',
                            name=f'down_{i}_downsample', dtype=self.dtype)(h)
        ch = cfg.block_channels[-1]
        h = VAEResnet(ch, cfg.norm_groups, dtype=self.dtype,
                      name='mid_res_0')(h)
        h = VAEAttention(ch, cfg.norm_groups, dtype=self.dtype,
                         name='mid_attn')(h)
        h = VAEResnet(ch, cfg.norm_groups, dtype=self.dtype,
                      name='mid_res_1')(h)
        h = nn.silu(
            nn.GroupNorm(cfg.norm_groups, epsilon=1e-6, name='norm_out',
                         dtype=jnp.float32)(h))
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1,
                       name='conv_out', dtype=self.dtype)(
                           h.astype(self.dtype))


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, latents: Array) -> Array:
        cfg = self.config
        ch = cfg.block_channels[-1]
        h = nn.Conv(ch, (3, 3), padding=1, name='conv_in',
                    dtype=self.dtype)(latents.astype(self.dtype))
        h = VAEResnet(ch, cfg.norm_groups, dtype=self.dtype,
                      name='mid_res_0')(h)
        h = VAEAttention(ch, cfg.norm_groups, dtype=self.dtype,
                         name='mid_attn')(h)
        h = VAEResnet(ch, cfg.norm_groups, dtype=self.dtype,
                      name='mid_res_1')(h)
        for i, ch in enumerate(reversed(cfg.block_channels)):
            for j in range(cfg.layers_per_block + 1):
                h = VAEResnet(ch, cfg.norm_groups, dtype=self.dtype,
                              name=f'up_{i}_res_{j}')(h)
            if i != len(cfg.block_channels) - 1:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c),
                                     method='nearest')
                h = nn.Conv(c, (3, 3), padding=1, name=f'up_{i}_upsample',
                            dtype=self.dtype)(h)
        h = nn.silu(
            nn.GroupNorm(cfg.norm_groups, epsilon=1e-6, name='norm_out',
                         dtype=jnp.float32)(h))
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, name='conv_out',
                       dtype=self.dtype)(h.astype(self.dtype)).astype(
                           jnp.float32)


class AutoencoderKL(nn.Module):
    """``encode(pixels) -> (mean, logvar)``; ``decode(latents) -> pixels``.

    All tensors NHWC; sampling from the posterior happens in the pipeline
    with an explicit PRNG key (reference: ``latent_dist.sample(generator)``).
    """

    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  name='quant_conv', dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                       name='post_quant_conv',
                                       dtype=self.dtype)

    def encode(self, pixels: Array) -> Tuple[Array, Array]:
        moments = self.quant_conv(self.encoder(pixels))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean.astype(jnp.float32), jnp.clip(
            logvar.astype(jnp.float32), -30.0, 20.0)

    def decode(self, latents: Array) -> Array:
        return self.decoder(self.post_quant_conv(
            latents.astype(self.dtype)))

    def __call__(self, pixels: Array, key: Array) -> Array:
        mean, logvar = self.encode(pixels)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
            key, mean.shape, jnp.float32)
        return self.decode(z)


def sample_latents(mean: Array, logvar: Array, key: Array) -> Array:
    """Reparameterized posterior sample (diffusers ``DiagonalGaussianDistribution``)."""
    return mean + jnp.exp(0.5 * logvar) * jax.random.normal(
        key, mean.shape, jnp.float32)
