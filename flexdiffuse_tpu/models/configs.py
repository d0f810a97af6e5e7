"""Model configurations: SD v1.x + CLIP ViT-L/14 real sizes and tiny test
variants (the tiny-fake-model strategy from SURVEY.md §4)."""
from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_positions: int = 77
    intermediate_size: int = 3072


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    intermediate_size: int = 4096
    projection_dim: int = 768

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size)**2

    @property
    def num_positions(self) -> int:
        return self.num_patches + 1


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """SD v1.x UNet2DConditionModel geometry (CompVis/stable-diffusion-v1-4)."""
    in_channels: int = 4
    out_channels: int = 4
    block_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    # Which down/up levels carry cross-attention transformer blocks
    # (SD1.x: all but the innermost).
    attention_levels: Tuple[bool, ...] = (True, True, True, False)
    num_heads: int = 8
    cross_attention_dim: int = 768
    norm_groups: int = 32
    transformer_depth: int = 1


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """SD v1.x AutoencoderKL geometry."""
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32


# ---------------------------------------------------------------------------
# Tiny variants for CPU-speed tests.

TINY_TEXT = CLIPTextConfig(vocab_size=1000, hidden_size=32, num_layers=2,
                           num_heads=4, max_positions=77,
                           intermediate_size=64)
TINY_VISION = CLIPVisionConfig(hidden_size=32, num_layers=2, num_heads=4,
                               image_size=32, patch_size=8,
                               intermediate_size=64, projection_dim=32)
TINY_UNET = UNetConfig(block_channels=(32, 64), layers_per_block=1,
                       attention_levels=(True, False), num_heads=2,
                       cross_attention_dim=32, norm_groups=8)
TINY_VAE = VAEConfig(block_channels=(32, 32), layers_per_block=1,
                     norm_groups=8)

SD14_UNET = UNetConfig()
SD14_VAE = VAEConfig()
CLIP_VIT_L14_TEXT = CLIPTextConfig()
CLIP_VIT_L14_VISION = CLIPVisionConfig()
