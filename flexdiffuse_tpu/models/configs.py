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
    activation: str = 'quick_gelu'  # OpenCLIP bigG (SDXL enc 2) uses 'gelu'
    projection_dim: int = 0         # >0: text_projection for pooled output
    # EOS token id for pooled-output selection. CLIP's EOS is the highest
    # vocab id only until textual-inversion tokens extend the table, so the
    # pool must match the id, not argmax the ids.
    eos_token_id: int = 49407


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
    """UNet2DConditionModel geometry (SD v1.x defaults; SDXL via overrides)."""
    in_channels: int = 4
    out_channels: int = 4
    block_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    # Which down/up levels carry cross-attention transformer blocks
    # (SD1.x: all but the innermost; SDXL: all but the outermost).
    attention_levels: Tuple[bool, ...] = (True, True, True, False)
    num_heads: int = 8
    # SDXL derives head count from a fixed per-head width instead.
    head_dim: int = 0  # 0 → use num_heads
    cross_attention_dim: int = 768
    norm_groups: int = 32
    # Transformer depth per level (int → same at every level). SDXL: (0,2,10).
    transformer_depth: Tuple[int, ...] | int = 1
    # Mid-block transformer depth; -1 → same as the innermost level (true
    # for SD1.x/SD2.x/SDXL-base). The SDXL *refiner* has no attention at its
    # innermost level yet a depth-4 mid transformer.
    mid_depth: int = -1
    # SDXL text_time additional embedding: pooled text embeds + micro-cond
    # time_ids, projected into the timestep embedding.
    addition_embed: bool = False
    addition_time_embed_dim: int = 256
    addition_pooled_dim: int = 1280
    # time_ids entries: 6 for SDXL-base [orig_h, orig_w, crop_t, crop_l,
    # target_h, target_w]; 5 for the refiner (aesthetic score replaces the
    # target pair). Geometry metadata (fixes add_embed_1's input width).
    num_time_ids: int = 6
    # IP-Adapter (decoupled image-prompt cross-attention): when true, every
    # cross-attention layer owns extra to_k_ip/to_v_ip projections attending
    # over `ip_tokens` projected image tokens.
    ip_adapter: bool = False
    ip_tokens: int = 4
    # Latent-consistency (LCM) guidance embedding: full LCM checkpoints
    # (e.g. SimianLuo/LCM_Dreamshaper_v7) condition the timestep embedding
    # on the guidance scale w through a bias-free projection
    # (HF ``time_embedding.cond_proj``); 0 → absent (standard SD).
    time_cond_proj_dim: int = 0
    # Minimum per-image token count for the channel-major transformer
    # interior (models/unet.py). Measured per architecture on TPU
    # (tools/{cmajor_exp,sdxl_exp}.py): SD1.x prefers CM from 1024 tokens;
    # SDXL's depth-10 1280-ch level is LayerNorm-heavy and runs ~1% faster
    # standard, so its preset raises this to 4096.
    cm_min_seq: int = 1024
    # DeepCache split point: how many of the shallowest encoder/decoder
    # levels a cache-using step recomputes (models/unet.py cache_mode).
    # 1 = recompute only the outermost level; the cached feature is the
    # hidden state entering decoder level ``num_levels - cache_depth``.
    cache_depth: int = 1

    def depth_at(self, level: int) -> int:
        if isinstance(self.transformer_depth, int):
            return self.transformer_depth
        return self.transformer_depth[level]

    def depth_mid(self) -> int:
        if self.mid_depth >= 0:
            return self.mid_depth
        return self.depth_at(len(self.block_channels) - 1)

    def heads_for(self, channels: int) -> int:
        return channels // self.head_dim if self.head_dim else self.num_heads


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
                           intermediate_size=64, eos_token_id=999)
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
# OpenCLIP ViT-bigG/14 text tower (SDXL's second encoder).
OPENCLIP_BIGG_TEXT = CLIPTextConfig(hidden_size=1280, num_layers=32,
                                    num_heads=20, intermediate_size=5120,
                                    activation='gelu', projection_dim=1280)
TINY_BIGG_TEXT = CLIPTextConfig(vocab_size=1000, hidden_size=24,
                                num_layers=2, num_heads=4,
                                intermediate_size=48, activation='gelu',
                                projection_dim=24, eos_token_id=999)
CLIP_VIT_L14_VISION = CLIPVisionConfig()

# SDXL-base geometry (stabilityai/stable-diffusion-xl-base-1.0): 3 levels,
# heavy transformer stacks at the deep levels, 64-wide heads, dual-text-
# encoder cross-attention (768+1280=2048), text_time additional embedding.
SDXL_UNET = UNetConfig(block_channels=(320, 640, 1280),
                       attention_levels=(False, True, True),
                       transformer_depth=(0, 2, 10), head_dim=64,
                       cross_attention_dim=2048, addition_embed=True,
                       cm_min_seq=4096)
SDXL_VAE = VAEConfig()  # same architecture; weights/scaling differ (0.13025)

TINY_SDXL_UNET = UNetConfig(block_channels=(32, 64), layers_per_block=1,
                            attention_levels=(False, True),
                            transformer_depth=(0, 2), head_dim=16,
                            cross_attention_dim=48, norm_groups=8,
                            addition_embed=True, addition_pooled_dim=24)

# SDXL refiner (stabilityai/stable-diffusion-xl-refiner-1.0): 4 levels with
# attention only in the middle two, depth-4 transformers (mid included —
# hence the explicit mid_depth), 64-wide heads, bigG-only cross-attention
# (1280), and a 5-entry time_ids micro-cond [orig_h, orig_w, crop_top,
# crop_left, aesthetic_score] → add_embed input 1280 + 5·256 = 2560.
SDXL_REFINER_UNET = UNetConfig(block_channels=(384, 768, 1536, 1536),
                               attention_levels=(False, True, True, False),
                               transformer_depth=(0, 4, 4, 0), mid_depth=4,
                               head_dim=64, cross_attention_dim=1280,
                               addition_embed=True, num_time_ids=5)

# Tiny refiner exercises the structure that distinguishes the refiner:
# mid_depth differing from the innermost level's transformer depth.
TINY_REFINER_UNET = UNetConfig(block_channels=(32, 64), layers_per_block=1,
                               attention_levels=(False, True),
                               transformer_depth=(0, 1), mid_depth=2,
                               head_dim=16, cross_attention_dim=24,
                               norm_groups=8, addition_embed=True,
                               addition_pooled_dim=24, num_time_ids=5)

# SD v2.1 (stabilityai/stable-diffusion-2-1): SD1.x layout with 64-wide
# heads (5/10/20/20 per level), 1024-dim OpenCLIP-H cross-attention, and —
# for the 768-v checkpoint — v-prediction
# (SchedulerConfig(prediction_type='v_prediction')). use_linear_projection
# transformer proj weights convert via the 2-D→1×1-conv rule
# (weights/convert.py).
SD21_UNET = UNetConfig(head_dim=64, cross_attention_dim=1024)
SD21_VAE = VAEConfig()
# OpenCLIP ViT-H/14 text tower as shipped in the SD2.x checkpoints: 23 of
# the 24 layers (the checkpoint drops the last layer because SD2 conditions
# on the penultimate representation), GELU MLPs.
OPENCLIP_H_TEXT = CLIPTextConfig(hidden_size=1024, num_layers=23,
                                 num_heads=16, intermediate_size=4096,
                                 activation='gelu')
# OpenCLIP ViT-bigG/14 vision tower (the encoder of the non-vit-h SDXL
# IP-Adapter checkpoints).
OPENCLIP_BIGG_VISION = CLIPVisionConfig(hidden_size=1664, num_layers=48,
                                        num_heads=16, intermediate_size=8192,
                                        projection_dim=1280)
# OpenCLIP ViT-H/14 vision tower (IP-Adapter's image encoder).
OPENCLIP_H_VISION = CLIPVisionConfig(hidden_size=1280, num_layers=32,
                                     num_heads=16, intermediate_size=5120,
                                     projection_dim=1024)
