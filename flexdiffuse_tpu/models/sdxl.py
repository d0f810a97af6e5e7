"""SDXL backbone assembly — dual text encoders, conditioning, loading.

The BASELINE.md stretch target ("SDXL backbone + batched multi-seed guidance
sweep"). Everything reuses the generalized building blocks:
:class:`UNet2DCondition` with ``SDXL_UNET`` geometry (verified: exactly
2,567,463,684 params), the same :class:`AutoencoderKL` (SDXL scaling
0.13025), and :class:`CLIPTextModel` in its penultimate/pooled output modes.

Conditioning layout (matching stabilityai/stable-diffusion-xl-base-1.0):

* context = concat(encoder-1 penultimate [77, 768],
  encoder-2 penultimate [77, 1280]) → ``[77, 2048]``;
* added cond = encoder-2 pooled projection [1280] + time_ids
  ``[orig_h, orig_w, crop_top, crop_left, target_h, target_w]``.

FlexDiffuse image guidance composes naturally: the tween blends CLIP-L image
patches into the *encoder-1 slice* of the context (the 768-d half), leaving
the bigG half untouched — the same embedding-manipulation API on an SDXL
backbone.
"""
from __future__ import annotations

import os
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from flexdiffuse_tpu.models.clip import CLIPTextModel
from flexdiffuse_tpu.models.configs import (CLIP_VIT_L14_TEXT,
                                            OPENCLIP_BIGG_TEXT,
                                            SDXL_REFINER_UNET, SDXL_UNET,
                                            SDXL_VAE)

Array = jax.Array

SDXL_LATENT_SCALE = 0.13025
# SDXL's second tokenizer pads with '!' (id 0), not EOS.
PAD_ID_2 = 0


class SDXLTextEncoder:
    """Dual-encoder prompt encoding: ``encode() -> (ctx [B,77,2048],
    pooled [B,1280])``."""

    def __init__(self, enc1: CLIPTextModel, enc1_params, enc2: CLIPTextModel,
                 enc2_params, tokenizer) -> None:
        self.tokenizer = tokenizer
        self._apply1 = jax.jit(enc1.apply, static_argnames=('output',))
        self._apply2 = jax.jit(enc2.apply, static_argnames=('output',))
        self._p1 = enc1_params
        self._p2 = enc2_params

    def encode(self, prompt: Union[str, List[str]]) -> Tuple[Array, Array]:
        ids1 = jnp.asarray(self.tokenizer(prompt))
        ids2 = jnp.asarray(self.tokenizer(prompt, pad_id=PAD_ID_2))
        h1 = self._apply1(self._p1, ids1, output='penultimate')
        h2, pooled = self._apply2(self._p2, ids2,
                                  output='penultimate_and_pooled')
        return jnp.concatenate([h1, h2], axis=-1), pooled

    def prompt(self, prompt: Union[str, List[str]]) -> Array:
        """Context-only convenience (matches the CLIPEncoder contract)."""
        return self.encode(prompt)[0]

    def encode_l(self, prompt: Union[str, List[str]]) -> Array:
        """Encoder-1 (CLIP-L) penultimate states only ``[B, 77, 768]`` —
        the space text *guides* tween in (the bigG half has no comparable
        guide embedding)."""
        ids1 = jnp.asarray(self.tokenizer(prompt))
        return self._apply1(self._p1, ids1, output='penultimate')

    def encode_refiner(self, prompt: Union[str, List[str]]
                       ) -> Tuple[Array, Array]:
        """Refiner conditioning: encoder-2 (bigG) ONLY —
        ``(ctx [B, 77, 1280], pooled [B, 1280])``. The refiner UNet has no
        CLIP-L half (cross_attention_dim 1280)."""
        ids2 = jnp.asarray(self.tokenizer(prompt, pad_id=PAD_ID_2))
        return self._apply2(self._p2, ids2,
                            output='penultimate_and_pooled')


def time_ids(original_size: Tuple[int, int] = (1024, 1024),
             crop: Tuple[int, int] = (0, 0),
             target_size: Tuple[int, int] = (1024, 1024)) -> Array:
    """SDXL micro-conditioning ids ``[1, 6]``."""
    return jnp.asarray([[*original_size, *crop, *target_size]], jnp.float32)


def refiner_time_ids(original_size: Tuple[int, int] = (1024, 1024),
                     crop: Tuple[int, int] = (0, 0),
                     aesthetic_score: float = 6.0) -> Array:
    """Refiner micro-conditioning ids ``[1, 5]`` — the target-size pair is
    replaced by the SGM aesthetic score (add_embed input 1280 + 5·256)."""
    return jnp.asarray([[*original_size, *crop, aesthetic_score]],
                       jnp.float32)


def sdxl_refiner_guidance(encoder: SDXLTextEncoder,
                          prompt: Union[str, List[str]],
                          negative_prompt: str = '',
                          guidance_scale: float = 5.0,
                          size: Tuple[int, int] = (1024, 1024),
                          aesthetic_score: float = 6.0,
                          negative_aesthetic_score: float = 2.5):
    """:class:`SimpleGuidance` for the refiner UNet: bigG-only context +
    pooled, aesthetic-score time_ids (positive/negative scores follow the
    stabilityai defaults: 6.0 / 2.5)."""
    from flexdiffuse_tpu.pipeline.guides import SimpleGuidance
    ctx, pooled = encoder.encode_refiner(prompt)
    unc_ctx, unc_pooled = encoder.encode_refiner(negative_prompt or '')
    return SimpleGuidance(
        embeddings=ctx, uncond=unc_ctx[:1],
        guidance_scale=jnp.float32(guidance_scale),
        pooled=pooled, uncond_pooled=unc_pooled[:1],
        time_ids=refiner_time_ids(size, (0, 0), aesthetic_score),
        uncond_time_ids=refiner_time_ids(size, (0, 0),
                                         negative_aesthetic_score),
        cfg=guidance_scale > 1.0)


def sdxl_guidance(encoder: SDXLTextEncoder,
                  prompt: Union[str, List[str]],
                  negative_prompt: str = '',
                  guidance_scale: float = 5.0,
                  size: Tuple[int, int] = (1024, 1024),
                  embeddings: Optional[Array] = None):
    """Build :class:`SimpleGuidance` for the SDXL UNet.

    ``embeddings`` may override the context (e.g. a FlexDiffuse-tweened
    ``[B, 77, 2048]`` stack) while pooled conditioning still comes from the
    raw prompts.
    """
    from flexdiffuse_tpu.pipeline.guides import SimpleGuidance
    ctx, pooled = encoder.encode(prompt)
    if embeddings is not None:
        ctx = embeddings
    unc_ctx, unc_pooled = encoder.encode(negative_prompt or '')
    return SimpleGuidance(
        embeddings=ctx, uncond=unc_ctx[:1],
        guidance_scale=jnp.float32(guidance_scale),
        pooled=pooled, uncond_pooled=unc_pooled[:1],
        time_ids=time_ids(size, (0, 0), size),
        cfg=guidance_scale > 1.0)


def encode_schema_sdxl(schema, encoder: SDXLTextEncoder,
                       latent_hw: Tuple[int, int], guidance_scale: float,
                       size: Tuple[int, int] = (1024, 1024),
                       cfg: bool = True, style_strength: float = 0.0,
                       scale: int = 8):
    """Encode a composition :class:`~flexdiffuse_tpu.composition.Schema` for
    the SDXL backbone: dual-encoder contexts per row plus per-row pooled
    conditioning.

    Deliberately mirrors :func:`flexdiffuse_tpu.composition.embeds.
    encode_schema` — keep the two in sync when changing schema-encoding
    semantics (the SD1.x path returns no pooled embeddings, which is the
    structural difference that keeps them separate).
    """
    from flexdiffuse_tpu.composition.embeds import px_to_block
    from flexdiffuse_tpu.pipeline.guides import (CompositeGuidance,
                                                 entity_masks)
    bg_ctx, bg_pooled = encoder.encode(schema.background_prompt)
    unc_ctx, unc_pooled = encoder.encode('')
    t, d = bg_ctx.shape[1], bg_ctx.shape[2]
    if schema.entities:
        pairs = [encoder.encode(e.prompt) for e in schema.entities]
        ents = jnp.concatenate([p[0] for p in pairs])
        ent_pooled = jnp.concatenate([p[1] for p in pairs])
        rects = [(px_to_block(e.offset, scale), px_to_block(e.size, scale))
                 for e in schema.entities]
        blends = jnp.asarray([e.blend for e in schema.entities], jnp.float32)
    else:
        ents = jnp.zeros((0, t, d), bg_ctx.dtype)
        ent_pooled = jnp.zeros((0, bg_pooled.shape[-1]), bg_pooled.dtype)
        rects = []
        blends = jnp.zeros((0,), jnp.float32)
    style_kwargs = {}
    if style_strength and (schema.style_start_prompt
                           or schema.style_end_prompt):
        style_kwargs = dict(
            style_start=encoder.encode(schema.style_start_prompt)[0],
            style_end=encoder.encode(schema.style_end_prompt)[0],
            style_range=jnp.asarray(schema.style_blend, jnp.float32),
            style_strength=jnp.float32(style_strength),
        )
    return CompositeGuidance(
        background=bg_ctx, entities=ents,
        masks=entity_masks(rects, latent_hw), blends=blends,
        uncond=unc_ctx, guidance_scale=jnp.float32(guidance_scale),
        pooled_stack=jnp.concatenate([bg_pooled, ent_pooled]),
        uncond_pooled=unc_pooled, time_ids=time_ids(size, (0, 0), size),
        cfg=cfg, **style_kwargs)


def tween_sdxl_context(tweener, ctx: Array, patch_embeddings: Array,
                       l_dim: int = 768) -> Array:
    """Apply FlexDiffuse image-guidance tweening to the CLIP-L half of an
    SDXL context (the ``l_dim``-d slice patch embeddings are comparable
    with); the bigG half is left untouched. Batched contexts tween each row
    independently (mirrors Guide.embeds' per-prompt loop for SD1.x)."""
    l_half = ctx[..., :l_dim]
    if ctx.ndim == 3:
        blended = jnp.stack([
            tweener.tween(l_half[i], patch_embeddings)
            for i in range(ctx.shape[0])
        ])
    else:
        blended = tweener.tween(l_half, patch_embeddings)
    return ctx.at[..., :l_dim].set(blended.astype(ctx.dtype))


def load_sdxl(model_dir: str, dtype=jnp.bfloat16, unet_config=SDXL_UNET,
              vae_config=SDXL_VAE, te1_config=CLIP_VIT_L14_TEXT,
              te2_config=OPENCLIP_BIGG_TEXT):
    """Load an ``stable-diffusion-xl-base-1.0`` snapshot dir.

    Returns ``(unet, unet_params, vae, vae_params, text_encoder)`` ready for
    ``FlexPipeline(..., latent_scale=SDXL_LATENT_SCALE)``. Config overrides
    exist for tiny-geometry end-to-end tests of this exact loading path.
    """
    from flexdiffuse_tpu.models.unet import UNet2DCondition
    from flexdiffuse_tpu.models.vae import AutoencoderKL
    from flexdiffuse_tpu.text.tokenizer import CLIPTokenizer
    from flexdiffuse_tpu.weights import convert, load as wload

    unet_sd = wload.load_state_dict(os.path.join(model_dir, 'unet'))
    vae_sd = wload.load_state_dict(os.path.join(model_dir, 'vae'))
    te1_sd = wload.load_state_dict(os.path.join(model_dir, 'text_encoder'))
    te2_sd = wload.load_state_dict(os.path.join(model_dir, 'text_encoder_2'))

    unet = UNet2DCondition(unet_config, dtype=dtype)
    vae = AutoencoderKL(vae_config, dtype=dtype)
    enc1 = CLIPTextModel(te1_config, dtype=dtype)
    enc2 = CLIPTextModel(te2_config, dtype=dtype)
    tokenizer = CLIPTokenizer.from_dir(model_dir)

    unet_params = {'params': convert.convert_unet(unet_sd, unet_config)}
    vae_params = {'params': convert.convert_vae(vae_sd, vae_config)}
    p1 = {'params': convert.convert_clip_text(te1_sd, te1_config)}
    p2 = {'params': convert.convert_clip_text(te2_sd, te2_config)}
    text_encoder = SDXLTextEncoder(enc1, p1, enc2, p2, tokenizer)
    return unet, unet_params, vae, vae_params, text_encoder


def load_sdxl_refiner(model_dir: str, dtype=jnp.bfloat16,
                      unet_config=SDXL_REFINER_UNET):
    """Load the UNet of a ``stable-diffusion-xl-refiner-1.0`` snapshot.

    Returns ``(unet, unet_params)`` — the refiner shares the base
    snapshot's VAE and bigG text encoder (same weights in both repos), so
    :class:`~flexdiffuse_tpu.sdxl_runner.SDXLRunner` only needs the extra
    UNet.
    """
    from flexdiffuse_tpu.models.unet import UNet2DCondition
    from flexdiffuse_tpu.weights import convert, load as wload

    unet_sd = wload.load_state_dict(os.path.join(model_dir, 'unet'))
    unet = UNet2DCondition(unet_config, dtype=dtype)
    return unet, {'params': convert.convert_unet(unet_sd, unet_config)}
