"""Schema encoding: prompts → embedding stacks + latent-space masks.

Rebuild of composition/embeds.py:28-44 — but where the reference keeps
per-entity python dataclasses consumed by a rect loop, here the schema
encodes directly into a :class:`CompositeGuidance` pytree (stacked entity
embeddings, precomputed masks, blend vector) ready for the compiled loop.

The reference's style interpolation (composition/guide.py:113-120) computes a
progress-blended style embedding but **never feeds it to the UNet**, and its
``progress = steps / step`` ratio is inverted (decreasing over time, >1).
Conscious decision (SURVEY.md §7.6): we implement the *documented* behavior —
style interpolated start→end over normalized progress and actually blended
into the background embedding per step — behind ``style_blend``; setting both
endpoints to 0 disables it (matching the reference's effective behavior).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from flexdiffuse_tpu.composition.schema import Schema
from flexdiffuse_tpu.pipeline.guides import CompositeGuidance, entity_masks


def px_to_block(px: Tuple[int, int], scale: int = 8) -> Tuple[int, int]:
    """Pixel → latent-block coordinates (reference composition/embeds.py:28-29)."""
    return tuple(p // scale for p in px)


def encode_schema(schema: Schema, encoder, latent_hw: Tuple[int, int],
                  guidance_scale: float, cfg: bool = True,
                  style_strength: float = 0.0,
                  scale: int = 8) -> CompositeGuidance:
    """Encode a composition schema into a :class:`CompositeGuidance`.

    Args:
        schema: the composition description.
        encoder: CLIP encoder (``prompt(str) -> [1, T, D]``).
        latent_hw: latent grid size ``(h, w)`` (pixels // 8).
        guidance_scale: CFG scale.
        cfg: enable classifier-free guidance (reference gates on scale > 1).
    """
    bg = encoder.prompt(schema.background_prompt)
    uncond = encoder.prompt('')
    t, d = bg.shape[1], bg.shape[2]
    if schema.entities:
        ents = jnp.concatenate([encoder.prompt(e.prompt)
                                for e in schema.entities])
        rects = [(px_to_block(e.offset, scale), px_to_block(e.size, scale))
                 for e in schema.entities]
        blends = jnp.asarray([e.blend for e in schema.entities], jnp.float32)
    else:
        ents = jnp.zeros((0, t, d), bg.dtype)
        rects = []
        blends = jnp.zeros((0,), jnp.float32)
    masks = entity_masks(rects, latent_hw)
    style_kwargs = {}
    if style_strength and (schema.style_start_prompt
                           or schema.style_end_prompt):
        style_kwargs = dict(
            style_start=encoder.prompt(schema.style_start_prompt),
            style_end=encoder.prompt(schema.style_end_prompt),
            style_range=jnp.asarray(schema.style_blend, jnp.float32),
            style_strength=jnp.float32(style_strength),
        )
    return CompositeGuidance(background=bg, entities=ents, masks=masks,
                             blends=blends, uncond=uncond,
                             guidance_scale=jnp.float32(guidance_scale),
                             cfg=cfg, **style_kwargs)
