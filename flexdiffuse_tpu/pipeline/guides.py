"""Guides as data — conditioning specs for the compiled denoise loop.

The reference injects conditioning through a virtual-method hierarchy
(``GuideBase.noise_pred``, pipeline/guide.py:8-72; ``CompositeGuide``,
composition/guide.py:32-139) called from a Python loop. TPU-native redesign:
a guide is a **pytree of tensors** (embedding stack + blend masks + scales)
plus pure functions — the whole sampling loop jits once, and swapping guide
*parameters* (embeddings, scales, masks) never recompiles; only structural
changes (batch size, entity count, CFG on/off) do.

* :class:`SimpleGuidance` — classifier-free guidance over a ``[B, T, D]``
  conditioning batch (pipeline/guide.py:46-64 semantics).
* :class:`CompositeGuidance` — regional composition: a ``(1+E)``-entry
  embedding stack denoises the same latents, and each entity's noise
  prediction is lerped into its rectangular region of the background
  prediction via precomputed masks — the reference's per-batch, per-entity
  Python rect loop (composition/guide.py:71-87) becomes one vectorized
  ``where``-free mask blend.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array

# noise_fn(latents [N,h,w,4], t [N], context [N,T,D],
#          added=None, ip=None) -> eps [N,h,w,4]
NoiseFn = Callable[..., Array]



def rescale_cfg(eps_cfg: Array, eps_cond: Array, phi: Array) -> Array:
    """CFG rescale (Lin et al. 2023, "Common Diffusion Noise Schedules and
    Sample Steps are Flawed" §3.4): CFG inflates the noise prediction's
    scale, washing out images (worst for zero-SNR v-pred checkpoints);
    rescale it toward the cond prediction's per-sample std and lerp by
    ``phi``. Traced ``phi`` — re-tuning never recompiles. NOTE: callers
    gate this behind the static ``rescale`` flag — even at ``phi=0`` the
    per-row std reductions change the compiled program's fusion/numerics
    across padded batch shapes, which broke row-level reproducibility in
    the serving batcher (round-4 regression, tests/test_serving.py).
    """
    axes = tuple(range(1, eps_cfg.ndim))
    std_c = jnp.std(eps_cond, axis=axes, keepdims=True)
    std_g = jnp.std(eps_cfg, axis=axes, keepdims=True)
    rescaled = eps_cfg * (std_c / (std_g + 1e-8))
    phi = jnp.asarray(phi, eps_cfg.dtype)
    return phi * rescaled + (1.0 - phi) * eps_cfg


def _check_rescale_gate(guide) -> None:
    """Catch the silent-no-op construction: a concrete nonzero
    ``guidance_rescale`` with the static ``rescale`` flag off would never
    be applied (the gate keeps phi=0 graphs reduction-free — see
    :func:`rescale_cfg`). Tracer phis are skipped (can't be value-checked
    at trace time; the runner-level APIs always set the flag)."""
    phi = guide.guidance_rescale
    if guide.rescale or isinstance(phi, jax.core.Tracer):
        return
    try:
        nonzero = float(phi) != 0.0
    except (TypeError, ValueError):
        return
    if nonzero:
        raise ValueError(
            'guidance_rescale is set but the static rescale flag is off — '
            'it would silently never apply. Pass rescale=True alongside '
            'guidance_rescale (runner-level APIs do this automatically).')


class SimpleGuidance(struct.PyTreeNode):
    """CFG conditioning: uncond + per-sample cond embeddings.

    ``embeddings``: ``[B, T, D]`` tweened prompt embeddings.
    ``uncond``: ``[1, T, D]`` empty-prompt embeddings.
    ``guidance_scale``: traced scalar; CFG batching is controlled by the
    static ``cfg`` flag (reference gates on ``guidance > 1``,
    pipeline/guide.py:47).
    """

    embeddings: Array
    uncond: Array
    guidance_scale: Array
    # SDXL text_time conditioning (None for SD1.x): pooled second-encoder
    # embeddings + size/crop micro-conditioning time_ids.
    pooled: Optional[Array] = None
    uncond_pooled: Optional[Array] = None
    time_ids: Optional[Array] = None
    # Refiner CFG: the negative half carries its own time_ids (the
    # aesthetic-score slot differs, 2.5 vs 6.0). None -> same as time_ids.
    uncond_time_ids: Optional[Array] = None
    # Inpainting-checkpoint conditioning (9-channel UNets à la
    # runwayml/stable-diffusion-inpainting): ``[B, h, w, 5]`` = mask (1ch,
    # 1 = repaint) + masked-image latents (4ch), concatenated onto the UNet
    # input every step. None for standard 4-channel models.
    extra_channels: Optional[Array] = None
    # IP-Adapter image-prompt tokens ([1 or B, N, D] projected image tokens;
    # uncond rows use ``ip_uncond`` — conventionally image_proj(zeros)).
    ip_tokens: Optional[Array] = None
    ip_uncond: Optional[Array] = None
    ip_scale: Array = 1.0
    # LCM guidance embedding ([1, time_cond_proj_dim], models/unet.py
    # guidance_scale_embedding): full LCM checkpoints take the guidance
    # scale as a model input; when set, ``cfg`` must be False (the
    # pipeline auto-builds both, pipeline/flex.py).
    timestep_cond: Optional[Array] = None
    cfg: bool = struct.field(pytree_node=False, default=True)
    # CFG interval (Kynkäänniemi et al. 2024, "Applying Guidance in a
    # Limited Interval"): when ``cfg_interval`` is True, classifier-free
    # guidance runs only for denoise progress in [cfg_from, cfg_to]; rows
    # outside run the UNet on the cond half alone (half the batch — the
    # speed win) which equals guidance_scale == 1. The bounds are traced
    # (re-tuning never recompiles); the enable flag is structural. The
    # branch selection lives in the compiled scan (pipeline/flex.py), not
    # here — ``noise_pred`` stays single-path.
    cfg_from: Array = 0.0
    cfg_to: Array = 1.0
    cfg_interval: bool = struct.field(pytree_node=False, default=False)
    # CFG rescale phi (Lin et al. 2023, see rescale_cfg). The phi VALUE is
    # traced (re-tuning never recompiles) but the feature is gated by the
    # static ``rescale`` flag: with it off the graph contains no std
    # reductions, so the compiled program — and its row-level numerics
    # under the serving batcher's padded shapes — is identical to a build
    # that predates the feature.
    guidance_rescale: Array = 0.0
    rescale: bool = struct.field(pytree_node=False, default=False)
    # PAG (Ahn et al. 2024): perturbed-attention guidance. When the static
    # ``pag`` flag is on, the UNet batch grows by one cond-context copy
    # whose rows run with identity self-attention in the UNet's
    # ``pag_layers`` (models/unet.py pag_mask), and the prediction adds
    # ``pag_scale·(eps_cond − eps_perturbed)``. Scale is traced.
    pag_scale: Array = 0.0
    pag: bool = struct.field(pytree_node=False, default=False)

    def __post_init__(self):
        _check_rescale_gate(self)

    @property
    def batch_size(self) -> int:
        return self.embeddings.shape[0]

    def _added(self, n: int, with_uncond: bool, cond_copies: int = 1):
        if self.pooled is None:
            return None
        b = self.batch_size
        pooled = jnp.broadcast_to(self.pooled,
                                  (b,) + self.pooled.shape[1:])
        if cond_copies > 1:
            pooled = jnp.concatenate([pooled] * cond_copies)
        if with_uncond:
            up = jnp.broadcast_to(self.uncond_pooled,
                                  (b,) + self.pooled.shape[1:])
            pooled = jnp.concatenate([up, pooled])
        if with_uncond and self.uncond_time_ids is not None:
            ub = (b, self.time_ids.shape[-1])
            cb = (b * cond_copies, self.time_ids.shape[-1])
            tids = jnp.concatenate(
                [jnp.broadcast_to(self.uncond_time_ids, ub),
                 jnp.broadcast_to(self.time_ids, cb)])
        else:
            tids = jnp.broadcast_to(self.time_ids,
                                    (n, self.time_ids.shape[-1]))
        return {'text_embeds': pooled, 'time_ids': tids}

    def _with_extra(self, latents: Array) -> Array:
        if self.extra_channels is None:
            return latents
        extra = jnp.broadcast_to(
            self.extra_channels,
            latents.shape[:3] + (self.extra_channels.shape[-1],))
        return jnp.concatenate([latents, extra.astype(latents.dtype)],
                               axis=-1)

    def _ip(self, b: int, with_uncond: bool, cond_copies: int = 1):
        if self.ip_tokens is None:
            return None
        shape = (b,) + self.ip_tokens.shape[1:]
        cond = jnp.broadcast_to(self.ip_tokens, shape)
        if cond_copies > 1:
            cond = jnp.concatenate([cond] * cond_copies)
        if with_uncond:
            unc = (jnp.broadcast_to(self.ip_uncond, shape)
                   if self.ip_uncond is not None else jnp.zeros(shape))
            cond = jnp.concatenate([unc, cond])
        return (cond, self.ip_scale)

    def _tcond(self, n: int):
        if self.timestep_cond is None:
            return None
        return jnp.broadcast_to(self.timestep_cond,
                                (n,) + self.timestep_cond.shape[1:])

    def noise_pred(self, noise_fn: NoiseFn, latents: Array, t: Array,
                   progress: Array = 0.0) -> Array:
        del progress
        b = self.batch_size
        if self.pag:
            return self._noise_pred_pag(noise_fn, latents, t)
        if not self.cfg:
            return noise_fn(self._with_extra(latents),
                            jnp.broadcast_to(t, (b,)), self.embeddings,
                            self._added(b, False), self._ip(b, False),
                            self._tcond(b))
        ctx = jnp.concatenate(
            [jnp.broadcast_to(self.uncond,
                              self.embeddings.shape), self.embeddings])
        lat_in = self._with_extra(latents)
        lat2 = jnp.concatenate([lat_in, lat_in])
        eps = noise_fn(lat2, jnp.broadcast_to(t, (2 * b,)), ctx,
                       self._added(2 * b, True), self._ip(b, True),
                       self._tcond(2 * b))
        eps_u, eps_c = jnp.split(eps, 2)
        out = eps_u + self.guidance_scale * (eps_c - eps_u)
        if self.rescale:
            out = rescale_cfg(out, eps_c, self.guidance_rescale)
        return out

    def _noise_pred_pag(self, noise_fn: NoiseFn, latents: Array,
                        t: Array) -> Array:
        """Perturbed-attention guidance: one extra cond-context batch row
        per sample runs with identity self-attention in the UNet's
        ``pag_layers`` (selected by the ``pag_mask`` row vector the UNet
        threads to its transformers), and the prediction gains
        ``pag_scale·(eps_cond − eps_perturbed)`` — with CFG the batch is
        ``[uncond; cond; perturbed]`` (published PAG+CFG combination),
        without it ``[cond; perturbed]``."""
        b = self.batch_size
        lat_in = self._with_extra(latents)
        cond = self.embeddings
        if self.cfg:
            ctx = jnp.concatenate(
                [jnp.broadcast_to(self.uncond, cond.shape), cond, cond])
            n = 3 * b
            mask = jnp.concatenate(
                [jnp.zeros((2 * b,), jnp.float32),
                 jnp.ones((b,), jnp.float32)])
            eps = noise_fn(jnp.concatenate([lat_in] * 3),
                           jnp.broadcast_to(t, (n,)), ctx,
                           self._added(n, True, cond_copies=2),
                           self._ip(b, True, cond_copies=2),
                           self._tcond(n), pag_mask=mask)
            eps_u, eps_c, eps_p = jnp.split(eps, 3)
            out = (eps_u + self.guidance_scale * (eps_c - eps_u) +
                   self.pag_scale * (eps_c - eps_p))
            if self.rescale:
                out = rescale_cfg(out, eps_c, self.guidance_rescale)
            return out
        ctx = jnp.concatenate([cond, cond])
        n = 2 * b
        mask = jnp.concatenate(
            [jnp.zeros((b,), jnp.float32), jnp.ones((b,), jnp.float32)])
        eps = noise_fn(jnp.concatenate([lat_in, lat_in]),
                       jnp.broadcast_to(t, (n,)), ctx,
                       self._added(n, False, cond_copies=2),
                       self._ip(b, False, cond_copies=2),
                       self._tcond(n), pag_mask=mask)
        eps_c, eps_p = jnp.split(eps, 2)
        out = eps_c + self.pag_scale * (eps_c - eps_p)
        if self.rescale:
            out = rescale_cfg(out, eps_c, self.guidance_rescale)
        return out


class InstructPix2PixGuidance(struct.PyTreeNode):
    """Dual text/image classifier-free guidance for InstructPix2Pix
    (Brooks et al. 2023) edit checkpoints — 8-channel UNets conditioned on
    the *unnoised* input-image latents as extra input channels.

    Three rows per sample ride one UNet call: ``[uncond (empty text, zero
    image); image (empty text, image latents); full (text, image
    latents)]``, and the prediction combines both guidance directions::

        eps = eps_u + s_img·(eps_i − eps_u) + s_txt·(eps_f − eps_i)

    ``image_latents`` are the VAE posterior MODE (mean), **unscaled** —
    the published IP2P checkpoints were trained on unscaled latents (the
    diffusers pipeline's prepare_image_latents does the same). Both
    scales are traced: re-tuning never recompiles.
    """

    embeddings: Array                    # [B, T, D] edit-instruction embeds
    uncond: Array                        # [1, T, D] empty/negative prompt
    image_latents: Array                 # [1 or B, h, w, 4], unscaled mode
    guidance_scale: Array                # s_txt (diffusers default 7.5)
    image_guidance_scale: Array          # s_img (diffusers default 1.5)
    guidance_rescale: Array = 0.0        # traced phi; gated by `rescale`
    rescale: bool = struct.field(pytree_node=False, default=False)

    def __post_init__(self):
        _check_rescale_gate(self)

    @property
    def batch_size(self) -> int:
        return self.embeddings.shape[0]

    def noise_pred(self, noise_fn: NoiseFn, latents: Array, t: Array,
                   progress: Array = 0.0) -> Array:
        del progress
        b = self.batch_size
        img = jnp.broadcast_to(
            self.image_latents,
            latents.shape[:3] + (self.image_latents.shape[-1],)).astype(
                latents.dtype)
        # Scheduler input scaling was applied to `latents` by the caller;
        # the image-conditioning channels stay unscaled (IP2P semantics).
        lat3 = jnp.concatenate([
            jnp.concatenate([latents, jnp.zeros_like(img)], axis=-1),
            jnp.concatenate([latents, img], axis=-1),
            jnp.concatenate([latents, img], axis=-1),
        ])
        unc = jnp.broadcast_to(self.uncond, self.embeddings.shape)
        ctx = jnp.concatenate([unc, unc, self.embeddings])
        eps = noise_fn(lat3, jnp.broadcast_to(t, (3 * b,)), ctx)
        eps_u, eps_i, eps_f = jnp.split(eps, 3)
        out = (eps_u + self.image_guidance_scale * (eps_i - eps_u) +
               self.guidance_scale * (eps_f - eps_i))
        if self.rescale:
            out = rescale_cfg(out, eps_f, self.guidance_rescale)
        return out


def prompt_guidance(encoder, prompt, guidance_scale: float) -> SimpleGuidance:
    """Convenience: build CFG guidance straight from a prompt (reference
    ``PromptGuide`` pipeline/guide.py:67-72)."""
    return SimpleGuidance(embeddings=encoder.prompt(prompt),
                          uncond=encoder.prompt(''),
                          guidance_scale=jnp.float32(guidance_scale),
                          cfg=guidance_scale > 1.0)


def entity_masks(entities: Sequence[Tuple[Tuple[int, int], Tuple[int, int]]],
                 latent_hw: Tuple[int, int]) -> Array:
    """Rect masks ``[E, h, w, 1]`` from (offset_blocks, size_blocks) pairs.

    Precomputed host-side once per schema; px→block conversion (//8) happens
    in :mod:`flexdiffuse_tpu.composition.embeds`.
    """
    h, w = latent_hw
    masks = []
    for (ox, oy), (sx, sy) in entities:
        m = jnp.zeros((h, w, 1), jnp.float32)
        m = m.at[oy:oy + sy, ox:ox + sx].set(1.0)
        masks.append(m)
    if not masks:
        return jnp.zeros((0, h, w, 1), jnp.float32)
    return jnp.stack(masks)


class CompositeGuidance(struct.PyTreeNode):
    """Regional composition conditioning (composition/guide.py semantics).

    ``background``: ``[1, T, D]``; ``entities``: ``[E, T, D]``;
    ``masks``: ``[E, h, w, 1]``; ``blends``: ``[E]`` per-entity strengths.
    The batch replicates latents across ``1 (uncond) + 1 (bg) + E`` contexts,
    runs ONE UNet call, then composites (reference composition/guide.py:58-95,
    with CFG applied after regional blending).
    """

    background: Array
    entities: Array
    masks: Array
    blends: Array
    uncond: Array
    guidance_scale: Array
    # Style interpolation start→end over denoise progress. The reference
    # computes this embedding every step but never feeds it to the UNet
    # (composition/guide.py:113-121, and its progress ratio is inverted);
    # we implement the documented intent behind `style_strength` — default 0
    # keeps reference-faithful behavior (SURVEY.md §7.6 keep/fix decision).
    style_start: Optional[Array] = None
    style_end: Optional[Array] = None
    style_range: Optional[Array] = None      # [2]: blend at p=0 and p=1
    style_strength: Array = 0.0
    # SDXL text_time conditioning (None for SD1.x): pooled embeds per stack
    # row ([1+E, D]: background first, then entities) + micro-cond time_ids.
    pooled_stack: Optional[Array] = None
    uncond_pooled: Optional[Array] = None
    time_ids: Optional[Array] = None
    cfg: bool = struct.field(pytree_node=False, default=True)
    # CFG interval (see SimpleGuidance): outside [cfg_from, cfg_to] the
    # uncond row is dropped from the stack (n = 1+E instead of 2+E).
    # Incompatible with DeepCache (the cached stack rows interleave per
    # batch item — pipeline/flex.py validates).
    cfg_from: Array = 0.0
    cfg_to: Array = 1.0
    cfg_interval: bool = struct.field(pytree_node=False, default=False)
    # CFG rescale phi (Lin et al. 2023, see rescale_cfg); traced phi value,
    # statically gated by `rescale` (see SimpleGuidance note).
    guidance_rescale: Array = 0.0
    rescale: bool = struct.field(pytree_node=False, default=False)

    def __post_init__(self):
        _check_rescale_gate(self)

    @property
    def batch_size(self) -> int:
        return 1

    @property
    def num_entities(self) -> int:
        return self.entities.shape[0]

    def _added(self, b: int, n: int):
        if self.pooled_stack is None:
            return None
        rows = [self.pooled_stack]
        if self.cfg:
            rows = [self.uncond_pooled] + rows
        pooled = jnp.tile(jnp.concatenate(rows), (b, 1))
        tids = jnp.broadcast_to(self.time_ids,
                                (b * n, self.time_ids.shape[-1]))
        return {'text_embeds': pooled, 'time_ids': tids}

    def noise_pred(self, noise_fn: NoiseFn, latents: Array, t: Array,
                   progress: Array = 0.0) -> Array:
        e = self.num_entities
        background = self.background
        if self.style_start is not None:
            mix = self.style_range[0] + progress * (self.style_range[1] -
                                                    self.style_range[0])
            style = self.style_start + (self.style_end -
                                        self.style_start) * mix
            background = background + self.style_strength * (style -
                                                             background)
        stack = [background, self.entities]
        if self.cfg:
            stack = [self.uncond] + stack
        ctx = jnp.concatenate(stack)                     # [(cfg)+1+E, T, D]
        n = ctx.shape[0]
        # Batch-general (multi-seed composition sweeps, parallel/sweep.py):
        # each latent row denoises against the whole context stack — row-
        # major [b0·ctx0..b0·ctxN, b1·ctx0, ...] so one UNet call covers all.
        b = latents.shape[0]
        lat = jnp.repeat(latents, n, axis=0)             # [B·n, h, w, 4]
        eps = noise_fn(lat, jnp.broadcast_to(t, (b * n,)),
                       jnp.tile(ctx, (b, 1, 1)), self._added(b, n))
        eps = eps.reshape((b, n) + eps.shape[1:])        # [B, n, h, w, 4]

        off = 1 if self.cfg else 0
        bg = eps[:, off]                                 # [B, h, w, 4]
        # Sequential entity composition (declaration order matters for
        # overlapping rects — reference composition/guide.py:76-87).
        for i in range(e):
            ent = eps[:, off + 1 + i]
            m = self.masks[i][None]                      # [1, h, w, 1]
            bg = bg + m * self.blends[i] * (ent - bg)
        if self.cfg:
            uncond = eps[:, 0]
            cond = bg
            bg = uncond + self.guidance_scale * (bg - uncond)
            if self.rescale:
                bg = rescale_cfg(bg, cond, self.guidance_rescale)
        return bg
