"""FlexPipeline — the compiled txt2img / img2img denoising pipeline.

TPU-native rebuild of the reference's ``FlexPipeline``
(pipeline/flex.py:126-310). The reference drives a Python loop of UNet calls
through diffusers scheduler objects; here the **entire sampling loop is one
``lax.scan`` inside one jit** (UNet + CFG + scheduler update fused into a
single XLA program):

* ``t_start`` (img2img strength) is a *traced* scalar — the scan always runs
  the full static length and gates skipped steps with ``lax.cond`` (XLA
  ``Conditional`` executes only the taken branch, so skipped steps cost
  ~nothing and changing strength never recompiles).
* Guides are data (:mod:`flexdiffuse_tpu.pipeline.guides`), not virtual
  methods: new embeddings/scales/masks re-run the same executable.
* RNG is ``jax.random`` key-splitting; torch-bitwise parity is impossible by
  construction (different generators) — parity targets are distributional
  (BASELINE.md).
* Attention slicing (reference pipeline/flex.py:85-110) is replaced by the
  Pallas flash-attention kernel; the toggles remain as no-ops for API parity.

Latent layout is NHWC (TPU conv-native). The 0.18215 VAE latent scale
matches pipeline/flex.py:117,192.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from flexdiffuse_tpu import schedulers
from flexdiffuse_tpu.config import LATENT_SCALE
from flexdiffuse_tpu.pipeline.guides import CompositeGuidance, SimpleGuidance
from flexdiffuse_tpu.utils.image import preprocess, to_pil

Array = jax.Array
Guidance = Union[SimpleGuidance, CompositeGuidance]


@dataclasses.dataclass
class FlexPipelineOutput:
    """Mirror of StableDiffusionPipelineOutput (NSFW detection hardcoded
    False, reference pipeline/flex.py:308-310)."""
    images: Union[List[Image.Image], np.ndarray]
    nsfw_content_detected: List[bool]

    def __getitem__(self, key):
        # The reference Runner reads output['sample'] (utils.py:102), a
        # field diffusers had already renamed to `images` — honor both.
        if key in ('images', 'sample'):
            return self.images
        if key == 'nsfw_content_detected':
            return self.nsfw_content_detected
        raise KeyError(key)


def prepare_latent_mask(mask, latent_hw) -> Array:
    """Pixel/latent-space inpainting mask → ``[B, h, w, 1]`` latent grid.

    1 = regenerate, 0 = keep. Accepts PIL, (H, W), (H, W, C), (B, H, W) or
    (B, H, W, C); RGB collapses to luminance-mean; pixel-space maps resize
    linearly to the latent grid.
    """
    if isinstance(mask, Image.Image):
        mask = np.asarray(mask.convert('L'), np.float32) / 255.0
    m = jnp.asarray(mask, jnp.float32)
    if m.ndim == 2:
        m = m[None, :, :, None]
    elif m.ndim == 3:
        # Disambiguate (H, W, C) from (B, H, W): a trailing dim of
        # 1/3/4 is a channel axis, anything else a batch-leading
        # grayscale mask.
        if m.shape[-1] in (1, 3, 4):
            m = m[None]                # (H, W, C) → (1, H, W, C)
        else:
            m = m[:, :, :, None]       # (B, H, W) → (B, H, W, 1)
    if m.shape[-1] > 1:                # RGB(A) masks → single channel
        m = jnp.mean(m[..., :3], axis=-1, keepdims=True)
    h, w = latent_hw
    if m.shape[1:3] != (h, w):  # pixel-space → latent grid
        m = jax.image.resize(m, (m.shape[0], h, w, m.shape[-1]),
                             method='linear')
    return jnp.clip(m, 0.0, 1.0)


def upscale_latents(latents: Array, scale: float,
                    method: str = 'bilinear') -> Array:
    """Latent-space upscale (the A1111 'Latent' highres-fix mode): resize
    final latents for a follow-on img2img refinement pass (``FlexPipeline(
    init_latents=...)``). New latent dims snap down to /8 so the UNet's
    three 2× downsamples stay even (pixel dims stay /64, matching
    utils/image.py preprocess)."""
    if scale <= 1.0:
        raise ValueError(f'hires scale must be > 1, got {scale}')
    b, h, w, c = latents.shape
    nh = max(8, (int(h * scale) // 8) * 8)
    nw = max(8, (int(w * scale) // 8) * 8)
    return jax.image.resize(latents.astype(jnp.float32), (b, nh, nw, c),
                            method=method)


class FlexPipeline:
    """Holds models + params and compiles the full generation program.

    Args:
        unet / unet_params: a :class:`UNet2DCondition` and its params.
        vae / vae_params: an :class:`AutoencoderKL` and its params.
        scheduler: 'ddim' | 'pndm' | 'lms' (reference supports the same trio).
    """

    def __init__(self, unet, unet_params, vae, vae_params,
                 scheduler: str = 'pndm',
                 scheduler_config: Optional[schedulers.SchedulerConfig] = None,
                 latent_scale: float = LATENT_SCALE,
                 sp_mesh=None, sp_axis: str = 'seq',
                 sp_min_seq: int = 4096,
                 controlnet=None, controlnet_params=None,
                 vae_tile: int = 0, vae_tile_overlap: int = 8,
                 deepcache: int = 0) -> None:
        """``sp_mesh`` (a :class:`jax.sharding.Mesh`) enables sequence-
        parallel generation: latent rows shard over ``sp_axis``, convs/norms
        partition via GSPMD (halo exchanges/psums inserted by XLA), and
        self-attention with ≥ ``sp_min_seq`` tokens rides ring attention
        (ops/ring_attention.py) — the ≥1024² multi-chip mode. Build one
        pipeline instance per mode; each instance owns its compiled programs.
        """
        from flexdiffuse_tpu.utils.params import (cast_for_module,
                                                  product_compiler_options)
        copts = product_compiler_options()
        if sp_mesh is not None:
            # Sequence parallelism partitions the standard NHWC/[B,S,C]
            # orientation (GSPMD halo/ring rules); the channel-major
            # interior is a single-chip layout optimization — force it off.
            if getattr(unet, 'channel_major', False) is not False:
                unet = unet.clone(channel_major=False)
            if (controlnet is not None and
                    getattr(controlnet, 'channel_major', False) is not False):
                controlnet = controlnet.clone(channel_major=False)
            if getattr(unet, 'tome', None) is not None:
                # The ToMe merge plan gathers tokens across the full
                # sequence; under SP the sequence is row-sharded — a
                # global top-r gather would defeat the sharding.
                raise ValueError('ToMe (unet.tome) is incompatible with '
                                 'sequence parallelism — disable one')
        self.unet = unet
        # Matmul/conv params pre-cast to the module's compute dtype:
        # bit-identical to flax's per-use promote_dtype cast, but done once
        # instead of every scan step (and halves weight HBM). fp32-compute
        # modules (CPU tests) pass through untouched (utils/params.py).
        self.unet_params = cast_for_module(unet_params, unet)
        self.vae = vae
        self.vae_params = cast_for_module(vae_params, vae)
        self.scheduler_kind = scheduler
        self.scheduler_config = scheduler_config
        self._schedules: dict = {}
        self.latent_channels = vae.config.latent_channels
        self.vae_scale = 2**(len(vae.config.block_channels) - 1)
        self.latent_scale = latent_scale
        self.sp_mesh = sp_mesh
        self.sp_axis = sp_axis
        self.sp_min_seq = sp_min_seq
        # Tiled VAE (ops/tiled_vae.py): decode/encode in `vae_tile`-latent-
        # unit tiles with cross-faded overlaps when the canvas exceeds one
        # tile — bounds VAE activation memory for very large images. Off by
        # default; ignored under SP (row sharding already splits memory).
        self.vae_tile = int(vae_tile)
        self.vae_tile_overlap = int(vae_tile_overlap)
        if self.vae_tile and self.vae_tile_overlap >= self.vae_tile:
            raise ValueError('vae_tile_overlap must be < vae_tile')
        # DeepCache (Ma et al. 2023): every `deepcache`-th active row runs
        # the full UNet and saves the deep feature; rows in between
        # recompute only the shallow levels around the cached feature
        # (models/unet.py cache_mode). 0/1 = off/every-row-full (identical
        # outputs); 2-3 = the published quality/speed sweet spot.
        self.deepcache = int(deepcache)
        if self.deepcache < 0:
            raise ValueError('deepcache interval must be >= 0')
        self.controlnet = controlnet
        self.controlnet_params = cast_for_module(controlnet_params,
                                                 controlnet)
        controlnet_apply = controlnet.apply if controlnet is not None \
            else None

        unet_apply = unet.apply
        vae_apply = vae.apply
        latent_scale = self.latent_scale
        latent_channels = self.latent_channels

        if sp_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            from flexdiffuse_tpu.ops import attention as _attn_mod
            row_sharding = NamedSharding(
                sp_mesh, PartitionSpec(None, sp_axis, None, None))
            base_unet_apply = unet_apply

            def unet_apply(params, lat, t, ctx, added=None, control=None,
                           ip_ctx=None, ip_scale=1.0, timestep_cond=None,
                           deep_cache=None, cache_mode='off',
                           pag_mask=None):
                lat = jax.lax.with_sharding_constraint(lat, row_sharding)
                with _attn_mod.sp_context(sp_mesh, sp_axis, sp_min_seq):
                    return base_unet_apply(params, lat, t, ctx, added,
                                           control, ip_ctx, ip_scale,
                                           timestep_cond,
                                           deep_cache=deep_cache,
                                           cache_mode=cache_mode,
                                           pag_mask=pag_mask)

            self._sp_sharding = row_sharding

        deepcache = self.deepcache

        @functools.partial(jax.jit, static_argnames=('debug', 'inpaint'),
                           compiler_options=copts)
        def _sample(unet_params, schedule, state0, guidance, latents,
                    t_start, eta, key, init_latents=None, mask=None,
                    control_cond=None, cn_params=None, cn_scale=1.0,
                    debug=False, inpaint=False):
            def _noise(lat, t, ctx, added, ip, tcond, mode='off',
                       cache_in=None, pag_mask=None):
                control = None
                if control_cond is not None:
                    # ControlNet branch: the control net sees only the noisy
                    # latent channels (diffusers semantics) — a 9-channel
                    # inpaint UNet's mask/masked-image extras are stripped —
                    # plus the conditioning image (CFG rows share it). The
                    # control branch is never perturbed (PAG applies to the
                    # main UNet's self-attention only, diffusers-consistent).
                    cond = jnp.broadcast_to(
                        control_cond,
                        (lat.shape[0],) + control_cond.shape[1:])
                    control = controlnet_apply(
                        cn_params, lat[..., :latent_channels], t, ctx, cond,
                        cn_scale)
                ip_ctx, ip_scale = ip if ip is not None else (None, 1.0)
                return unet_apply(unet_params, lat, t, ctx, added, control,
                                  ip_ctx, ip_scale, tcond,
                                  deep_cache=cache_in, cache_mode=mode,
                                  pag_mask=pag_mask)

            def noise_fn(lat, t, ctx, added=None, ip=None, tcond=None,
                         pag_mask=None):
                return _noise(lat, t, ctx, added, ip, tcond,
                              pag_mask=pag_mask)

            def _pred_save(g, xin, t, progress):
                """Full UNet row; also returns the captured deep feature.
                g.noise_pred calls its noise_fn exactly once (both
                guidance classes), so a trace-time box carries the cache
                out without touching the guidance API."""
                box = {}

                def nf(lat, tt, ctx, added=None, ip=None, tcond=None,
                       pag_mask=None):
                    eps, box['c'] = _noise(lat, tt, ctx, added, ip, tcond,
                                           'save', pag_mask=pag_mask)
                    return eps

                eps = g.noise_pred(nf, xin, t, progress)
                return eps, box['c']

            def _pred_use(g, xin, t, progress, cache):
                def nf(lat, tt, ctx, added=None, ip=None, tcond=None,
                       pag_mask=None):
                    eps, _ = _noise(lat, tt, ctx, added, ip, tcond, 'use',
                                    cache, pag_mask=pag_mask)
                    return eps

                return g.noise_pred(nf, xin, t, progress)

            # CFG interval (Kynkäänniemi et al. 2024): guidance only for
            # progress in [cfg_from, cfg_to]; outside, the row runs the
            # guidance variant with cfg=False — the UNet batch halves (B
            # instead of 2B), so out-of-interval rows cost ~half. Both
            # branches compile once; the taken one executes (same
            # `lax.cond` discipline as DeepCache). Bounds are traced:
            # re-tuning the interval never recompiles.
            use_interval = (bool(getattr(guidance, 'cfg_interval', False))
                            and bool(getattr(guidance, 'cfg', False)))
            g_cond = guidance.replace(cfg=False) if use_interval else None

            def in_interval(prog):
                return ((prog >= guidance.cfg_from) &
                        (prog <= guidance.cfg_to))

            if deepcache >= 2:
                # Deep-feature carry: zeros until the first active row
                # (always a 'save' row — the cadence anchors at t_start).
                c_shape = jax.eval_shape(
                    lambda lat: _pred_save(
                        guidance, schedulers.scale_model_input(
                            schedule, lat, 0),
                        schedule.timesteps[0], jnp.float32(0.0))[1],
                    latents)
                cache0 = jnp.zeros(c_shape.shape, c_shape.dtype)

            def body(carry, i):
                if deepcache >= 2:
                    lat, state, k, cache = carry
                else:
                    lat, state, k = carry
                k, sub, k_inp = jax.random.split(k, 3)

                def active(op):
                    if deepcache >= 2:
                        lat, state, cache = op
                    else:
                        lat, state = op
                    xin = schedulers.scale_model_input(schedule, lat, i)
                    t = schedule.timesteps[i]
                    span = jnp.maximum(schedule.length - 1 - t_start, 1)
                    progress = (i - t_start).astype(jnp.float32) / span
                    if deepcache >= 2:
                        is_full = ((i - t_start) % deepcache) == 0
                        if use_interval:
                            # Force a full 'save' on interval transitions:
                            # the cond-only save tiles its half-batch cache
                            # into the uncond slots, and this guarantees a
                            # CFG row never 'use's that tiled stand-in.
                            prev = (i - 1 - t_start).astype(
                                jnp.float32) / span
                            is_full = is_full | (in_interval(progress) !=
                                                 in_interval(prev))

                        def _save_row(c):
                            if not use_interval:
                                return _pred_save(guidance, xin, t,
                                                  progress)

                            def _cond_save():
                                eps, cc = _pred_save(g_cond, xin, t,
                                                     progress)
                                # Tile the half-batch cache into the uncond
                                # slots so the carry shape stays [2B, ...].
                                return eps, jnp.concatenate([cc, cc])

                            return jax.lax.cond(
                                in_interval(progress),
                                lambda: _pred_save(guidance, xin, t,
                                                   progress),
                                _cond_save)

                        def _use_row(c):
                            if not use_interval:
                                return _pred_use(guidance, xin, t,
                                                 progress, c), c
                            # Cond rows occupy the second half of the CFG
                            # cache batch (SimpleGuidance stacks uncond
                            # first — pipeline/flex.py validates the
                            # guidance kind for this combination).
                            eps = jax.lax.cond(
                                in_interval(progress),
                                lambda: _pred_use(guidance, xin, t,
                                                  progress, c),
                                lambda: _pred_use(g_cond, xin, t, progress,
                                                  c[c.shape[0] // 2:]))
                            return eps, c

                        eps, cache = jax.lax.cond(is_full, _save_row,
                                                  _use_row, cache)
                    elif use_interval:
                        eps = jax.lax.cond(
                            in_interval(progress),
                            lambda: guidance.noise_pred(noise_fn, xin, t,
                                                        progress),
                            lambda: g_cond.noise_pred(noise_fn, xin, t,
                                                      progress))
                    else:
                        eps = guidance.noise_pred(noise_fn, xin, t,
                                                  progress)
                    state, new = schedulers.step(schedule, state, eps, i,
                                                 i - t_start, lat, sub, eta)
                    if inpaint:
                        # Re-anchor the kept region (mask==0) to the init
                        # image noised to this step's OUTPUT level, so both
                        # regions share one trajectory (latent inpainting;
                        # level is scheduler-specific — PLMS warm-up included).
                        noise = jax.random.normal(k_inp, new.shape,
                                                  jnp.float32)
                        anchored = schedulers.anchor_noise(
                            schedule, init_latents, noise, i, i - t_start)
                        new = mask * new + (1.0 - mask) * anchored
                    if deepcache >= 2:
                        return new, state, cache
                    return new, state

                if deepcache >= 2:
                    op0 = (lat, state, cache)
                    lat, state, cache = jax.lax.cond(i >= t_start, active,
                                                     lambda op: op, op0)
                    carry_out = (lat, state, k, cache)
                else:
                    lat, state = jax.lax.cond(i >= t_start, active,
                                              lambda op: op, (lat, state))
                    carry_out = (lat, state, k)
                ys = lat if debug else jnp.zeros((), jnp.float32)
                return carry_out, ys

            carry0 = ((latents, state0, key, cache0) if deepcache >= 2
                      else (latents, state0, key))
            out_carry, all_latents = jax.lax.scan(
                body, carry0, jnp.arange(schedule.length))
            return out_carry[0], all_latents

        self._sample = _sample

        @functools.partial(jax.jit, compiler_options=copts)
        def _encode(vae_params, pixels, key):
            mean, logvar = vae_apply(vae_params, pixels,
                                     method=type(vae).encode)
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                key, mean.shape, jnp.float32)
            return z * latent_scale

        self._encode = _encode

        def _decode_impl(vae_params, latents):
            img = vae_apply(vae_params, latents / latent_scale,
                            method=type(vae).decode)
            return jnp.clip(img / 2.0 + 0.5, 0.0, 1.0)

        # NOTE: _decode_u8 must trace the IMPL, not the jitted _decode —
        # compiler_options are rejected on nested jits (TPU product bug
        # caught by on-chip verification in round 4).
        self._decode = functools.partial(jax.jit,
                                         compiler_options=copts)(
                                             _decode_impl)

        @functools.partial(jax.jit, compiler_options=copts)
        def _decode_u8(vae_params, latents):
            # Quantize on device for the PIL path: 4× less device→host
            # traffic; same round-half-up as utils.image.to_pil.
            img = _decode_impl(vae_params, latents)
            return (img * 255.0 + 0.5).astype(jnp.uint8)

        self._decode_u8 = _decode_u8

        @functools.partial(jax.jit, compiler_options=copts)
        def _encode_moments(vae_params, pixels):
            # Posterior moments only (no sampling) — the tiled-encode path
            # cross-fades moments across tile seams, then samples ONCE over
            # the blended canvas so the overlap regions don't average two
            # independent noise draws (which would shrink their variance).
            return vae_apply(vae_params, pixels, method=type(vae).encode)

        self._encode_moments = _encode_moments
        self._quant_u8 = jax.jit(
            lambda img: (img * 255.0 + 0.5).astype(jnp.uint8))

    # ------------------------------------------------------------------
    def _tiling_active(self, h: int, w: int) -> bool:
        """Latent-space spatial dims ``h×w`` exceed one tile (and SP is not
        managing memory already)."""
        return (self.vae_tile > 0 and self.sp_mesh is None
                and (h > self.vae_tile or w > self.vae_tile))

    def encode_pixels(self, pixels: Array, key: Array) -> Array:
        """VAE-encode pixels → scaled latents, tiling when enabled and the
        image exceeds one tile."""
        f = self.vae_scale
        if self._tiling_active(pixels.shape[1] // f, pixels.shape[2] // f):
            from flexdiffuse_tpu.ops.tiled_vae import tiled_apply
            mean, logvar = tiled_apply(
                lambda t: self._encode_moments(self.vae_params, t), pixels,
                self.vae_tile * f, self.vae_tile_overlap * f,
                out_num=1, out_den=f)
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                key, mean.shape, jnp.float32)
            return z * self.latent_scale
        return self._encode(self.vae_params, pixels, key)

    def _decode01(self, latents: Array) -> Array:
        """Latents → [0,1] images, tiling when enabled."""
        if self._tiling_active(latents.shape[1], latents.shape[2]):
            from flexdiffuse_tpu.ops.tiled_vae import tiled_apply
            return tiled_apply(
                lambda t: self._decode(self.vae_params, t), latents,
                self.vae_tile, self.vae_tile_overlap,
                out_num=self.vae_scale, out_den=1)
        return self._decode(self.vae_params, latents)

    # ------------------------------------------------------------------
    # API-parity shims: attention slicing is obsolete under flash attention
    # (reference pipeline/flex.py:85-110).
    def enable_attention_slicing(self, slice_size=None) -> None:
        """No-op: the Pallas flash-attention kernel already streams K/V
        blocks, which is strictly better than slicing."""

    def disable_attention_slicing(self) -> None:
        """No-op (see :meth:`enable_attention_slicing`)."""

    # ------------------------------------------------------------------
    def schedule(self, steps: int) -> schedulers.Schedule:
        key = (self.scheduler_kind, steps)
        if key not in self._schedules:
            self._schedules[key] = schedulers.make(self.scheduler_kind, steps,
                                                   self.scheduler_config)
        return self._schedules[key]

    def latents_to_images(self, latents: Array,
                          pil: bool = True) -> Union[np.ndarray, list]:
        """VAE-decode latents to [0,1] images (reference flex.py:112-124)."""
        if pil:
            return to_pil(np.asarray(self.decode_u8_device(latents)))
        if self.sp_mesh is not None:
            latents = jax.device_put(latents, self._sp_sharding)
        return np.asarray(self._decode01(latents))

    def decode_u8_device(self, latents: Array) -> Array:
        """VAE decode + uint8 quantize, left ON DEVICE (no host fetch).

        The serving-overlap path: the runner dispatches every batch's scan +
        decode through this before fetching any of them, so batch N's
        device→host transfer and PIL/save work overlap batch N+1's denoise
        scan on the XLA runtime's async queue (the reference's serial loop —
        utils.py:85-112 — pays scan+decode+fetch end to end per batch).
        """
        if self.sp_mesh is not None:
            # Row-sharded decode: GSPMD propagates the input sharding through
            # the (purely convolutional + one mid-attention) decoder.
            latents = jax.device_put(latents, self._sp_sharding)
        if self._tiling_active(latents.shape[1], latents.shape[2]):
            return self._quant_u8(self._decode01(latents))
        return self._decode_u8(self.vae_params, latents)

    def __call__(self,
                 guide: Guidance,
                 steps: int = 30,
                 init_image: Optional[Union[Image.Image, np.ndarray,
                                            Array]] = None,
                 init_size: Tuple[int, int] = (512, 512),
                 strength: float = 0.6,
                 eta: float = 0.0,
                 key: Optional[Array] = None,
                 output_type: str = 'pil',
                 return_dict: bool = True,
                 debug: bool = False,
                 mask: Optional[Union[Image.Image, np.ndarray,
                                      Array]] = None,
                 control_image: Optional[Union[Image.Image,
                                               np.ndarray]] = None,
                 controlnet_scale: float = 1.0,
                 init_latents: Optional[Array] = None,
                 noise: Optional[Array] = None):
        """Generate images (reference ``FlexPipeline.__call__``
        pipeline/flex.py:126-310; ``generator`` → explicit PRNG ``key``).

        ``mask`` (addition over the reference) enables latent inpainting:
        a pixel- or latent-space map where 1 = regenerate and 0 = keep the
        ``init_image`` content; requires ``init_image``. The kept region is
        re-anchored to the init latents at each step's noise level.

        ``noise`` (txt2img only): caller-supplied unit-normal latents
        ``[B, H/f, W/f, C]`` used instead of the internal ``key`` draw —
        the serving API builds these per-row so a request's sampling
        trajectory doesn't depend on what it was batched with.
        """
        if strength < 0 or strength > 1:
            raise ValueError('The value of strength should in [0.0, 1.0] '
                             f'but is {strength}')
        if mask is not None and init_image is None:
            raise ValueError('inpainting (mask=...) requires init_image')
        if init_latents is not None and init_image is not None:
            raise ValueError('pass init_image OR init_latents, not both')
        if (self.deepcache >= 2 and getattr(guide, 'cfg_interval', False)
                and hasattr(guide, 'entities')):
            # The deepcache+interval cache tiling/slicing assumes the
            # SimpleGuidance batch layout ([uncond; cond] halves);
            # CompositeGuidance interleaves stack rows per batch item.
            raise ValueError('cfg_interval composes with deepcache only '
                             'for SimpleGuidance (composite stacks have no '
                             'half-batch cache layout)')
        if getattr(guide, 'pag', False):
            if getattr(self.unet, 'pag_layers', None) is None:
                raise ValueError(
                    'PAG guidance requires a UNet with pag_layers set '
                    '(Runner.enable_pag / unet.clone(pag_layers=...)) — '
                    'without it the perturbed row is a wasted cond copy')
            if self.deepcache >= 2 and getattr(guide, 'cfg_interval',
                                               False):
                # The interval transition cache tiling assumes the 2-row
                # [uncond; cond] layout; PAG's 3-row stack breaks it.
                raise ValueError('PAG composes with deepcache or '
                                 'cfg_interval, but not both at once '
                                 '(the half-batch cache layout assumes '
                                 'two rows per sample)')
        if key is None:
            key = jax.random.PRNGKey(0)
        key, k_enc, k_noise, k_scan = jax.random.split(key, 4)

        batch_size = guide.batch_size
        schedule = self.schedule(steps)
        f = self.vae_scale

        # Guidance-embedded (LCM) checkpoints: the UNet takes the guidance
        # scale as a model input and CFG is off (diffusers semantics —
        # LCM-LoRA on a standard UNet keeps ordinary CFG instead).
        tcp = getattr(self.unet.config, 'time_cond_proj_dim', 0)
        if tcp:
            if not hasattr(guide, 'timestep_cond'):
                raise NotImplementedError(
                    'guidance-embedded (LCM) UNets are driven through '
                    'SimpleGuidance; composite guidance does not carry a '
                    'timestep_cond')
            if guide.timestep_cond is None:
                from flexdiffuse_tpu.models.unet import \
                    guidance_scale_embedding
                w = jnp.asarray(guide.guidance_scale, jnp.float32) - 1.0
                guide = guide.replace(
                    timestep_cond=guidance_scale_embedding(w, tcp),
                    cfg=False)

        control_kw = {}
        if control_image is not None:
            if self.controlnet is None:
                raise ValueError('control_image given but this pipeline was '
                                 'built without a controlnet')
            if isinstance(control_image, Image.Image):
                control_image = np.asarray(control_image.convert('RGB'),
                                           np.float32) / 255.0
            cond = jnp.asarray(control_image, jnp.float32)
            if cond.ndim == 3:
                cond = cond[None]
            # Resized to the generation resolution below, once the latent
            # grid is known (diffusers resizes to (height, width) too).
            control_kw = dict(control_cond=cond,
                              cn_params=self.controlnet_params,
                              cn_scale=jnp.float32(controlnet_scale))

        def fit_control(latents):
            if control_kw:
                cond = control_kw['control_cond']
                hw = (latents.shape[1] * f, latents.shape[2] * f)
                if cond.shape[1:3] != hw:
                    control_kw['control_cond'] = jax.image.resize(
                        cond, (cond.shape[0],) + hw + (cond.shape[-1],),
                        method='bilinear')
            return control_kw

        # Native inpainting checkpoints (9-channel UNets, e.g.
        # runwayml/stable-diffusion-inpainting): mask + masked-image latents
        # ride as extra UNet input channels every step, latents start from
        # full noise, and no latent re-anchoring is needed.
        native_inpaint = (mask is not None and
                          self.unet.config.in_channels >
                          self.latent_channels)
        if native_inpaint:
            if not isinstance(guide, SimpleGuidance):
                raise ValueError('inpainting-checkpoint conditioning is '
                                 'supported for SimpleGuidance only')
            if isinstance(init_image, Image.Image):
                init_image = preprocess(init_image)
            pixels = jnp.asarray(init_image)
            hpix, wpix = pixels.shape[1:3]
            pix_mask = prepare_latent_mask(mask, (hpix, wpix))  # [1,H,W,1]
            masked = pixels * (1.0 - pix_mask)  # keep region only
            masked_latents = self.encode_pixels(masked, k_enc)
            latent_mask = prepare_latent_mask(mask, (hpix // f, wpix // f))
            extra = jnp.concatenate(
                [latent_mask,
                 jnp.broadcast_to(masked_latents,
                                  latent_mask.shape[:3] +
                                  (masked_latents.shape[-1],))], axis=-1)
            guide = guide.replace(extra_channels=extra)
            if strength < 1.0:
                # diffusers inpaint semantics: strength < 1 starts from the
                # ORIGINAL image noised to the matching level (the extra
                # channels still carry mask + masked-image conditioning).
                key_e2 = jax.random.fold_in(k_enc, 1)
                orig = self.encode_pixels(pixels, key_e2)
                orig = jnp.concatenate([orig] * batch_size)
                init_timestep, t_start = schedulers.init_timestep_info(
                    schedule, strength, steps)
                t_start *= schedule.rows_per_step
                noise = jax.random.normal(k_noise, orig.shape, jnp.float32)
                latents = schedulers.add_noise(schedule, orig, noise,
                                               init_timestep)
            else:
                t_start = 0
                latents = jax.random.normal(
                    k_noise, (batch_size, hpix // f, wpix // f,
                              self.latent_channels), jnp.float32)
                if schedule.kind in schedulers.SIGMA_SPACE_KINDS:
                    latents = latents * schedule.sigmas[0]
            state0 = schedulers.init_state(schedule, latents.shape,
                                           latents.dtype)
            latents, all_latents = self._sample(
                self.unet_params, schedule, state0, guide, latents,
                jnp.int32(t_start), jnp.float32(eta), k_scan, debug=debug,
                **fit_control(latents))
            return self._package(latents, all_latents, t_start, debug,
                                 output_type, return_dict)

        if init_image is not None or init_latents is not None:
            if getattr(schedule, 'prk', False):
                # The PRK feed is steps+9 positions whose first 12 span only
                # the top 3 timesteps; a strength-derived t_start indexes a
                # steps-long PLMS list and would enter the table mid-warm-up
                # with empty RK state and a mismatched noise level. diffusers
                # 0.3.0 img2img flows ship PLMS (skip_prk_steps=True) for
                # exactly this reason.
                raise NotImplementedError(
                    'img2img/inpaint is not defined for PNDM PRK warm-up '
                    '(skip_prk_steps=False); use the PLMS mode')
            if init_latents is not None:
                # Latents-direct img2img (SDXL base->refiner chaining): the
                # caller supplies final latents from a previous pipeline in
                # the shared scaled latent space; no VAE round trip.
                init_latents = jnp.asarray(init_latents, jnp.float32)
                if init_latents.shape[0] != batch_size:
                    init_latents = jnp.concatenate(
                        [init_latents] * batch_size)
            else:
                if isinstance(init_image, Image.Image):
                    init_image = preprocess(init_image)
                pixels = jnp.asarray(init_image)
                init_latents = self.encode_pixels(pixels, k_enc)
                init_latents = jnp.concatenate([init_latents] * batch_size)
            init_timestep, t_start = schedulers.init_timestep_info(
                schedule, strength, steps)
            t_start *= schedule.rows_per_step
            noise = jax.random.normal(k_noise, init_latents.shape,
                                      jnp.float32)
            latents = schedulers.add_noise(schedule, init_latents, noise,
                                           init_timestep)
        else:
            height, width = init_size
            want = (batch_size, height // f, width // f,
                    self.latent_channels)
            if noise is not None:
                latents = jnp.asarray(noise, jnp.float32)
                if latents.shape != want:
                    raise ValueError(
                        f'noise shape {latents.shape} != {want}')
            else:
                latents = jax.random.normal(k_noise, want, jnp.float32)
            if schedule.kind in schedulers.SIGMA_SPACE_KINDS:
                latents = latents * schedule.sigmas[0]
            t_start = 0

        latent_mask = None
        if mask is not None:
            latent_mask = prepare_latent_mask(mask, latents.shape[1:3])

        state0 = schedulers.init_state(schedule, latents.shape,
                                       latents.dtype)
        latents, all_latents = self._sample(self.unet_params, schedule,
                                            state0, guide, latents,
                                            jnp.int32(t_start),
                                            jnp.float32(eta), k_scan,
                                            init_latents=(init_latents
                                                          if mask is not None
                                                          else None),
                                            mask=latent_mask,
                                            debug=debug,
                                            inpaint=mask is not None,
                                            **fit_control(latents))

        return self._package(latents, all_latents, t_start, debug,
                             output_type, return_dict)

    def _package(self, latents, all_latents, t_start, debug, output_type,
                 return_dict):
        """Decode + wrap outputs (shared by the generation paths)."""
        if debug:
            # Decode every recorded step from t_start on (reference debug
            # mode, flex.py:254-301). all_latents is [L, B, h, w, C].
            steps_recorded = np.asarray(all_latents)[int(t_start):]
            batches = [
                self.latents_to_images(jnp.asarray(l),
                                       pil=(output_type == 'pil'))
                for l in steps_recorded
            ]
            if output_type == 'pil':
                images: Union[list, np.ndarray] = [
                    im for b in batches for im in b
                ]
            else:
                images = np.concatenate(batches, axis=0)
        elif output_type == 'latent':
            # Raw final latents (scaled latent space) — feeds a follow-on
            # pipeline sharing the VAE, e.g. the SDXL refiner.
            images = latents
        elif output_type == 'device_u8':
            # Quantized device array, fetch deferred to the caller (the
            # overlapped serving path; see decode_u8_device).
            images = self.decode_u8_device(latents)
        else:
            images = self.latents_to_images(latents,
                                            pil=(output_type == 'pil'))

        if not return_dict:
            return (images, False)
        return FlexPipelineOutput(images=images,
                                  nsfw_content_detected=[False] * len(images))
