"""Runner — top-level orchestration: loading, seeding, sweeps, outputs.

Rebuild of the reference ``Runner`` (utils.py:53-207): owns model loading,
seed handling, the multi-batch sweep, parameter-encoded output filenames (the
provenance system — kept on purpose) and grid assembly.

Conscious fixes vs. the reference (SURVEY.md §7.f keep/fix catalogue):
* reads ``output.images`` instead of the stale ``output['sample']`` key
  (utils.py:102 — both work against our pipeline output);
* DDIM η is an explicit parameter and is **not** clobbered by wall-clock
  timing (the reference stores elapsed seconds into ``self.eta``,
  utils.py:72,103 — a latent bug);
* structured logging instead of prints.

RNG: seeds are clamped to the torch-compatible ``[0, 2³¹−1]`` range
(utils.py:78-83) and feed ``jax.random.PRNGKey``; bitwise torch parity is
impossible (different generators) — see BASELINE.md.
"""
from __future__ import annotations

import logging
import os
import time
from typing import Any, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from flexdiffuse_tpu import schedulers
from flexdiffuse_tpu.composition import EntitySchema, Schema, encode_schema
from flexdiffuse_tpu.config import MAX_SEED, GuidanceParams, RunConfig, \
    clamp_seed
from flexdiffuse_tpu.encode import CLIPEncoder
from flexdiffuse_tpu.guidance import Guide
from flexdiffuse_tpu.models import (AutoencoderKL, CLIPTextModel,
                                    CLIPVisionModel, SD14_UNET, SD14_VAE,
                                    UNet2DCondition, configs)
from flexdiffuse_tpu.pipeline import FlexPipeline, SimpleGuidance
from flexdiffuse_tpu.utils.image import image_grid, to_pil

log = logging.getLogger(__name__)


class IPAdapterState:
    """Loaded IP-Adapter: image-projection head (simple or Resampler),
    optional image encoder, and the adapter's unconditional tokens. Shared
    by the SD1.x :class:`Runner` and :class:`~flexdiffuse_tpu.sdxl_runner.
    SDXLRunner` (the SDXL checkpoints differ only in dims/encoder)."""

    def __init__(self, proj, proj_params, input_kind: str, encoder,
                 vision_config) -> None:
        self.proj = proj
        self.proj_params = proj_params
        self.input_kind = input_kind  # 'pooled' | 'penultimate'
        self.encoder = encoder        # (jitted apply, params) | None
        self.vision_config = vision_config
        self.uncond_tokens = self.proj.apply(self.proj_params,
                                             self._uncond_embed())

    def _uncond_embed(self):
        """Zeros embedding for base checkpoints; for Plus, the encoder's
        penultimate states of a zeros pixel grid (the official uncond —
        zeros in the *normalized* pixel space), falling back to zeros
        hidden states when no encoder is loaded (precomputed-embed
        workflows)."""
        if self.input_kind == 'pooled':
            return jnp.zeros((1, self.proj_params['params']['proj']
                              ['kernel'].shape[0]), jnp.float32)
        if self.encoder is not None:
            apply, vparams = self.encoder
            size = self.vision_config.image_size
            return apply(vparams, jnp.zeros((1, size, size, 3), jnp.float32),
                         output='penultimate')
        embed_dim = self.proj_params['params']['proj_in']['kernel'].shape[0]
        return jnp.zeros((1, 257, embed_dim), jnp.float32)

    def fields(self, ip_embed, ip_image, ip_scale: float) -> dict:
        """The ``SimpleGuidance`` ip_* fields for one generation."""
        if ip_embed is None:
            if self.encoder is None:
                raise ValueError(
                    'ip_image requires load_ip_adapter(image_encoder_dir=…) '
                    '— or pass a precomputed ip_embed')
            from flexdiffuse_tpu.utils.image import clip_preprocess
            apply, vparams = self.encoder
            ip_embed = apply(
                vparams, jnp.asarray(clip_preprocess(ip_image)),
                output=('penultimate' if self.input_kind == 'penultimate'
                        else 'pooled'))
        emb = jnp.asarray(ip_embed, jnp.float32)
        want_ndim = 3 if self.input_kind == 'penultimate' else 2
        if emb.ndim == want_ndim - 1:
            emb = emb[None]
        tok = self.proj.apply(self.proj_params, emb)
        return dict(ip_tokens=tok, ip_uncond=self.uncond_tokens,
                    ip_scale=jnp.float32(ip_scale))


def attach_ip_adapter(pipe: FlexPipeline, path: str,
                      image_encoder_dir: Optional[str] = None,
                      vision_config=None):
    """Merge an IP-Adapter checkpoint into a pipeline.

    Returns ``(new_pipe, IPAdapterState)`` — the pipeline is rebuilt with an
    ``ip_adapter=True`` UNet config and the per-layer ``to_k_ip``/``to_v_ip``
    projections merged into the param tree. ``vision_config`` defaults to
    OpenCLIP ViT-H (the encoder shipped with the SD1.5 and SDXL *vit-h*
    adapters); pass another ``CLIPVisionConfig`` for bigG-encoder variants.
    """
    import dataclasses as _dc
    from flexdiffuse_tpu.models import (OPENCLIP_H_VISION, CLIPVisionModel,
                                        UNet2DCondition)
    from flexdiffuse_tpu.models.ip_adapter import (build_image_proj,
                                                   convert_ip_layers,
                                                   merge_ip_weights)
    from flexdiffuse_tpu.weights import convert as _convert
    from flexdiffuse_tpu.weights import load as _load
    if vision_config is None:
        vision_config = OPENCLIP_H_VISION
    sd = _load.load_state_dict(path)
    old = pipe.unet
    layer_map = convert_ip_layers(sd, old.config)
    proj, proj_params, tokens, kind = build_image_proj(sd, old.config,
                                                       dtype=old.dtype)
    cfg2 = _dc.replace(old.config, ip_adapter=True, ip_tokens=tokens)
    new_unet = UNet2DCondition(cfg2, dtype=old.dtype)
    new_params = merge_ip_weights(pipe.unet_params, layer_map)
    new_pipe = FlexPipeline(
        new_unet, new_params, pipe.vae, pipe.vae_params,
        scheduler=pipe.scheduler_kind, scheduler_config=pipe.scheduler_config,
        latent_scale=pipe.latent_scale, sp_mesh=pipe.sp_mesh,
        sp_axis=pipe.sp_axis, sp_min_seq=pipe.sp_min_seq,
        controlnet=pipe.controlnet, controlnet_params=pipe.controlnet_params,
        vae_tile=pipe.vae_tile, vae_tile_overlap=pipe.vae_tile_overlap)
    encoder = None
    if image_encoder_dir:
        enc_sd = _load.load_state_dict(image_encoder_dir)
        vparams = {'params': _convert.convert_clip_vision(enc_sd,
                                                          vision_config)}
        vmodel = CLIPVisionModel(vision_config, dtype=old.dtype)
        encoder = (jax.jit(vmodel.apply, static_argnames=('output',)),
                   vparams)
    state = IPAdapterState(proj, proj_params, kind, encoder, vision_config)
    log.info('ip-adapter loaded from %s (%d tokens, %s input)', path,
             tokens, kind)
    return new_pipe, state


def _i100(f: float) -> int:
    return int(f * 100)


class Runner:
    """End-to-end generation runner.

    Construct either from a model root directory containing HF snapshots
    (``Runner(model_root=...)``) or from already-built models/params
    (``Runner.from_models(...)``, used by tests and tools).
    """

    def __init__(self,
                 model_root: Optional[str] = None,
                 config: RunConfig = RunConfig(),
                 scheduler: str = 'pndm',
                 dtype=jnp.bfloat16,
                 text_config=None,
                 vision_config=None,
                 unet_config=None,
                 vae_config=None,
                 clip_skip: int = 0,
                 scheduler_config=None) -> None:
        """Load from HF snapshot dirs under ``model_root`` (default configs
        are the reference's SD-1.4 + CLIP ViT-L/14 geometry; the ``*_config``
        overrides exist for alternative checkpoints and loading-path tests).
        """
        self.config = config
        if model_root is None:
            raise ValueError(
                'model_root is required (a directory with HF snapshots of '
                f'{config.sd_model} and {config.clip_model}); for weightless '
                'construction use Runner.from_models(...)')
        from flexdiffuse_tpu.text.tokenizer import CLIPTokenizer
        from flexdiffuse_tpu.weights import load

        text_config = text_config or configs.CLIP_VIT_L14_TEXT
        vision_config = vision_config or configs.CLIP_VIT_L14_VISION
        vae_config = vae_config or SD14_VAE

        sd_dir = os.path.join(model_root, config.sd_model.split('/')[-1])
        if unet_config is None:
            unet_config = SD14_UNET
            # Auto-adopt per-checkpoint geometry from the HF snapshot's
            # unet/config.json: the cond-proj width of guidance-embedded
            # (full LCM) checkpoints, and the input-channel count of
            # conditioned UNets (9 = inpainting, 8 = InstructPix2Pix) —
            # so those checkpoints load without a hand-built UNetConfig.
            cfg_json = os.path.join(sd_dir, 'unet', 'config.json')
            if os.path.exists(cfg_json):
                import dataclasses
                import json as _json
                try:
                    with open(cfg_json) as f:
                        uj = _json.load(f)
                    tcp = uj.get('time_cond_proj_dim') or 0
                    in_ch = uj.get('in_channels') or 4
                except (OSError, ValueError):
                    tcp, in_ch = 0, 4
                if tcp:
                    unet_config = dataclasses.replace(
                        unet_config, time_cond_proj_dim=int(tcp))
                if int(in_ch) != unet_config.in_channels:
                    unet_config = dataclasses.replace(
                        unet_config, in_channels=int(in_ch))
        clip_dir = os.path.join(model_root, config.clip_model.split('/')[-1])
        log.info('Loading CLIP from %s and SD from %s (local only: %s)',
                 clip_dir, sd_dir, config.local_only)
        text_params, vision_params = load.load_clip(
            clip_dir, text_config=text_config, vision_config=vision_config)
        unet_params, vae_params = load.load_sd(
            sd_dir, unet_config=unet_config, vae_config=vae_config)
        tokenizer = CLIPTokenizer.from_dir(clip_dir)
        text_model = CLIPTextModel(text_config, dtype=dtype)
        vision_model = CLIPVisionModel(vision_config, dtype=dtype)
        unet = UNet2DCondition(unet_config, dtype=dtype)
        vae = AutoencoderKL(vae_config, dtype=dtype)
        self._init_common(text_model, text_params, vision_model,
                          vision_params, unet, unet_params, vae, vae_params,
                          tokenizer, scheduler, clip_skip, scheduler_config)

    @classmethod
    def from_models(cls, text_model, text_params, vision_model,
                    vision_params, unet, unet_params, vae, vae_params,
                    tokenizer, scheduler: str = 'pndm',
                    config: RunConfig = RunConfig(),
                    scheduler_config=None) -> 'Runner':
        self = cls.__new__(cls)
        self.config = config
        self._init_common(text_model, text_params, vision_model,
                          vision_params, unet, unet_params, vae, vae_params,
                          tokenizer, scheduler,
                          scheduler_config=scheduler_config)
        return self

    def _init_common(self, text_model, text_params, vision_model,
                     vision_params, unet, unet_params, vae, vae_params,
                     tokenizer, scheduler, clip_skip: int = 0,
                     scheduler_config=None) -> None:
        self.encoder = CLIPEncoder(text_model, text_params, vision_model,
                                   vision_params, tokenizer,
                                   clip_skip=clip_skip)
        self.guide = Guide(self.encoder)
        self.pipe = FlexPipeline(unet, unet_params, vae, vae_params,
                                 scheduler=scheduler,
                                 scheduler_config=scheduler_config)
        self.eta = 0.0  # DDIM η — a real parameter here, never a timer.
        self._key = jax.random.PRNGKey(0)
        self.output_dir = self.config.output_dir
        self.grid_dir = os.path.join(self.output_dir, 'grids')
        from flexdiffuse_tpu.utils.profiling import PhaseTimer
        self.timer = PhaseTimer()

    # ------------------------------------------------------------------
    def load_textual_inversion(self, path: str,
                               token: str = None) -> None:
        """Load a textual-inversion embedding: registers its placeholder
        token with the tokenizer and appends the learned vectors to the
        text encoder's embedding table (weights/textual_inversion.py).
        ``token`` overrides the name stored in (or implied by) the file."""
        import os as _os
        from flexdiffuse_tpu.weights import load as _load
        from flexdiffuse_tpu.weights import textual_inversion as _ti
        import dataclasses as _dc
        sd = _load.load_state_dict(path)
        file_token, table = _ti.extract_embedding(sd, token)
        name = token or file_token or _os.path.splitext(
            _os.path.basename(path))[0]
        enc = self.encoder
        new_params = _ti.add_textual_inversion(enc.tokenizer,
                                               enc._text_params, name, table)
        # flax validates the Embed shape against the module config, so the
        # text model is rebuilt for the grown vocabulary (one recompile).
        new_vocab = np.asarray(
            new_params['params']['token_embedding']['embedding']).shape[0]
        tm = enc._text_model
        enc.replace_text(
            type(tm)(_dc.replace(tm.config, vocab_size=new_vocab),
                     dtype=tm.dtype), new_params)
        log.info('textual inversion %r: %d vector(s) added', name,
                 table.shape[0])

    # ------------------------------------------------------------------
    def load_ip_adapter(self, path: str,
                        image_encoder_dir: str = None,
                        vision_config=None) -> None:
        """Load an official IP-Adapter checkpoint (decoupled image-prompt
        attention, models/ip_adapter.py) and rebuild the pipeline with the
        per-layer projections merged in.

        Generate with ``gen(ip_image=<PIL image>, ip_scale=...)`` when
        ``image_encoder_dir`` points at the adapter's image-encoder snapshot
        (OpenCLIP ViT-H for the standard SD1.5 checkpoints — CLS-pooled
        projected embedding for base adapters, penultimate hidden states for
        Plus/Resampler ones; the variant is detected from the checkpoint),
        or with a precomputed ``gen(ip_embed=...)`` matching the adapter's
        input kind."""
        self.pipe, self._ip = attach_ip_adapter(self.pipe, path,
                                                image_encoder_dir,
                                                vision_config=vision_config)

    def _ip_fields(self, ip_embed, ip_image, ip_scale: float) -> dict:
        if ip_embed is None and ip_image is None:
            return {}
        if getattr(self, '_ip', None) is None:
            raise ValueError('image prompt given but no IP-Adapter is '
                             'loaded (Runner.load_ip_adapter)')
        return self._ip.fields(ip_embed, ip_image, ip_scale)

    # ------------------------------------------------------------------
    def enable_freeu(self, b1: float = 1.5, b2: float = 1.6,
                     s1: float = 0.9, s2: float = 0.2) -> None:
        """FreeU (published recipe; defaults are the SD1.x settings):
        amplify the backbone half-channels and Fourier-attenuate the skip
        features at the two deepest decoder levels. No new weights — the
        UNet is cloned with the static ``freeu`` attribute and the pipeline
        recompiles once; params/LoRA/adapters are untouched."""
        self._rebuild_with_unet(self.pipe.unet.clone(freeu=(b1, b2, s1, s2)))

    def disable_freeu(self) -> None:
        if self.pipe.unet.freeu is not None:
            self._rebuild_with_unet(self.pipe.unet.clone(freeu=None))

    # ------------------------------------------------------------------
    def enable_tome(self, ratio: float = 0.5, min_seq: int = 4096) -> None:
        """ToMe token merging (Bolya & Hoffman 2023; beyond-reference
        accelerator, ops/tome.py): before every self-attention on a grid
        of ≥ ``min_seq`` tokens, merge ``ratio`` of the spatial tokens
        into their most-similar neighbours and copy the outputs back —
        attention cost drops ~(1-ratio)². The default ``min_seq`` engages
        it only at SD1.x's 4096-token top level (and bigger highres
        canvases) where attention dominates. An approximation: outputs
        change slightly (the published quality loss at ratio ≤ 0.5 is
        negligible). The pipeline recompiles once."""
        if not 0.0 < ratio < 1.0:
            raise ValueError('tome ratio must be in (0, 1)')
        self._rebuild_with_unet(
            self.pipe.unet.clone(tome=(float(ratio), int(min_seq))))

    def disable_tome(self) -> None:
        if getattr(self.pipe.unet, 'tome', None) is not None:
            self._rebuild_with_unet(self.pipe.unet.clone(tome=None))

    # ------------------------------------------------------------------
    def enable_pag(self, layers: Sequence[str] = ('mid',)) -> None:
        """PAG — perturbed-attention guidance (Ahn et al. 2024; beyond-
        reference quality feature): an extra cond batch row runs with
        identity self-attention in the named transformer layers and the
        prediction adds ``pag_scale·(eps_cond − eps_perturbed)`` —
        improves structure/anatomy, and guides even with CFG off (e.g.
        negative-prompt-free generation). ``layers`` are name prefixes
        ('mid', 'down_1', 'up_2_attn_1' — models/unet.py pag_selected);
        ('mid',) is the published default. Selection is static (the
        pipeline recompiles once); the per-call strength is
        ``gen(pag_scale=...)`` and never recompiles."""
        if not layers:
            raise ValueError('pag layers must name at least one '
                             "transformer (e.g. ('mid',))")
        self._rebuild_with_unet(
            self.pipe.unet.clone(pag_layers=tuple(layers)))

    def disable_pag(self) -> None:
        if getattr(self.pipe.unet, 'pag_layers', None) is not None:
            self._rebuild_with_unet(self.pipe.unet.clone(pag_layers=None))

    def _rebuild_with_unet(self, unet, **overrides) -> None:
        """Rebuild the pipeline around a cloned UNet module (same params)."""
        kw = dict(
            scheduler=self.pipe.scheduler_kind,
            scheduler_config=self.pipe.scheduler_config,
            latent_scale=self.pipe.latent_scale, sp_mesh=self.pipe.sp_mesh,
            sp_axis=self.pipe.sp_axis, sp_min_seq=self.pipe.sp_min_seq,
            controlnet=self.pipe.controlnet,
            controlnet_params=self.pipe.controlnet_params,
            vae_tile=self.pipe.vae_tile,
            vae_tile_overlap=self.pipe.vae_tile_overlap,
            deepcache=self.pipe.deepcache)
        kw.update(overrides)
        self.pipe = FlexPipeline(unet, self.pipe.unet_params, self.pipe.vae,
                                 self.pipe.vae_params, **kw)

    # ------------------------------------------------------------------
    def enable_deepcache(self, interval: int = 2) -> None:
        """DeepCache (Ma et al. 2023; beyond-reference accelerator): run
        the full UNet every ``interval``-th denoise step and reuse its deep
        feature in between, recomputing only the shallow levels. 2-3 is the
        published quality/speed sweet spot; the pipeline recompiles once."""
        if int(interval) != self.pipe.deepcache:
            self._rebuild_with_unet(self.pipe.unet,
                                    deepcache=int(interval))

    def disable_deepcache(self) -> None:
        if self.pipe.deepcache:
            self._rebuild_with_unet(self.pipe.unet, deepcache=0)

    # ------------------------------------------------------------------
    def enable_vae_tiling(self, tile: int = 64, overlap: int = 8) -> None:
        """Decode/encode the VAE in ``tile``-latent-unit tiles with
        cross-faded ``overlap`` seams once the canvas exceeds one tile
        (ops/tiled_vae.py) — bounds VAE memory for very large images.
        ``tile=64`` = 512² pixels per tile. Takes effect immediately (the
        tiled path reuses the already-compiled per-tile executables)."""
        if overlap >= tile:
            raise ValueError('overlap must be < tile')
        self.pipe.vae_tile = int(tile)
        self.pipe.vae_tile_overlap = int(overlap)

    def disable_vae_tiling(self) -> None:
        self.pipe.vae_tile = 0

    # ------------------------------------------------------------------
    def load_controlnet(self, path: str) -> None:
        """Load a diffusers ControlNet snapshot and rebuild the pipeline
        with the control branch attached (models/controlnet.py); pass
        ``control_image=`` (with optional ``controlnet_scale=``) to
        :meth:`gen`."""
        from flexdiffuse_tpu.models.controlnet import ControlNetModel
        from flexdiffuse_tpu.weights import convert as _convert
        from flexdiffuse_tpu.weights import load as _load
        sd = _load.load_state_dict(path)
        cfg = self.pipe.unet.config
        params = {'params': _convert.convert_controlnet(sd, cfg)}
        model = ControlNetModel(cfg, dtype=self.pipe.unet.dtype)
        self.pipe = FlexPipeline(
            self.pipe.unet, self.pipe.unet_params, self.pipe.vae,
            self.pipe.vae_params, scheduler=self.pipe.scheduler_kind,
            scheduler_config=self.pipe.scheduler_config,
            latent_scale=self.pipe.latent_scale,
            sp_mesh=self.pipe.sp_mesh, sp_axis=self.pipe.sp_axis,
            sp_min_seq=self.pipe.sp_min_seq,
            controlnet=model, controlnet_params=params,
            vae_tile=self.pipe.vae_tile,
            vae_tile_overlap=self.pipe.vae_tile_overlap)
        log.info('controlnet loaded from %s', path)

    # ------------------------------------------------------------------
    def apply_lora(self, path: str, scale: float = 1.0) -> None:
        """Merge a kohya-format LoRA safetensors adapter into the loaded
        UNet + text-encoder weights (beyond-reference; see weights/lora.py).

        Merging happens host-side once; compiled programs are unchanged and
        repeated calls stack adapters."""
        from flexdiffuse_tpu.weights import load as _load
        from flexdiffuse_tpu.weights import lora as _lora
        sd = _load.load_state_dict(path)
        unet_p, text_p = _lora.apply_lora(self.pipe.unet_params,
                                          self.encoder._text_params, sd,
                                          scale=scale)
        self.pipe.unet_params = unet_p
        self.encoder._text_params = text_p

    # ------------------------------------------------------------------
    def _set_seed(self, seed: Optional[int]) -> int:
        seed = clamp_seed(seed)
        if seed is None:
            seed = int(np.random.default_rng().integers(0, MAX_SEED))
        self._key = jax.random.PRNGKey(seed)
        return seed

    def _next_key(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    # ------------------------------------------------------------------
    def _run(self, batches: int, guidance, init_image, init_size, strength,
             steps: int, debug: bool, fp: str,
             save: bool = True,
             mask=None, control_image=None,
             controlnet_scale: float = 1.0,
             hires_scale: float = 0.0,
             hires_strength: float = 0.55,
             hires_steps: Optional[int] = None
             ) -> Tuple[List[Image.Image], Image.Image]:
        """Multi-batch sweep (reference ``_run`` utils.py:85-112): one
        compiled executable, new PRNG key per batch.

        Non-debug batches are *pipelined*: every batch's scan + device-side
        u8 decode is dispatched before any result is fetched, so batch N's
        device→host transfer + PIL encode + disk write overlap batch N+1's
        denoise on the XLA async queue (the reference's loop is fully
        serial). Debug mode (per-step latent decode, host-side) keeps the
        serial path.

        ``hires_scale > 1`` enables the two-pass highres fix (A1111 'Latent'
        upscale mode, beyond-reference): pass 1 generates at ``init_size``,
        the final latents are bilinear-upscaled by ``hires_scale`` and
        refined by an img2img pass at ``hires_strength`` (inpainting masks
        apply to pass 1 only — the refinement keeps the composed result).
        Both passes stay on the XLA async queue, so batches still pipeline.
        """
        hires = bool(hires_scale) and hires_scale > 1.0
        all_images: List[Image.Image] = []
        if save:
            os.makedirs(self.grid_dir, exist_ok=True)
        dispatched = []
        for b in range(batches):
            stime = time.time()
            ms_time = int(stime * 1000)
            if hires:
                from flexdiffuse_tpu.pipeline.flex import upscale_latents
                lat = self.pipe(guidance, steps=steps,
                                init_image=init_image, init_size=init_size,
                                strength=strength, eta=self.eta,
                                key=self._next_key(), mask=mask,
                                control_image=control_image,
                                controlnet_scale=controlnet_scale,
                                output_type='latent').images
                up = upscale_latents(lat, hires_scale)
                out = self.pipe(guidance, steps=hires_steps or steps,
                                init_latents=up, strength=hires_strength,
                                eta=self.eta, key=self._next_key(),
                                debug=debug, control_image=control_image,
                                controlnet_scale=controlnet_scale,
                                output_type='pil' if debug
                                else 'device_u8')
            else:
                out = self.pipe(guidance, steps=steps,
                                init_image=init_image,
                                init_size=init_size, strength=strength,
                                eta=self.eta, key=self._next_key(),
                                debug=debug, mask=mask,
                                control_image=control_image,
                                controlnet_scale=controlnet_scale,
                                output_type='pil' if debug
                                else 'device_u8')
            if debug:
                images = self._finish_batch(b, batches, out.images, stime,
                                            ms_time, fp, save)
                all_images.extend(images)
            else:
                dispatched.append((stime, ms_time, out.images))
        for b, (stime, ms_time, device_u8) in enumerate(dispatched):
            images = to_pil(np.asarray(device_u8))
            images = self._finish_batch(b, batches, images, stime, ms_time,
                                        fp, save)
            all_images.extend(images)
        grid = image_grid(all_images)
        if save:
            ms_time = int(time.time() * 1000)
            grid.save(f'{self.grid_dir}/{ms_time:>013d}_{fp}.png',
                      format='png')
        return all_images, grid

    def _finish_batch(self, b, batches, images, stime, ms_time, fp, save):
        log.info('batch %d/%d: %d image(s) in %.2fs', b + 1, batches,
                 len(images), time.time() - stime)
        if save:
            for i, img in enumerate(images):
                img.save(
                    f'{self.output_dir}/{ms_time:>013d}_{i:>02d}_{fp}.png',
                    format='png')
        return images

    # ------------------------------------------------------------------
    def gen(self,
            prompt: Union[str, List[str]] = '',
            init_image: Optional[Image.Image] = None,
            guide: Union[Image.Image, str, None] = None,
            init_size: Tuple[int, int] = (512, 512),
            mapping_concepts: str = '',
            guide_threshold_mult: float = 0.5,
            guide_threshold_floor: float = 0.5,
            guide_clustered: float = 0.5,
            guide_linear: Tuple[float, float] = (0.0, 0.5),
            guide_max_guidance: float = 0.5,
            guide_header_max: float = 0.15,
            guide_mode: int = 0,
            guide_reuse: bool = True,
            strength: float = 0.6,
            steps: int = 10,
            guidance_scale: float = 8,
            samples: int = 1,
            seed: Optional[int] = None,
            debug: bool = False,
            save: bool = True,
            negative_prompt: str = '',
            mask: Optional[Image.Image] = None,
            control_image: Optional[Image.Image] = None,
            controlnet_scale: float = 1.0,
            ip_embed=None,
            ip_image: Optional[Image.Image] = None,
            ip_scale: float = 1.0,
            long_prompt: bool = False,
            weighted: bool = False,
            hires_scale: float = 0.0,
            hires_strength: float = 0.55,
            hires_steps: Optional[int] = None,
            cfg_interval: Optional[Tuple[float, float]] = None,
            guidance_rescale: float = 0.0,
            pag_scale: float = 0.0):
        """Guided generation (reference ``Runner.gen`` utils.py:114-166).

        ``negative_prompt`` replaces the empty-string unconditional embedding
        in classifier-free guidance (an addition over the reference, which
        always uses '' — pipeline/guide.py:30). ``weighted`` parses A1111
        emphasis syntax (``(word:1.3)``, ``[word]``, ``BREAK``) in both the
        prompt and the negative prompt (``text/emphasis.py``); it subsumes
        ``long_prompt`` (windows chunk the same way).

        ``cfg_interval=(lo, hi)`` applies classifier-free guidance only for
        denoise progress in [lo, hi] (Kynkäänniemi et al. 2024); outside,
        steps run cond-only at ~half cost. (0.0, 0.6) is a good default:
        faster AND typically better FID than full-range CFG.

        ``guidance_rescale`` (phi, Lin et al. 2023) pulls the CFG noise
        prediction back toward the cond prediction's std — fixes
        washed-out images, most visibly on zero-SNR v-pred checkpoints
        (0.7 recommended there). 0 = off.

        ``pag_scale`` (Ahn et al. 2024) adds perturbed-attention guidance:
        ``pag_scale·(eps_cond − eps_perturbed)`` where the perturbed row
        runs identity self-attention in the layers set by
        :meth:`enable_pag` (auto-enabled at the published ('mid',) default
        on first use). ~3.0 is the paper's sweet spot; works with CFG on
        or off. 0 = off."""
        if pag_scale and getattr(self.pipe.unet, 'pag_layers',
                                 None) is None:
            self.enable_pag()
        if mask is not None and init_image is not None:
            fp = f'inp_ds{int(strength * 100)}'
        elif init_image is not None:
            fp = f'i2i_ds{int(strength * 100)}'
        else:
            fp = 't2i'
        if guide is not None and not (isinstance(guide, str) and not guide):
            fp += (f'_itm{_i100(guide_threshold_mult)}'
                   f'_itf{_i100(guide_threshold_floor)}'
                   f'_ic{_i100(guide_clustered)}'
                   f'_il{_i100(guide_linear[0])}'
                   f'-{_i100(guide_linear[1])}'
                   f'_mg{_i100(guide_max_guidance)}'
                   f'_hm{_i100(guide_header_max)}'
                   f'_im{guide_mode:d}')
        fp += f'_st{steps}_gs{int(guidance_scale)}'
        if cfg_interval is not None:
            fp += f'_ci{_i100(cfg_interval[0])}-{_i100(cfg_interval[1])}'
        if guidance_rescale:
            fp += f'_gr{_i100(guidance_rescale)}'
        if pag_scale:
            fp += f'_pg{_i100(pag_scale)}'
        if hires_scale and hires_scale > 1.0:
            fp += f'_hr{_i100(hires_scale)}_hs{_i100(hires_strength)}'
        if seed:
            fp += f'_se{seed}'

        self._set_seed(seed)
        params = GuidanceParams(threshold_mult=guide_threshold_mult,
                                threshold_floor=guide_threshold_floor,
                                clustered=guide_clustered,
                                linear=tuple(guide_linear),
                                max_guidance=guide_max_guidance,
                                header_max=guide_header_max, mode=guide_mode,
                                reuse=guide_reuse)
        enc_fn = (self.encoder.prompt_weighted
                  if weighted else self.encoder.prompt_chunked)
        with self.timer.phase('embeds'):
            if long_prompt or weighted:
                # A1111-style chunked encoding for >75-token prompts (and/or
                # emphasis weighting). The similarity-mapped guide tween is
                # defined on a 77-token window, so with a guide present it
                # is applied to the *first* window (A1111-consistent
                # per-window semantics: guidance binds to the prompt's head)
                # and later chunks pass through untweened.
                if not isinstance(prompt, str):
                    raise ValueError(
                        'long_prompt/weighted take a single prompt')
                embeds = enc_fn(prompt)
                has_guide = guide is not None and (not isinstance(guide, str)
                                                   or bool(guide.strip()))
                if has_guide:
                    win = self.encoder.tokenizer.model_max_length
                    first = self.guide.embeds(
                        prompt=prompt, guide=guide,
                        mapping_concepts=mapping_concepts, params=params,
                        text_embeddings=embeds[:, :win])
                    if embeds.shape[1] > win:
                        embeds = jnp.concatenate([first, embeds[:, win:]],
                                                 axis=1)
                    else:
                        embeds = first
            else:
                embeds = self.guide.embeds(prompt=prompt, guide=guide,
                                           mapping_concepts=mapping_concepts,
                                           params=params)
        if long_prompt or weighted:
            # The negative chunks independently (A1111 convention) and pads
            # with empty-prompt windows up to the positive's chunk count.
            uncond = enc_fn(negative_prompt or '')
            win = self.encoder.tokenizer.model_max_length
            k = embeds.shape[1] // win
            k_u = uncond.shape[1] // win
            if k_u > k:
                uncond = uncond[:, :k * win]
            elif k_u < k:
                pad = jnp.tile(self.encoder.prompt(''), (1, k - k_u, 1))
                uncond = jnp.concatenate([uncond, pad], axis=1)
        else:
            uncond = self.encoder.prompt(negative_prompt or '')
        interval_kw = {}
        if cfg_interval is not None:
            interval_kw = dict(cfg_interval=True,
                               cfg_from=jnp.float32(cfg_interval[0]),
                               cfg_to=jnp.float32(cfg_interval[1]))
        pag_kw = {}
        if pag_scale:
            pag_kw = dict(pag=True, pag_scale=jnp.float32(pag_scale))
        rescale_kw = {}
        if guidance_rescale:
            # Static gate: phi=0 must build the identical (reduction-free)
            # graph, preserving row-level batch reproducibility (serving).
            rescale_kw = dict(rescale=True,
                              guidance_rescale=jnp.float32(guidance_rescale))
        guidance = SimpleGuidance(
            embeddings=embeds,
            uncond=uncond,
            guidance_scale=jnp.float32(guidance_scale),
            **rescale_kw,
            cfg=guidance_scale > 1.0,
            **interval_kw,
            **pag_kw,
            **self._ip_fields(ip_embed, ip_image, ip_scale))
        with self.timer.phase('generate'):
            return self._run(samples, guidance, init_image, init_size,
                             strength, steps, debug, fp, save, mask=mask,
                             control_image=control_image,
                             controlnet_scale=controlnet_scale,
                             hires_scale=hires_scale,
                             hires_strength=hires_strength,
                             hires_steps=hires_steps)

    # ------------------------------------------------------------------
    def edit(self,
             prompt: str,
             image: Union[Image.Image, np.ndarray],
             steps: int = 20,
             guidance_scale: float = 7.5,
             image_guidance_scale: float = 1.5,
             negative_prompt: str = '',
             samples: int = 1,
             seed: Optional[int] = None,
             save: bool = True,
             debug: bool = False,
             guidance_rescale: float = 0.0):
        """Instruction-based image editing (InstructPix2Pix, Brooks et al.
        2023; beyond-reference model family): ``prompt`` is an edit
        instruction ("make it winter"), ``image`` the picture to edit —
        a PIL image, or a preprocessed ``[-1, 1]`` NHWC array (``[1, H,
        W, 3]``; a bare ``[H, W, 3]`` gains the batch dim).

        Requires an 8-channel IP2P checkpoint (e.g.
        ``timbrooks/instruct-pix2pix``; auto-detected from the snapshot's
        unet/config.json). The input image conditions every step through
        extra UNet input channels — its VAE-mode latents ride *unscaled*,
        the convention the IP2P checkpoints were trained with — and
        sampling starts from pure noise with dual text/image CFG
        (:class:`InstructPix2PixGuidance`). ``image_guidance_scale``
        controls faithfulness to the input (1.5 is the published
        default; higher = closer to the original)."""
        from flexdiffuse_tpu.pipeline import InstructPix2PixGuidance
        from flexdiffuse_tpu.utils.image import preprocess
        if self.pipe.unet.config.in_channels != 8:
            raise ValueError(
                'edit() needs an 8-channel InstructPix2Pix UNet; this '
                f'pipeline has {self.pipe.unet.config.in_channels} input '
                'channels (point --models at an instruct-pix2pix snapshot)')
        fp = (f'edit_st{steps}_gs{int(guidance_scale)}'
              f'_igs{_i100(image_guidance_scale)}')
        if guidance_rescale:
            fp += f'_gr{_i100(guidance_rescale)}'
        if seed:
            fp += f'_se{seed}'
        self._set_seed(seed)

        with self.timer.phase('embeds'):
            embeds = self.encoder.prompt(prompt)
            uncond = self.encoder.prompt(negative_prompt or '')
        if isinstance(image, Image.Image):
            image = preprocess(image)
        pixels = jnp.asarray(image, jnp.float32)
        if pixels.ndim == 3:          # unbatched HWC → add the batch dim
            pixels = pixels[None]
        if pixels.ndim != 4 or pixels.shape[-1] != 3:
            raise ValueError(
                'edit() image array must be [1, H, W, 3] (or [H, W, 3]) '
                f'in [-1, 1]; got shape {tuple(pixels.shape)}')
        h, w = pixels.shape[1:3]
        # VAE posterior MODE (mean), UNSCALED — the IP2P conditioning
        # convention (diffusers prepare_image_latents does the same).
        mean, _ = self.pipe._encode_moments(self.pipe.vae_params, pixels)
        guidance = InstructPix2PixGuidance(
            embeddings=embeds,
            uncond=uncond,
            image_latents=mean,
            guidance_scale=jnp.float32(guidance_scale),
            image_guidance_scale=jnp.float32(image_guidance_scale),
            **(dict(rescale=True,
                    guidance_rescale=jnp.float32(guidance_rescale))
               if guidance_rescale else {}))
        with self.timer.phase('generate'):
            return self._run(samples, guidance, None, (h, w), 1.0, steps,
                             debug, fp, save)

    # ------------------------------------------------------------------
    def compose(self,
                bg_prompt: str = '',
                entities_df: Sequence[Sequence[Any]] = (),
                start_style: str = '',
                end_style: str = '',
                style_blend: Tuple[float, float] = (0.0, 1.0),
                init_image: Optional[Image.Image] = None,
                batches: int = 4,
                strength: float = 0.7,
                steps: int = 30,
                guidance_scale: float = 8.0,
                init_size: Tuple[int, int] = (512, 512),
                seed: Optional[int] = None,
                debug: bool = False,
                style_strength: float = 0.0,
                save: bool = True):
        """Regional composition (reference ``Runner.compose`` utils.py:168-207)."""
        fp = f'ci2i_ds{int(strength * 100)}' if init_image is not None \
            else 'ct2i'
        fp += f'_st{steps}_gs{int(guidance_scale)}'
        if seed:
            fp += f'_se{seed}'

        self._set_seed(seed)

        def _row_to_ent(row: Sequence[Any]) -> Optional[EntitySchema]:
            try:
                return EntitySchema(
                    str(row[0]).strip(), (int(row[1]), int(row[2])),
                    (int(row[3]), int(row[4])), float(row[5]))
            except Exception as ex:  # bad rows are skipped (utils.py:190-197)
                log.warning('Failed to build EntitySchema: %s', ex)
                return None

        if hasattr(entities_df, '_values'):
            entities_df = entities_df._values  # pandas DataFrame support
        rows = [_row_to_ent(r) for r in entities_df]
        ents = [r for r in rows if r and r.prompt]
        schema = Schema(bg_prompt, start_style, end_style, tuple(style_blend),
                        ents)
        f = self.pipe.vae_scale
        latent_hw = (init_size[0] // f, init_size[1] // f)
        guidance = encode_schema(schema, self.encoder, latent_hw,
                                 guidance_scale,
                                 cfg=guidance_scale > 1.0,
                                 style_strength=style_strength,
                                 scale=f)
        return self._run(batches, guidance, init_image, init_size, strength,
                         steps, debug, fp, save)
