"""SDXLRunner — orchestration for the SDXL backbone (stretch config).

Mirrors :class:`flexdiffuse_tpu.runner.Runner`'s surface for the SDXL model
family: prompt/negative-prompt generation, FlexDiffuse image guidance (the
tween applies to the CLIP-L half of the dual-encoder context — the 768-d
slice CLIP image patches are comparable with), seeding, provenance
filenames and grids. Composition is SD1.x-only for now (the reference's
composition mode predates SDXL).

Image guidance needs the CLIP ViT-L/14 *vision* tower, which the SDXL
snapshot does not ship — pass ``clip_root`` (the reference's
``openai/clip-vit-large-patch14`` snapshot) to enable it.
"""
from __future__ import annotations

import logging
import os
import time
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from flexdiffuse_tpu.config import (MAX_SEED, GuidanceParams, clamp_seed)
from flexdiffuse_tpu.guidance.tween import Tweener
from flexdiffuse_tpu.models.sdxl import (SDXL_LATENT_SCALE, load_sdxl,
                                         sdxl_guidance, tween_sdxl_context)
from flexdiffuse_tpu.pipeline import FlexPipeline
from flexdiffuse_tpu.utils.image import clip_preprocess, image_grid

log = logging.getLogger(__name__)


class SDXLRunner:
    def __init__(self, model_root: str, clip_root: Optional[str] = None,
                 scheduler: str = 'dpmpp', dtype=jnp.bfloat16,
                 output_dir: str = './outputs',
                 refiner_root: Optional[str] = None,
                 refiner_config=None, **load_kwargs) -> None:
        unet, unet_params, vae, vae_params, text = load_sdxl(
            model_root, dtype=dtype, **load_kwargs)
        self.text = text
        # Width of the encoder-1 (CLIP-L) slice of the context — the half
        # image/text guides tween with.
        from flexdiffuse_tpu.models.configs import CLIP_VIT_L14_TEXT
        self._l_dim = load_kwargs.get('te1_config',
                                      CLIP_VIT_L14_TEXT).hidden_size
        self.pipe = FlexPipeline(unet, unet_params, vae, vae_params,
                                 scheduler=scheduler,
                                 latent_scale=SDXL_LATENT_SCALE)
        # Refiner (ensemble-of-expert-denoisers second stage): its own UNet
        # in a pipeline sharing the base VAE; bigG-only conditioning.
        self.refiner_pipe = None
        if refiner_root:
            from flexdiffuse_tpu.models.sdxl import load_sdxl_refiner
            rkw = {} if refiner_config is None else {
                'unet_config': refiner_config}
            r_unet, r_params = load_sdxl_refiner(refiner_root, dtype=dtype,
                                                 **rkw)
            self.refiner_pipe = FlexPipeline(
                r_unet, r_params, vae, vae_params, scheduler=scheduler,
                latent_scale=SDXL_LATENT_SCALE)
        self.vision = None
        if clip_root:
            from flexdiffuse_tpu.models.clip import CLIPVisionModel
            from flexdiffuse_tpu.models.configs import CLIP_VIT_L14_VISION
            from flexdiffuse_tpu.weights import load as wload
            _, vision_params = wload.load_clip(clip_root)
            model = CLIPVisionModel(CLIP_VIT_L14_VISION, dtype=dtype)
            self.vision = (jax.jit(model.apply), vision_params)
        self.output_dir = output_dir
        self._key = jax.random.PRNGKey(0)

    # ------------------------------------------------------------------
    def enable_deepcache(self, interval: int = 2) -> None:
        """DeepCache for the base (and refiner, if loaded): full UNet every
        ``interval``-th step, shallow-levels-only in between. SDXL's level 0
        carries no attention, so its shallow step is especially cheap."""
        iv = int(interval)

        def _with(p):
            if p is None or p.deepcache == iv:
                return p
            return FlexPipeline(p.unet, p.unet_params, p.vae, p.vae_params,
                                scheduler=p.scheduler_kind,
                                scheduler_config=p.scheduler_config,
                                latent_scale=p.latent_scale, deepcache=iv)

        self.pipe = _with(self.pipe)
        self.refiner_pipe = _with(self.refiner_pipe)

    def disable_deepcache(self) -> None:
        self.enable_deepcache(0)

    # ------------------------------------------------------------------
    def enable_tome(self, ratio: float = 0.5, min_seq: int = 4096) -> None:
        """ToMe token merging (ops/tome.py) for the base (and refiner, if
        loaded): merge ``ratio`` of the spatial tokens before every
        self-attention on grids of ≥ ``min_seq`` tokens. At 1024² SDXL's
        4096-token level-1 self-attention is the only one the default
        threshold reaches — exactly the attention-bound one."""
        if not 0.0 < ratio < 1.0:
            raise ValueError('tome ratio must be in (0, 1)')
        tm = (float(ratio), int(min_seq))

        def _with(p):
            if p is None or getattr(p.unet, 'tome', None) == tm:
                return p
            return FlexPipeline(p.unet.clone(tome=tm), p.unet_params,
                                p.vae, p.vae_params,
                                scheduler=p.scheduler_kind,
                                scheduler_config=p.scheduler_config,
                                latent_scale=p.latent_scale,
                                deepcache=p.deepcache)

        self.pipe = _with(self.pipe)
        self.refiner_pipe = _with(self.refiner_pipe)

    def disable_tome(self) -> None:
        def _without(p):
            if p is None or getattr(p.unet, 'tome', None) is None:
                return p
            return FlexPipeline(p.unet.clone(tome=None), p.unet_params,
                                p.vae, p.vae_params,
                                scheduler=p.scheduler_kind,
                                scheduler_config=p.scheduler_config,
                                latent_scale=p.latent_scale,
                                deepcache=p.deepcache)

        self.pipe = _without(self.pipe)
        self.refiner_pipe = _without(self.refiner_pipe)

    # ------------------------------------------------------------------
    def enable_pag(self, layers=('mid',)) -> None:
        """PAG perturbed layers on the BASE stage (Ahn et al. 2024; see
        Runner.enable_pag). The refiner keeps plain CFG — its short
        low-noise tail is past where attention perturbation helps, and
        the official SDXL-PAG workflows perturb the base only."""
        if not layers:
            raise ValueError("pag layers must name at least one "
                             "transformer (e.g. ('mid',))")
        pl = tuple(layers)
        p = self.pipe
        if getattr(p.unet, 'pag_layers', None) != pl:
            self.pipe = FlexPipeline(p.unet.clone(pag_layers=pl),
                                     p.unet_params, p.vae, p.vae_params,
                                     scheduler=p.scheduler_kind,
                                     scheduler_config=p.scheduler_config,
                                     latent_scale=p.latent_scale,
                                     deepcache=p.deepcache)

    def disable_pag(self) -> None:
        p = self.pipe
        if getattr(p.unet, 'pag_layers', None) is not None:
            self.pipe = FlexPipeline(p.unet.clone(pag_layers=None),
                                     p.unet_params, p.vae, p.vae_params,
                                     scheduler=p.scheduler_kind,
                                     scheduler_config=p.scheduler_config,
                                     latent_scale=p.latent_scale,
                                     deepcache=p.deepcache)

    # ------------------------------------------------------------------
    def apply_lora(self, path: str, scale: float = 1.0) -> None:
        """Merge a kohya SDXL LoRA (SGM-named ``lora_unet_*`` +
        ``lora_te1_``/``lora_te2_``) into the loaded weights; repeated
        calls stack (weights/lora.py)."""
        from flexdiffuse_tpu.models.configs import SDXL_UNET
        from flexdiffuse_tpu.weights import load as _load
        from flexdiffuse_tpu.weights import lora as _lora
        sd = _load.load_state_dict(path)
        unet_p, te1_p, te2_p = _lora.apply_lora(
            self.pipe.unet_params, self.text._p1, sd, scale=scale,
            text2_params=self.text._p2, unet_config=SDXL_UNET)
        self.pipe.unet_params = unet_p
        self.text._p1 = te1_p
        self.text._p2 = te2_p

    # ------------------------------------------------------------------
    def load_ip_adapter(self, path: str, image_encoder_dir: str = None,
                        encoder: str = 'vit-h') -> None:
        """Load an SDXL IP-Adapter checkpoint (base 2048-dim projection or
        Plus Resampler — detected from the state dict) into the base
        pipeline. ``encoder`` picks the image-tower geometry for
        ``image_encoder_dir``: ``'vit-h'`` (the ``_vit-h`` checkpoints) or
        ``'bigg'`` (the original ``ip-adapter_sdxl.bin``)."""
        from flexdiffuse_tpu.models.configs import (OPENCLIP_BIGG_VISION,
                                                    OPENCLIP_H_VISION)
        from flexdiffuse_tpu.runner import attach_ip_adapter
        vcfg = {'vit-h': OPENCLIP_H_VISION,
                'bigg': OPENCLIP_BIGG_VISION}[encoder]
        self.pipe, self._ip = attach_ip_adapter(self.pipe, path,
                                                image_encoder_dir,
                                                vision_config=vcfg)

    # ------------------------------------------------------------------
    def compose(self, *args, **kwargs):
        """Regional composition is SD1.x-only (the reference's composition
        mode predates SDXL); the web UI's Compose tab surfaces this error."""
        raise ValueError('composition is not supported for the SDXL family '
                         '(use --model-family sd1)')

    # ------------------------------------------------------------------
    def _set_seed(self, seed: Optional[int]) -> None:
        seed = clamp_seed(seed)
        if seed is None:
            seed = int(np.random.default_rng().integers(0, MAX_SEED))
        self._key = jax.random.PRNGKey(seed)

    def _patches(self, guide: Image.Image) -> jax.Array:
        assert self.vision is not None, (
            'image guidance requires clip_root (CLIP ViT-L/14 snapshot)')
        apply, params = self.vision
        return apply(params, jnp.asarray(clip_preprocess(guide)))

    # ------------------------------------------------------------------
    # Runner.gen keyword surface (cli.py / interface/server.py call shape)
    # → GuidanceParams fields; lets the SDXL family sit behind the same
    # product entries as SD1.x (--model-family sdxl, web UI).
    _GP_FIELDS = {
        'guide_threshold_mult': 'threshold_mult',
        'guide_threshold_floor': 'threshold_floor',
        'guide_clustered': 'clustered',
        'guide_linear': 'linear',
        'guide_max_guidance': 'max_guidance',
        'guide_header_max': 'header_max',
        'guide_mode': 'mode',
        'guide_reuse': 'reuse',
    }
    _UNSUPPORTED = ('mask', 'control_image', 'mapping_concepts',
                    'long_prompt', 'weighted')

    def _ip_fields(self, ip_embed, ip_image, ip_scale: float) -> dict:
        if ip_embed is None and ip_image is None:
            return {}
        if getattr(self, '_ip', None) is None:
            raise ValueError('image prompt given but no IP-Adapter is '
                             'loaded (SDXLRunner.load_ip_adapter)')
        return self._ip.fields(ip_embed, ip_image, ip_scale)

    def gen(self,
            prompt: Union[str, List[str]] = '',
            negative_prompt: str = '',
            guide: Union[Image.Image, str, None] = None,
            guidance_params: Optional[GuidanceParams] = None,
            init_image: Optional[Image.Image] = None,
            init_size: Tuple[int, int] = (1024, 1024),
            strength: float = 0.6,
            steps: int = 25,
            guidance_scale: float = 5.0,
            samples: int = 1,
            seed: Optional[int] = None,
            save: bool = True,
            debug: bool = False,
            refine_strength: float = 0.3,
            aesthetic_score: float = 6.0,
            negative_aesthetic_score: float = 2.5,
            ip_image: Optional[Image.Image] = None,
            ip_embed=None,
            ip_scale: float = 1.0,
            cfg_interval: Optional[Tuple[float, float]] = None,
            guidance_rescale: float = 0.0,
            pag_scale: float = 0.0,
            **ui_kwargs):
        """SDXL generation with optional FlexDiffuse image guidance.

        Accepts the SD1.x ``Runner.gen`` keyword surface: ``guide_*``
        parameters build the :class:`GuidanceParams`; features SDXL does
        not support yet (inpainting mask, ControlNet, IP-Adapter, concept
        mapping, long prompts) raise a clear error instead of being
        silently dropped. A text ``guide`` tweens with the CLIP-L half of
        the context like an image guide does for SD1.x text guides."""
        if guidance_params is None:
            gp_kw = {
                self._GP_FIELDS[k]: (tuple(v) if k == 'guide_linear' else v)
                for k, v in ui_kwargs.items() if k in self._GP_FIELDS
            }
            guidance_params = (GuidanceParams(**gp_kw)
                               if gp_kw else GuidanceParams.ui_defaults())
        for k in self._UNSUPPORTED:
            if ui_kwargs.get(k):
                raise ValueError(f'{k} is not supported for the SDXL '
                                 'family yet (SD1.x only)')
        ui_kwargs.pop('controlnet_scale', None)
        unknown = set(ui_kwargs) - set(self._GP_FIELDS) - set(
            self._UNSUPPORTED)
        if unknown:
            raise TypeError(f'unknown gen() arguments: {sorted(unknown)}')
        self._set_seed(seed)
        g = sdxl_guidance(self.text, prompt, negative_prompt,
                          guidance_scale, size=init_size)
        if cfg_interval is not None:
            # CFG interval (Kynkäänniemi et al. 2024): out-of-interval rows
            # run cond-only at half batch — at 1024² that halves most of
            # the step cost outside [lo, hi]. Bounds are traced (re-tuning
            # never recompiles). The refiner stage keeps full CFG: its short
            # low-noise tail is exactly where guidance does its work.
            g = g.replace(cfg_interval=True,
                          cfg_from=jnp.float32(cfg_interval[0]),
                          cfg_to=jnp.float32(cfg_interval[1]))
        if guidance_rescale:
            g = g.replace(rescale=True,
                          guidance_rescale=jnp.float32(guidance_rescale))
        if pag_scale:
            # PAG on the base stage (the refiner guidance below stays
            # plain CFG — see enable_pag).
            if getattr(self.pipe.unet, 'pag_layers', None) is None:
                self.enable_pag()
            g = g.replace(pag=True, pag_scale=jnp.float32(pag_scale))
        if isinstance(guide, str) and not guide.strip():
            guide = None
        if guide is not None:
            if isinstance(guide, str):
                # Text guide: tween with the guide text's CLIP-L states
                # (same space as the context's 768-d half).
                alt = self.text.encode_l(guide)[0]
            else:
                alt = self._patches(guide)
            tweener = Tweener(guidance_params)
            ctx = tween_sdxl_context(tweener, g.embeddings, alt,
                                     l_dim=self._l_dim)
            g = g.replace(embeddings=ctx)
        ipf = self._ip_fields(ip_embed, ip_image, ip_scale)
        if ipf:
            # Decoupled image-prompt attention on the BASE stage; the
            # refiner UNet ships no adapter weights, so the refine pass
            # (if any) runs text-only — matching the official SDXL
            # IP-Adapter workflows.
            g = g.replace(**ipf)

        refine = self.refiner_pipe is not None and refine_strength > 0
        g_ref = None
        if refine:
            if debug:
                raise ValueError('debug (per-step decode) is not supported '
                                 'with the refiner stage')
            from flexdiffuse_tpu.models.sdxl import sdxl_refiner_guidance
            g_ref = sdxl_refiner_guidance(
                self.text, prompt, negative_prompt, guidance_scale,
                size=init_size, aesthetic_score=aesthetic_score,
                negative_aesthetic_score=negative_aesthetic_score)

        fp = (f'{"xli2i" if init_image is not None else "xlt2i"}'
              f'_st{steps}_gs{int(guidance_scale)}')
        if cfg_interval is not None:
            fp += (f'_ci{int(cfg_interval[0] * 100)}'
                   f'-{int(cfg_interval[1] * 100)}')
        if pag_scale:
            fp += f'_pg{int(pag_scale * 100)}'
        if refine:
            fp += f'_ref{int(refine_strength * 100)}'
        if seed:
            fp += f'_se{seed}'
        all_images: List[Image.Image] = []
        if save:
            os.makedirs(os.path.join(self.output_dir, 'grids'), exist_ok=True)
        for b in range(samples):
            self._key, sub = jax.random.split(self._key)
            t0 = time.time()
            out = self.pipe(g, steps=steps, init_image=init_image,
                            init_size=init_size, strength=strength, key=sub,
                            output_type='latent' if refine else 'pil')
            if refine:
                # SDEdit-style refinement: renoise the base latents to the
                # refine_strength level and denoise with the refiner UNet
                # (shared VAE — latents chain without a decode/encode trip).
                self._key, sub2 = jax.random.split(self._key)
                out = self.refiner_pipe(g_ref, steps=steps,
                                        init_latents=out.images,
                                        strength=refine_strength, key=sub2)
            log.info('sdxl batch %d/%d in %.2fs', b + 1, samples,
                     time.time() - t0)
            if save:
                ms = int(time.time() * 1000)
                for i, img in enumerate(out.images):
                    img.save(f'{self.output_dir}/{ms:>013d}_{i:>02d}_{fp}.png')
            all_images.extend(out.images)
        grid = image_grid(all_images)
        if save:
            ms = int(time.time() * 1000)
            grid.save(f'{self.output_dir}/grids/{ms:>013d}_{fp}.png')
        return all_images, grid
