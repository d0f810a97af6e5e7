"""Checkpoint loading: HF snapshot dirs → converted Flax params, cached.

The reference downloads through ``from_pretrained`` with a ``local_files_only``
toggle (utils.py:59-66, the ``--dl`` flag). This environment has no egress, so
loading works off an on-disk model directory (an HF snapshot of
``CompVis/stable-diffusion-v1-4`` + ``openai/clip-vit-large-patch14``), with
the converted pytrees cached as msgpack next to the snapshot
(SURVEY.md §5 checkpoint/resume: "HF weight download + one-time conversion to
a JAX checkpoint format, cached on disk").
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from flexdiffuse_tpu.models.configs import (CLIPTextConfig, CLIPVisionConfig,
                                            UNetConfig, VAEConfig)
from flexdiffuse_tpu.weights import convert


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch/safetensors state dict as numpy arrays.

    ``path`` may be a ``.safetensors`` file, a torch ``.bin``/``.ckpt``, or a
    directory containing ``diffusion_pytorch_model.safetensors`` /
    ``pytorch_model.bin`` style files.
    """
    if os.path.isdir(path):
        for name in ('diffusion_pytorch_model.safetensors',
                     'model.safetensors', 'pytorch_model.bin',
                     'diffusion_pytorch_model.bin'):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                path = cand
                break
        else:
            raise FileNotFoundError(f'no model weights found under {path}')
    if path.endswith('.safetensors'):
        from safetensors import safe_open
        out = {}
        with safe_open(path, framework='np') as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    import torch
    sd = torch.load(path, map_location='cpu', weights_only=True)
    if 'state_dict' in sd:
        sd = sd['state_dict']

    # A1111 textual-inversion .pt files mix tensors with metadata (name,
    # step, nested string_to_param dict) — flatten dicts, keep tensors,
    # drop scalars/strings.
    out = {}

    def put(prefix, v):
        if torch.is_tensor(v):
            out[prefix] = v.float().numpy()
        elif isinstance(v, dict):
            for k, sub in v.items():
                put(f'{prefix}.{k}' if prefix else str(k), sub)

    put('', sd)
    return out


def _config_tag(*configs) -> str:
    """Short fingerprint of the model configs a cache was converted under —
    loading the same snapshot with different configs must not hit a stale
    cache."""
    import hashlib
    text = '|'.join(repr(c) for c in configs)
    return hashlib.sha1(text.encode()).hexdigest()[:10]


def _cached(cache_path: Optional[str], build,
            legacy_path: Optional[str] = None):
    from flax import serialization
    if cache_path and os.path.exists(cache_path):
        with open(cache_path, 'rb') as f:
            return serialization.msgpack_restore(f.read())
    # Pre-tagging caches (no config fingerprint in the name) are still
    # valid for default configs — reuse instead of reconverting gigabytes.
    if legacy_path and os.path.exists(legacy_path):
        with open(legacy_path, 'rb') as f:
            return serialization.msgpack_restore(f.read())
    params = build()
    if cache_path:
        os.makedirs(os.path.dirname(cache_path) or '.', exist_ok=True)
        with open(cache_path, 'wb') as f:
            f.write(serialization.msgpack_serialize(params))
    return params


def load_clip(model_dir: str,
              text_config: CLIPTextConfig = CLIPTextConfig(),
              vision_config: CLIPVisionConfig = CLIPVisionConfig(),
              cache: bool = True):
    """Load CLIP text+vision params from an ``openai/clip-vit-large-patch14``
    snapshot dir. Returns ``(text_params, vision_params)`` (flax-style, each
    wrapped in ``{'params': ...}``)."""

    def build():
        sd = load_state_dict(model_dir)
        return {
            'text': convert.convert_clip_text(sd, text_config),
            'vision': convert.convert_clip_vision(sd, vision_config),
        }

    tag = _config_tag(text_config, vision_config)
    cache_path = (os.path.join(model_dir,
                               f'flexdiffuse_tpu_clip_{tag}.msgpack')
                  if cache else None)
    default_cfgs = (text_config == CLIPTextConfig()
                    and vision_config == CLIPVisionConfig())
    legacy = (os.path.join(model_dir, 'flexdiffuse_tpu_clip.msgpack')
              if cache and default_cfgs else None)
    both = _cached(cache_path, build, legacy)
    return {'params': both['text']}, {'params': both['vision']}


def load_sd(model_dir: str,
            unet_config: UNetConfig = UNetConfig(),
            vae_config: VAEConfig = VAEConfig(),
            cache: bool = True):
    """Load UNet+VAE params from a diffusers snapshot dir (expects ``unet/``
    and ``vae/`` subdirs). Returns ``(unet_params, vae_params)``.

    Config-parametric: SD1.4 with the defaults, SD2.1 via
    ``load_sd(dir, SD21_UNET, SD21_VAE)`` (use_linear_projection transformer
    weights convert through the 2-D→1×1-conv rule), SDXL via
    :func:`load_sdxl`."""

    def build():
        unet_sd = load_state_dict(os.path.join(model_dir, 'unet'))
        vae_sd = load_state_dict(os.path.join(model_dir, 'vae'))
        return {
            'unet': convert.convert_unet(unet_sd, unet_config),
            'vae': convert.convert_vae(vae_sd, vae_config),
        }

    tag = _config_tag(unet_config, vae_config)
    cache_path = (os.path.join(model_dir,
                               f'flexdiffuse_tpu_sd_{tag}.msgpack')
                  if cache else None)
    default_cfgs = (unet_config == UNetConfig()
                    and vae_config == VAEConfig())
    legacy = (os.path.join(model_dir, 'flexdiffuse_tpu_sd.msgpack')
              if cache and default_cfgs else None)
    both = _cached(cache_path, build, legacy)
    return {'params': both['unet']}, {'params': both['vae']}
