"""Typed configuration — the single source of parameter defaults.

The reference scatters its defaults across three places (``guidance.py:337-348``,
``utils.py:114-133`` and the UI slider values in ``interface/sandbox.py:70-180``).
Here every tunable lives in one frozen dataclass; the UI, the runner and the
library API all read from these.

Guide-order constants mirror ``guidance.py:18-20`` of the reference.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

# Mapping priority modes (reference: guidance.py:18-20).
GUIDE_ORDER_TEXT = 0
GUIDE_ORDER_ALIGN = 1
GUIDE_ORDER_DIRECT = 2

# CLIP / SD geometry (reference: encode/clip.py:11-12).
CLIP_IMAGE_SIZE = 224
MAX_SINGLE_DIM = 512
MAX_TOKENS = 77

# VAE latent scaling used by SD v1.x (reference: pipeline/flex.py:117,192).
LATENT_SCALE = 0.18215

# Seeds are clamped into the torch-compatible range (reference: utils.py:22,78-83).
MAX_SEED = 2147483647


@dataclasses.dataclass(frozen=True)
class GuidanceParams:
    """Parameters of the embedding tween (reference: guidance.py:337-348).

    UI defaults differ from library defaults in the reference; we keep the
    library defaults here and expose the UI defaults via :func:`ui_defaults`.
    """

    threshold_mult: float = 0.5
    threshold_floor: float = 0.5
    clustered: float = 0.5
    linear: Tuple[float, float] = (0.0, 0.5)
    max_guidance: float = 0.5
    header_max: float = 0.15
    mode: int = GUIDE_ORDER_ALIGN
    reuse: bool = True

    @staticmethod
    def ui_defaults() -> "GuidanceParams":
        """Slider defaults from the reference UI (interface/sandbox.py:96-158)."""
        return GuidanceParams(
            threshold_mult=0.25,
            threshold_floor=0.75,
            clustered=0.15,
            linear=(0.1, 0.5),
            max_guidance=0.35,
            header_max=0.0,
            mode=GUIDE_ORDER_ALIGN,
            reuse=True,
        )


@dataclasses.dataclass(frozen=True)
class DiffusionParams:
    """Denoise-loop parameters (reference: utils.py:114-133, pipeline/flex.py:126-137)."""

    steps: int = 30
    guidance_scale: float = 8.0
    strength: float = 0.6
    eta: float = 0.0
    height: int = 512
    width: int = 512
    scheduler: str = "pndm"  # 'ddim' | 'pndm' | 'lms'
    dtype: str = "bfloat16"  # compute dtype for the UNet/VAE on TPU


@dataclasses.dataclass(frozen=True)
class RunConfig:
    """Top-level run configuration for :class:`flexdiffuse_tpu.runner.Runner`."""

    sd_model: str = "CompVis/stable-diffusion-v1-4"
    clip_model: str = "openai/clip-vit-large-patch14"
    output_dir: str = "./outputs"
    local_only: bool = True
    seed: Optional[int] = None
    batches: int = 4
    debug: bool = False


def clamp_seed(seed: Optional[int]) -> Optional[int]:
    """Clamp a user seed into ``[0, MAX_SEED]`` (reference: utils.py:78-83)."""
    if not seed:
        return None
    return min(max(int(seed), 0), MAX_SEED)
