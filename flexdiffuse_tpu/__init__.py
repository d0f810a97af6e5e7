"""flexdiffuse_tpu — TPU-native image-guided Stable Diffusion framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``tim-speed/flexdiffuse``: image-guided prompt-embedding manipulation
(cosine-similarity mapping + linear/clustered/threshold/concept tweening),
a fully-compiled txt2img/img2img diffusion pipeline, regional composition,
and a data-parallel multi-seed sweep over TPU meshes.

The facade mirrors the reference's module exports (__init__.py:1-14).
"""
from flexdiffuse_tpu.config import (GUIDE_ORDER_ALIGN, GUIDE_ORDER_DIRECT,
                                    GUIDE_ORDER_TEXT, DiffusionParams,
                                    GuidanceParams, RunConfig)
from flexdiffuse_tpu.encode import CLIPEncoder
from flexdiffuse_tpu.guidance import Guide
from flexdiffuse_tpu.pipeline import (CompositeGuidance, FlexPipeline,
                                      SimpleGuidance)
from flexdiffuse_tpu.runner import Runner
from flexdiffuse_tpu.utils.image import image_grid, preprocess

__version__ = '0.1.0'

__all__ = [
    'CLIPEncoder', 'GUIDE_ORDER_TEXT', 'GUIDE_ORDER_ALIGN',
    'GUIDE_ORDER_DIRECT', 'Guide', 'preprocess', 'FlexPipeline',
    'image_grid', 'Runner', 'SimpleGuidance', 'CompositeGuidance',
    'GuidanceParams', 'DiffusionParams', 'RunConfig'
]
