"""Pipeline — the compiled denoising loop and guide-as-data conditioning."""
from flexdiffuse_tpu.pipeline.flex import FlexPipeline, FlexPipelineOutput
from flexdiffuse_tpu.pipeline.guides import (CompositeGuidance,
                                             InstructPix2PixGuidance,
                                             SimpleGuidance, entity_masks,
                                             prompt_guidance)

__all__ = [
    'FlexPipeline', 'FlexPipelineOutput', 'SimpleGuidance',
    'CompositeGuidance', 'InstructPix2PixGuidance', 'entity_masks',
    'prompt_guidance'
]
