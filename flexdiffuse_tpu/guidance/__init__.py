"""Guidance — image↔text embedding mapping and tweening (the FlexDiffuse core)."""
from flexdiffuse_tpu.config import (GUIDE_ORDER_ALIGN, GUIDE_ORDER_DIRECT,
                                    GUIDE_ORDER_TEXT, GuidanceParams)
from flexdiffuse_tpu.guidance.concepts import ConceptMapper
from flexdiffuse_tpu.guidance.guide import Guide
from flexdiffuse_tpu.guidance.mapping import map_embeddings, similarity_matrix
from flexdiffuse_tpu.guidance.tween import Tweener, apply_tween
from flexdiffuse_tpu.guidance.weights import (blend_weights,
                                              clustered_weights,
                                              threshold_weights)

__all__ = [
    'GUIDE_ORDER_TEXT', 'GUIDE_ORDER_ALIGN', 'GUIDE_ORDER_DIRECT',
    'GuidanceParams', 'ConceptMapper', 'Guide', 'map_embeddings',
    'similarity_matrix', 'Tweener', 'apply_tween', 'blend_weights',
    'clustered_weights', 'threshold_weights'
]
