"""Concept mapping — two-hop guide-image → concept-prompt → base-prompt overwrite.

Vectorized equivalent of the reference's ``ConceptMapper`` (guidance.py:275-312):

* hop 1: guide-image patch embeddings are matched onto the "mapping concepts"
  prompt tokens with no reuse, TEXT order (guidance.py:280-281);
* hop 2: the concept tokens are matched onto the base prompt tokens (reuse,
  ALIGN order, guidance.py:293-294);
* where a hop-2 similarity exceeds 0.9, the output token is overwritten with
  the hop-1 image-patch embedding (guidance.py:305-307).

Reference-faithful indexing quirks preserved: hop-2 row ``r`` writes base
token ``r+1`` (the ``enumerate(..., 1)`` shift at guidance.py:297), and a
row's concept index is shifted down one (``cmi = concept_i - 1``,
guidance.py:299) with ``concept_i == 0`` rows skipped.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from flexdiffuse_tpu.config import GUIDE_ORDER_ALIGN, GUIDE_ORDER_TEXT
from flexdiffuse_tpu.guidance import mapping

Array = jax.Array


@jax.jit
def _concept_map_jit(guide_emb: Array, concept_idx: Array, base_emb: Array,
                     concept_emb: Array, out_emb: Array) -> Array:
    t = base_emb.shape[0]
    c_idx, c_sim = mapping.map_embeddings(concept_emb, base_emb, True,
                                          GUIDE_ORDER_ALIGN)
    # Row r (r in [0, T-2]) targets base token r+1; row T-1 would target the
    # nonexistent token T and is always unmatched — mask it off.
    rows = jnp.arange(t)
    valid = (rows < t - 1) & (c_idx >= 1) & (c_sim > 0.9)
    cmi = jnp.maximum(c_idx - 1, 0)
    img_idx = concept_idx[cmi]                       # hop-1: concept → patch
    replacement = guide_emb[img_idx]                 # [T, D]
    # Scatter onto tokens 1..T-1 from rows 0..T-2.
    out = out_emb.at[1:].set(
        jnp.where(valid[:-1, None], replacement[:-1], out_emb[1:]))
    return out


class ConceptMapper:
    """Maps named concepts from a guide image directly into prompt tokens."""

    def __init__(self, guide_embeddings: Array,
                 concept_embeddings: Array) -> None:
        """Args mirror the reference (guidance.py:276-281): ``guide_embeddings``
        are the ``[1, A, D]`` (or ``[A, D]``) image-patch embeddings and
        ``concept_embeddings`` the encoded mapping-concepts prompt."""
        self.guide_embeddings = (guide_embeddings[0]
                                 if guide_embeddings.ndim == 3 else
                                 guide_embeddings)
        self.concept_embeddings = (concept_embeddings[0]
                                   if concept_embeddings.ndim == 3 else
                                   concept_embeddings)
        self.concept_idx, self.concept_sim = mapping.map_embeddings(
            self.guide_embeddings, self.concept_embeddings, False,
            GUIDE_ORDER_TEXT)

    def map(self, base_embeddings: Array,
            output_embeddings: Array | None = None) -> Array:
        """Overwrite strongly-matching tokens of ``output_embeddings``
        (default: a copy of ``base_embeddings``) with mapped patch embeddings."""
        squeeze = base_embeddings.ndim == 3
        base = base_embeddings[0] if squeeze else base_embeddings
        if output_embeddings is None:
            out = base
        else:
            out = (output_embeddings[0]
                   if output_embeddings.ndim == 3 else output_embeddings)
        res = _concept_map_jit(self.guide_embeddings, self.concept_idx, base,
                               self.concept_embeddings, out)
        return res[None] if squeeze else res
