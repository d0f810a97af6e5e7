"""Guide — the top-level embedding-manipulation facade.

TPU-native equivalent of the reference's ``Guide`` (guidance.py:315-474):
validates the prompt, encodes prompt / guide (image or text), builds the
tween + optional concept mapping, and handles the pure-image fallback path.

The encoder is any object exposing ``prompt(str | list[str]) -> [B, T, D]``
and ``image(PIL.Image) -> [1, A, D]`` (see :mod:`flexdiffuse_tpu.encode`);
tests inject deterministic fakes.
"""
from __future__ import annotations

import logging
from typing import List, Optional, Union

import jax.numpy as jnp

from flexdiffuse_tpu.config import GuidanceParams
from flexdiffuse_tpu.guidance.concepts import ConceptMapper
from flexdiffuse_tpu.guidance.tween import Tweener

log = logging.getLogger(__name__)

# Moving the leading patch embedding toward a text header: the reference uses
# the header of the placeholder prompt '{}' at 85% (guidance.py:333-335,469-472).
PLACEHOLDER_PROMPT = '{}'
HEADER_PULL = 0.85


class Guide:
    """Generate prompt/image embeddings and tween the space of their numbers."""

    def __init__(self, encoder) -> None:
        self.encoder = encoder
        self.placeholder_embed = encoder.prompt(PLACEHOLDER_PROMPT)

    def embeds(self,
               prompt: Union[str, List[str]] = '',
               guide=None,
               mapping_concepts: str = '',
               params: Optional[GuidanceParams] = None,
               text_embeddings=None,
               **overrides):
        """Build CLIP embeddings for the denoiser from text and/or a guide.

        Args:
            prompt: prompt text or batch of prompts.
            guide: a PIL image, guide text, or None.
            mapping_concepts: concepts to fully map from the guide image.
            params: tween parameters; keyword overrides (``threshold_mult=...``
                etc., matching :class:`GuidanceParams` fields) are applied on
                top, so the reference's flat-kwarg call shape
                (guidance.py:337-348) still works.
            text_embeddings: optional pre-encoded ``[B, 77, D]`` prompt
                window — used by the long-prompt path to tween the first
                77-token window of a chunked encoding; ``prompt`` is ignored
                for encoding (treated as present for control flow).

        Returns:
            ``[B, T, D]`` embeddings for the denoising pipeline.

        Raises:
            ValueError: no prompt and no guide, or a bad prompt type
                (reference guidance.py:392-401).
        """
        import dataclasses
        params = params or GuidanceParams()
        if overrides:
            params = dataclasses.replace(params, **overrides)

        if isinstance(prompt, str):
            prompt = prompt.strip()
        elif isinstance(prompt, list):
            prompt = [ss for ss in (s.strip() for s in prompt) if ss]
        else:
            raise ValueError(f'`prompt` has to be of type `str` '
                             f'or `list` but is {type(prompt)}')
        if isinstance(guide, str) and not guide.strip():
            guide = None  # blank guide text is no guide at all
        if not prompt and guide is None and text_embeddings is None:
            raise ValueError('No prompt, or guide image provided.')

        guide_embeddings = None
        concept_mapper: Optional[ConceptMapper] = None
        if text_embeddings is None and prompt:
            text_embeddings = self.encoder.prompt(prompt)
        if guide is not None:
            if isinstance(guide, str):
                guide = guide.strip()
                if guide:
                    guide_embeddings = self.encoder.prompt(guide)
            else:
                guide_embeddings = self.encoder.image(guide)
                if mapping_concepts:
                    concept_mapper = ConceptMapper(
                        guide_embeddings,
                        self.encoder.prompt(mapping_concepts))

        tweener = Tweener(params)

        def _tween(alt_emb, txt_emb):
            out = tweener.tween(txt_emb, alt_emb)
            if concept_mapper is not None:
                out = concept_mapper.map(txt_emb, out)
            return out

        if text_embeddings is not None:
            if guide_embeddings is not None:
                if text_embeddings.shape[0] > 1:
                    rows = [
                        _tween(guide_embeddings, text_embeddings[i:i + 1])[0]
                        for i in range(text_embeddings.shape[0])
                    ]
                    return jnp.stack(rows)
                return _tween(guide_embeddings, text_embeddings)
            return text_embeddings

        assert guide_embeddings is not None
        if isinstance(guide, str):
            log.warning('Using the guide like a prompt — just use prompt.')
            return guide_embeddings
        # Pure-image guidance: first T patch embeddings, header pulled 85%
        # toward the placeholder text header (reference guidance.py:452-472).
        log.warning('Guiding purely from an image — SD was not trained for '
                    'this; results will be strange.')
        t = self.placeholder_embed.shape[1]
        emb = guide_embeddings[:, :t, :]
        d_emb = self.placeholder_embed[:, 0, :] - emb[:, 0, :]
        emb = emb.at[:, 0, :].add(d_emb * HEADER_PULL)
        return emb
