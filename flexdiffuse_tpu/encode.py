"""CLIPEncoder — text and image embedding facade (reference encode/clip.py).

Wraps the Flax CLIP towers + tokenizer behind the two-method contract the
guidance system consumes:

* ``prompt(str | list[str]) -> [B, 77, 768]`` — tokenize (pad/truncate to
  77) and run the text tower's post-LN last hidden state
  (reference encode/clip.py:47-65);
* ``image(PIL) -> [1, 257, 768]`` — SD-preprocess → center-crop → 224²
  bicubic → normalize (from the [-1,1] range, a reference quirk) → vision
  tower with the all-patch ``post_layernorm`` + ``visual_projection`` path
  (reference encode/clip.py:67-100).

Both towers are jit-compiled once; prompts of any batch size reuse the same
executable per shape.
"""
from __future__ import annotations

from typing import List, Union

import logging

import jax
import jax.numpy as jnp
import numpy as np

from flexdiffuse_tpu.utils.image import clip_preprocess

Array = jax.Array


class CLIPEncoder:
    def __init__(self, text_model, text_params, vision_model, vision_params,
                 tokenizer, clip_skip: int = 0) -> None:
        """``clip_skip=1`` conditions on the penultimate hidden state run
        through ``final_layer_norm`` — the diffusers/A1111 convention many
        fine-tuned SD1.x checkpoints are trained against (the raw un-normed
        tap is the SDXL path, not this one); 0 is the reference behavior."""
        self.tokenizer = tokenizer
        self._text_model = text_model
        self._text_apply = jax.jit(text_model.apply,
                                   static_argnames=('output',))
        self._vision_apply = jax.jit(vision_model.apply)
        self._text_params = text_params
        self._vision_params = vision_params
        if clip_skip not in (0, 1):
            raise ValueError('clip_skip must be 0 or 1')
        self._output = 'penultimate_norm' if clip_skip else 'final'

    def replace_text(self, text_model, text_params) -> None:
        """Swap the text tower (e.g. after a textual-inversion vocabulary
        extension); re-jits the apply for the new module."""
        self._text_model = text_model
        self._text_apply = jax.jit(text_model.apply,
                                   static_argnames=('output',))
        self._text_params = text_params

    def prompt(self, prompt: Union[str, List[str]]) -> Array:
        ids = jnp.asarray(self.tokenizer(prompt))
        return self._text_apply(self._text_params, ids, output=self._output)

    def prompt_chunked(self, prompt: str, max_chunks: int = 8) -> Array:
        """Long-prompt encoding (A1111 convention): token ids beyond the
        75-content-token window split into BOS…EOS chunks, each encoded
        separately, contexts concatenated → ``[1, 77·k, D]``.

        ``k`` is padded up to the number of chunks the prompt needs (capped
        at ``max_chunks``) — cross-attention accepts any context length.
        Returns the plain 77-token encoding for short prompts.
        """
        tk = self.tokenizer
        content = tk.encode(prompt)
        window = tk.model_max_length - 2            # 75 content tokens
        if len(content) <= window:
            return self.prompt(prompt)
        chunks = [content[i:i + window]
                  for i in range(0, len(content), window)]
        if len(chunks) > max_chunks:
            logging.getLogger(__name__).warning(
                'prompt needs %d chunks; truncating to max_chunks=%d '
                '(%d tokens dropped)', len(chunks), max_chunks,
                len(content) - max_chunks * window)
            chunks = chunks[:max_chunks]
        rows = np.full((len(chunks), tk.model_max_length), tk.eos_token_id,
                       np.int32)
        for r, ch in enumerate(chunks):
            rows[r, 0] = tk.bos_token_id
            rows[r, 1:1 + len(ch)] = ch
            rows[r, 1 + len(ch)] = tk.eos_token_id
        enc = self._text_apply(self._text_params, jnp.asarray(rows),
                               output=self._output)   # [k, 77, D]
        return enc.reshape(1, -1, enc.shape[-1])

    def image(self, image) -> Array:
        if isinstance(image, np.ndarray) and image.ndim == 4:
            pixels = jnp.asarray(image)  # already preprocessed NHWC
        else:
            pixels = jnp.asarray(clip_preprocess(image))
        return self._vision_apply(self._vision_params, pixels)
