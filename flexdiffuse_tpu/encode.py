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

    def prompt_weighted(self, prompt: str, max_chunks: int = 8) -> Array:
        """Emphasis-weighted encoding (A1111 ``(word:1.3)`` syntax — see
        ``text/emphasis.py``). Handles long prompts the same way as
        :meth:`prompt_chunked` (75-token windows; ``BREAK`` forces a window
        boundary), scales each token's embedding by its parsed weight, and
        restores the per-window embedding mean so overall conditioning
        magnitude (and therefore effective CFG strength) is unchanged.
        Returns ``[1, 77·k, D]`` (``k=1`` for short prompts)."""
        from flexdiffuse_tpu.text.emphasis import tokenize_weighted
        tk = self.tokenizer
        ids, weights, breaks = tokenize_weighted(tk, prompt)
        window = tk.model_max_length - 2            # 75 content tokens
        chunks: list = []
        cur_i: list = []
        cur_w: list = []
        for idx, (i, w) in enumerate(zip(ids, weights)):
            if (idx in breaks and cur_i) or len(cur_i) == window:
                chunks.append((cur_i, cur_w))
                cur_i, cur_w = [], []
            cur_i.append(i)
            cur_w.append(w)
        if cur_i or not chunks:
            chunks.append((cur_i, cur_w))
        if len(chunks) > max_chunks:
            logging.getLogger(__name__).warning(
                'weighted prompt needs %d chunks; truncating to '
                'max_chunks=%d', len(chunks), max_chunks)
            chunks = chunks[:max_chunks]
        k = len(chunks)
        rows = np.full((k, tk.model_max_length), tk.eos_token_id, np.int32)
        wrows = np.ones((k, tk.model_max_length), np.float32)
        for r, (ci, cw) in enumerate(chunks):
            rows[r, 0] = tk.bos_token_id
            rows[r, 1:1 + len(ci)] = ci
            rows[r, 1 + len(ci)] = tk.eos_token_id
            wrows[r, 1:1 + len(cw)] = cw
        enc = self._text_apply(self._text_params, jnp.asarray(rows),
                               output=self._output)   # [k, 77, D]
        if np.allclose(wrows, 1.0):
            return enc.reshape(1, -1, enc.shape[-1])
        w = jnp.asarray(wrows)[..., None]
        mean_before = enc.mean(axis=(1, 2), keepdims=True)
        z = enc * w
        mean_after = z.mean(axis=(1, 2), keepdims=True)
        # Multiplicative mean restoration (the community convention). The
        # degenerate near-zero-mean case (possible with random-init test
        # towers; real CLIP means are distinctly nonzero) would make the
        # ratio arbitrary — fall back to an additive shift there, which
        # restores the mean exactly without rescaling the context.
        safe = jnp.abs(mean_after) > 1e-6 * jnp.abs(z).mean()
        ratio = jnp.where(safe,
                          mean_before / jnp.where(safe, mean_after, 1.0),
                          1.0)
        shift = jnp.where(safe, 0.0, mean_before - mean_after)
        return (z * ratio + shift).reshape(1, -1, z.shape[-1])

    def image(self, image) -> Array:
        if isinstance(image, np.ndarray) and image.ndim == 4:
            pixels = jnp.asarray(image)  # already preprocessed NHWC
        else:
            pixels = jnp.asarray(clip_preprocess(image))
        return self._vision_apply(self._vision_params, pixels)
