"""The Tweener — blends text-token embeddings toward mapped alt embeddings.

Vectorized, jit-compiled equivalent of the reference's ``Tweener``
(guidance.py:196-272). The reference's 77-iteration Python lerp loop
(guidance.py:258-271) becomes one gather + three ``where`` lanes; the whole
tween (similarity mapping → weight curves → lerp) runs as a single compiled
XLA program so re-blending with new guidance parameters never leaves HBM
(params enter as traced scalars — changing them does not recompile).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from flexdiffuse_tpu.config import GuidanceParams
from flexdiffuse_tpu.guidance import mapping, weights as W

Array = jax.Array


def apply_tween(base_emb: Array, alt_emb: Array, mapped_idx: Array,
                mapped_sim: Array, alt_weights: Array,
                max_guidance: Array) -> Array:
    """Per-token lerp text→alt with full-replacement cap
    (reference guidance.py:256-272).

    Args:
        base_emb: ``[T, D]`` prompt embeddings.
        alt_emb: ``[A, D]`` alt embeddings.
        mapped_idx / mapped_sim: ``[T]`` mapping from :func:`map_embeddings`.
        alt_weights: ``[T]`` blended weight curve.
        max_guidance: scalar cap on the per-token weight.

    Returns:
        ``[T, D]`` tweened embeddings.
    """
    iw = jnp.minimum(alt_weights, max_guidance)[:, None]        # [T, 1]
    sd = (1.0 - mapped_sim)[:, None]                            # [T, 1]
    alt = alt_emb[mapped_idx]                                   # [T, D] gather
    lerp = base_emb + (alt - base_emb) * iw
    out = jnp.where(jnp.abs(iw) >= sd, alt, lerp)
    return jnp.where(iw == 0.0, base_emb, out)


@functools.partial(jax.jit, static_argnames=("mode", "reuse", "header_capped"))
def _tween_jit(base_emb: Array, alt_emb: Array, threshold_floor: Array,
               threshold_mult: Array, linear_start: Array, linear_end: Array,
               clustered: Array, max_guidance: Array, header_max: Array,
               mode: int, reuse: bool, header_capped: bool) -> Array:
    t = base_emb.shape[0]
    idx, sim = mapping.map_embeddings(alt_emb, base_emb, reuse, mode)
    avg_sim = jnp.mean(sim)

    # Linear ramp (linspace with traced endpoints).
    frac = jnp.arange(t, dtype=jnp.float32) / float(t - 1)
    alt_w = linear_start + (linear_end - linear_start) * frac

    # Clustered curve, gated on `clustered != 0` and on peak existence
    # (reference guidance.py:234-239).
    cw, has_peaks = W.clustered_weights(sim, avg_sim, 1.0)
    cw = cw * clustered
    use_clustered = (clustered != 0.0) & has_peaks
    alt_w = jnp.where(use_clustered, W.blend_weights(alt_w, cw), alt_w)

    # Threshold curve, gated on `threshold_mult != 0` (guidance.py:241-246).
    th = W.threshold_weights(sim, threshold_floor, threshold_mult)
    alt_w = jnp.where(threshold_mult != 0.0, W.blend_weights(alt_w, th), alt_w)

    # Header cap (guidance.py:249-254). `header_capped` is static because the
    # reference skips the cap entirely when header_max >= 1.
    if header_capped:
        hw = alt_w[0]
        capped = jnp.where(hw >= 0, jnp.minimum(hw, header_max),
                           jnp.maximum(hw, -header_max))
        alt_w = alt_w.at[0].set(capped)

    return apply_tween(base_emb, alt_emb, idx, sim, alt_w, max_guidance)


class Tweener:
    """Parameter bundle + callable tween (reference ``Tweener`` guidance.py:196-272).

    Thin object wrapper so the public API mirrors the reference; all compute
    is the jitted pure function above.
    """

    def __init__(self, params: GuidanceParams = GuidanceParams()) -> None:
        self.params = params

    def tween(self, base_emb: Array, alt_emb: Array) -> Array:
        """Blend ``alt_emb`` into ``base_emb``.

        Accepts ``[T, D]`` or the reference's ``[1, T, D]`` layout and returns
        the same rank it was given.
        """
        p = self.params
        squeeze_base = base_emb.ndim == 3
        base = base_emb[0] if squeeze_base else base_emb
        alt = alt_emb[0] if alt_emb.ndim == 3 else alt_emb
        out = _tween_jit(
            base, alt,
            jnp.float32(p.threshold_floor), jnp.float32(p.threshold_mult),
            jnp.float32(p.linear[0]), jnp.float32(p.linear[1]),
            jnp.float32(p.clustered), jnp.float32(p.max_guidance),
            jnp.float32(p.header_max), p.mode, p.reuse,
            p.header_max < 1.0)
        return out[None] if squeeze_base else out
