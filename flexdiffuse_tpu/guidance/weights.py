"""Per-token weight curves for embedding tweening — vectorized TPU-native.

Covers the reference's clustered
peak/valley guidance (``_clustered_guidance`` + ``_traverse_a_to_b``,
guidance.py:88-172), threshold weights (guidance.py:241-246), weight blending
(``_blend_weights``, guidance.py:175-193); the linear ramp and header cap
live inline in :mod:`flexdiffuse_tpu.guidance.tween` (they need traced
endpoints / static gating there).

The reference builds the clustered curve by *sequentially walking* from every
similarity peak down into its neighbouring valleys. That construction has a
closed form, derived and golden-tested against a step-by-step reimplementation
of the reference algorithm:

* peaks ``P = {t ∈ [1, T-2] : s[t] ≥ thr, s[t-1] ≤ s[t] ≥ s[t+1]}``
* between consecutive peaks ``pl < pr`` the valley sits at
  ``v = pl + ceil((pr-pl)/2)``; the curve descends linearly ``1 → 0`` from
  each peak into its valleys; virtual valleys sit at ``0`` and ``T-1``.
* therefore every token's weight depends only on its nearest peak to the left
  (``pl``, via a cumulative max) and to the right (``pr``, via a reversed
  cumulative min) — fully data-parallel, no walking.

Divergence from the reference, on purpose: two *adjacent* equal-similarity
peaks make the reference divide by zero (``_traverse_a_to_b`` with ``d == 0``,
guidance.py:110-114 — e.g. runs of identically-embedded padding tokens). The
closed form returns the limit value (weight 0 at the absorbed peak) instead of
crashing.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def clustered_weights(sims: Array, threshold: Array,
                      guidance: float) -> Tuple[Array, Array]:
    """Closed-form clustered guidance curve.

    Args:
        sims: ``[T]`` per-token mapped similarities.
        threshold: scalar peak-acceptance threshold (the tween passes the mean
            similarity, guidance.py:219,235-237).
        guidance: curve multiplier.

    Returns:
        ``(weights [T], has_peaks scalar bool)``. When no peaks exist the
        reference returns ``None`` and skips blending; callers here select on
        ``has_peaks`` instead.
    """
    t = sims.shape[0]
    pos = jnp.arange(t)
    interior = (pos >= 1) & (pos <= t - 2)
    left = jnp.roll(sims, 1)
    right = jnp.roll(sims, -1)
    peaks = interior & (sims >= threshold) & (left <= sims) & (sims >= right)
    has_peaks = jnp.any(peaks)

    # Nearest peak at-or-left of each position (−1 if none).
    pl = jax.lax.cummax(jnp.where(peaks, pos, -1))
    # Nearest peak at-or-right of each position (T if none).
    pr = jax.lax.cummin(jnp.where(peaks, pos, t)[::-1])[::-1]

    plf = pl.astype(jnp.float32)
    prf = pr.astype(jnp.float32)
    posf = pos.astype(jnp.float32)

    # Case A: before the first peak — valley pinned at 0, descend left from pr.
    denom_a = jnp.maximum(prf, 1.0)
    w_a = 1.0 - (prf - posf) / denom_a

    # Case B: after the last peak — valley pinned at T-1, descend right from pl.
    denom_b = jnp.maximum((t - 1) - plf, 1.0)
    w_b = 1.0 - (posf - plf) / denom_b

    # Case C: between two peaks with valley v = pl + ceil((pr-pl)/2).
    v = plf + jnp.ceil((prf - plf) / 2.0)
    up = 1.0 - (posf - plf) / jnp.maximum(v - plf, 1.0)        # pl → v slope
    down = 1.0 - (prf - posf) / jnp.maximum(prf - v, 1.0)      # v → pr slope
    w_c = jnp.where(posf <= v, up, down)

    w = jnp.where(pl < 0, w_a, jnp.where(pr >= t, w_b, w_c))
    return w * guidance, has_peaks


def blend_weights(a: Array, b: Array) -> Array:
    """Merge two weight curves (reference ``_blend_weights`` guidance.py:175-193).

    Semantics keyed off each curve's *global* max: both non-negative → max;
    ``a`` non-negative but ``b`` negative → sum ("fighting"); ``a`` negative →
    elementwise min regardless of ``b`` (the reference's asymmetry, preserved).
    """
    amax = jnp.max(a)
    bmax = jnp.max(b)
    both = jnp.maximum(a, b)
    fight = a + b
    neg = jnp.minimum(a, b)
    return jnp.where(amax >= 0.0, jnp.where(bmax >= 0.0, both, fight), neg)


def threshold_weights(sims: Array, floor: float, mult: float) -> Array:
    """Flat ``mult`` where similarity clears ``floor``, else 0
    (reference guidance.py:241-246)."""
    return jnp.where(sims < floor, 0.0, jnp.full_like(sims, mult))

