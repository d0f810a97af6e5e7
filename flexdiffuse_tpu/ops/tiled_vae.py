"""Tiled VAE encode/decode — bounded-memory large-image support.

Beyond-reference capability (the reference's only memory lever is attention
slicing, ``/root/reference/pipeline/flex.py:85-110``, which does nothing for
the VAE): at 2048² the SD VAE decoder's activations alone exceed a single
chip's HBM. Tiling splits the spatial plane into overlapping tiles, runs the
conv tower per tile, and linearly cross-fades the overlaps.

TPU-first shape: the tile grid is computed from *static* shapes at trace
time, every tile shares one compiled executable (one compile, N launches,
peak memory = one tile), and the seam blend is a weighted scatter-add with
precomputed ramp masks followed by one normalization divide — no sequential
row/column blending. Normalizing by the accumulated mask weight makes canvas
borders exact (a region covered by a single tile gets ``x·w/w = x``)
regardless of tile placement.
"""
from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def tile_starts(total: int, tile: int, stride: int) -> List[int]:
    """Static tile origins covering ``[0, total)``; the last tile is clamped
    flush to the end so every position is covered by ≥1 tile."""
    if total <= tile:
        return [0]
    starts = list(range(0, total - tile + 1, stride))
    if starts[-1] != total - tile:
        starts.append(total - tile)
    return starts


def _ramp(length: int, overlap: int) -> np.ndarray:
    """1-D blend profile: linear ramp over ``overlap`` samples at both ends
    (strictly positive at the edge so the normalization divide is safe)."""
    r = np.ones(length, np.float32)
    o = min(overlap, length // 2)
    if o > 0:
        up = np.arange(1, o + 1, dtype=np.float32) / (o + 1)
        r[:o] = up
        r[length - o:] = up[::-1]
    return r


def blend_mask(th: int, tw: int, oy: int, ox: int) -> np.ndarray:
    """``[1, th, tw, 1]`` separable ramp mask for a ``th×tw`` output tile."""
    return np.outer(_ramp(th, oy), _ramp(tw, ox))[None, :, :, None]


def tiled_apply(fn: Callable, x: Array, tile: int, overlap: int,
                out_num: int = 1, out_den: int = 1):
    """Apply ``fn`` tile-wise over the spatial dims of ``x`` and cross-fade.

    ``fn`` maps ``[B, tile, tile, C] -> [B, tile·out_num/out_den, ·, C']``
    (or a pytree of such arrays sharing spatial dims — e.g. VAE encoder
    moments). ``out_num/out_den`` is the spatial scale factor: ``(f, 1)``
    for the decoder's upsampling, ``(1, f)`` for the encoder. Tiles are
    launched sequentially so peak activation memory is one tile's.
    """
    B, H, W, _ = x.shape
    if H <= tile and W <= tile:
        return fn(x)
    stride = tile - overlap
    if stride <= 0:
        raise ValueError(f'overlap {overlap} must be < tile {tile}')
    # Per-axis effective tile size: a canvas smaller than ``tile`` along one
    # axis (e.g. a wide-short image) yields sub-tile-sized blocks there —
    # the blend mask and accumulation slices must match that size.
    th, tw = min(tile, H), min(tile, W)
    ys = tile_starts(H, th, stride)
    xs = tile_starts(W, tw, stride)

    def _o(v: int) -> int:
        return v * out_num // out_den

    mask = jnp.asarray(blend_mask(_o(th), _o(tw), _o(overlap),
                                  _o(overlap)))
    acc = None
    wsum = jnp.zeros((1, _o(H), _o(W), 1), jnp.float32)
    for y0 in ys:
        for x0 in xs:
            out = fn(x[:, y0:y0 + th, x0:x0 + tw, :])
            oy, ox = _o(y0), _o(x0)
            if acc is None:
                acc = jax.tree_util.tree_map(
                    lambda t: jnp.zeros((B, _o(H), _o(W), t.shape[-1]),
                                        jnp.float32), out)
            acc = jax.tree_util.tree_map(
                lambda a, t: a.at[:, oy:oy + t.shape[1],
                                  ox:ox + t.shape[2], :].add(
                                      t.astype(jnp.float32) * mask),
                acc, out)
            wsum = wsum.at[:, oy:oy + _o(th), ox:ox + _o(tw), :].add(mask)
    return jax.tree_util.tree_map(lambda a: a / wsum, acc)
