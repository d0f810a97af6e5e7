"""GroupNorm with a producer fusion barrier — pure XLA, no Pallas.

The round-2 HLO archaeology (tools/dump_hlo.py + profile_scan.py) showed
where the profiled GroupNorm cost actually comes from: flax's
``nn.GroupNorm(dtype=float32)`` converts the activation to f32 *before* the
stat reduces, and XLA fuses that convert (and the ``square`` for the
variance) backwards into the producing convolution — so every conv feeding a
GroupNorm emits ``(f32 x, f32 x²)`` tuple outputs at full activation size:
4× the HBM write traffic of the bf16 activation, plus f32 relayout copies
downstream. The fix is not a custom kernel (the Pallas GroupNorm was a
measured rejection — ops/group_norm.py); it is an ``optimization_barrier``
on the input so the conv emits plain bf16 and the convert+square+reduce form
a single ``convert_reduce`` fusion that reads bf16 from HBM and accumulates
in f32 — the pattern XLA already produces for the small mid-block norms.

Numerics match ``nn.GroupNorm``: f32 statistics (mean, E[x²]−E[x]², ε inside
rsqrt), f32 scale/shift, output in the input dtype's compute chain (the
caller converts). Parameter names (``scale``/``bias``) match ``nn.GroupNorm``
so checkpoints convert identically.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def group_norm(x: Array, groups: int, scale: Array, bias: Array,
               epsilon: float = 1e-5, barrier=True) -> Array:
    """GroupNorm over the channel-last dim of ``[B, ..., C]``; returns f32.

    Statistics are computed in two stages so the big reduce keeps channels
    in the lane dimension (reducing a ``[b, spatial, groups, C/groups]``
    reshape directly puts C/groups ≤ 40 elements minor — pathological
    tiling): spatial-only per-channel sums ``[b, C]``, then a tiny grouped
    sum. Mathematically identical to flax's mean/E[x²] form.
    """
    xs = x
    if barrier == 'stats':
        # Split variant: only the stats reduce reads through the barrier —
        # the producing conv emits plain bf16 once, while the normalize
        # apply below stays fusable with both the producer's epilogue and
        # the consumer (the full barrier variant blocked those fusions and
        # measured slower; tools/flash_tt.py step()).
        (xs,) = jax.lax.optimization_barrier((x,))
    elif barrier:
        (x,) = jax.lax.optimization_barrier((x,))
        xs = x
    shape = x.shape
    b, c = shape[0], shape[-1]
    per = c // groups
    n = 1
    for dim in shape[1:-1]:
        n *= dim
    n *= per
    red = tuple(range(1, len(shape) - 1))
    xf = x.astype(jnp.float32)
    xsf = xs.astype(jnp.float32)
    s1c = jnp.sum(xsf, axis=red)                             # [b, c]
    s2c = jnp.sum(jnp.square(xsf), axis=red)                 # [b, c]
    s1 = jnp.sum(s1c.reshape(b, groups, per), axis=-1)       # [b, groups]
    s2 = jnp.sum(s2c.reshape(b, groups, per), axis=-1)
    mean = s1 / n
    var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + epsilon)                       # [b, groups]
    # Fold everything into one per-channel affine: y = x·a + d.
    sc = scale.astype(jnp.float32).reshape(groups, per)
    a = (inv[..., None] * sc).reshape(b, c)
    d = (bias.astype(jnp.float32).reshape(groups, per)[None] -
         (mean * inv)[..., None] * sc).reshape(b, c)
    bshape = (b,) + (1,) * (len(shape) - 2) + (c,)
    return xf * a.reshape(bshape) + d.reshape(bshape)


class GroupNorm(nn.Module):
    """Drop-in for ``nn.GroupNorm(num_groups, epsilon, dtype=float32)`` with
    the barrier stats path. Same param names/shapes; always computes (and
    returns) f32 like the model's norm contract expects."""

    num_groups: int
    epsilon: float = 1e-5
    barrier: Any = True  # True | False | 'stats'

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (c,))
        bias = self.param('bias', nn.initializers.zeros, (c,))
        return group_norm(x, self.num_groups, scale, bias, self.epsilon,
                          barrier=self.barrier)
