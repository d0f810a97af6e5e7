"""Fused GroupNorm(+affine, optional SiLU) Pallas kernel.

XLA compiles each UNet GroupNorm into a convert+reduce fusion (fp32 stats)
plus a convert+multiply fusion (apply), i.e. three HBM passes over the
activation per norm — ~2.5 ms of a 19.5 ms SD step (profiled,
docs/PERFORMANCE.md). This kernel reads the activation once into VMEM,
computes fp32 group statistics on-chip, applies the affine + optional SiLU,
and writes once: the minimum possible HBM traffic (one read + one write).

**Status: measured and NOT integrated.** In isolation the kernel is ~5×
faster than XLA's norm fusions, but swapping it into the UNet made the
whole step *slower* (49.3 → 37.4 steps/s): the Pallas boundary breaks
XLA's producer/consumer fusion around every norm and the neighboring conv
fusions balloon (docs/PERFORMANCE.md, round-2 rejection log). The UNet and
VAE therefore keep ``nn.GroupNorm``; this module stays as a unit-tested
library op and as the measured record of the experiment.

Layout: NHWC with channels last — the group axis is a *lane* axis, so group
sums reduce [HW, C] over sublanes (cheap VPU column reduction) and then fold
C → (groups, C/groups) on a [1, C] vector (trivial relayout at that size).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Single-block budget: the activation block [HW, C] must sit in VMEM in
# fp32 alongside its bf16 input copy and the output. UNet levels peak at
# 4096×320 (level 0) = 5.2 MB fp32 — comfortably inside; the VAE's decode
# activations (up to 262144×512) are dispatched to the XLA path.
_MAX_BLOCK_BYTES = 8 * 1024 * 1024


def _gn_kernel(x_ref, g_ref, b_ref, o_ref, *, groups: int, eps: float,
               silu: bool):
    x = x_ref[0].astype(jnp.float32)                     # [HW, C]
    hw, c = x.shape
    gc = c // groups
    s1 = jnp.sum(x, axis=0, keepdims=True)               # [1, C]
    s2 = jnp.sum(x * x, axis=0, keepdims=True)
    # Group fold/unfold as matmuls against the one-hot membership matrix
    # (Mosaic has no [1,C]→[G,gc] relayout, but 1×C×G matmuls are trivial).
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    member = (ch // gc == grp).astype(jnp.float32)       # [C, G]
    dot = lambda a, b, dims: jax.lax.dot_general(
        a, b, (dims, ((), ())), preferred_element_type=jnp.float32)
    gs1 = dot(s1, member, ((1,), (0,)))                  # [1, G]
    gs2 = dot(s2, member, ((1,), (0,)))
    n = jnp.float32(hw * gc)
    mean = gs1 / n
    var = gs2 / n - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    mean_c = dot(mean, member, ((1,), (1,)))             # [1, C]
    rstd_c = dot(rstd, member, ((1,), (1,)))
    # Fold mean/rstd/affine into one multiply-add: y = x·a + b.
    a = rstd_c * g_ref[:]                                # [1, C]
    b = b_ref[:] - mean_c * a
    y = x * a + b
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _gn_reference(x: Array, gamma: Array, beta: Array, groups: int,
                  eps: float, silu: bool) -> Array:
    """XLA fallback (also the numerics oracle in tests)."""
    b, hw, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, hw, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.var(xf, axis=(1, 3), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, hw, c)
    y = y * gamma[None, None] + beta[None, None]
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


@functools.partial(jax.jit,
                   static_argnames=('groups', 'eps', 'silu', 'interpret'))
def group_norm(x: Array, gamma: Array, beta: Array, groups: int = 32,
               eps: float = 1e-5, silu: bool = False,
               interpret: bool | None = None) -> Array:
    """GroupNorm + affine (+ SiLU) over the last axis of ``[..., C]``.

    Statistics are computed per (batch, group) over all non-channel,
    non-batch axes — NHWC semantics matching ``nn.GroupNorm``.
    """
    shape = x.shape
    c = shape[-1]
    b = shape[0]
    hw = 1
    for s in shape[1:-1]:
        hw *= s
    x3 = x.reshape(b, hw, c)
    fits = hw * c * 4 <= _MAX_BLOCK_BYTES and c % groups == 0
    on_tpu = jax.default_backend() == 'tpu'
    if not fits or (not on_tpu and not interpret):
        # Off-TPU the XLA path is the product path (interpret-mode Pallas is
        # for kernel unit tests only); oversized activations (VAE decode)
        # always take XLA.
        return _gn_reference(x3, gamma, beta, groups, eps,
                             silu).reshape(shape)
    if interpret is None:
        interpret = not on_tpu
    out = pl.pallas_call(
        functools.partial(_gn_kernel, groups=groups, eps=eps, silu=silu),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        interpret=interpret,
    )(x3, gamma.astype(jnp.float32).reshape(1, c),
      beta.astype(jnp.float32).reshape(1, c))
    return out.reshape(shape)


class GroupNormFused(nn.Module):
    """Drop-in for ``nn.GroupNorm`` (+ optional fused SiLU).

    Parameter names/shapes match ``nn.GroupNorm`` ('scale'/'bias', [C]), so
    weight conversion (weights/convert.py) and existing checkpoints are
    unaffected; only the compute path changes.
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    silu: bool = False
    # Output dtype for the normalized activation (the model compute dtype).
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (c,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (c,), jnp.float32)
        y = group_norm(x.astype(self.dtype), scale, bias, self.num_groups,
                       self.epsilon, self.silu)
        return y.astype(self.dtype)
