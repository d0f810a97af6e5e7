"""Software-pipelined flash-attention variant, measured in the full UNet scan.

Two-stage pipeline: block j+1's QK matmul (MXU) issues before block j's
softmax/accumulate (VPU) completes, giving Mosaic's scheduler room to overlap
the units. Measured against the production kernel on the real chip.
"""
from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pipelined_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                      block_k: int):
    q = q_ref[0] * jnp.asarray(scale, q_ref.dtype)
    bq, d = q.shape
    skv = k_ref.shape[1]
    num_kv = skv // block_k

    def qk(j):
        kb = k_ref[0, pl.ds(j * block_k, block_k), :]
        return jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def body(j, carry):
        acc, m, l, s = carry
        # Issue next block's QK early (independent of this block's VPU work).
        s_next = jax.lax.cond(j + 1 < num_kv, lambda: qk(j + 1), lambda: s)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        vb = v_ref[0, pl.ds(j * block_k, block_k), :]
        pv = jax.lax.dot_general(p.astype(vb.dtype), vb,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc = acc * alpha + pv
        return acc, m_new, l, s_next

    acc = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l, _ = jax.lax.fori_loop(0, num_kv, body, (acc, m0, l0, qk(0)))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def pipelined_attention(q, k, v, scale, block_q=512, block_k=512):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    block_q = min(block_q, sq)
    block_k = min(block_k, skv)
    out = pl.pallas_call(
        functools.partial(_pipelined_kernel, scale=scale, block_k=block_k),
        grid=(b * h, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
    )(q.reshape(b * h, sq, d), k.reshape(b * h, skv, d),
      v.reshape(b * h, skv, d))
    return out.reshape(b, h, sq, d)


def main():
    print('devices:', jax.devices())
    # Correctness first.
    from flexdiffuse_tpu.ops.attention import xla_attention
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(2, 8, 4096, 40)).astype(
        np.float32)).astype(jnp.bfloat16) for _ in range(3))
    ref = np.asarray(xla_attention(q.astype(jnp.float32),
                                   k.astype(jnp.float32),
                                   v.astype(jnp.float32), 40**-0.5))
    got = np.asarray(pipelined_attention(q, k, v, 40**-0.5).astype(
        jnp.float32))
    print('pipelined maxerr:', float(np.abs(ref - got).max()))

    # Full-UNet scan comparison: swap the kernel via the attention module.
    import flexdiffuse_tpu.ops.flash_attention as fa
    import tools.perf_experiment as pe
    from flexdiffuse_tpu.models import SD14_UNET, UNet2DCondition

    def make_unet():
        return UNet2DCondition(SD14_UNET, dtype=jnp.bfloat16)

    base = pe.scan_time(make_unet, 'production kernel')
    orig = fa.flash_attention
    fa.flash_attention = lambda q, k, v, scale, **kw: pipelined_attention(
        q, k, v, scale)
    try:
        piped = pe.scan_time(make_unet, 'pipelined kernel')
    finally:
        fa.flash_attention = orig
    print(f'delta: {base - piped:+.2f} ms/forward '
          f'({100 * (base - piped) / base:+.1f}%)')


if __name__ == '__main__':
    main()
