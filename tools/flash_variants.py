"""Flash-kernel softmax variants, scan-timed on the real chip.

Hypothesis from tools/perf_experiment.py: level-0 self-attention is
VPU-transcendental bound (~268M exps per CFG step). Variants:
  v0: current kernel (jnp.exp, fp32 probabilities)
  v1: exp2-based softmax (scores pre-scaled by log2(e))
  v2: exp2 + probabilities cast to bf16 before the row-sum and PV matmul
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

LOG2E = 1.4426950408889634


def make_kernel(variant: int, scale: float, block_k: int):
    def kernel(q_ref, k_ref, v_ref, o_ref):
        eff_scale = scale * (LOG2E if variant >= 1 else 1.0)
        q = q_ref[0] * jnp.asarray(eff_scale, q_ref.dtype)
        bq, d = q.shape
        skv = k_ref.shape[1]

        def body(j, carry):
            acc, m, l = carry
            kb = k_ref[0, pl.ds(j * block_k, block_k), :]
            vb = v_ref[0, pl.ds(j * block_k, block_k), :]
            s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            if variant == 0:
                p = jnp.exp(s - m_new)
                alpha = jnp.exp(m - m_new)
            else:
                p = jnp.exp2(s - m_new)
                alpha = jnp.exp2(m - m_new)
            if variant == 2:
                p16 = p.astype(vb.dtype)
                l = l * alpha + jnp.sum(p16.astype(jnp.float32), axis=-1,
                                        keepdims=True)
                pv = jax.lax.dot_general(p16, vb, (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
            else:
                l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
                pv = jax.lax.dot_general(p.astype(vb.dtype), vb,
                                         (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
            acc = acc * alpha + pv
            return acc, m_new, l

        acc = jnp.zeros((bq, d), jnp.float32)
        m0 = jnp.full((bq, 1), -1e30, jnp.float32)
        l0 = jnp.zeros((bq, 1), jnp.float32)
        acc, m, l = jax.lax.fori_loop(0, skv // block_k, body,
                                      (acc, m0, l0))
        o_ref[0] = (acc / l).astype(o_ref.dtype)

    return kernel


def attn(variant, q, k, v, scale, block_q=512, block_k=512):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    out = pl.pallas_call(
        make_kernel(variant, scale, block_k),
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
    rng = np.random.default_rng(0)
    shape = (2, 8, 4096, 40)
    q, k, v = (jnp.asarray(rng.normal(size=shape).astype(np.float32)).astype(
        jnp.bfloat16) for _ in range(3))
    scale = 40**-0.5

    from flexdiffuse_tpu.ops.attention import xla_attention
    ref = np.asarray(
        xla_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                      v.astype(jnp.float32), scale))

    N = 40
    for variant in (0, 1, 2):
        @jax.jit
        def chain(q, k, v, _v=variant):
            def body(qc, _):
                out = attn(_v, qc, k, v, scale)
                return out, None
            out, _ = jax.lax.scan(body, q, None, length=N)
            return out
        # correctness (single call; eager — jit would trace `scale` into a
        # captured constant inside the kernel)
        got = np.asarray(attn(variant, q, k, v, scale).astype(jnp.float32))
        err = np.abs(ref - got).max()
        _ = np.asarray(chain(q, k, v))
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(chain(q, k, v))
            best = min(best, time.perf_counter() - t0)
        ms = best / N * 1e3
        tflops = 2 * 2 * 8 * 4096**2 * 40 * 2 / (ms / 1e3) / 1e12
        print(f'v{variant}: {ms:6.3f} ms/call  {tflops:5.1f} TFLOP/s  '
              f'maxerr {err:.2e}')


if __name__ == '__main__':
    main()
