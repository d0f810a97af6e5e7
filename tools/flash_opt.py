"""Flash-kernel ILP experiments on the real chip (round 2, VERDICT #1).

Cycle-model context (full derivation in docs/PERFORMANCE.md): with head_dim
40, every packing of heads into 128-lane tiles — block-diagonal QKT, packed
PV, row-stacked layouts — streams the same number of MXU (k,n)-tile-pairs x
rows, so the *useful*-FLOP ceiling is pinned at 40/128 of peak (~61 TFLOP/s)
no matter the layout. The round-1 kernel achieves ~40 TFLOP/s = 65% of that
ceiling; the gap is scheduling, not layout. These variants attack the gap by
giving Mosaic's scheduler independent work to overlap MXU and VPU:

  v0   round-1 kernel (fori_loop over kv blocks, one dependency chain)
  vU   unrolled kv loop — whole-DAG visibility; QK(j+1) has no dependency on
       softmax(j), so the scheduler can overlap them
  vG   G independent q-chunks per kernel instance (sublane-sliced), unrolled:
       G parallel softmax/PV chains to hide behind each other's matmuls
  vH   all H heads inside one kernel instance ([1,H,bq,d] blocks): H
       independent chains, KV streamed per head-block

Each variant is exactness-checked against fp32 XLA attention and timed with
a 40-deep data-dependent scan chain.
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

NEG_INF = -1e30


def _chain_body(q, scale, block_k, unroll):
    """Online-softmax over resident K/V for one q chunk; returns output."""
    def step(carry, kb, vb):
        acc, m, l = carry
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(p.astype(vb.dtype), vb,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return (acc * alpha + pv, m_new, l)
    return step


def make_kernel(variant: str, scale: float, block_k: int, g: int = 1):
    def kernel(q_ref, k_ref, v_ref, o_ref):
        skv = k_ref.shape[1]
        num_kv = skv // block_k

        def run_chain(q):
            step = _chain_body(q, scale, block_k, True)
            acc = jnp.zeros(q.shape, jnp.float32)
            m = jnp.full((q.shape[0], 1), NEG_INF, jnp.float32)
            l = jnp.zeros((q.shape[0], 1), jnp.float32)
            carry = (acc, m, l)
            if variant == 'v0':
                def body(j, carry):
                    kb = k_ref[0, pl.ds(j * block_k, block_k), :]
                    vb = v_ref[0, pl.ds(j * block_k, block_k), :]
                    return step(carry, kb, vb)
                carry = jax.lax.fori_loop(0, num_kv, body, carry)
            else:
                for j in range(num_kv):
                    kb = k_ref[0, j * block_k:(j + 1) * block_k, :]
                    vb = v_ref[0, j * block_k:(j + 1) * block_k, :]
                    carry = step(carry, kb, vb)
            acc, m, l = carry
            return acc / l

        if variant in ('v0', 'vU'):
            q = q_ref[0] * jnp.asarray(scale, q_ref.dtype)
            o_ref[0] = run_chain(q).astype(o_ref.dtype)
        elif variant == 'vG':
            bq = q_ref.shape[1] // g
            outs = []
            for c in range(g):
                q = (q_ref[0, c * bq:(c + 1) * bq, :]
                     * jnp.asarray(scale, q_ref.dtype))
                outs.append(run_chain(q))
            o_ref[0] = jnp.concatenate(outs, axis=0).astype(o_ref.dtype)
    return kernel


def attn(variant, q, k, v, scale, block_q=512, block_k=512, g=1):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    bq_tile = block_q * (g if variant == 'vG' else 1)
    out = pl.pallas_call(
        make_kernel(variant, scale, block_k, g),
        grid=(b * h, sq // bq_tile),
        in_specs=[
            pl.BlockSpec((1, bq_tile, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq_tile, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
    )(q.reshape(b * h, sq, d), k.reshape(b * h, skv, d),
      v.reshape(b * h, skv, d))
    return out.reshape(b, h, sq, d)


def make_kernel_h(scale: float, h: int):
    """vH: all heads in one kernel instance, K/V streamed over grid dim 2."""
    def kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref):
        j = pl.program_id(2)
        nj = pl.num_programs(2)

        @pl.when(j == 0)
        def _():
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        bq = q_ref.shape[2]
        for hh in range(h):
            q = q_ref[0, hh] * jnp.asarray(scale, q_ref.dtype)
            kb = k_ref[0, hh]
            vb = v_ref[0, hh]
            s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            m_prev = m_ref[hh * bq:(hh + 1) * bq, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[hh * bq:(hh + 1) * bq, :1] = (
                l_ref[hh * bq:(hh + 1) * bq, :1] * alpha
                + jnp.sum(p, axis=-1, keepdims=True))
            pv = jax.lax.dot_general(p.astype(vb.dtype), vb,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            acc_ref[hh] = acc_ref[hh] * alpha + pv
            m_ref[hh * bq:(hh + 1) * bq, :1] = m_new

        @pl.when(j == nj - 1)
        def _():
            for hh in range(h):
                o_ref[0, hh] = (
                    acc_ref[hh]
                    / l_ref[hh * bq:(hh + 1) * bq, :1]).astype(o_ref.dtype)
    return kernel


def attn_h(q, k, v, scale, block_q=512, block_k=512):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    out = pl.pallas_call(
        make_kernel_h(scale, h),
        grid=(b, sq // block_q, skv // block_k),
        in_specs=[
            pl.BlockSpec((1, h, block_q, d), lambda i, qi, j: (i, 0, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, block_k, d), lambda i, qi, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, block_k, d), lambda i, qi, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, block_q, d),
                               lambda i, qi, j: (i, 0, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((h, block_q, d), jnp.float32),
            pltpu.VMEM((h * block_q, 128), jnp.float32),
            pltpu.VMEM((h * block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
    )(q, k, v)
    return out


def bench(fn, q, k, v, scale, n=40):
    @jax.jit
    def chain(q, k, v):
        def body(qc, _):
            return fn(qc, k, v, scale), None
        out, _ = jax.lax.scan(body, q, None, length=n)
        return out

    got = np.asarray(fn(q, k, v, scale).astype(jnp.float32))
    _ = np.asarray(chain(q, k, v))
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(chain(q, k, v))
        best = min(best, time.perf_counter() - t0)
    return best / n * 1e3, got


def main():
    print('devices:', jax.devices())
    rng = np.random.default_rng(0)
    b, h, s, d = 2, 8, 4096, 40
    shape = (b, h, s, d)
    q, k, v = (jnp.asarray(rng.normal(size=shape).astype(np.float32)).astype(
        jnp.bfloat16) for _ in range(3))
    scale = d**-0.5

    from flexdiffuse_tpu.ops.attention import xla_attention
    ref = np.asarray(
        xla_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                      v.astype(jnp.float32), scale))
    flops = 2 * 2 * b * h * s * s * d

    def report(name, ms, got):
        err = np.abs(ref - got).max()
        print(f'{name:28s} {ms:7.3f} ms  {flops / (ms / 1e3) / 1e12:5.1f} '
              f'TFLOP/s  maxerr {err:.2e}')

    cfgs = [
        ('v0 512/512 (round-1)', lambda q, k, v, sc: attn('v0', q, k, v, sc)),
        ('vU 512/512 unrolled',
         lambda q, k, v, sc: attn('vU', q, k, v, sc)),
        ('vU 512/1024',
         lambda q, k, v, sc: attn('vU', q, k, v, sc, 512, 1024)),
        ('vU 1024/512',
         lambda q, k, v, sc: attn('vU', q, k, v, sc, 1024, 512)),
        ('vU 256/512',
         lambda q, k, v, sc: attn('vU', q, k, v, sc, 256, 512)),
        ('vU 2048/512',
         lambda q, k, v, sc: attn('vU', q, k, v, sc, 2048, 512)),
        ('vU 512/2048',
         lambda q, k, v, sc: attn('vU', q, k, v, sc, 512, 2048)),
        ('vU 1024/1024',
         lambda q, k, v, sc: attn('vU', q, k, v, sc, 1024, 1024)),
        ('vG g=2 256/512',
         lambda q, k, v, sc: attn('vG', q, k, v, sc, 256, 512, 2)),
        ('vG g=2 512/512',
         lambda q, k, v, sc: attn('vG', q, k, v, sc, 512, 512, 2)),
        ('vG g=4 256/512',
         lambda q, k, v, sc: attn('vG', q, k, v, sc, 256, 512, 4)),
        ('vG g=4 512/512',
         lambda q, k, v, sc: attn('vG', q, k, v, sc, 512, 512, 4)),
        ('vH heads-in 512/512', attn_h),
        ('vH heads-in 256/512',
         lambda q, k, v, sc: attn_h(q, k, v, sc, 256, 512)),
        ('vH heads-in 512/1024',
         lambda q, k, v, sc: attn_h(q, k, v, sc, 512, 1024)),
    ]
    for name, fn in cfgs:
        try:
            ms, got = bench(fn, q, k, v, scale)
            report(name, ms, got)
        except Exception as e:
            print(f'{name:28s} FAILED: {type(e).__name__}: '
                  f'{str(e).splitlines()[0][:100]}')


if __name__ == '__main__':
    main()
