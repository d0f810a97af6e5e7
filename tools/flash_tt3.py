"""VPU-pass elimination experiments on the transposed-operand flash kernel.

Round-3 finding: with the tt orientation the kernel's MXU work is
scores 512·1·4 + PV 40·4·4 cycles per 512² block-pair → its own-mix ceiling
is ~94 TFLOP/s, but it measures ~53 — the kernel is VPU-(softmax-)bound.
Variants here cut VPU passes per element:

  tt    — current product kernel (reference point)
  ttv3  — sum-reduce folded into the P·V matmul (a ones-row appended to the
          streamed V block makes row d of the PV output the row-sum of P),
          and exp2 with log2(e) pre-folded into the q scaling (saves the
          per-element multiply inside exp's lowering).
  ttv4  — ttv3 + probabilities computed in bf16 (subtract in f32 for the
          max-sub accuracy, exp2 on the bf16 cast — the PV matmul needs
          bf16 anyway, so the cast moves before the transcendental).

Run: ``python tools/flash_tt3.py`` on the real chip.
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

from flexdiffuse_tpu.ops.attention import xla_attention
from flexdiffuse_tpu.ops.flash_attention import flash_attention_tt

STEPS = 12
NEG_INF = -1e30
LOG2E = 1.4426950408889634


def _ttv3_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, block_k, unroll,
                 bf16_p, sum_fold=True):
    """[1, d, s] refs; with ``sum_fold`` V blocks are loaded with a ones-row
    appended so the P·V dot also produces sum(p) (its last output row);
    without it, the lane sum-reduce stays on the VPU (exp2-only variant)."""
    q = q_ref[0] * jnp.asarray(scale * LOG2E, q_ref.dtype)   # [d, bq]
    d, bq = q.shape
    skv = k_ref.shape[2]
    num_kv = skv // block_k

    ones_row = jnp.ones((1, block_k), v_ref.dtype)

    def body(j, carry):
        acc, m, l = carry                    # [d(+1),bq],[bq,1],[bq,1]|None
        kb = k_ref[0, :, pl.ds(j * block_k, block_k)]        # [d, bk]
        vb = v_ref[0, :, pl.ds(j * block_k, block_k)]
        s = jax.lax.dot_general(q, kb, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [bq,bk]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        if bf16_p:
            p = jnp.exp2((s - m_new).astype(jnp.bfloat16))
        else:
            p = jnp.exp2(s - m_new).astype(vb.dtype)
        alpha = jnp.exp2(m - m_new)                          # [bq, 1]
        if sum_fold:
            vb = jnp.concatenate([vb, ones_row], axis=0)     # [d+1, bk]
        else:
            l = l * alpha + jnp.sum(p, axis=-1,
                                    keepdims=True).astype(jnp.float32)
        pv = jax.lax.dot_general(vb, p, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc = acc * alpha.T + pv
        return acc, m_new, l

    rows = d + 1 if sum_fold else d
    acc = jnp.zeros((rows, bq), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = None if sum_fold else jnp.zeros((bq, 1), jnp.float32)
    carry = (acc, m0, l0)
    unroll = min(unroll, num_kv)
    while num_kv % unroll:
        unroll -= 1
    if num_kv == unroll:
        for j in range(num_kv):
            carry = body(j, carry)
    else:
        def outer(jj, carry):
            for u in range(unroll):
                carry = body(jj * unroll + u, carry)
            return carry
        carry = jax.lax.fori_loop(0, num_kv // unroll, outer, carry)
    acc, m, l = carry
    if sum_fold:
        o_ref[0] = (acc[:d] / acc[d:d + 1]).astype(o_ref.dtype)
    else:
        o_ref[0] = (acc / l.T).astype(o_ref.dtype)


def flash_ttv3(q, k, v, scale, block_q=512, block_k=512, bf16_p=False,
               sum_fold=True):
    b, h, d, sq = q.shape
    skv = k.shape[3]
    block_q = min(block_q, sq)
    block_k = min(block_k, skv)
    qf = q.reshape(b * h, d, sq)
    kf = k.reshape(b * h, d, skv)
    vf = v.reshape(b * h, d, skv)
    kv_bytes = 4 * skv * max(d, 8) * jnp.dtype(k.dtype).itemsize
    unroll = (skv // block_k
              if b * h <= 16 and kv_bytes <= 4 * 1024 * 1024 else 2)
    out = pl.pallas_call(
        functools.partial(_ttv3_kernel, scale=scale, block_k=block_k,
                          unroll=unroll, bf16_p=bf16_p, sum_fold=sum_fold),
        grid=(b * h, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, d, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, skv), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, skv), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d, block_q), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, d, sq), q.dtype),
        interpret=jax.default_backend() != 'tpu',
    )(qf, kf, vf)
    return out.reshape(b, h, d, sq)


def step_ab():
    """Full SD-1.4 UNet chain with the product kernel vs the variants —
    the number that matters (micro chains are known-distorted here)."""
    import flexdiffuse_tpu.ops.flash_attention as fa
    from flexdiffuse_tpu.models import SD14_UNET, UNet2DCondition
    from flexdiffuse_tpu.utils.params import cast_matmul_params

    orig = fa.flash_attention_tt

    def make_variant(**kw):
        def fn(q, k, v, scale, block_q=512, block_k=512, interpret=None):
            return flash_ttv3(q, k, v, scale, block_q=block_q,
                              block_k=min(block_k, 512), **kw)
        return fn

    variants = {
        'base': orig,
        'v3': make_variant(sum_fold=True),
        'v4': make_variant(sum_fold=True, bf16_p=True),
    }
    unet = UNet2DCondition(SD14_UNET, dtype=jnp.bfloat16)
    lat = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 4),
                            jnp.float32) * 0.1
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 77, 768), jnp.float32)
    shapes = jax.eval_shape(
        lambda k: unet.init(k, lat, jnp.zeros((2,)), ctx),
        jax.random.PRNGKey(0))
    # Random params (not constant fill): constant weights collapse the
    # attention scores to near-degenerate values that can hide real numeric
    # differences between softmax variants.
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = cast_matmul_params(jax.tree_util.tree_unflatten(treedef, [
        jax.random.normal(kk, s.shape, s.dtype) * 0.02
        for kk, s in zip(keys, leaves)]))

    ref = None
    for label, impl in variants.items():
        fa.flash_attention_tt = impl
        # flash_attention is itself jitted and its cached trace inlines the
        # kernel; clear_cache() on it is NOT enough — pjit keeps a separate
        # tracing-level cache that survives it when the call happens under an
        # outer trace (diagnosed: max|d| = 0 across variants that must
        # differ). Nuke everything between variants.
        jax.clear_caches()
        try:
            @jax.jit
            def chain(params, lat, ctx):
                def body(l, _):
                    out = unet.apply(params, 0.1 * jnp.tanh(l),
                                     jnp.full((2,), 500.0), ctx)
                    return out, None
                out, _ = jax.lax.scan(body, lat, None, length=STEPS)
                return out

            out = np.asarray(chain(params, lat, ctx))
            if ref is None:
                ref = out
            err = np.abs(out - ref).max()
            best = float('inf')
            for _ in range(4):
                t0 = time.perf_counter()
                _ = np.asarray(chain(params, lat, ctx))
                best = min(best, time.perf_counter() - t0)
            ms = best / STEPS * 1e3
            print(f'{label:5s}: {ms:6.2f} ms/forward ({1e3 / ms:5.1f} '
                  f'steps/s) max|d| vs base = {err:.2e}', flush=True)
        finally:
            fa.flash_attention_tt = orig


def main():
    for shape in [(2, 8, 4096, 40), (8, 8, 4096, 40), (2, 8, 1024, 80)]:
        b, h, s, d = shape
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q, k, v = (jax.random.normal(kk, shape, jnp.bfloat16) for kk in ks)
        qt, kt, vt = (t.transpose(0, 1, 3, 2) for t in (q, k, v))
        ref = np.asarray(xla_attention(q, k, v, d**-0.5), np.float32)

        variants = {
            'tt': lambda q_, k_, v_, s_: flash_attention_tt(q_, k_, v_, s_),
            'ttv3': lambda q_, k_, v_, s_: flash_ttv3(q_, k_, v_, s_),
            'ttv4': lambda q_, k_, v_, s_: flash_ttv3(q_, k_, v_, s_,
                                                      bf16_p=True),
        }
        print(f'shape {shape}:', flush=True)
        for label, fn in variants.items():
            got = np.asarray(
                fn(qt, kt, vt, d**-0.5).transpose(0, 1, 3, 2), np.float32)
            err = np.abs(got - ref).max()

            @jax.jit
            def chain(q_, k_, v_):
                def body(c, _):
                    o = fn(c, k_, v_, d**-0.5)
                    return 0.999 * o + 0.001 * qt, None
                o, _ = jax.lax.scan(body, qt, None, length=STEPS)
                return o

            _ = np.asarray(chain(qt, kt, vt))
            best = float('inf')
            for _ in range(3):
                t0 = time.perf_counter()
                _ = np.asarray(chain(qt, kt, vt))
                best = min(best, time.perf_counter() - t0)
            ms = best / STEPS * 1e3
            flops = 4 * b * h * s * s * d
            print(f'  {label:5s}: {ms:6.2f} ms/call '
                  f'{flops / (best / STEPS) / 1e12:6.1f} TFLOP/s '
                  f'err {err:.4f} {"OK" if err < 0.04 else "FAIL"}',
                  flush=True)


if __name__ == '__main__':
    print('devices:', jax.devices())
    if 'step' in sys.argv[1:]:
        step_ab()
    else:
        main()
