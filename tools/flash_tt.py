"""Round-3 perf experiments: transposed-operand flash kernel + barrier GN.

Run on the real chip: ``python tools/flash_tt.py [exact|micro|step]``.
All step timings are single-executable ``lax.scan`` chains with device→host
fetch (see .claude/skills/verify for why).
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
import numpy as np

from flexdiffuse_tpu.ops import attention as attn_mod
from flexdiffuse_tpu.ops.attention import xla_attention
from flexdiffuse_tpu.ops.flash_attention import (flash_attention,
                                                 flash_attention_tt)

STEPS = 12


def check_exact():
    for shape in [(2, 8, 4096, 40), (2, 8, 1024, 80), (8, 8, 4096, 40),
                  (2, 8, 1536, 40)]:
        b, h, s, d = shape
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], shape, jnp.bfloat16)
        k = jax.random.normal(ks[1], shape, jnp.bfloat16)
        v = jax.random.normal(ks[2], shape, jnp.bfloat16)
        ref = np.asarray(xla_attention(q, k, v, d**-0.5), np.float32)
        tt = flash_attention_tt(q.transpose(0, 1, 3, 2),
                                k.transpose(0, 1, 3, 2),
                                v.transpose(0, 1, 3, 2), d**-0.5)
        got = np.asarray(tt.transpose(0, 1, 3, 2), np.float32)
        err = np.abs(got - ref).max()
        print(f'tt exactness {shape}: max abs err {err:.4f} '
              f'{"OK" if err < 0.04 else "FAIL"}')


def micro():
    """Data-dependent scan over attention calls — kernel-only timing."""
    for shape in [(2, 8, 4096, 40), (8, 8, 4096, 40), (2, 8, 1024, 80)]:
        b, h, s, d = shape
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], shape, jnp.bfloat16)
        k = jax.random.normal(ks[1], shape, jnp.bfloat16)
        v = jax.random.normal(ks[2], shape, jnp.bfloat16)

        def bench(fn, label, transposed):
            if transposed:
                args = tuple(
                    t.transpose(0, 1, 3, 2) for t in (q, k, v))
            else:
                args = (q, k, v)

            @jax.jit
            def chain(q, k, v):
                def body(c, _):
                    o = fn(c, k, v, d**-0.5)
                    return 0.999 * o + 0.001 * q, None

                o, _ = jax.lax.scan(body, q, None, length=STEPS)
                return o

            _ = np.asarray(chain(*args))
            best = float('inf')
            for _ in range(3):
                t0 = time.perf_counter()
                _ = np.asarray(chain(*args))
                best = min(best, time.perf_counter() - t0)
            flops = 4 * b * h * s * s * d * STEPS
            ms = best / STEPS * 1e3
            print(f'  {label:10s} {shape}: {ms:6.2f} ms/call '
                  f'{flops / best / 1e12 / STEPS * STEPS:6.1f} TFLOP/s')
            return ms

        print(f'shape {shape}:')
        bench(lambda q, k, v, s: flash_attention(q, k, v, s), 'flash', False)
        bench(lambda q, k, v, s: flash_attention_tt(q, k, v, s), 'flash_tt',
              True)


def _flash_tt2_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, block_k,
                      unroll=2):
    """TT variant with stream-friendly matmul orientations:

    scores = dot(q [d,bq], kb [d,bk]) contracting dim0 — the transposed
    *streamed* operand is the loop-invariant q block, so Mosaic can hoist
    its transpose out of the kv loop (vs the current kernel's dot(kb, q)
    which re-transposes kb every block); PV keeps vb streaming with its
    contraction minor. Stats are lane-reduced [bq,1] columns with one small
    vector transpose per block for the acc rescale.
    """
    import functools as _ft
    from jax.experimental import pallas as pl
    import jax.numpy as jnp
    import jax

    q = q_ref[0] * jnp.asarray(scale, q_ref.dtype)   # [d, bq]
    d, bq = q.shape
    skv = k_ref.shape[2]
    num_kv = skv // block_k
    NEG_INF = -1e30

    def body(j, carry):
        acc, m, l = carry                            # [d,bq],[bq,1],[bq,1]
        kb = k_ref[0, :, pl.ds(j * block_k, block_k)]
        vb = v_ref[0, :, pl.ds(j * block_k, block_k)]
        s = jax.lax.dot_general(q, kb, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [bq,bk]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)                   # [bq,1]
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(vb, p, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # [d,bq]
        acc = acc * alpha.T + pv
        return acc, m_new, l

    acc = jnp.zeros((d, bq), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
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
    o_ref[0] = (acc / l.T).astype(o_ref.dtype)


def flash_tt2(q, k, v, scale, block_q=512, block_k=512):
    """[B,H,D,S] variant-2 kernel wrapper (experiment only)."""
    import functools as _ft
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    b, h, d, sq = q.shape
    skv = k.shape[3]
    block_q = min(block_q, sq)
    block_k = min(block_k, skv)
    qf = q.reshape(b * h, d, sq)
    kf = k.reshape(b * h, d, skv)
    vf = v.reshape(b * h, d, skv)
    unroll = skv // block_k if b * h <= 16 else 2
    out = pl.pallas_call(
        _ft.partial(_flash_tt2_kernel, scale=scale, block_k=block_k,
                    unroll=unroll),
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


def micro2():
    """tt vs tt2 orientation comparison."""
    for shape in [(2, 8, 4096, 40), (8, 8, 4096, 40), (2, 8, 1024, 80)]:
        b, h, s, d = shape
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q, k, v = (jax.random.normal(kk, shape, jnp.bfloat16) for kk in ks)
        qt, kt, vt = (t.transpose(0, 1, 3, 2) for t in (q, k, v))
        ref = np.asarray(xla_attention(q, k, v, d**-0.5), np.float32)
        got = np.asarray(
            flash_tt2(qt, kt, vt, d**-0.5).transpose(0, 1, 3, 2), np.float32)
        err = np.abs(got - ref).max()
        print(f'tt2 exact {shape}: {err:.4f} {"OK" if err < 0.04 else "FAIL"}')

        def bench(fn, label):
            @jax.jit
            def chain(q, k, v):
                def body(c, _):
                    o = fn(c, k, v, d**-0.5)
                    return 0.999 * o + 0.001 * qt, None
                o, _ = jax.lax.scan(body, qt, None, length=STEPS)
                return o
            _ = np.asarray(chain(qt, kt, vt))
            best = float('inf')
            for _ in range(3):
                t0 = time.perf_counter()
                _ = np.asarray(chain(qt, kt, vt))
                best = min(best, time.perf_counter() - t0)
            print(f'  {label:8s} {shape}: {best / STEPS * 1e3:6.2f} ms/call')

        bench(lambda q, k, v, s_: flash_attention_tt(q, k, v, s_), 'tt')
        bench(lambda q, k, v, s_: flash_tt2(q, k, v, s_), 'tt2')


def _attention_tt_bhsd(q, k, v, scale=None, backend=None):
    """Dispatcher-compatible wrapper: [b,h,s,d] API over the tt kernel for
    eligible self-attention shapes, XLA otherwise."""
    if scale is None:
        scale = q.shape[-1]**-0.5
    big = q.shape[-2] >= 1024 and k.shape[-2] >= 1024
    divisible = q.shape[-2] % 128 == 0 and k.shape[-2] % 128 == 0
    if not (big and divisible and q.shape[-1] <= 128):
        return xla_attention(q, k, v, scale)
    out = flash_attention_tt(q.transpose(0, 1, 3, 2),
                             k.transpose(0, 1, 3, 2),
                             v.transpose(0, 1, 3, 2), scale)
    return out.transpose(0, 1, 3, 2)


def step(variants=('base', 'tt', 'gn', 'gn-nb', 'tt+gn')):
    import flexdiffuse_tpu.models.unet as unet_mod
    from flexdiffuse_tpu.models import SD14_UNET, UNet2DCondition
    from flexdiffuse_tpu.ops import group_norm_xla

    orig_attn = unet_mod.attention
    orig_gn = unet_mod.nn.GroupNorm

    def gn_maker(barrier):
        def make_gn(num_groups, epsilon=1e-5, name=None, dtype=None,
                    use_bias=True, use_scale=True):
            return group_norm_xla.GroupNorm(num_groups, epsilon=epsilon,
                                            barrier=barrier, name=name)
        return make_gn

    def run(label, use_tt, use_gn, ctx_bf16=False, gn_barrier=True):
        unet_mod.attention = _attention_tt_bhsd if use_tt else orig_attn
        unet_mod.nn.GroupNorm = gn_maker(gn_barrier) if use_gn else orig_gn
        try:
            unet = UNet2DCondition(SD14_UNET, dtype=jnp.bfloat16)
            lat = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 4),
                                    jnp.float32) * 0.1
            ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 77, 768),
                                    jnp.float32)
            if ctx_bf16:
                ctx = ctx.astype(jnp.bfloat16)
            shapes = jax.eval_shape(
                lambda k: unet.init(k, lat, jnp.zeros((2,)), ctx),
                jax.random.PRNGKey(0))
            params = jax.tree_util.tree_map(
                lambda s: jnp.full(s.shape, 1e-3, s.dtype), shapes)

            @jax.jit
            def chain(params, lat, ctx):
                def body(l, _):
                    out = unet.apply(params, 0.1 * jnp.tanh(l),
                                     jnp.full((2,), 500.0), ctx)
                    return out, None

                out, _ = jax.lax.scan(body, lat, None, length=STEPS)
                return out

            out = np.asarray(chain(params, lat, ctx))
            assert np.isfinite(out).all(), f'{label}: non-finite output'
            best = float('inf')
            for _ in range(3):
                t0 = time.perf_counter()
                _ = np.asarray(chain(params, lat, ctx))
                best = min(best, time.perf_counter() - t0)
            ms = best / STEPS * 1e3
            print(f'{label:12s}: {ms:7.2f} ms/forward '
                  f'({1e3 / ms:.1f} steps/s)')
            return ms
        finally:
            unet_mod.attention = orig_attn
            unet_mod.nn.GroupNorm = orig_gn

    if 'base' in variants:
        run('baseline', False, False)
    if 'tt' in variants:
        run('tt-attn', True, False)
    if 'gn' in variants:
        run('barrier-GN', False, True)
    if 'gn-nb' in variants:
        run('GN-nobarrier', False, True, gn_barrier=False)
    if 'tt+gn' in variants:
        run('tt+GN', True, True)
    if 'tt+gn+ctx' in variants:
        run('tt+GN+bf16ctx', True, True, ctx_bf16=True)
    if 'gn-stats' in variants:
        # Split barrier: stats-only (normalize stays producer/consumer-
        # fusable). The full barrier measured slower; this isolates whether
        # killing the (f32, f32) conv tuple outputs alone wins.
        run('GN-stats', False, True, gn_barrier='stats')


if __name__ == '__main__':
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    print('devices:', jax.devices())
    if which in ('exact', 'all'):
        check_exact()
    if which in ('micro', 'all'):
        micro()
    if which in ('micro2',):
        micro2()
    if which in ('step', 'all'):
        step()
