"""Conv/matmul roofline: in-context XLA vs the MXU tile-cycle model.

Walks the SD-1.4 UNet jaxpr for every `conv_general_dilated` and
`dot_general`, prices each with the implicit-GEMM tile model

    cycles = m · ceil(k/256) · ceil(n/128)        (bf16 MXU, k packs 2/lane)

and compares the summed ceiling against the *profiled in-context* step time
of the conv/matmul fusion buckets (tools/profile_scan.py).

Why not time each conv in isolation: measured and rejected — isolated
bf16 NHWC conv scans compile for 200-500 s and run at 0.3-3 TFLOP/s on this
stack (pathological algorithm choice without producer/consumer context),
while the same convs inside the UNet demonstrably run two orders faster
(whole 98-conv step = 20 ms). In-context profile vs analytic ceiling is the
honest roofline here.
"""
from __future__ import annotations

import collections
import sys

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp

from flexdiffuse_tpu.models import SD14_UNET, UNet2DCondition

# Aggregate MXU row rate: 197 TFLOP/s bf16 peak = 2 · 128·128 MACs · RATE,
# so RATE ≈ 6009 M rows/s (the per-unit clock × unit count folded together;
# the tile model only needs the aggregate).
RATE = 197e12 / (2 * 128 * 128) / 1e6


def collect_ops():
    unet = UNet2DCondition(SD14_UNET, dtype=jnp.bfloat16)
    params = jax.eval_shape(
        lambda k: unet.init(k, jnp.zeros((2, 64, 64, 4)), jnp.zeros((2,)),
                            jnp.zeros((2, 77, 768))), jax.random.PRNGKey(0))
    jaxpr = jax.make_jaxpr(
        lambda p, l, t, c: unet.apply(p, l, t, c))(
            params, jax.ShapeDtypeStruct((2, 64, 64, 4), jnp.float32),
            jax.ShapeDtypeStruct((2,), jnp.float32),
            jax.ShapeDtypeStruct((2, 77, 768), jnp.float32))
    convs: collections.Counter = collections.Counter()
    dots: collections.Counter = collections.Counter()

    def walk(jp):
        for eq in jp.eqns:
            if eq.primitive.name == 'conv_general_dilated':
                lhs, rhs = eq.invars[0].aval.shape, eq.invars[1].aval.shape
                out = eq.outvars[0].aval.shape
                convs[(lhs, rhs, out, eq.params['window_strides'])] += 1
            elif eq.primitive.name == 'dot_general':
                lhs, rhs = eq.invars[0].aval.shape, eq.invars[1].aval.shape
                dims = eq.params['dimension_numbers']
                dots[(lhs, rhs, str(dims))] += 1
            for v in eq.params.values():
                if hasattr(v, 'eqns'):
                    walk(v)
                elif hasattr(v, 'jaxpr') and hasattr(v.jaxpr, 'eqns'):
                    walk(v.jaxpr)
    walk(jaxpr.jaxpr)
    return convs, dots


def tile_us(m: int, k: int, n: int) -> float:
    return m * -(-k // 128) * -(-n // 128) / RATE


def main():
    convs, dots = collect_ops()
    tot_us = tot_flops = 0.0
    rows = []
    for (lhs, rhs, out, strides), cnt in convs.items():
        b, oh, ow, _ = out
        kh, kw, cin, cout = rhs
        m, k, n = b * oh * ow, kh * kw * cin, cout
        us = tile_us(m, k, n)
        fl = 2 * m * kh * kw * cin * cout
        tot_us += us * cnt
        tot_flops += fl * cnt
        rows.append((us * cnt, f'conv {lhs[1]}x{lhs[2]} {kh}x{kw} '
                     f'{cin:4d}->{cout:4d} s{strides[0]} x{cnt}',
                     us, fl * cnt))
    dot_us = dot_flops = 0.0
    for (lhs, rhs, dims), cnt in dots.items():
        # Contractions in this model are last-dim × first-dim matmuls
        # (attention is excluded: those run in the Pallas kernel; batched
        # attention dots appear only under the xla backend).
        m = 1
        for s in lhs[:-1]:
            m *= s
        k = lhs[-1]
        n = rhs[-1]
        us = tile_us(m, k, n)
        fl = 2 * m * k * n
        dot_us += us * cnt
        dot_flops += fl * cnt
        rows.append((us * cnt, f'dot  {lhs} x {rhs} x{cnt}', us, fl * cnt))
    rows.sort(reverse=True)
    for tot, name, us, fl in rows[:18]:
        print(f'{name:46s} {us:8.1f} µs each, {tot:8.1f} µs total '
              f'({fl / 1e9:6.1f} GF)')
    print(f'\nconv ceiling  {tot_us / 1e3:6.2f} ms/step '
          f'({tot_flops / 1e9:.0f} GFLOP)')
    print(f'dot  ceiling  {dot_us / 1e3:6.2f} ms/step '
          f'({dot_flops / 1e9:.0f} GFLOP)')
    print(f'TOTAL MXU ceiling {(tot_us + dot_us) / 1e3:.2f} ms/step')
    print('\nprofiled conv/matmul fusion buckets (tools/profile_scan.py, '
          'round 2): fusion 7.32 + convolution_add 0.95 + '
          'convolution_bitcast 0.30 = 8.57 ms/step')
    ceiling = (tot_us + dot_us) / 1e3
    print(f'→ XLA in-context efficiency ≈ {100 * ceiling / 8.57:.0f}% of '
          'the tile-model ceiling (the fusion bucket also carries the '
          'elementwise epilogues fused into these ops, so true efficiency '
          'is higher).')


if __name__ == '__main__':
    main()
