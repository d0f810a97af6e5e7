"""Feasibility probe: does the v5e reach ~2x MXU rate for int8 on the
SD-1.4 UNet's dominant conv/matmul shapes?

Measures, inside a lax.scan (data-dependent carry, the repo's standard
anti-overlap methodology), the per-iteration time of:
  - bf16 conv/dot (the product path)
  - s8 x s8 -> s32 conv/dot (quantized candidate)
  - s8 with the dequant epilogue (scale multiply, what a real
    weight+activation quantized layer pays)

Shapes: the two workhorse convs (320-ch 64x64 3x3, 1280-ch 16x16 3x3) and
the big transformer GEMM (4096x320 x 320x320). CFG batch 2.
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _time_scan(body, init, iters=50, reps=5):
    @jax.jit
    def run(x):
        return lax.scan(lambda c, _: (body(c), None), x,
                        None, length=iters)[0]

    out = run(init)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
    np.asarray(jax.tree_util.tree_leaves(out)[0][(0,) * out[0].ndim
               if isinstance(out, tuple) else (0,) * out.ndim])
    best = float('inf')
    for _ in range(reps):
        t0 = time.monotonic()
        out = run(init)
        jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
        best = min(best, (time.monotonic() - t0) / iters)
    return best * 1e3  # ms / iter


def conv_case(b, h, w, c, dtype, dequant=False):
    k = jnp.ones((3, 3, c, c), dtype)
    scale = jnp.full((c,), 0.01, jnp.float32)

    def body(x):
        y = lax.conv_general_dilated(
            x, k, (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.int32 if dtype == jnp.int8
            else jnp.float32)
        if dtype == jnp.int8:
            if dequant:
                y = (y.astype(jnp.float32) * scale)
                # re-quantize activation for the next layer (dynamic
                # per-tensor): the real recurring cost of w8a8.
                amax = jnp.max(jnp.abs(y)) + 1e-6
                return jnp.clip(jnp.round(y / amax * 127), -127,
                                127).astype(jnp.int8)
            return jnp.clip(y >> 8, -127, 127).astype(jnp.int8)
        return y.astype(dtype)

    x0 = jnp.ones((b, h, w, c), dtype)
    return _time_scan(body, x0)


def dot_case(m, kdim, n, dtype, dequant=False):
    w_ = jnp.ones((kdim, n), dtype)
    scale = jnp.full((n,), 0.01, jnp.float32)

    def body(x):
        y = lax.dot_general(
            x, w_, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if dtype == jnp.int8
            else jnp.float32)
        if dtype == jnp.int8:
            if dequant:
                y = y.astype(jnp.float32) * scale
                amax = jnp.max(jnp.abs(y)) + 1e-6
                return jnp.clip(jnp.round(y / amax * 127), -127,
                                127).astype(jnp.int8)
            return jnp.clip(y >> 8, -127, 127).astype(jnp.int8)
        return y.astype(dtype)

    x0 = jnp.ones((m, kdim), dtype)
    return _time_scan(body, x0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--json', action='store_true',
                   help='print only the final JSON line')
    args = p.parse_args()
    out = {}
    cases = {
        'conv_320c_64sq': lambda d, dq=False: conv_case(2, 64, 64, 320, d,
                                                        dq),
        'conv_1280c_16sq': lambda d, dq=False: conv_case(2, 16, 16, 1280, d,
                                                         dq),
        'gemm_8192x320x320': lambda d, dq=False: dot_case(8192, 320, 320, d,
                                                          dq),
        'gemm_8192x1280x1280': lambda d, dq=False: dot_case(
            8192, 1280, 1280, d, dq),
    }
    for name, fn in cases.items():
        bf = fn(jnp.bfloat16)
        s8 = fn(jnp.int8)
        s8dq = fn(jnp.int8, True)
        out[name] = {'bf16_ms': round(bf, 4), 's8_ms': round(s8, 4),
                     's8_dequant_ms': round(s8dq, 4),
                     'speedup_raw': round(bf / s8, 3),
                     'speedup_dequant': round(bf / s8dq, 3)}
        if not args.json:
            print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
