"""Measure the SD-1.4 UNet chain with fp32 vs pre-cast bf16 params.

Hypothesis (VERDICT r2 task 1): the profiled 2.7 ms/step of copies/converts
partly comes from per-use fp32->bf16 parameter casts inside the scan body —
860M params = 3.44 GB of fp32 HBM reads per step where bf16 would stream
1.72 GB. Since every Dense/Conv in the UNet runs with ``dtype=bf16`` (flax
``promote_dtype`` casts the fp32 kernel to bf16 at use) and every fp32 op
(GroupNorm) only owns 1-D params, pre-casting all ndim>=2 params to bf16 is
bit-identical to the current compute — it just moves the cast out of the
step.

Variants:
  fp32    — current product path (fp32 params, per-use casts)
  bf16    — whole tree cast to bf16 (norm scale/bias too; NOT bit-identical,
            measured for the delta attribution)
  bf16-mm — ndim>=2 -> bf16, 1-D stays fp32 (bit-identical candidate)

Run on the real TPU: ``python tools/param_dtype_exp.py``.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 25


def main():
    from flexdiffuse_tpu.models import SD14_UNET, UNet2DCondition

    unet = UNet2DCondition(SD14_UNET, dtype=jnp.bfloat16)
    lat = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 4),
                            jnp.float32) * 0.1
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 77, 768), jnp.float32)
    shapes = jax.eval_shape(
        lambda k: unet.init(k, lat, jnp.zeros((2,)), ctx),
        jax.random.PRNGKey(0))
    params32 = jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 1e-3, s.dtype), shapes)

    def cast(tree, rule):
        return jax.tree_util.tree_map(rule, tree)

    variants = {
        'fp32': params32,
        'bf16': cast(params32, lambda a: a.astype(jnp.bfloat16)),
        'bf16-mm': cast(params32,
                        lambda a: a.astype(jnp.bfloat16)
                        if a.ndim >= 2 else a),
    }

    @jax.jit
    def chain(params, lat, ctx):
        def body(l, _):
            out = unet.apply(params, 0.1 * jnp.tanh(l),
                             jnp.full((2,), 500.0), ctx)
            return out, None

        out, _ = jax.lax.scan(body, lat, None, length=STEPS)
        return out

    ref = None
    for label, params in variants.items():
        out = np.asarray(chain(params, lat, ctx))
        assert np.isfinite(out).all(), f'{label}: non-finite'
        if label == 'fp32':
            ref = out
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(chain(params, lat, ctx))
            best = min(best, time.perf_counter() - t0)
        ms = best / STEPS * 1e3
        err = np.abs(out - ref).max() if ref is not None else 0.0
        print(f'{label:8s}: {ms:7.2f} ms/forward ({1e3 / ms:5.1f} steps/s) '
              f'max|d| vs fp32 = {err:.3e}', flush=True)


if __name__ == '__main__':
    main()
