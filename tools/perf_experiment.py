"""Consolidated TPU perf experiment: scan-timed UNet variants.

Run on the real chip: ``python tools/perf_experiment.py``. All timings are
single-executable ``lax.scan`` chains with device→host fetch (the only
trustworthy timing through the axon relay — see .claude/skills/verify).
"""
from __future__ import annotations

import dataclasses
import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
import numpy as np

from flexdiffuse_tpu.models import SD14_UNET, UNet2DCondition
from flexdiffuse_tpu.models.configs import UNetConfig

STEPS = 12


def scan_time(make_model, label, batch=2, hw=64):
    unet = make_model()
    lat = jax.random.normal(jax.random.PRNGKey(0), (batch, hw, hw, 4),
                            jnp.float32) * 0.1
    ctx = jax.random.normal(jax.random.PRNGKey(1), (batch, 77, 768),
                            jnp.float32)
    shapes = jax.eval_shape(
        lambda k: unet.init(k, lat, jnp.zeros((batch,)), ctx),
        jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 1e-3, s.dtype), shapes)

    @jax.jit
    def chain(params, lat, ctx):
        def body(l, _):
            out = unet.apply(params, 0.1 * jnp.tanh(l),
                             jnp.full((batch,), 500.0), ctx)
            return out, None

        out, _ = jax.lax.scan(body, lat, None, length=STEPS)
        return out

    _ = np.asarray(chain(params, lat, ctx))
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(chain(params, lat, ctx))
        best = min(best, time.perf_counter() - t0)
    ms = best / STEPS * 1e3
    print(f'{label:44s}: {ms:7.2f} ms/forward')
    return ms


def main():
    print('devices:', jax.devices())
    base = scan_time(
        lambda: UNet2DCondition(SD14_UNET, dtype=jnp.bfloat16),
        'baseline bf16 (GN fp32)')
    scan_time(
        lambda: UNet2DCondition(SD14_UNET, dtype=jnp.bfloat16,
                                norm_dtype=jnp.bfloat16),
        'GN bf16')
    noattn = dataclasses.replace(SD14_UNET,
                                 attention_levels=(False,) * 4)
    conv = scan_time(
        lambda: UNet2DCondition(noattn, dtype=jnp.bfloat16),
        'conv-only (transformers removed)')
    print(f'transformer share: {base - conv:.2f} ms '
          f'({100 * (base - conv) / base:.0f}%)')
    # Conv MFU reference: FLOPs of the conv-only variant.
    # (resnets+up/downsamples ≈ 0.62 TFLOP per CFG forward at 512².)
    print(f'approx conv MFU vs 197 TFLOP/s peak: '
          f'{0.62e12 / (conv / 1e3) / 197e12 * 100:.0f}%')


if __name__ == '__main__':
    main()
