"""Throughput-mode bench: SD-1.4 512² denoise at several batch sizes.

Serving configuration study: larger per-chip batches amortize HBM weight
traffic across images. Run: ``python tools/bench_batch.py``.
"""
from __future__ import annotations

import functools
import json
import sys
import time

sys.path.insert(0, '/root/repo')

from flexdiffuse_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache('/root/repo/.jax_cache')  # shared bench-tool cache

import jax
import jax.numpy as jnp
import numpy as np

from flexdiffuse_tpu import schedulers
from flexdiffuse_tpu.models import SD14_UNET, UNet2DCondition

STEPS = 12


def bench(batch: int) -> dict:
    unet = UNet2DCondition(SD14_UNET, dtype=jnp.bfloat16)
    latents = jnp.zeros((batch, 64, 64, 4), jnp.float32)
    ctx = jnp.zeros((2 * batch, 77, 768), jnp.float32)
    shapes = jax.eval_shape(
        lambda k: unet.init(k, jnp.zeros((2 * batch, 64, 64, 4)),
                            jnp.zeros((2 * batch,)), ctx),
        jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 1e-3,
                           jnp.bfloat16 if len(s.shape) >= 2 else s.dtype),
        shapes)
    schedule = schedulers.make('pndm', STEPS)
    state0 = schedulers.init_state(schedule, latents.shape, latents.dtype)

    from flexdiffuse_tpu.utils.params import product_compiler_options

    @functools.partial(jax.jit,
                       compiler_options=product_compiler_options())
    def sample(params, latents, state, ctx, gs):
        def body(carry, i):
            lat, state = carry
            lat2 = jnp.concatenate([lat, lat])
            t = jnp.broadcast_to(schedule.timesteps[i], (2 * batch,))
            eps = unet.apply(params, lat2, t, ctx)
            eps_u, eps_c = jnp.split(eps, 2)
            eps = eps_u + gs * (eps_c - eps_u)
            state, lat = schedulers.step(schedule, state, eps, i, i, lat,
                                         None, 0.0)
            return (lat, state), None

        (lat, _), _ = jax.lax.scan(body, (latents, state),
                                   jnp.arange(schedule.length))
        return lat

    args = (params, latents, state0, ctx, jnp.float32(8.0))
    _ = np.asarray(sample(*args))
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(sample(*args))
        best = min(best, time.perf_counter() - t0)
    scan_len = schedule.length
    sps = scan_len / best
    img_min_25 = 60.0 / (best / scan_len * 26) * batch  # 25-step gen ≈ 26 calls
    return dict(batch=batch, steps_per_sec=round(sps, 2),
                images_per_min_25step=round(img_min_25, 1))


def main():
    print('devices:', jax.devices())
    for b in (1, 2, 4, 8):
        print(json.dumps(bench(b)))


if __name__ == '__main__':
    main()
