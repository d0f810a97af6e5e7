"""LCM few-step serving bench: SD-1.4 geometry + guidance embedding.

The LCM flow is CFG-free (the guidance scale enters through the embedding,
models/unet.py), so each step is a single batch-1 UNet forward — roughly
half the FLOPs of a CFG step — and an image takes 4 of them. Measures the
4-step denoise scan plus on-device u8 decode, fetch-timed.
Run: ``python tools/bench_lcm.py [--json]``.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, '/root/repo')

from flexdiffuse_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache('/root/repo/.jax_cache')  # shared bench-tool cache
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 4


def measure() -> dict:
    import dataclasses

    from flexdiffuse_tpu import schedulers
    from flexdiffuse_tpu.models import (SD14_UNET, SD14_VAE, AutoencoderKL,
                                        UNet2DCondition)
    from flexdiffuse_tpu.models.unet import guidance_scale_embedding
    from flexdiffuse_tpu.ops import attention
    from flexdiffuse_tpu.utils.params import product_compiler_options

    attention.set_backend('flash')
    cfg = dataclasses.replace(SD14_UNET, time_cond_proj_dim=256)
    unet = UNet2DCondition(cfg, dtype=jnp.bfloat16)
    vae = AutoencoderKL(SD14_VAE, dtype=jnp.bfloat16)
    latents = jnp.zeros((1, 64, 64, 4), jnp.float32)
    ctx = jnp.zeros((1, 77, 768), jnp.float32)
    tcond = guidance_scale_embedding(jnp.float32(7.0), 256)

    def mk(tree):
        return jax.tree_util.tree_map(
            lambda s: jnp.full(s.shape, 1e-3,
                               jnp.bfloat16 if len(s.shape) >= 2
                               else s.dtype), tree)

    params = mk(jax.eval_shape(
        lambda k: unet.init(k, latents, jnp.zeros((1,)), ctx,
                            timestep_cond=tcond), jax.random.PRNGKey(0)))
    vae_params = mk(jax.eval_shape(
        lambda k: vae.init(k, jnp.zeros((1, 512, 512, 3)), k),
        jax.random.PRNGKey(1)))

    schedule = schedulers.make('lcm', STEPS)
    state0 = schedulers.init_state(schedule, latents.shape, latents.dtype)
    copts = product_compiler_options()

    @functools.partial(jax.jit, compiler_options=copts)
    def generate(params, vae_params, latents, state, ctx, tcond, key):
        def body(carry, i):
            lat, state, k = carry
            k, sub = jax.random.split(k)
            t = jnp.broadcast_to(schedule.timesteps[i], (1,))
            eps = unet.apply(params, lat, t, ctx, timestep_cond=tcond)
            state, lat = schedulers.step(schedule, state, eps, i, i, lat,
                                         sub, 0.0)
            return (lat, state, k), None

        (lat, _, _), _ = jax.lax.scan(body, (latents, state, key),
                                      jnp.arange(schedule.length))
        img = vae.apply(vae_params, lat / 0.18215,
                        method=AutoencoderKL.decode)
        img = jnp.clip(img / 2.0 + 0.5, 0.0, 1.0)
        return jnp.round(img * 255.0).astype(jnp.uint8)

    key = jax.random.PRNGKey(0)
    args = (params, vae_params, latents, state0, ctx, tcond, key)
    t0 = time.perf_counter()
    out = np.asarray(generate(*args))
    compile_s = time.perf_counter() - t0
    best = float('inf')
    for _ in range(7):
        t0 = time.perf_counter()
        _ = np.asarray(generate(*args))
        best = min(best, time.perf_counter() - t0)
    # Throughput: overlap-queue 8 images (amortizes the relay RTT the way
    # the serving loop does).
    n = 8
    t0 = time.perf_counter()
    pending = [generate(*args) for _ in range(n)]
    for p in pending:
        _ = np.asarray(p)
    queued = time.perf_counter() - t0
    return {
        'metric': 'sd1.4 512x512 LCM 4-step image (scan+decode, batch 1)',
        'p50_latency_s': round(best, 4),
        'images_per_min': round(60.0 * n / queued, 1),
        'compile_s': round(compile_s, 1),
        'finite': bool(np.isfinite(out.astype(np.float32)).all()),
    }


if __name__ == '__main__':
    out = measure()
    print(json.dumps(out))
