"""A/B micro-experiments on the SDXL-base 1024² CFG scan (real chip).

Knobs (env vars), each measured against the same baseline scan as
tools/bench_sdxl.py:
  UPSAMPLE=broadcast  — Upsample via broadcast+reshape instead of
                        jax.image.resize (chasing the f32 layout ping-pong
                        copies around the up-block GroupNorms).
  FLASH_BQ/FLASH_BK   — flash kernel block sizes at SDXL shapes.
Run: ``python tools/sdxl_exp.py``.
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, '/root/repo')
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 25
IMAGE = 1024


def measure() -> float:
    from flexdiffuse_tpu import schedulers
    from flexdiffuse_tpu.models.configs import SDXL_UNET
    from flexdiffuse_tpu.models.unet import UNet2DCondition
    from flexdiffuse_tpu.ops import attention
    from flexdiffuse_tpu.utils.params import product_compiler_options

    attention.set_backend('flash')
    bq, bk = os.environ.get('FLASH_BQ'), os.environ.get('FLASH_BK')
    if bq or bk:
        from flexdiffuse_tpu.ops import flash_attention as fa
        orig = fa.flash_attention_cm

        def patched(q, k, v, scale, **kw):
            kw.setdefault('block_q', int(bq or 512))
            kw.setdefault('block_k', int(bk or 512))
            return orig(q, k, v, scale, **kw)

        fa.flash_attention_cm = patched
        from flexdiffuse_tpu.ops import attention as att
        att.flash_attention_cm = patched

    unet = UNet2DCondition(SDXL_UNET, dtype=jnp.bfloat16)
    hw = IMAGE // 8
    latents = jnp.zeros((1, hw, hw, 4), jnp.float32)
    ctx = jnp.zeros((2, 77, 2048), jnp.float32)
    added = {
        'text_embeds': jnp.zeros((2, 1280), jnp.float32),
        'time_ids': jnp.tile(
            jnp.asarray([[IMAGE, IMAGE, 0, 0, IMAGE, IMAGE]], jnp.float32),
            (2, 1)),
    }
    shapes = jax.eval_shape(
        lambda k: unet.init(k, jnp.zeros((2, hw, hw, 4)), jnp.zeros((2,)),
                            ctx, added), jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 1e-3,
                           jnp.bfloat16 if len(s.shape) >= 2 else s.dtype),
        shapes)
    schedule = schedulers.make('dpmpp', STEPS)
    state0 = schedulers.init_state(schedule, latents.shape, latents.dtype)

    @functools.partial(jax.jit, compiler_options=product_compiler_options())
    def sample(params, latents, state, ctx, added, gs):
        def body(carry, i):
            lat, state = carry
            lat2 = jnp.concatenate([lat, lat])
            t = jnp.broadcast_to(schedule.timesteps[i], (2,))
            eps = unet.apply(params, lat2, t, ctx, added)
            eps_u, eps_c = jnp.split(eps, 2)
            state, lat = schedulers.step(schedule, state,
                                         eps_u + gs * (eps_c - eps_u),
                                         i, i, lat, None, 0.0)
            return (lat, state), None

        (lat, _), _ = jax.lax.scan(body, (latents, state),
                                   jnp.arange(schedule.length))
        return lat

    args = (params, latents, state0, ctx, added, jnp.float32(5.0))
    t0 = time.perf_counter()
    out = np.asarray(sample(*args))
    print(f'  compile+run {time.perf_counter() - t0:.0f}s '
          f'finite={np.isfinite(out).all()}')
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(sample(*args))
        best = min(best, time.perf_counter() - t0)
    return STEPS / best


if __name__ == '__main__':
    label = (f"UPSAMPLE={os.environ.get('UPSAMPLE', 'resize')} "
             f"BQ={os.environ.get('FLASH_BQ', '512')} "
             f"BK={os.environ.get('FLASH_BK', '512')}")
    sps = measure()
    print(f'{label}: {sps:.3f} steps/s')
