"""A/B DeepCache on the SDXL-base 1024² CFG scan (one chip).

SDXL's outermost level carries no attention (attention_levels[0]=False),
so the DeepCache shallow step is conv-only at 128² latents — a bigger
relative win than SD1.x. Same scan harness as tools/bench_sdxl.py with the
full/shallow lax.cond of pipeline/flex.py inlined.

Run: ``python tools/sdxl_deepcache_exp.py [intervals...]`` (default 0 3).
"""
from __future__ import annotations

import functools
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

from flexdiffuse_tpu import schedulers
from flexdiffuse_tpu.models.configs import SDXL_UNET
from flexdiffuse_tpu.models.unet import UNet2DCondition

STEPS = 25
IMAGE = 1024


def build(deepcache: int):
    from flexdiffuse_tpu.ops import attention
    attention.set_backend('flash')
    unet = UNet2DCondition(SDXL_UNET, dtype=jnp.bfloat16)
    hw = IMAGE // 8
    latents = jax.random.normal(jax.random.PRNGKey(7), (1, hw, hw, 4),
                                jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 77, 2048),
                            jnp.float32) * 0.3
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

    from flexdiffuse_tpu.utils.params import product_compiler_options

    @functools.partial(jax.jit,
                       compiler_options=product_compiler_options())
    def sample(params, latents, state, ctx, added, gs):
        def pred_save(lat2, t):
            return unet.apply(params, lat2, t, ctx, added,
                              cache_mode='save')

        def pred_use(lat2, t, cache):
            eps, _ = unet.apply(params, lat2, t, ctx, added,
                                deep_cache=cache, cache_mode='use')
            return eps

        if deepcache >= 2:
            c_shape = jax.eval_shape(
                lambda lat: pred_save(jnp.concatenate([lat, lat]),
                                      jnp.zeros((2,)))[1], latents)
            cache0 = jnp.zeros(c_shape.shape, c_shape.dtype)

        def body(carry, i):
            if deepcache >= 2:
                lat, state, cache = carry
            else:
                lat, state = carry
            lat2 = jnp.concatenate([lat, lat])
            t = jnp.broadcast_to(schedule.timesteps[i], (2,))
            if deepcache >= 2:
                eps, cache = jax.lax.cond(
                    (i % deepcache) == 0,
                    lambda c: pred_save(lat2, t),
                    lambda c: (pred_use(lat2, t, c), c), cache)
            else:
                eps = unet.apply(params, lat2, t, ctx, added)
            eps_u, eps_c = jnp.split(eps, 2)
            eps = eps_u + gs * (eps_c - eps_u)
            state, lat = schedulers.step(schedule, state, eps, i, i, lat,
                                         None, 0.0)
            if deepcache >= 2:
                return (lat, state, cache), None
            return (lat, state), None

        carry0 = ((latents, state, cache0) if deepcache >= 2
                  else (latents, state))
        out, _ = jax.lax.scan(body, carry0, jnp.arange(schedule.length))
        return out[0]

    args = (params, latents, state0, ctx, added, jnp.float32(5.0))

    def run():
        return np.asarray(sample(*args))

    return run, schedule.length


def main():
    intervals = [int(a) for a in sys.argv[1:]] or [0, 3]
    outs, rates = {}, {}
    for dc in intervals:
        run, length = build(dc)
        t0 = time.perf_counter()
        out = run()
        print(f'sdxl deepcache={dc}: compile+warm '
              f'{time.perf_counter() - t0:.0f}s', flush=True)
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            out = run()
            best = min(best, time.perf_counter() - t0)
        outs[dc], rates[dc] = out, length / best
        print(f'sdxl deepcache={dc}: {length / best:6.2f} steps/s '
              f'({best / length * 1e3:.1f} ms/step; 25-step image in '
              f'{best / length * 25:.2f}s)', flush=True)
    if 0 in outs:
        for dc in intervals:
            if dc == 0:
                continue
            mse = float(np.mean((outs[dc] - outs[0])**2))
            print(f'sdxl deepcache={dc}: latent MSE vs exact {mse:.3e} — '
                  f'{rates[dc] / rates[0] - 1:+.1%} steps/s', flush=True)


if __name__ == '__main__':
    main()
