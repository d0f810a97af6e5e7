"""A/B: ``lax.scan`` unroll of the product denoise loop (exact path).

Round-5 exact-path lever hunt (VERDICT r4 #4): the per-iteration scan
boundary forces XLA to materialize/copy the carry and blocks fusion
between step i's scheduler update and step i+1's UNet prologue
(profile bucket 'copies/converts/reshape' = 1.8 ms/step). ``unroll=k``
compiles k consecutive steps into one loop body, letting XLA fuse across
the boundary — at the cost of a k× bigger program (compile time, i-cache).

Run: ``python tools/scan_unroll_exp.py [unrolls...]`` (default 1 2).
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, '/root/repo')

from flexdiffuse_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache('/root/repo/.jax_cache')

import numpy as np

STEPS = 25
IMAGE = 512


def build(unroll: int, batch: int = 1):
    import functools

    import jax
    import jax.numpy as jnp

    from flexdiffuse_tpu import schedulers
    from flexdiffuse_tpu.models import SD14_UNET, UNet2DCondition
    from flexdiffuse_tpu.utils.params import product_compiler_options

    unet = UNet2DCondition(SD14_UNET, dtype=jnp.bfloat16)
    hw = IMAGE // 8
    latents = jnp.zeros((batch, hw, hw, 4), jnp.float32)
    ctx = jnp.zeros((2 * batch, 77, 768), jnp.float32)
    shapes = jax.eval_shape(
        lambda k: unet.init(k, jnp.zeros((2 * batch, hw, hw, 4)),
                            jnp.zeros((2 * batch,)), ctx),
        jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.01,
                           jnp.bfloat16 if len(s.shape) >= 2 else s.dtype),
        shapes)

    schedule = schedulers.make('pndm', STEPS)
    state0 = schedulers.init_state(schedule, latents.shape, latents.dtype)

    @functools.partial(jax.jit, compiler_options=product_compiler_options())
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
                                   jnp.arange(schedule.length),
                                   unroll=unroll)
        return lat

    args = (params, latents, state0, ctx, jnp.float32(8.0))
    return sample, args, schedule.length


def main():
    unrolls = [int(a) for a in sys.argv[1:]] or [1, 2]
    for u in unrolls:
        sample, args, length = build(u)
        t0 = time.perf_counter()
        out = np.asarray(sample(*args))
        print(f'unroll={u}: compile+warm {time.perf_counter()-t0:.0f}s',
              flush=True)
        best = float('inf')
        for _ in range(4):
            t0 = time.perf_counter()
            out = np.asarray(sample(*args))
            best = min(best, time.perf_counter() - t0)
        print(f'unroll={u}: {length / best:6.2f} steps/s '
              f'({best / length * 1e3:.2f} ms/step)', flush=True)


if __name__ == '__main__':
    main()
