"""Benchmark: SD-1.x 512² denoise-loop steps/sec on one chip.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``.

Measures the real product workload — the compiled ``lax.scan`` sampling loop
(CFG-doubled UNet + PLMS scheduler update per step, the exact program
``FlexPipeline`` runs) at 512×512 with the true SD-1.4 UNet geometry in bf16,
random weights. Steps are data-dependent (each consumes the previous
latents), so the timing cannot be inflated by async dispatch overlap.

The reference publishes no perf numbers (BASELINE.md); ``vs_baseline``
compares the Pallas flash-attention path against the same framework's
fused-XLA attention path — the strongest non-kernel TPU baseline.
"""
from __future__ import annotations

import json
import sys
import time

STEPS = 25
IMAGE = 512


def _build(scheduler_steps: int = STEPS):
    import jax
    import jax.numpy as jnp

    from flexdiffuse_tpu import schedulers
    from flexdiffuse_tpu.models import SD14_UNET, UNet2DCondition

    unet = UNet2DCondition(SD14_UNET, dtype=jnp.bfloat16)
    hw = IMAGE // 8
    latents = jnp.zeros((1, hw, hw, 4), jnp.float32)
    ctx = jnp.zeros((2, 77, 768), jnp.float32)  # uncond + cond
    shapes = jax.eval_shape(
        lambda k: unet.init(k, jnp.zeros((2, hw, hw, 4)), jnp.zeros((2,)),
                            ctx), jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)

    schedule = schedulers.make('pndm', scheduler_steps)
    state0 = schedulers.init_state(schedule, latents.shape, latents.dtype)

    @jax.jit
    def sample(params, latents, state, ctx, gs):
        def body(carry, i):
            lat, state = carry
            lat2 = jnp.concatenate([lat, lat])
            t = jnp.broadcast_to(schedule.timesteps[i], (2,))
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
    return sample, args, schedule.length


def _time(sample, args, length: int, iters: int = 3):
    out = sample(*args)
    out.block_until_ready()  # compile + warmup
    best = float('inf')
    for _ in range(iters):
        t0 = time.perf_counter()
        out = sample(*args)
        out.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return length / best, best


def main() -> None:
    from flexdiffuse_tpu.ops import attention

    attention.set_backend('flash')
    sample, args, length = _build()
    flash_sps, flash_t = _time(sample, args, length)

    attention.set_backend('xla')
    sample_xla, args_xla, _ = _build()
    xla_sps, _ = _time(sample_xla, args_xla, length)
    attention.set_backend('auto')

    print(json.dumps({
        'metric': ('sd1.4 512x512 CFG denoise-loop steps/sec/chip '
                   f'(bf16, PLMS, {STEPS}-step scan; '
                   f'{60.0 / flash_t:.2f} images/min)'),
        'value': round(flash_sps, 3),
        'unit': 'steps/sec',
        'vs_baseline': round(flash_sps / xla_sps, 3),
    }))


if __name__ == '__main__':
    sys.exit(main())
