"""Dump the optimized TPU HLO of the SD-1.4 sampling scan for offline
fusion archaeology (which ops hide inside the profiled fusion buckets).

Run: ``python tools/dump_hlo.py [out.txt]`` — writes the post-optimization
HLO text of the exact program ``tools/profile_scan.py`` profiles.
"""
from __future__ import annotations

import sys

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp


def main(out_path: str = '/tmp/sd14_scan_hlo.txt') -> None:
    from flexdiffuse_tpu import schedulers
    from flexdiffuse_tpu.models import SD14_UNET, UNet2DCondition

    unet = UNet2DCondition(SD14_UNET, dtype=jnp.bfloat16)
    latents = jnp.zeros((1, 64, 64, 4), jnp.float32)
    ctx = jnp.zeros((2, 77, 768), jnp.float32)
    shapes = jax.eval_shape(
        lambda k: unet.init(k, jnp.zeros((2, 64, 64, 4)), jnp.zeros((2,)),
                            ctx), jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 1e-3, s.dtype), shapes)
    import os
    if os.environ.get('BF16_MM'):  # match tools/profile_scan.py BF16_MM=1
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.ndim >= 2 else a, params)
    schedule = schedulers.make('pndm', 12)
    state0 = schedulers.init_state(schedule, latents.shape, latents.dtype)

    def sample(params, latents, state, ctx, gs):
        def body(carry, i):
            lat, state = carry
            lat2 = jnp.concatenate([lat, lat])
            t = jnp.broadcast_to(schedule.timesteps[i], (2,))
            eps = unet.apply(params, lat2, t, ctx)
            eu, ec = jnp.split(eps, 2)
            state, lat = schedulers.step(schedule, state, eu + gs * (ec - eu),
                                         i, i, lat, None, 0.0)
            return (lat, state), None

        (lat, _), _ = jax.lax.scan(body, (latents, state),
                                   jnp.arange(schedule.length))
        return lat

    args = (params, latents, state0, ctx, jnp.float32(8.0))
    from flexdiffuse_tpu.utils.params import product_compiler_options
    compiled = jax.jit(sample).lower(*args).compile(
        compiler_options=product_compiler_options())
    text = compiled.as_text()
    with open(out_path, 'w') as f:
        f.write(text)
    print(f'wrote {len(text) / 1e6:.1f} MB to {out_path}')


if __name__ == '__main__':
    main(*sys.argv[1:])
