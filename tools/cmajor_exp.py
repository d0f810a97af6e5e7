"""A/B the channel-major transformer interior on the real SD-1.4 CFG scan.

The HLO archaeology (tools/dump_hlo.py + tools/profile_scan.py) showed the
seq-minor layouts around the flash kernel push transposition into the matmul
emitters: at level 0 the FF proj_in/proj_out dots compile as
EmitAllInputFeatureInSublanes / EmitOutputBatchInLanes variants costing
213/225 µs/step each (vs ~68/34 µs standard-emitter ideal), and the qkv dots
~4× their ideal. The channel-major interior (models/unet.py DenseCM et al.)
expresses those memory layouts as the logical shapes, so every interior dot
is a standard emitter and the flash kernel I/O needs no relayout.

Run: ``python tools/cmajor_exp.py`` — prints steps/s for both orientations
plus a single-forward max|Δ| agreement check.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
import numpy as np


def build(channel_major: bool, steps: int = 25):
    from flexdiffuse_tpu import schedulers
    from flexdiffuse_tpu.models import SD14_UNET, UNet2DCondition
    from flexdiffuse_tpu.utils.params import product_compiler_options

    unet = UNet2DCondition(SD14_UNET, dtype=jnp.bfloat16,
                           channel_major=channel_major)
    latents = jnp.zeros((1, 64, 64, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 77, 768),
                            jnp.float32) * 0.3
    shapes = jax.eval_shape(
        lambda k: unet.init(k, jnp.zeros((2, 64, 64, 4)), jnp.zeros((2,)),
                            ctx), jax.random.PRNGKey(0))
    # Random-ish params (structured, not constant — constants hide bugs),
    # pre-cast to bf16 for ndim>=2 like the product pipeline.
    cnt = [0]

    def mk(s):
        cnt[0] += 1
        k = jax.random.PRNGKey(cnt[0])
        a = jax.random.normal(k, s.shape, jnp.float32) * 0.02
        return a.astype(jnp.bfloat16) if a.ndim >= 2 else a

    params = jax.tree_util.tree_map(mk, shapes)
    schedule = schedulers.make('pndm', steps)
    state0 = schedulers.init_state(schedule, latents.shape, latents.dtype)

    import functools
    @functools.partial(jax.jit,
                       compiler_options=product_compiler_options())
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
    return unet, sample, args, schedule.length


def main():
    import os

    from flexdiffuse_tpu.ops import attention
    bq, bk = os.environ.get('FLASH_BQ'), os.environ.get('FLASH_BK')
    if bq or bk:  # flash block-size A/B (mirrors tools/sdxl_exp.py)
        import functools

        from flexdiffuse_tpu.ops import flash_attention as fa
        orig = fa.flash_attention_cm

        def patched(q, k, v, scale, **kw):
            kw.setdefault('block_q', int(bq or 512))
            kw.setdefault('block_k', int(bk or 512))
            return orig(q, k, v, scale, **kw)

        fa.flash_attention_cm = patched
        attention.flash_attention_cm = patched
    results = {}
    outs = {}
    cms = ((True,) if os.environ.get('CM_ONLY') else (False, True))
    with attention.backend('flash'):
        for cm in cms:
            unet, sample, args, length = build(cm)
            t0 = time.perf_counter()
            out = np.asarray(sample(*args))
            print(f'cm={cm}: compile+warm {time.perf_counter() - t0:.0f}s',
                  flush=True)
            best = float('inf')
            for _ in range(4):
                t0 = time.perf_counter()
                out = np.asarray(sample(*args))
                best = min(best, time.perf_counter() - t0)
            results[cm] = length / best
            outs[cm] = out
            print(f'cm={cm}: {length / best:6.2f} steps/s '
                  f'({best / length * 1e3:.2f} ms/step)', flush=True)
    if False in outs:
        d = np.max(np.abs(outs[True] - outs[False]))
        s = np.max(np.abs(outs[False]))
        print(f'scan-output max|delta| = {d:.3e} (scale {s:.3e}) — '
              f'{results[True] / results[False] - 1:+.1%} steps/s',
              flush=True)


if __name__ == '__main__':
    main()
