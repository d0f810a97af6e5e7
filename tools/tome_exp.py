"""A/B ToMe token merging on the real SD-1.4 CFG product scan.

ToMe (Bolya & Hoffman 2023, ops/tome.py): merge a fraction of the spatial
tokens before every self-attention on the big grids and copy the outputs
back. This measures the PRODUCT path (FlexPipeline._sample) at 512²
(S=4096 — the default min_seq just engages) and 1024² (S=16384 — the
attention-dominated highres canvas ToMe exists for), exact vs ratio sweep.

Run: ``python tools/tome_exp.py [--size 512|1024] [--ratios 0.3,0.5]
[--json]``. Latent MSE vs the exact scan is a drift proxy; real-weight
quality must be judged visually per the README protocol once weights land.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, '/root/repo')

from flexdiffuse_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache('/root/repo/.jax_cache')  # shared bench-tool cache

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 25


def build(size: int, tome, batch: int = 1):
    from flexdiffuse_tpu import schedulers
    from flexdiffuse_tpu.models import SD14_UNET, SD14_VAE
    from flexdiffuse_tpu.models import AutoencoderKL, UNet2DCondition
    from flexdiffuse_tpu.pipeline import FlexPipeline
    from flexdiffuse_tpu.pipeline.guides import SimpleGuidance
    from tools.deepcache_exp import build_parts

    # Reuse deepcache_exp's jitted synthetic-param recipe via a fresh
    # build, then rebuild the pipeline around a tome-cloned UNet module
    # (same params — the toggle adds no weights).
    parts = build_parts(0, batch=batch)
    base = parts['pipe']
    unet = base.unet.clone(tome=tome) if tome else base.unet
    pipe = FlexPipeline(unet, base.unet_params, base.vae, base.vae_params,
                        scheduler='pndm')
    rng = np.random.default_rng(0)
    emb = jnp.asarray(
        rng.normal(size=(batch, 77, 768)).astype(np.float32) * .3)
    unc = jnp.asarray(rng.normal(size=(1, 77, 768)).astype(np.float32) * .3)
    g = SimpleGuidance(embeddings=emb, uncond=unc,
                       guidance_scale=jnp.float32(8.0), cfg=True)
    schedule = pipe.schedule(STEPS)
    lat_hw = size // 8
    latents = jax.random.normal(jax.random.PRNGKey(7),
                                (batch, lat_hw, lat_hw, 4), jnp.float32)
    state0 = schedulers.init_state(schedule, latents.shape, latents.dtype)

    def run():
        out, _ = pipe._sample(pipe.unet_params, schedule, state0, g,
                              latents, jnp.int32(0), jnp.float32(0.0),
                              jax.random.PRNGKey(3))
        return np.asarray(out)   # host fetch: the only reliable sync

    return run


def measure(run, reps: int = 4):
    lat = run()                  # compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    return STEPS / float(np.median(times)), lat


def main():
    emit_json = '--json' in sys.argv
    size = 512
    if '--size' in sys.argv:
        size = int(sys.argv[sys.argv.index('--size') + 1])
    ratios = [0.5]
    if '--ratios' in sys.argv:
        ratios = [float(v) for v in
                  sys.argv[sys.argv.index('--ratios') + 1].split(',')]

    base_sps, base_lat = measure(build(size, None))
    rows = []
    for ratio in ratios:
        sps, lat = measure(build(size, (ratio, 4096)))
        mse = float(np.mean((lat - base_lat) ** 2))
        rows.append({'ratio': ratio, 'steps_per_sec': round(sps, 2),
                     'speedup': round(sps / base_sps, 3),
                     'latent_mse_vs_exact': mse,
                     'finite': bool(np.isfinite(lat).all())})

    out = {'metric': (f'sd1.4 {size}x{size} ToMe denoise steps/sec/chip '
                      '(bf16, PLMS, 25-step scan)'),
           'exact_steps_per_sec': round(base_sps, 2), 'tome': rows}
    if emit_json:
        print(json.dumps(out))
        return
    print(f'exact {size}²: {base_sps:.2f} steps/s', flush=True)
    for r in rows:
        print(f"tome {r['ratio']}: {r['steps_per_sec']} steps/s "
              f"({r['speedup']}x), mse {r['latent_mse_vs_exact']:.3g}, "
              f"finite={r['finite']}", flush=True)


if __name__ == '__main__':
    main()
