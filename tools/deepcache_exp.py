"""A/B DeepCache on the real SD-1.4 CFG product scan (FlexPipeline._sample).

DeepCache (Ma et al. 2023): the deep UNet feature drifts slowly across
denoise steps; cache it every Nth step and recompute only the shallow
levels in between (models/unet.py cache_mode, pipeline/flex.py deepcache).
This measures the PRODUCT path — the lax.cond full/shallow dispatch inside
the scan — not an isolated kernel.

Run: ``python tools/deepcache_exp.py [intervals...]`` (default 0 2 3).
Prints steps/s per interval plus the latent drift vs the exact scan
(quality proxy; real-weight quality must be judged visually per the
README experiment protocol once weights are available).
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, '/root/repo')

from flexdiffuse_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache('/root/repo/.jax_cache')  # shared bench-tool cache

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 25


def build_parts(deepcache: int, batch: int = 1):
    from flexdiffuse_tpu import schedulers
    from flexdiffuse_tpu.models import (SD14_UNET, SD14_VAE, AutoencoderKL,
                                        UNet2DCondition)
    from flexdiffuse_tpu.pipeline import FlexPipeline
    from flexdiffuse_tpu.pipeline.guides import SimpleGuidance

    unet = UNet2DCondition(SD14_UNET, dtype=jnp.bfloat16)
    vae = AutoencoderKL(SD14_VAE, dtype=jnp.bfloat16)
    u_shapes = jax.eval_shape(
        lambda k: unet.init(k, jnp.zeros((2, 64, 64, 4)), jnp.zeros((2,)),
                            jnp.zeros((2, 77, 768))), jax.random.PRNGKey(0))
    v_shapes = jax.eval_shape(
        lambda k: vae.init(k, jnp.zeros((1, 64, 64, 3)), k),
        jax.random.PRNGKey(0))
    def _mk_tree(shapes):
        # One jitted program for the whole tree: eager per-param RNG would
        # pay ~50 ms relay RTT per dispatch (.claude/skills/verify).
        leaves, treedef = jax.tree_util.tree_flatten(shapes)

        @jax.jit
        def build():
            k = jax.random.PRNGKey(0)
            return [jax.random.normal(jax.random.fold_in(k, i), s.shape,
                                      jnp.float32) * 0.02
                    for i, s in enumerate(leaves)]

        return jax.tree_util.tree_unflatten(treedef, build())

    u_params = _mk_tree(u_shapes)
    v_params = _mk_tree(v_shapes)
    pipe = FlexPipeline(unet, u_params, vae, v_params, scheduler='pndm',
                        deepcache=deepcache)
    rng = np.random.default_rng(0)
    emb = jnp.asarray(
        rng.normal(size=(batch, 77, 768)).astype(np.float32) * .3)
    unc = jnp.asarray(rng.normal(size=(1, 77, 768)).astype(np.float32) * .3)
    g = SimpleGuidance(embeddings=emb, uncond=unc,
                       guidance_scale=jnp.float32(8.0), cfg=True)
    schedule = pipe.schedule(STEPS)
    latents = jax.random.normal(jax.random.PRNGKey(7), (batch, 64, 64, 4),
                                jnp.float32)
    state0 = schedulers.init_state(schedule, latents.shape, latents.dtype)

    def sample():
        """Dispatch the scan; returns device latents WITHOUT a host fetch
        (serving overlap needs the decode queued behind it)."""
        out, _ = pipe._sample(pipe.unet_params, schedule, state0, g,
                              latents, jnp.int32(0), jnp.float32(0.0),
                              jax.random.PRNGKey(3))
        return out

    return {'pipe': pipe, 'sample': sample, 'length': schedule.length}


def build(deepcache: int, batch: int = 1):
    parts = build_parts(deepcache, batch=batch)

    def run():
        return np.asarray(parts['sample']())

    return run, parts['length']


def main():
    batch = 1
    args = []
    it = iter(sys.argv[1:])
    for a in it:
        if a == '--batch':
            batch = int(next(it))
        else:
            args.append(int(a))
    intervals = args or [0, 2, 3]
    outs, rates = {}, {}
    for dc in intervals:
        run, length = build(dc, batch=batch)
        t0 = time.perf_counter()
        out = run()
        print(f'deepcache={dc}: compile+warm {time.perf_counter()-t0:.0f}s',
              flush=True)
        best = float('inf')
        for _ in range(4):
            t0 = time.perf_counter()
            out = run()
            best = min(best, time.perf_counter() - t0)
        outs[dc], rates[dc] = out, length / best
        print(f'deepcache={dc} batch={batch}: {length / best:6.2f} steps/s '
              f'({best / length * 1e3:.2f} ms/step; '
              f'{batch * 60.0 / best:.1f} img/min scan-only)', flush=True)
    if 0 in outs:
        scale = np.abs(outs[0]).max()
        for dc in intervals:
            if dc == 0:
                continue
            d = np.abs(outs[dc] - outs[0]).max()
            mse = float(np.mean((outs[dc] - outs[0])**2))
            print(f'deepcache={dc}: latent drift vs exact max|Δ|={d:.3e} '
                  f'MSE={mse:.3e} (scale {scale:.3e}) — '
                  f'{rates[dc] / rates[0] - 1:+.1%} steps/s', flush=True)


if __name__ == '__main__':
    main()
