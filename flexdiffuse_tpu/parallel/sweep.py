"""Data-parallel multi-seed sweeps — the BASELINE.md stretch workload.

One compiled executable generates ``N`` images for ``N`` seeds with the
batch dim sharded across the mesh's data axis: every chip denoises its own
slice, embeddings/params are replicated (or TP-sharded), and the only
cross-chip traffic is the final gather. The reference's equivalent is a
*serial* Python loop over batches on one GPU (utils.py:90).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flexdiffuse_tpu import schedulers
from flexdiffuse_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                           seed_sweep_keys, shard_params)
from flexdiffuse_tpu.pipeline.flex import FlexPipeline
from flexdiffuse_tpu.pipeline.guides import SimpleGuidance

Array = jax.Array


def guidance_param_sweep(base_emb: Array, alt_emb: Array,
                         params_list) -> Array:
    """Tween one prompt against one guide under N parameter settings.

    Returns ``[N, T, D]`` conditioning rows for :func:`sweep` — pairing each
    parameter setting with its own seed/latent row, so a whole guidance-
    parameter exploration runs as ONE compiled data-parallel executable
    (BASELINE.md north star: re-blending guidance params never leaves HBM;
    the tween itself re-runs the same jitted program per setting since
    params are traced scalars).

    Args:
        base_emb: ``[T, D]`` or ``[1, T, D]`` prompt embeddings.
        alt_emb: ``[A, D]`` or ``[1, A, D]`` guide embeddings.
        params_list: iterable of :class:`GuidanceParams`.
    """
    from flexdiffuse_tpu.guidance.tween import Tweener
    rows = []
    for p in params_list:
        out = Tweener(p).tween(base_emb, alt_emb)
        rows.append(out[0] if out.ndim == 3 else out)
    return jnp.stack(rows)


def sweep(pipe: FlexPipeline,
          embeddings: Array,
          uncond: Array,
          seeds_key: Array,
          steps: int = 30,
          guidance_scale: float = 8.0,
          init_size: Tuple[int, int] = (512, 512),
          mesh=None,
          model_parallel: int = 1,
          eta: float = 0.0,
          init_image=None,
          strength: float = 0.6) -> Array:
    """Generate one image per seed, sharded over the mesh's data axis.

    Args:
        pipe: a FlexPipeline.
        embeddings: ``[T, D]`` / ``[1, T, D]`` conditioning shared by all
            seeds, or ``[N, T, D]`` per-seed rows (guidance-param sweeps).
        uncond: ``[1, T, D]`` unconditional embeddings.
        seeds_key: ``[N, key]`` PRNG keys from :func:`seed_sweep_keys` —
            N must divide by the mesh's data-axis size.
        mesh: optional prebuilt mesh (default: all devices, DP only).
        init_image: optional preprocessed ``[1, H, W, 3]`` array (or PIL
            image) — img2img sweep: encoded once, noised per seed at
            ``strength`` (the deer_img2img config of BASELINE.md).

    Returns:
        ``[N, H, W, 3]`` decoded images in [0, 1] (host numpy).
    """
    if mesh is None:
        mesh = make_mesh(model_parallel=model_parallel)
    n = seeds_key.shape[0]
    if embeddings.ndim == 2:
        embeddings = embeddings[None]
    if embeddings.shape[0] == n:
        emb = embeddings  # per-seed conditioning (guidance-param sweeps)
    else:
        emb = jnp.broadcast_to(embeddings, (n,) + embeddings.shape[1:])

    schedule = pipe.schedule(steps)
    f = pipe.vae_scale
    h, w = init_size[0] // f, init_size[1] // f
    c = pipe.latent_channels

    if init_image is not None:
        from PIL import Image as _Image

        from flexdiffuse_tpu.utils.image import preprocess
        if isinstance(init_image, _Image.Image):
            init_image = preprocess(init_image)
        pixels = jnp.asarray(init_image)
        enc_key = jax.random.fold_in(seeds_key[0], 0x33)
        z = pipe._encode(pipe.vae_params, pixels, enc_key)   # [1, h, w, c]
        if z.shape[1:3] != (h, w):
            raise ValueError(
                f'init_image latent grid {z.shape[1:3]} does not match '
                f'init_size {init_size} (→ {(h, w)}); resize the image or '
                'pass the matching init_size')
        init_timestep, t_start = schedulers.init_timestep_info(
            schedule, strength, steps)
        base = jnp.broadcast_to(z, (n,) + z.shape[1:])
        noise = jax.vmap(
            lambda k: jax.random.normal(k, z.shape[1:], jnp.float32))(
                seeds_key)
        latents = schedulers.add_noise(schedule, base, noise, init_timestep)
    else:
        t_start = 0
        # Per-seed initial latents: vmapped key → normal draw.
        latents = jax.vmap(
            lambda k: jax.random.normal(k, (h, w, c), jnp.float32))(
                seeds_key)
        if schedule.kind in ('lms', 'euler'):
            latents = latents * schedule.sigmas[0]

    guidance = SimpleGuidance(embeddings=emb, uncond=uncond,
                              guidance_scale=jnp.float32(guidance_scale),
                              cfg=guidance_scale > 1.0)
    state0 = schedulers.init_state(schedule, latents.shape, latents.dtype)

    sh = batch_sharding(mesh)
    latents = jax.device_put(latents, sh)
    guidance = guidance.replace(
        embeddings=jax.device_put(emb, sh))
    # Local sharded copy — don't mutate the caller's pipeline placement.
    unet_params = shard_params(pipe.unet_params, mesh)
    # Independent in-loop key (η>0 variance noise): folding avoids reusing
    # seed 0's init-latent key for the sampling stream.
    loop_key = jax.random.fold_in(seeds_key[0], 0x5eed)

    with mesh:
        final, _ = pipe._sample(unet_params, schedule, state0, guidance,
                                latents, jnp.int32(t_start),
                                jnp.float32(eta), loop_key, debug=False)
        images = pipe._decode(pipe.vae_params, final)
    return np.asarray(images)
