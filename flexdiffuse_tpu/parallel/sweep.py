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
    parameter exploration runs as ONE compiled data-parallel executable.

    The tween itself is ``vmap``-batched on device: settings are grouped by
    their static axes (mode/reuse/header-cap, which change the compiled
    program) and each group runs as one vectorized call — N settings cost
    one kernel launch per distinct static config, not N.

    Args:
        base_emb: ``[T, D]`` or ``[1, T, D]`` prompt embeddings.
        alt_emb: ``[A, D]`` or ``[1, A, D]`` guide embeddings.
        params_list: iterable of :class:`GuidanceParams`.
    """
    from flexdiffuse_tpu.guidance.tween import _tween_jit
    params_list = list(params_list)
    base = base_emb[0] if base_emb.ndim == 3 else base_emb
    alt = alt_emb[0] if alt_emb.ndim == 3 else alt_emb

    groups: dict = {}
    for i, p in enumerate(params_list):
        groups.setdefault((p.mode, p.reuse, p.header_max < 1.0),
                          []).append(i)

    out_rows = [None] * len(params_list)
    batched = jax.vmap(_tween_jit,
                       in_axes=(None, None) + (0,) * 7 + (None, None, None))
    for (mode, reuse, capped), idxs in groups.items():
        cols = [[getattr_p(params_list[i], name) for i in idxs]
                for name in ('threshold_floor', 'threshold_mult',
                             'linear_start', 'linear_end', 'clustered',
                             'max_guidance', 'header_max')]
        rows = batched(base, alt, *[jnp.asarray(c, jnp.float32)
                                    for c in cols], mode, reuse, capped)
        for j, i in enumerate(idxs):
            out_rows[i] = rows[j]
    return jnp.stack(out_rows)


def getattr_p(p, name: str):
    """GuidanceParams field access with the linear tuple flattened."""
    if name == 'linear_start':
        return p.linear[0]
    if name == 'linear_end':
        return p.linear[1]
    return getattr(p, name)


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
          strength: float = 0.6,
          mask=None) -> Array:
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
        mask: optional inpainting mask (1 = regenerate, 0 = keep; pixel- or
            latent-space; requires ``init_image``) — an N-seed inpaint runs
            as the same single executable.

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

    if mask is not None and init_image is None:
        raise ValueError('inpainting sweep (mask=...) requires init_image')

    init_latents = None
    if init_image is not None:
        if getattr(schedule, 'prk', False):
            raise NotImplementedError(
                'img2img/inpaint is not defined for PNDM PRK warm-up '
                '(skip_prk_steps=False); use the PLMS mode')
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
        # Multi-row schedulers (Heun: predictor+corrector rows) index the
        # scan by row, not step — matches pipeline/flex.py's scaling.
        t_start *= schedule.rows_per_step
        base = jnp.broadcast_to(z, (n,) + z.shape[1:])
        noise = jax.vmap(
            lambda k: jax.random.normal(k, z.shape[1:], jnp.float32))(
                seeds_key)
        latents = schedulers.add_noise(schedule, base, noise, init_timestep)
        init_latents = base
    else:
        t_start = 0
        # Per-seed initial latents: vmapped key → normal draw.
        latents = jax.vmap(
            lambda k: jax.random.normal(k, (h, w, c), jnp.float32))(
                seeds_key)
        if schedule.kind in schedulers.SIGMA_SPACE_KINDS:
            latents = latents * schedule.sigmas[0]

    guidance = SimpleGuidance(embeddings=emb, uncond=uncond,
                              guidance_scale=jnp.float32(guidance_scale),
                              cfg=guidance_scale > 1.0)
    return _run_sharded(pipe, mesh, guidance, latents, t_start, eta,
                        seeds_key, mask=mask, init_latents=init_latents,
                        schedule=schedule)


def _run_sharded(pipe, mesh, guidance, latents, t_start, eta, seeds_key,
                 mask=None, init_latents=None, schedule=None):
    """Shard the batch axis, run the compiled sampling loop, decode."""
    from flexdiffuse_tpu.pipeline.flex import prepare_latent_mask

    state0 = schedulers.init_state(schedule, latents.shape, latents.dtype)
    sh = batch_sharding(mesh)
    latents = jax.device_put(latents, sh)
    if isinstance(guidance, SimpleGuidance):
        guidance = guidance.replace(
            embeddings=jax.device_put(guidance.embeddings, sh))
    latent_mask = None
    if mask is not None:
        latent_mask = prepare_latent_mask(mask, latents.shape[1:3])
    # Local sharded copy — don't mutate the caller's pipeline placement.
    unet_params = shard_params(pipe.unet_params, mesh)
    # Independent in-loop key (η>0 variance noise): folding avoids reusing
    # seed 0's init-latent key for the sampling stream.
    loop_key = jax.random.fold_in(seeds_key[0], 0x5eed)

    with mesh:
        final, _ = pipe._sample(unet_params, schedule, state0, guidance,
                                latents, jnp.int32(t_start),
                                jnp.float32(eta), loop_key,
                                init_latents=init_latents, mask=latent_mask,
                                debug=False, inpaint=mask is not None)
        images = pipe._decode(pipe.vae_params, final)
    return np.asarray(images)


def compose_sweep(pipe: FlexPipeline,
                  guidance,
                  seeds_key: Array,
                  steps: int = 30,
                  init_size: Tuple[int, int] = (512, 512),
                  mesh=None,
                  eta: float = 0.0) -> Array:
    """Multi-seed regional composition as one data-parallel executable.

    Each seed's latents denoise against the schema's full
    ``(uncond+bg+E)`` context stack (CompositeGuidance.noise_pred is
    batch-general: one UNet call covers ``N·(2+E)`` rows, sharded over the
    data axis). The reference's equivalent is a serial Python batch loop
    per composition (utils.py:90,168-207).

    Args:
        pipe: a FlexPipeline.
        guidance: a :class:`CompositeGuidance` (from
            ``composition.embeds.encode_schema``-built stacks).
        seeds_key: ``[N, key]`` PRNG keys from :func:`seed_sweep_keys`.

    Returns:
        ``[N, H, W, 3]`` decoded images in [0, 1] (host numpy).
    """
    if mesh is None:
        mesh = make_mesh()
    schedule = pipe.schedule(steps)
    f = pipe.vae_scale
    h, w = init_size[0] // f, init_size[1] // f
    latents = jax.vmap(
        lambda k: jax.random.normal(k, (h, w, pipe.latent_channels),
                                    jnp.float32))(seeds_key)
    if schedule.kind in schedulers.SIGMA_SPACE_KINDS:
        latents = latents * schedule.sigmas[0]
    return _run_sharded(pipe, mesh, guidance, latents, 0, eta, seeds_key,
                        schedule=schedule)
