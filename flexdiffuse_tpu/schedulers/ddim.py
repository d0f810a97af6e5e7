"""DDIM — deterministic (η=0) / stochastic (η>0) denoising steps.

Pure-function equivalent of the diffusers ``DDIMScheduler`` the reference
plumbs η into (pipeline/flex.py:243-251). Stateless apart from the PRNG key.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flexdiffuse_tpu.schedulers.base import Schedule, SchedulerConfig, \
    alphas_cumprod, spaced_timesteps

Array = jax.Array


def make_schedule(config: SchedulerConfig, steps: int) -> Schedule:
    ratio = config.num_train_timesteps // steps
    ts = spaced_timesteps(config, steps, config.steps_offset)
    acp = alphas_cumprod(config)
    final = 1.0 if config.set_alpha_to_one else float(acp[0])
    return Schedule(
        kind='ddim',
        num_steps=steps,
        num_train_timesteps=config.num_train_timesteps,
        ratio=ratio,
        steps_offset=config.steps_offset,
        clip_sample=config.clip_sample,
        length=steps,
        timesteps=jnp.asarray(ts, jnp.float32),
        alphas_cumprod=jnp.asarray(acp, jnp.float32),
        final_alpha_cumprod=jnp.float32(final),
        sigmas=jnp.zeros((1,), jnp.float32),
        lms_coeffs=jnp.zeros((1, 4), jnp.float32),
    )


def init_state(schedule: Schedule, latent_shape, dtype) -> tuple:
    return ()


def step(schedule: Schedule, state: tuple, eps: Array, i: Array,
         counter: Array, sample: Array, key: Optional[Array],
         eta: Array) -> Tuple[tuple, Array]:
    """One x_t → x_{t-1} DDIM update.

    Args:
        eps: model noise prediction.
        i: position in ``schedule.timesteps`` (traced).
        counter: calls so far (unused for DDIM).
        sample: current latents.
        key: PRNG key for the η>0 variance noise (may be None when η==0
            statically).
        eta: DDIM η scalar (traced).
    """
    del state, counter
    t = schedule.timesteps[i].astype(jnp.int32)
    prev_t = t - schedule.ratio
    ap_t = schedule.alphas_cumprod[jnp.clip(t, 0,
                                            schedule.num_train_timesteps - 1)]
    ap_prev = jnp.where(prev_t >= 0,
                        schedule.alphas_cumprod[jnp.maximum(prev_t, 0)],
                        schedule.final_alpha_cumprod)

    f32 = sample.astype(jnp.float32)
    eps32 = eps.astype(jnp.float32)
    x0 = (f32 - jnp.sqrt(1.0 - ap_t) * eps32) / jnp.sqrt(ap_t)
    if schedule.clip_sample:
        x0 = jnp.clip(x0, -1.0, 1.0)

    variance = (1.0 - ap_prev) / (1.0 - ap_t) * (1.0 - ap_t / ap_prev)
    std = eta * jnp.sqrt(variance)
    direction = jnp.sqrt(jnp.maximum(1.0 - ap_prev - std**2, 0.0)) * eps32
    prev = jnp.sqrt(ap_prev) * x0 + direction
    if key is not None:
        noise = jax.random.normal(key, sample.shape, jnp.float32)
        prev = prev + std * noise
    return (), prev.astype(sample.dtype)
