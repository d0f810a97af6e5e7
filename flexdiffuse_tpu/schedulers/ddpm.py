"""DDPM — the classic ancestral sampler (Ho et al. 2020).

An addition over the reference's DDIM/PLMS/LMS trio (the reference's
diffusers 0.3.0 ships ``DDPMScheduler`` but pipeline/flex.py never selects
it): the stochastic posterior sampler that DDIM generalizes. Useful as the
training-time sampler (its marginals are exactly the forward process the
training loop optimizes) and as the η=1 quality reference.

Math follows diffusers' ``DDPMScheduler`` with ``variance_type =
'fixed_small'``: from the model's ε at timestep t,

    x₀ = (x_t − √(1−ᾱ_t)·ε)/√ᾱ_t                      (clipped if configured)
    μ  = √ᾱ_prev·β_t/(1−ᾱ_t)·x₀ + √α_t·(1−ᾱ_prev)/(1−ᾱ_t)·x_t
    x_prev = μ + √(β̃_t)·z,   β̃_t = β_t·(1−ᾱ_prev)/(1−ᾱ_t),  z ~ N(0,1)

with no noise on the final (t = 0) step. Stateless; the per-step key comes
from the sampling loop's key stream (same as DDIM η / Euler-ancestral).
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
    n = config.num_train_timesteps
    ratio = n // steps
    # diffusers DDPMScheduler spacing: leading multiples of the ratio,
    # descending, no steps_offset.
    ts = spaced_timesteps(config, steps)
    acp = alphas_cumprod(config)
    return Schedule(
        kind='ddpm',
        num_steps=steps,
        num_train_timesteps=n,
        ratio=ratio,
        steps_offset=0,
        clip_sample=config.clip_sample,
        length=steps,
        timesteps=jnp.asarray(ts, jnp.float32),
        alphas_cumprod=jnp.asarray(acp, jnp.float32),
        final_alpha_cumprod=jnp.float32(1.0),  # diffusers' `self.one`
        sigmas=jnp.zeros((1,), jnp.float32),
        lms_coeffs=jnp.zeros((1, 4), jnp.float32),
    )


def init_state(schedule: Schedule, latent_shape, dtype) -> tuple:
    return ()


def step(schedule: Schedule, state: tuple, eps: Array, i: Array,
         counter: Array, sample: Array, key: Optional[Array],
         eta: Array) -> Tuple[tuple, Array]:
    del state, counter, eta
    t = schedule.timesteps[i].astype(jnp.int32)
    prev_t = t - schedule.ratio
    ap_t = schedule.alphas_cumprod[jnp.clip(t, 0,
                                            schedule.num_train_timesteps - 1)]
    ap_prev = jnp.where(prev_t >= 0,
                        schedule.alphas_cumprod[jnp.maximum(prev_t, 0)],
                        schedule.final_alpha_cumprod)
    alpha_t = ap_t / ap_prev
    beta_t = 1.0 - alpha_t

    x = sample.astype(jnp.float32)
    eps32 = eps.astype(jnp.float32)
    x0 = (x - jnp.sqrt(1.0 - ap_t) * eps32) / jnp.sqrt(ap_t)
    if schedule.clip_sample:
        x0 = jnp.clip(x0, -1.0, 1.0)

    c0 = jnp.sqrt(ap_prev) * beta_t / (1.0 - ap_t)
    c1 = jnp.sqrt(alpha_t) * (1.0 - ap_prev) / (1.0 - ap_t)
    mean = c0 * x0 + c1 * x

    # fixed_small posterior variance, noise gated off on the final t=0 step.
    var = jnp.maximum(beta_t * (1.0 - ap_prev) / (1.0 - ap_t), 1e-20)
    if key is not None:
        noise = jax.random.normal(key, sample.shape, jnp.float32)
        mean = mean + jnp.where(t > 0, jnp.sqrt(var), 0.0) * noise
    return (), mean.astype(sample.dtype)
