"""Euler discrete scheduler (σ-space first-order ODE steps).

An addition over the reference's DDIM/PLMS/LMS trio: the community-standard
Euler sampler. Shares LMS's σ machinery (float timesteps, ``x/√(σ²+1)``
input scaling, index-driven stepping) but replaces the order-4 multistep
update with the exact first-order step ``x ← x + ε·(σ_{i+1} − σ_i)``.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flexdiffuse_tpu.schedulers.base import Schedule, SchedulerConfig, \
    alphas_cumprod, karras_sigmas, sigmas_to_timesteps

Array = jax.Array


def make_schedule(config: SchedulerConfig, steps: int) -> Schedule:
    n = config.num_train_timesteps
    acp = alphas_cumprod(config)
    sig_full = np.sqrt((1.0 - acp) / acp)
    if config.use_karras_sigmas:
        sigmas = karras_sigmas(float(sig_full[0]), float(sig_full[-1]),
                               steps)
        ts = sigmas_to_timesteps(sigmas, sig_full)
    else:
        ts = np.linspace(n - 1, 0, steps, dtype=np.float64)
        low = np.floor(ts).astype(int)
        high = np.ceil(ts).astype(int)
        frac = np.mod(ts, 1.0)
        sigmas = (1.0 - frac) * sig_full[low] + frac * sig_full[high]
    sigmas = np.concatenate([sigmas, [0.0]])
    return Schedule(
        kind='euler',
        num_steps=steps,
        num_train_timesteps=n,
        ratio=n // steps,
        steps_offset=0,
        clip_sample=False,
        length=steps,
        timesteps=jnp.asarray(ts, jnp.float32),
        alphas_cumprod=jnp.asarray(acp, jnp.float32),
        final_alpha_cumprod=jnp.float32(acp[0]),
        sigmas=jnp.asarray(sigmas, jnp.float32),
        lms_coeffs=jnp.zeros((1, 4), jnp.float32),
    )


def init_state(schedule: Schedule, latent_shape, dtype) -> tuple:
    return ()


def scale_model_input(schedule: Schedule, sample: Array, i: Array) -> Array:
    sigma = schedule.sigmas[i]
    return (sample.astype(jnp.float32) /
            jnp.sqrt(sigma**2 + 1.0)).astype(sample.dtype)


def step(schedule: Schedule, state: tuple, eps: Array, i: Array,
         counter: Array, sample: Array, key: Optional[Array],
         eta: Array) -> Tuple[tuple, Array]:
    del key, eta, counter
    dt = schedule.sigmas[i + 1] - schedule.sigmas[i]
    prev = sample.astype(jnp.float32) + eps.astype(jnp.float32) * dt
    return (), prev.astype(sample.dtype)


def add_noise(schedule: Schedule, sample: Array, noise: Array,
              index: Array) -> Array:
    sigma = schedule.sigmas[jnp.asarray(index, jnp.int32)]
    return (sample.astype(jnp.float32) +
            noise.astype(jnp.float32) * sigma).astype(sample.dtype)
