"""Euler-Ancestral — Euler steps with per-step ancestral noise injection.

The community's most-used SD sampler (k-diffusion ``sample_euler_ancestral``
/ diffusers ``EulerAncestralDiscreteScheduler``): each transition splits
σ_i → σ_{i+1} into a deterministic step down to

    σ_down = sqrt(σ_to² − σ_up²),   σ_up² = σ_to²·(σ_from² − σ_to²)/σ_from²

followed by fresh N(0, σ_up²) noise, keeping the marginal at exactly σ_to.
Shares the Euler σ machinery (tables, input scaling, img2img noising); the
per-step key comes from the sampling loop's key-split (the same stream that
feeds DDIM's η noise), so trajectories are reproducible per seed.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flexdiffuse_tpu.schedulers import euler as _euler
from flexdiffuse_tpu.schedulers.base import Schedule, SchedulerConfig

Array = jax.Array


def make_schedule(config: SchedulerConfig, steps: int) -> Schedule:
    return _euler.make_schedule(config, steps).replace(kind='euler_a')


def init_state(schedule: Schedule, latent_shape, dtype) -> tuple:
    return ()


scale_model_input = _euler.scale_model_input
add_noise = _euler.add_noise


def step(schedule: Schedule, state: tuple, eps: Array, i: Array,
         counter: Array, sample: Array, key: Optional[Array],
         eta: Array) -> Tuple[tuple, Array]:
    del eta, counter
    s_from = schedule.sigmas[i]
    s_to = schedule.sigmas[i + 1]
    # σ_to = 0 on the final step ⇒ σ_up = 0: deterministic landing.
    up2 = s_to**2 * (s_from**2 - s_to**2) / jnp.maximum(s_from**2, 1e-20)
    s_up = jnp.sqrt(up2)
    s_down = jnp.sqrt(jnp.maximum(s_to**2 - up2, 0.0))
    x = sample.astype(jnp.float32)
    prev = x + eps.astype(jnp.float32) * (s_down - s_from)
    noise = jax.random.normal(key, sample.shape, jnp.float32)
    prev = prev + noise * s_up
    return (), prev.astype(sample.dtype)
