"""PNDM in PLMS mode (``skip_prk_steps=True``) — SD v1.x's shipped scheduler.

Scan-friendly redesign of the stateful diffusers PLMS stepper: the ε-history
deque becomes a fixed ``[4, ...]`` rolling buffer in the scheduler state, and
the order ramp-up (1st → 2nd → 3rd → 4th order Adams–Bashforth) becomes a
coefficient table indexed by the call counter — no Python branching, the
whole thing lives inside ``lax.scan``.

Semantics mirrored from the reference's runtime behavior:
* ``timesteps`` has ``steps+1`` entries with the second-to-last duplicated
  (the PLMS warm-up), so ``FlexPipeline`` iterates steps+1 UNet calls.
* call 0 stashes the sample, call 1 re-uses it with the averaged ε and a
  shifted timestep pair; later calls use the multistep formula.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flexdiffuse_tpu.schedulers.base import Schedule, SchedulerConfig, \
    alphas_cumprod

Array = jax.Array

# ε-combination weights over the rolling buffer [newest, ..., oldest] per
# call-counter branch (clipped at 4): Adams–Bashforth ramp.
_BUFFER_WEIGHTS = np.array([
    [1.0, 0.0, 0.0, 0.0],                       # counter 0: ε itself
    [0.5, 0.0, 0.0, 0.0],                       # counter 1: (ε + e₀)/2 — ε/2 added separately
    [3 / 2, -1 / 2, 0.0, 0.0],                  # counter 2
    [23 / 12, -16 / 12, 5 / 12, 0.0],           # counter 3
    [55 / 24, -59 / 24, 37 / 24, -9 / 24],      # counter ≥ 4
], dtype=np.float32)


def make_schedule(config: SchedulerConfig, steps: int) -> Schedule:
    if not config.skip_prk_steps:
        raise NotImplementedError(
            'Only PLMS (skip_prk_steps=True) is implemented — the SD model '
            'family ships with it; classic PRK warm-up is not used by the '
            'reference pipeline.')
    ratio = config.num_train_timesteps // steps
    base = np.arange(steps) * ratio + config.steps_offset
    # Duplicate the second-to-last entry then reverse (PLMS warm-up).
    ts = np.concatenate([base[:-1], base[-2:-1], base[-1:]])[::-1].copy()
    acp = alphas_cumprod(config)
    final = float(acp[0])  # PNDM: set_alpha_to_one=False semantics
    return Schedule(
        kind='pndm',
        num_steps=steps,
        num_train_timesteps=config.num_train_timesteps,
        ratio=ratio,
        steps_offset=config.steps_offset,
        clip_sample=False,
        length=steps + 1,
        timesteps=jnp.asarray(ts, jnp.float32),
        alphas_cumprod=jnp.asarray(acp, jnp.float32),
        final_alpha_cumprod=jnp.float32(final),
        sigmas=jnp.zeros((1,), jnp.float32),
        lms_coeffs=jnp.zeros((1, 4), jnp.float32),
    )


def init_state(schedule: Schedule, latent_shape, dtype) -> tuple:
    ets = jnp.zeros((4,) + tuple(latent_shape), jnp.float32)
    cur_sample = jnp.zeros(latent_shape, jnp.float32)
    return (ets, cur_sample)


def _transfer(schedule: Schedule, sample: Array, t: Array, prev_t: Array,
              eps: Array) -> Array:
    """The PNDM x_t → x_{t-δ} transfer formula (PNDM paper eq. 11)."""
    n = schedule.num_train_timesteps
    ap_t = schedule.alphas_cumprod[jnp.clip(t, 0, n - 1)]
    ap_prev = jnp.where(prev_t >= 0,
                        schedule.alphas_cumprod[jnp.maximum(prev_t, 0)],
                        schedule.final_alpha_cumprod)
    sample_coeff = jnp.sqrt(ap_prev / ap_t)
    denom = (ap_t * jnp.sqrt(1.0 - ap_prev) +
             jnp.sqrt(ap_t * (1.0 - ap_t) * ap_prev))
    return sample_coeff * sample - (ap_prev - ap_t) * eps / denom


def step(schedule: Schedule, state: tuple, eps: Array, i: Array,
         counter: Array, sample: Array, key: Optional[Array],
         eta: Array) -> Tuple[tuple, Array]:
    del key, eta
    ets, cur_sample = state
    eps32 = eps.astype(jnp.float32)
    sample32 = sample.astype(jnp.float32)

    t = schedule.timesteps[i].astype(jnp.int32)
    is_c1 = counter == 1
    t_used = jnp.where(is_c1, t + schedule.ratio, t)
    prev_t = jnp.where(is_c1, t, t - schedule.ratio)

    # Stash the sample at counter 0; restore it at counter 1.
    cur_sample = jnp.where(counter == 0, sample32, cur_sample)
    sample_used = jnp.where(is_c1, cur_sample, sample32)

    # Push ε into the history buffer except at counter 1.
    pushed = jnp.concatenate([eps32[None], ets[:-1]])
    ets = jnp.where(is_c1, ets, pushed)

    branch = jnp.clip(counter, 0, 4)
    w = jnp.asarray(_BUFFER_WEIGHTS)[branch]                   # [4]
    eps_prime = jnp.tensordot(w, ets, axes=1)
    eps_prime = eps_prime + jnp.where(is_c1, 0.5, 0.0) * eps32

    prev = _transfer(schedule, sample_used, t_used, prev_t, eps_prime)
    return (ets, cur_sample), prev.astype(sample.dtype)
