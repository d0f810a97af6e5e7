"""Schedulers — pure-function DDIM / PLMS / K-LMS with scan-friendly state.

Usage::

    sch = schedulers.make('pndm', steps=30)
    state = schedulers.init_state(sch, latents.shape, latents.dtype)
    x = schedulers.scale_model_input(sch, latents, i)
    state, latents = schedulers.step(sch, state, eps, i, counter, latents,
                                     key, eta)
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from flexdiffuse_tpu.schedulers import ddim as _ddim
from flexdiffuse_tpu.schedulers import ddpm as _ddpm
from flexdiffuse_tpu.schedulers import dpmpp as _dpmpp
from flexdiffuse_tpu.schedulers import euler as _euler
from flexdiffuse_tpu.schedulers import euler_ancestral as _euler_a
from flexdiffuse_tpu.schedulers import heun as _heun
from flexdiffuse_tpu.schedulers import lcm as _lcm
from flexdiffuse_tpu.schedulers import lms as _lms
from flexdiffuse_tpu.schedulers import pndm as _pndm
from flexdiffuse_tpu.schedulers import unipc as _unipc
from flexdiffuse_tpu.schedulers.base import (SIGMA_SPACE_KINDS, Schedule,
                                             SchedulerConfig, alphas_cumprod,
                                             ddim_like_add_noise,
                                             init_timestep_info, make_betas)

_KINDS = {'ddim': _ddim, 'pndm': _pndm, 'lms': _lms,
          'euler': _euler, 'euler_a': _euler_a, 'dpmpp': _dpmpp,
          'lcm': _lcm, 'ddpm': _ddpm, 'unipc': _unipc, 'heun': _heun}

# VP-space kinds that carry per-position (α, σ) tables (fractional-timestep
# exact conversions for Karras spacing).
_VP_TABLE_KINDS = ('dpmpp', 'unipc')

Array = jax.Array


def make(kind: str, steps: int,
         config: Optional[SchedulerConfig] = None) -> Schedule:
    if kind not in _KINDS:
        raise ValueError(f'unknown scheduler {kind!r}; one of {list(_KINDS)}')
    config = config or SchedulerConfig(kind=kind)
    if config.use_karras_sigmas and kind not in ('euler', 'euler_a',
                                                 'dpmpp', 'unipc', 'heun'):
        raise ValueError(
            'use_karras_sigmas is only supported for '
            f'euler/euler_a/dpmpp/unipc/heun, not {kind!r}')
    if config.prediction_type not in ('epsilon', 'v_prediction'):
        raise ValueError(
            f'unknown prediction_type {config.prediction_type!r}')
    schedule = _KINDS[kind].make_schedule(config, steps)
    if config.prediction_type == 'v_prediction':
        schedule = schedule.replace(v_prediction=True)
    return schedule


def init_state(schedule: Schedule, latent_shape, dtype) -> tuple:
    return _KINDS[schedule.kind].init_state(schedule, latent_shape, dtype)


def scale_model_input(schedule: Schedule, sample: Array, i: Array) -> Array:
    if schedule.kind == 'lms':
        return _lms.scale_model_input(schedule, sample, i)
    if schedule.kind in ('euler', 'euler_a'):
        return _euler.scale_model_input(schedule, sample, i)
    if schedule.kind == 'heun':
        return _heun.scale_model_input(schedule, sample, i)
    return sample


def convert_v_prediction(schedule: Schedule, v: Array, i: Array,
                         sample: Array) -> Array:
    """v-parameterized model output → ε at step position ``i`` (SD2.x).

    VP space: ``ε = √(1−ᾱ_t)·x_t + √ᾱ_t·v``. σ-space schedulers carry
    ``x = x₀ + σ·ε`` (the UNet still sees the VP-scaled input), where the
    same identity reads ``ε = x·σ/(σ²+1) + v/√(σ²+1)``.
    """
    x = sample.astype(jnp.float32)
    v = v.astype(jnp.float32)
    if schedule.kind in SIGMA_SPACE_KINDS:
        sigma = schedule.sigmas[i]
        return x * (sigma / (sigma * sigma + 1.0)) + v * jax.lax.rsqrt(
            sigma * sigma + 1.0)
    if schedule.kind in _VP_TABLE_KINDS:
        return schedule.vp_sigma[i] * x + schedule.vp_alpha[i] * v
    t = jnp.clip(schedule.timesteps[i].astype(jnp.int32), 0,
                 schedule.num_train_timesteps - 1)
    ap = schedule.alphas_cumprod[t]
    return jnp.sqrt(1.0 - ap) * x + jnp.sqrt(ap) * v


def step(schedule: Schedule, state: tuple, eps: Array, i: Array,
         counter: Array, sample: Array, key=None, eta=0.0):
    eta = jnp.asarray(eta, jnp.float32)
    if schedule.v_prediction:
        eps = convert_v_prediction(schedule, eps, i, sample)
    return _KINDS[schedule.kind].step(schedule, state, eps, i, counter,
                                      sample, key, eta)


def add_noise(schedule: Schedule, sample: Array, noise: Array,
              init_timestep: int) -> Array:
    """Noise init latents for img2img (dispatches on scheduler kind).

    For LMS the reference passes the *index* ``steps - init_timestep`` into
    the sigma table (flex.py:200-204); DDIM/PNDM use the timestep *value*
    ``timesteps[-init_timestep]`` (flex.py:206-209).
    """
    if schedule.kind in SIGMA_SPACE_KINDS:
        mod = {'lms': _lms, 'heun': _heun}.get(schedule.kind, _euler)
        return mod.add_noise(schedule, sample, noise,
                             schedule.num_steps - init_timestep)
    if schedule.kind in _VP_TABLE_KINDS:
        # Position-indexed VP tables: exact for fractional (Karras)
        # timesteps where value-indexed alpha-bar would floor.
        idx = schedule.num_steps - int(init_timestep)
        if idx >= schedule.length:  # strength ~0: effectively clean
            return sample
        a = schedule.vp_alpha[idx]
        sg = schedule.vp_sigma[idx]
        return (a * sample.astype(jnp.float32) +
                sg * noise.astype(jnp.float32)).astype(sample.dtype)
    # Guard init_timestep == 0 (possible for offset-0 schedulers at tiny
    # strength): index -0 would wrap to the *maximum* timestep; the lowest
    # one is correct (and the loop skips every step anyway).
    t = schedule.timesteps[-max(int(init_timestep), 1)]
    return ddim_like_add_noise(schedule, sample, noise, t)


def anchor_noise(schedule: Schedule, sample: Array, noise: Array, i: Array,
                 counter: Array) -> Array:
    """Noise a clean latent to the level of step ``i``'s OUTPUT (traced).

    Used by inpainting to re-anchor the kept region so both mask regions
    share one trajectory. The output level is scheduler-specific:

    * σ-space (lms/euler) and dpmpp: position ``i+1``'s tables (terminal →
      clean);
    * ddim: timestep value ``timesteps[i] − ratio`` (negative → clean);
    * pndm/PLMS: the warm-up's counter-1 step re-steps the stashed sample to
      ``timesteps[i]`` itself (pndm.py counter logic), every other step lands
      at ``timesteps[i] − ratio``.
    """
    i = jnp.asarray(i, jnp.int32)
    length = schedule.length
    f32 = sample.astype(jnp.float32)
    n32 = noise.astype(jnp.float32)
    if schedule.kind in SIGMA_SPACE_KINDS:
        sigma = schedule.sigmas[jnp.clip(i + 1, 0, length)]
        return (f32 + n32 * sigma).astype(sample.dtype)
    if schedule.kind in _VP_TABLE_KINDS:
        clamped = jnp.clip(i + 1, 0, length - 1)
        clean = i + 1 >= length
        a = jnp.where(clean, 1.0, schedule.vp_alpha[clamped])
        s = jnp.where(clean, 0.0, schedule.vp_sigma[clamped])
        return (a * f32 + s * n32).astype(sample.dtype)
    if schedule.kind == 'lcm' or (schedule.kind == 'pndm' and
                                  getattr(schedule, 'prk', False)):
        # PRK/LCM tables carry each position's exact output level
        # (LCM's last entry is -1 → clean, handled below).
        t_out = schedule.prev_tr[jnp.clip(i, 0, length - 1)].astype(jnp.int32)
    else:
        t = schedule.timesteps[jnp.clip(i, 0, length - 1)].astype(jnp.int32)
        t_out = t - schedule.ratio
        if schedule.kind == 'pndm':
            t_out = jnp.where(jnp.asarray(counter, jnp.int32) == 1, t, t_out)
    clean = t_out < 0
    ap = schedule.alphas_cumprod[jnp.clip(t_out, 0,
                                          schedule.num_train_timesteps - 1)]
    # Terminal level is the scheduler's OWN final alpha-bar (pndm: acp[0],
    # ddim: 1.0 under set_alpha_to_one) so the kept region exactly matches
    # what the step function's last transfer produces.
    ap = jnp.where(clean, schedule.final_alpha_cumprod, ap)
    return (jnp.sqrt(ap) * f32 +
            jnp.sqrt(1.0 - ap) * n32).astype(sample.dtype)


__all__ = [
    'Schedule', 'SchedulerConfig', 'make', 'init_state', 'scale_model_input',
    'step', 'add_noise', 'init_timestep_info', 'make_betas',
    'alphas_cumprod', 'anchor_noise', 'convert_v_prediction',
    'SIGMA_SPACE_KINDS'
]
