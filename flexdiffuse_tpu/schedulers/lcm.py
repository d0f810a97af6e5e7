"""LCM — latent-consistency-model few-step sampling.

Pure-function equivalent of the diffusers ``LCMScheduler`` (the sampler LCM
checkpoints and LCM-LoRA adapters are distilled for; nothing in the
reference — beyond-reference surface, anchored to the published
consistency-distillation formulation):

* timesteps are drawn from the distillation's base DDIM sub-schedule
  (``original_inference_steps`` of the 1000 train steps, default 50), then
  strided down to ``steps`` — NOT the uniform ``ratio`` grid the other VP
  schedulers use, so the schedule carries an explicit per-position
  ``prev_tr`` transfer-target table (the same device PNDM's PRK mode uses);
* each step maps the sample straight to the consistency function's output
  ``denoised = c_out·x₀(x_t) + c_skip·x_t`` with the boundary-condition
  scalings ``c_skip = σ_d²/(s·t)²+σ_d²)``, ``c_out = s·t/√((s·t)²+σ_d²)``
  (σ_d = 0.5, s = ``timestep_scaling`` = 10), then — on every step but the
  last — re-noises to the next timestep's level with FRESH noise (the
  per-step key the sampling scan already splits for η/ancestral samplers);
* classifier-free guidance is OFF: full LCM checkpoints take the guidance
  scale as a model input instead (``UNetConfig.time_cond_proj_dim`` +
  ``models/unet.py guidance_scale_embedding``); LCM-LoRA runs the plain
  conditional pass.

Trajectory is oracle-tested against a hand-written numpy transcription of
the published update rule (tests/test_lcm.py).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from flexdiffuse_tpu.schedulers.base import (Schedule, SchedulerConfig,
                                             alphas_cumprod)

Array = jax.Array

SIGMA_DATA = 0.5


class LCMSchedule(Schedule):
    prev_tr: Array = None          # [L] next (transfer-target) timestep; -1 → clean
    timestep_scaling: float = struct.field(pytree_node=False, default=10.0)


def make_schedule(config: SchedulerConfig, steps: int) -> LCMSchedule:
    n = config.num_train_timesteps
    orig = config.original_inference_steps
    if steps > orig:
        raise ValueError(
            f'LCM steps ({steps}) cannot exceed original_inference_steps '
            f'({orig}) — the model was only distilled on that sub-schedule')
    k = n // orig
    # Ascending distillation grid [k-1, 2k-1, ..., n-1], then stride down
    # to `steps` starting from the terminal timestep (diffusers
    # LCMScheduler.set_timesteps).
    origin = np.arange(1, orig + 1, dtype=np.int64) * k - 1
    skip = len(origin) // steps
    ts = origin[::-skip][:steps].astype(np.float64)
    prev = np.concatenate([ts[1:], [-1.0]])  # -1 → final step lands clean
    acp = alphas_cumprod(config)
    return LCMSchedule(
        kind='lcm',
        num_steps=steps,
        num_train_timesteps=n,
        ratio=k * skip,  # nominal spacing (anchor/add-noise bookkeeping)
        steps_offset=config.steps_offset,
        # diffusers LCMScheduler defaults clip_sample=False (the
        # consistency function was distilled without clipping); the config
        # default is the DDIM-oriented True, deliberately ignored here.
        clip_sample=False,
        length=steps,
        timesteps=jnp.asarray(ts, jnp.float32),
        alphas_cumprod=jnp.asarray(acp, jnp.float32),
        final_alpha_cumprod=jnp.float32(1.0),
        sigmas=jnp.zeros((1,), jnp.float32),
        lms_coeffs=jnp.zeros((1, 4), jnp.float32),
        prev_tr=jnp.asarray(prev, jnp.float32),
        timestep_scaling=config.timestep_scaling,
    )


def init_state(schedule: LCMSchedule, latent_shape, dtype) -> tuple:
    return ()


def boundary_scalings(schedule: LCMSchedule,
                      t: Array) -> Tuple[Array, Array]:
    """Consistency boundary conditions ``(c_skip, c_out)`` at timestep t."""
    scaled = t.astype(jnp.float32) * schedule.timestep_scaling
    c_skip = SIGMA_DATA**2 / (scaled**2 + SIGMA_DATA**2)
    c_out = scaled * jax.lax.rsqrt(scaled**2 + SIGMA_DATA**2)
    return c_skip, c_out


def step(schedule: LCMSchedule, state: tuple, eps: Array, i: Array,
         counter: Array, sample: Array, key: Optional[Array],
         eta: Array) -> Tuple[tuple, Array]:
    """One consistency step: x_t → denoise → re-noise to the next level."""
    del state, counter, eta
    t = schedule.timesteps[i].astype(jnp.int32)
    prev_t = schedule.prev_tr[i].astype(jnp.int32)
    nmax = schedule.num_train_timesteps - 1
    ap_t = schedule.alphas_cumprod[jnp.clip(t, 0, nmax)]
    ap_prev = jnp.where(prev_t >= 0,
                        schedule.alphas_cumprod[jnp.clip(prev_t, 0, nmax)],
                        schedule.final_alpha_cumprod)

    x = sample.astype(jnp.float32)
    eps32 = eps.astype(jnp.float32)
    x0 = (x - jnp.sqrt(1.0 - ap_t) * eps32) * jax.lax.rsqrt(ap_t)
    c_skip, c_out = boundary_scalings(schedule, t)
    denoised = c_out * x0 + c_skip * x

    noise = jax.random.normal(key, sample.shape, jnp.float32)
    renoised = jnp.sqrt(ap_prev) * denoised + jnp.sqrt(1.0 - ap_prev) * noise
    prev = jnp.where(prev_t >= 0, renoised, denoised)
    return (), prev.astype(sample.dtype)
