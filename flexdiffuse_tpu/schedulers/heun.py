"""Heun (2nd-order) discrete scheduler — trapezoidal σ-space ODE steps.

Beyond-reference sampler (the reference ships DDIM/PLMS/LMS only,
pipeline/flex.py:46-83): Heun's method evaluates the model twice per σ
transition — once at the step start (predictor, a plain Euler move) and once
at the predicted endpoint — then averages the two derivatives (corrector).
Halves the discretization error order vs Euler at 2× the model cost.

Scan-friendly shape: the two evaluations become two *rows* of one
``lax.scan`` (``rows_per_step = 2``). Tables are interleaved —

    sigmas    [σ0, σ1,σ1, σ2,σ2, …, σ_{N-1},σ_{N-1}, 0]
    timesteps [t0, t1,t1, t2,t2, …, t_{N-1}]            (length 2N−1)

even rows are predictors for the transition ``s[i] → s[i+1]`` (stash the
start sample + derivative in the carried state, output the Euler estimate),
odd rows are correctors for ``s[i−1] → s[i]`` (average stashed and fresh
derivatives from the predicted point). The final transition to σ=0 is the
lone terminal even row — Euler only, exactly as k-diffusion defines it
(the model is never evaluated at σ=0). Duplicated odd-row sigmas make the
generic ``anchor_noise``/input-scaling row arithmetic hold for both
parities with no special cases.
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
    # Interleave: predictor+corrector rows share the step's tables.
    ts_rows = np.concatenate([ts[:1], np.repeat(ts[1:], 2)])
    sig_rows = np.concatenate([sigmas[:1], np.repeat(sigmas[1:], 2), [0.0]])
    return Schedule(
        kind='heun',
        num_steps=steps,
        num_train_timesteps=n,
        ratio=n // steps,
        steps_offset=0,
        clip_sample=False,
        length=2 * steps - 1,
        rows_per_step=2,
        timesteps=jnp.asarray(ts_rows, jnp.float32),
        alphas_cumprod=jnp.asarray(acp, jnp.float32),
        final_alpha_cumprod=jnp.float32(acp[0]),
        sigmas=jnp.asarray(sig_rows, jnp.float32),
        lms_coeffs=jnp.zeros((1, 4), jnp.float32),
    )


def init_state(schedule: Schedule, latent_shape, dtype):
    # (step-start sample, stashed predictor derivative)
    return (jnp.zeros(latent_shape, jnp.float32),
            jnp.zeros(latent_shape, jnp.float32))


def scale_model_input(schedule: Schedule, sample: Array, i: Array) -> Array:
    sigma = schedule.sigmas[i]
    return (sample.astype(jnp.float32) /
            jnp.sqrt(sigma**2 + 1.0)).astype(sample.dtype)


def step(schedule: Schedule, state: tuple, eps: Array, i: Array,
         counter: Array, sample: Array, key: Optional[Array],
         eta: Array) -> Tuple[tuple, Array]:
    del key, eta, counter
    x0_stash, d_stash = state
    x = sample.astype(jnp.float32)
    d = eps.astype(jnp.float32)
    first = (i % 2) == 0

    # Predictor (even row): Euler estimate of s[i] → s[i+1]; stash.
    dt_pred = schedule.sigmas[i + 1] - schedule.sigmas[i]
    predicted = x + d * dt_pred

    # Corrector (odd row): finish s[i-1] → s[i] with the mean derivative.
    im1 = jnp.maximum(i - 1, 0)
    dt_corr = schedule.sigmas[i] - schedule.sigmas[im1]
    corrected = x0_stash + 0.5 * (d_stash + d) * dt_corr

    prev = jnp.where(first, predicted, corrected)
    new_state = (jnp.where(first, x, x0_stash),
                 jnp.where(first, d, d_stash))
    return new_state, prev.astype(sample.dtype)


def add_noise(schedule: Schedule, sample: Array, noise: Array,
              index: Array) -> Array:
    """img2img noising at *step* ``index`` → interleaved row ``2·index``."""
    row = jnp.clip(2 * jnp.asarray(index, jnp.int32), 0,
                   schedule.length)
    sigma = schedule.sigmas[row]
    return (sample.astype(jnp.float32) +
            noise.astype(jnp.float32) * sigma).astype(sample.dtype)
