"""DPM-Solver++ (2M) — second-order multistep solver in data-prediction form.

An addition over the reference trio: the de-facto standard fast sampler
(10–25 steps at PLMS-30 quality). Scan-friendly design: every per-step
coefficient of the update

    x ← (σ_t/σ_s)·x − α_t·(e^{−h} − 1)·D0 − ½·α_t·(e^{−h} − 1)·D1

is precomputed host-side into tables (including the exact σ→0 limit on the
final step, where the update degenerates to ``x ← x₀``), so the traced step
is three gathers and a lerp. State is the previous x₀ prediction. First and
last steps use the first-order update (``lower_order_final`` behavior).

Operates in VP space: identity input scaling, standard ``√ᾱ·x + √(1−ᾱ)·ε``
img2img noising, plain N(0,1) txt2img init.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flexdiffuse_tpu.schedulers.base import Schedule, SchedulerConfig, \
    alphas_cumprod, karras_sigmas, sigmas_to_timesteps
from flax import struct

Array = jax.Array


class DPMSchedule(Schedule):
    """Schedule with DPM-Solver++ coefficient tables."""

    # [L] each: update coefficients; r0 is h_prev/h for the D1 term.
    c_x: Array = None
    c_d0: Array = None
    r0_inv: Array = None
    use_2nd: Array = None
    # VP-space (α_t, σ_t) pairs per position for ε→x₀ conversion.
    vp_alpha: Array = None
    vp_sigma: Array = None


def make_schedule(config: SchedulerConfig, steps: int) -> DPMSchedule:
    n = config.num_train_timesteps
    acp = alphas_cumprod(config)
    if config.use_karras_sigmas:
        sig_full = np.sqrt((1.0 - acp) / acp)
        sig_k = karras_sigmas(float(sig_full[0]), float(sig_full[-1]), steps)
        ts = sigmas_to_timesteps(sig_k, sig_full)
        alpha = 1.0 / np.sqrt(sig_k**2 + 1.0)
        sigma = sig_k * alpha
    else:
        # Integer timesteps, trailing-style spacing (linspace incl endpoints).
        ts = np.linspace(0, n - 1, steps + 1).round()[::-1][:-1].astype(
            np.float64)
        idx = ts.astype(int)
        alpha = np.sqrt(acp[idx])                  # ᾱ^0.5 at each position
        sigma = np.sqrt(1.0 - acp[idx])
        sig_k = sigma / alpha
    lam = np.log(alpha) - np.log(sigma)
    # Terminal state: σ→0 ⇒ α→1, λ→∞.
    sig_k_next = np.concatenate([sig_k[1:], [0.0]])
    alpha_next = np.concatenate([alpha[1:], [1.0]])
    lam_next = np.concatenate([lam[1:], [np.inf]])

    h = lam_next - lam                              # > 0
    # Sample coefficient is the VP-sigma ratio σ_t/σ_s (NOT the Karras σ/α
    # ratio — latents live in VP space here); terminal σ→0 gives c_x = 0.
    sigma_next = np.concatenate([sigma[1:], [0.0]])
    c_x = sigma_next / np.maximum(sigma, 1e-20)
    c_d0 = -alpha_next * (np.exp(-np.minimum(h, 60.0)) - 1.0)
    h_prev = np.concatenate([[np.nan], h[:-1]])
    with np.errstate(invalid='ignore', divide='ignore'):
        r0_inv = np.where(np.isfinite(h_prev / h), h / np.maximum(
            h_prev, 1e-20), 0.0)
    use_2nd = np.zeros(steps, bool)
    if steps > 2:
        # First step has no history; the FINAL step must be first-order here
        # regardless of step count: this schedule uses a zero terminal sigma,
        # so h_final = λ_∞ − λ = ∞ and the D1 factor h/h_prev diverges.
        # diffusers encodes the same rule — with final_sigmas_type="zero"
        # (its default) the last step is forced to first order at any step
        # count; the `lower_order_final and steps < 15` branch only governs
        # the legacy sigma_min-terminal schedule, which we don't build.
        use_2nd[1:-1] = True
    r0_inv = np.where(use_2nd, np.nan_to_num(r0_inv), 0.0)

    return DPMSchedule(
        kind='dpmpp',
        num_steps=steps,
        num_train_timesteps=n,
        ratio=n // steps,
        steps_offset=0,
        clip_sample=False,
        length=steps,
        timesteps=jnp.asarray(ts, jnp.float32),
        alphas_cumprod=jnp.asarray(acp, jnp.float32),
        final_alpha_cumprod=jnp.float32(acp[0]),
        sigmas=jnp.asarray(np.concatenate([sig_k, [0.0]]), jnp.float32),
        lms_coeffs=jnp.zeros((1, 4), jnp.float32),
        c_x=jnp.asarray(c_x, jnp.float32),
        c_d0=jnp.asarray(c_d0, jnp.float32),
        r0_inv=jnp.asarray(r0_inv, jnp.float32),
        use_2nd=jnp.asarray(use_2nd),
        vp_alpha=jnp.asarray(alpha, jnp.float32),
        vp_sigma=jnp.asarray(sigma, jnp.float32),
    )


def init_state(schedule: DPMSchedule, latent_shape, dtype) -> tuple:
    return (jnp.zeros(latent_shape, jnp.float32),)  # previous x₀


def step(schedule: DPMSchedule, state: tuple, eps: Array, i: Array,
         counter: Array, sample: Array, key: Optional[Array],
         eta: Array) -> Tuple[tuple, Array]:
    del key, eta
    (x0_prev,) = state
    x = sample.astype(jnp.float32)
    eps32 = eps.astype(jnp.float32)
    # ε → x₀ (data prediction).
    x0 = (x - schedule.vp_sigma[i] * eps32) / schedule.vp_alpha[i]

    d0 = x0
    # D1 only valid when a previous x₀ exists this run (counter ≥ 1).
    second = schedule.use_2nd[i] & (counter >= 1)
    d1 = jnp.where(second, (x0 - x0_prev) * schedule.r0_inv[i], 0.0)
    prev = (schedule.c_x[i] * x + schedule.c_d0[i] * d0 +
            0.5 * schedule.c_d0[i] * d1)
    return (x0,), prev.astype(sample.dtype)
