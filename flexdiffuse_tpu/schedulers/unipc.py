"""UniPC — unified predictor-corrector sampler (Zhao et al. 2023), order 2.

An addition over the reference's DDIM/PLMS/LMS trio: the sampler many UIs
default to for 5–15-step generation. This implements the data-prediction
(``predict_x0=True``) B(h) = e^{hh} − 1 ("bh2") variant at solver order 2
with ``lower_order_final`` semantics and a zero terminal sigma — the
diffusers ``UniPCMultistepScheduler`` defaults.

Scan-friendly redesign (same approach as dpmpp.py): diffusers keeps Python
lists of model outputs and solves a small linear system per step; here every
position-dependent coefficient — including the 2×2 corrector solve — is
precomputed host-side in float64 into tables, so the traced step is a few
gathers and fused multiply-adds. The carried state is
``(m_prev, m_prev2, x_last)``: the two previous x₀ predictions and the
previous *corrected* sample (diffusers' ``last_sample``).

Per step at position i (h_i = λ_{i+1} − λ_i, φ₁(h) = e^{−h} − 1 = B(h)):

  1. convert:   m_i = (x − σ_i·ε)/α_i                    (pre-corrector x)
  2. correct (UniC at i, from i−1 → i, counter ≥ 1):
       x ← (σ_i/σ_{i−1})·x_last − α_i·φ₁(h_{i−1})·m_{i−1}
             − α_i·B(h_{i−1})·[ρ₀·(m_{i−2} − m_{i−1})/r₁ᶜ + ρ₁·(m_i − m_{i−1})]
     order 1 (counter == 1): ρ = [0.5] on the (m_i − m_{i−1}) term only;
     order 2: [ρ₀, ρ₁] solves [[1,1],[r₁ᶜ,1]]·ρ = [b₁,b₂] (precomputed).
  3. predict (UniP at i, → i+1):
       x ← (σ_{i+1}/σ_i)·x − α_{i+1}·φ₁(h_i)·m_i
             − α_{i+1}·B(h_i)·½·(m_{i−1} − m_i)/r₁ᵖ     (order 2; first and
     final steps are first-order — the terminal σ = 0 makes h_final = ∞).

VP space throughout: identity input scaling, standard ``√ᾱ·x + √(1−ᾱ)·ε``
img2img noising, plain N(0,1) txt2img init. Supports Karras sigma spacing
and v-prediction (via the shared vp_alpha/vp_sigma tables).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flexdiffuse_tpu.schedulers.base import Schedule, SchedulerConfig, \
    alphas_cumprod, karras_sigmas, sigmas_to_timesteps

Array = jax.Array


class UniPCSchedule(Schedule):
    """Schedule with precomputed UniP/UniC coefficient tables ([L] each)."""

    # Predictor: x ← p_cx·x + p_m0·m_i + p_d1·(m_{i-1} − m_i)
    p_cx: Array = None
    p_m0: Array = None
    p_d1: Array = None
    # Corrector: x ← c_cx·x_last + c_m0·m_{i-1} + c_d10·(m_{i-2} − m_{i-1})
    #              + c_d1t·(m_i − m_{i-1});  order-1 uses c_d1t_o1 alone.
    c_cx: Array = None
    c_m0: Array = None
    c_d10: Array = None
    c_d1t: Array = None
    c_d1t_o1: Array = None
    # VP-space (α, σ) per position for ε→x₀ / add_noise / anchor_noise.
    vp_alpha: Array = None
    vp_sigma: Array = None


def make_schedule(config: SchedulerConfig, steps: int) -> UniPCSchedule:
    n = config.num_train_timesteps
    acp = alphas_cumprod(config)
    if config.use_karras_sigmas:
        sig_full = np.sqrt((1.0 - acp) / acp)
        sig_k = karras_sigmas(float(sig_full[0]), float(sig_full[-1]), steps)
        ts = sigmas_to_timesteps(sig_k, sig_full)
        alpha = 1.0 / np.sqrt(sig_k**2 + 1.0)
        sigma = sig_k * alpha
    else:
        ts = np.linspace(0, n - 1, steps + 1).round()[::-1][:-1].astype(
            np.float64)
        idx = ts.astype(int)
        alpha = np.sqrt(acp[idx])
        sigma = np.sqrt(1.0 - acp[idx])
        sig_k = sigma / alpha
    lam = np.log(alpha) - np.log(sigma)
    L = steps

    # Interval widths; the terminal sigma is 0 ⇒ h[L-1] = ∞ (the final
    # predictor degenerates to x ← m, handled via explicit limits below).
    lam_next = np.concatenate([lam[1:], [np.inf]])
    sigma_next = np.concatenate([sigma[1:], [0.0]])
    alpha_next = np.concatenate([alpha[1:], [1.0]])
    h = lam_next - lam

    def phi1(hv):  # e^{−h} − 1, safe at h = ∞
        return np.expm1(-np.minimum(hv, 60.0))

    # ---- Predictor tables -------------------------------------------------
    p_cx = sigma_next / np.maximum(sigma, 1e-20)          # terminal → 0
    p_m0 = -alpha_next * phi1(h)                          # terminal → 1
    # Second order: −α_t·B(h)·½/r₁ᵖ with r₁ᵖ = −h_{i−1}/h_i; disabled at the
    # first position (no history) and the final one (lower_order_final /
    # h = ∞).
    p_d1 = np.zeros(L)
    for i in range(1, L - 1):
        r1p = -h[i - 1] / h[i]
        p_d1[i] = -alpha_next[i] * phi1(h[i]) * 0.5 / r1p

    # ---- Corrector tables (at position i, over the i−1 → i interval) -----
    c_cx = np.zeros(L)
    c_m0 = np.zeros(L)
    c_d10 = np.zeros(L)
    c_d1t = np.zeros(L)
    c_d1t_o1 = np.zeros(L)
    for i in range(1, L):
        hc = h[i - 1]
        hh = -hc
        p1 = phi1(hc)                                     # = B(h), bh2
        c_cx[i] = sigma[i] / sigma[i - 1]
        c_m0[i] = -alpha[i] * p1
        c_d1t_o1[i] = -alpha[i] * p1 * 0.5                # order-1: ρ = [½]
        if i >= 2:
            r1c = -h[i - 2] / hc
            b1 = (p1 / hh - 1.0) / p1
            b2 = 2.0 * ((p1 / hh - 1.0) / hh - 0.5) / p1
            rho0 = (b2 - b1) / (r1c - 1.0)
            rho1 = b1 - rho0
            c_d10[i] = -alpha[i] * p1 * rho0 / r1c
            c_d1t[i] = -alpha[i] * p1 * rho1

    return UniPCSchedule(
        kind='unipc',
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
        p_cx=jnp.asarray(p_cx, jnp.float32),
        p_m0=jnp.asarray(p_m0, jnp.float32),
        p_d1=jnp.asarray(p_d1, jnp.float32),
        c_cx=jnp.asarray(c_cx, jnp.float32),
        c_m0=jnp.asarray(c_m0, jnp.float32),
        c_d10=jnp.asarray(c_d10, jnp.float32),
        c_d1t=jnp.asarray(c_d1t, jnp.float32),
        c_d1t_o1=jnp.asarray(c_d1t_o1, jnp.float32),
        vp_alpha=jnp.asarray(alpha, jnp.float32),
        vp_sigma=jnp.asarray(sigma, jnp.float32),
    )


def init_state(schedule: UniPCSchedule, latent_shape, dtype) -> tuple:
    zero = jnp.zeros(latent_shape, jnp.float32)
    return (zero, zero, zero)  # (m_prev, m_prev2, x_last)


def step(schedule: UniPCSchedule, state: tuple, eps: Array, i: Array,
         counter: Array, sample: Array, key: Optional[Array],
         eta: Array) -> Tuple[tuple, Array]:
    del key, eta
    m_prev, m_prev2, x_last = state
    x = sample.astype(jnp.float32)
    m = (x - schedule.vp_sigma[i] * eps.astype(jnp.float32)) / \
        schedule.vp_alpha[i]

    # UniC: correct the incoming (predictor) sample using this position's
    # fresh model output. o_c = min(2, counter); inactive at counter == 0.
    base = schedule.c_cx[i] * x_last + schedule.c_m0[i] * m_prev
    corr1 = base + schedule.c_d1t_o1[i] * (m - m_prev)
    corr2 = (base + schedule.c_d10[i] * (m_prev2 - m_prev) +
             schedule.c_d1t[i] * (m - m_prev))
    x = jnp.where(counter == 0, x, jnp.where(counter == 1, corr1, corr2))

    # UniP: predict position i+1 from the corrected sample.
    # o_p = min(2, L − i, counter + 1); p_d1 is already zeroed at i = 0 and
    # i = L−1, so only the counter gate is traced.
    pred = schedule.p_cx[i] * x + schedule.p_m0[i] * m
    d1 = jnp.where(counter >= 1, schedule.p_d1[i] * (m_prev - m), 0.0)
    prev = pred + d1
    return (m, m_prev, x), prev.astype(sample.dtype)
