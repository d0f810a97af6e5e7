"""Scheduler foundations: beta schedules, config, and the scan-friendly API.

The reference drives stateful diffusers scheduler objects from a Python loop
(pipeline/flex.py:262-287). TPU-native redesign: a scheduler is

* a :class:`Schedule` — immutable pytree of precomputed tables (timesteps,
  cumulative alphas, sigmas, LMS coefficients) built host-side at init, and
* a pure ``step`` function ``(schedule, state, eps, i, counter, sample, key)
  -> (state, prev_sample)`` where ``i`` is the (traced) position in the
  timestep list and ``counter = i - t_start`` the number of calls so far —

so the whole denoise loop compiles into one ``lax.scan`` and a *traced*
``t_start`` (img2img strength) never forces a recompile.

Schedule semantics follow the reference's diffusers-0.3.0 usage: scaled-linear
betas (0.00085 → 0.012, 1000 train steps — SD v1.x), the ``steps_offset = 1``
shim (pipeline/flex.py:57-70), PLMS (``skip_prk_steps=True``) with its
duplicated second timestep, and LMS sigma interpolation with trailing zero.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

Array = jax.Array

# Scheduler kinds whose carry lives in k-diffusion sigma space
# (x = x0 + sigma*eps; input scaling x/sqrt(sigma^2+1)).
SIGMA_SPACE_KINDS = ('lms', 'euler', 'euler_a', 'heun')


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    kind: str = 'pndm'  # 'ddim' | 'pndm' | 'lms'
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = 'scaled_linear'  # or 'linear'
    steps_offset: int = 1
    # DDIM-only knobs (defaults match diffusers DDIMScheduler).
    clip_sample: bool = True
    set_alpha_to_one: bool = True
    # PNDM-only: PLMS mode (SD ships skip_prk_steps=True).
    skip_prk_steps: bool = True
    # Euler/DPM++: Karras et al. (2022) rho-7 sigma spacing — concentrates
    # steps at low noise for better few-step quality.
    use_karras_sigmas: bool = False
    # 'epsilon' (SD1.x/SDXL) or 'v_prediction' (SD2.x 768-v: the model
    # predicts v = √ᾱ·ε − √(1−ᾱ)·x₀; converted to ε once per step).
    prediction_type: str = 'epsilon'
    # LCM-only: the distillation's base DDIM schedule length and the
    # boundary-condition timestep scaling (diffusers LCMScheduler defaults).
    original_inference_steps: int = 50
    timestep_scaling: float = 10.0
    # Timestep spacing: 'leading' (SD default — first step at
    # ~T·(1-1/steps)+offset) or 'trailing' (first step at T-1 — required
    # for zero-SNR checkpoints to actually start from pure noise; diffusers
    # semantics). ddim/ddpm honor it; others are leading-spaced by design.
    timestep_spacing: str = 'leading'
    # Zero terminal SNR (Lin et al. 2023): rescale the betas so
    # alphas_cumprod[-1] == 0 — the last train step is pure noise, fixing
    # the train/inference mismatch for checkpoints trained this way
    # (pairs with prediction_type='v_prediction'; epsilon prediction is
    # undefined at zero SNR).
    rescale_betas_zero_snr: bool = False


def rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Shift-and-scale ``sqrt(alphas_cumprod)`` so the terminal SNR is
    exactly zero while the initial value is preserved (Lin et al. 2023
    algorithm 1; mirrors diffusers' ``rescale_zero_terminal_snr``)."""
    abar_sqrt = np.sqrt(np.cumprod(1.0 - betas, axis=0))
    a0, aT = abar_sqrt[0], abar_sqrt[-1]
    abar_sqrt = (abar_sqrt - aT) * (a0 / (a0 - aT))
    abar = abar_sqrt**2
    # Floor the terminal alpha-bar at a tiny positive value instead of an
    # exact 0: the samplers recover x0 through the shared ε interface as
    # ``(x − √(1−ᾱ)·ε)/√ᾱ``, which is 0/0 at ᾱ=0 but exact in fp32 for any
    # tiny ᾱ (√(1−ᾱ) rounds to 1, the subtraction cancels the x term, and
    # the √ᾱ factors divide out — the limit −v is produced bit-cleanly).
    abar[-1] = max(abar[-1], 1e-12)
    alphas = np.concatenate([abar[:1], abar[1:] / abar[:-1]])
    return 1.0 - alphas


def spaced_timesteps(config: SchedulerConfig, steps: int,
                     offset: int = 0) -> np.ndarray:
    """Descending inference timesteps under ``config.timestep_spacing``.

    'leading': ``(arange(steps)·ratio)[::-1] + offset`` (SD's historical
    spacing — never reaches T-1). 'trailing': ``round(arange(T, 0,
    -T/steps)) - 1`` — the last train step IS the first inference step,
    which zero-SNR checkpoints need to see pure noise.
    """
    n = config.num_train_timesteps
    if config.timestep_spacing == 'leading':
        ratio = n // steps
        return (np.arange(steps) * ratio)[::-1].copy() + offset
    if config.timestep_spacing == 'trailing':
        return np.round(np.arange(n, 0, -n / steps)).astype(np.int64) - 1
    raise ValueError(
        f'unknown timestep_spacing {config.timestep_spacing!r}')


def make_betas(config: SchedulerConfig) -> np.ndarray:
    n = config.num_train_timesteps
    if config.beta_schedule == 'scaled_linear':
        betas = np.linspace(config.beta_start**0.5, config.beta_end**0.5, n,
                            dtype=np.float64)**2
    elif config.beta_schedule == 'linear':
        betas = np.linspace(config.beta_start, config.beta_end, n,
                            dtype=np.float64)
    else:
        raise ValueError(f'unknown beta schedule {config.beta_schedule!r}')
    if config.rescale_betas_zero_snr:
        betas = rescale_zero_terminal_snr(betas)
    return betas


def alphas_cumprod(config: SchedulerConfig) -> np.ndarray:
    return np.cumprod(1.0 - make_betas(config), axis=0)


class Schedule(struct.PyTreeNode):
    """Precomputed schedule tables (a pytree; static metadata is aux data)."""

    kind: str = struct.field(pytree_node=False)
    num_steps: int = struct.field(pytree_node=False)
    num_train_timesteps: int = struct.field(pytree_node=False)
    ratio: int = struct.field(pytree_node=False)
    steps_offset: int = struct.field(pytree_node=False)
    clip_sample: bool = struct.field(pytree_node=False)
    # Length L of the scan (PNDM/PLMS has steps+1 entries, see pndm.py).
    length: int = struct.field(pytree_node=False)
    # v-parameterized model (SD2.x): step() converts v → ε at entry.
    v_prediction: bool = struct.field(pytree_node=False, default=False)
    # Scan rows per sampling step (heun's predictor+corrector = 2; img2img
    # t_start in step units scales by this to index rows).
    rows_per_step: int = struct.field(pytree_node=False, default=1)

    timesteps: Array = None          # [L] float32, fed to the UNet
    alphas_cumprod: Array = None     # [num_train_timesteps]
    final_alpha_cumprod: Array = None
    sigmas: Array = None             # [L+1] (LMS) else [1]
    lms_coeffs: Array = None         # [L, 4] (LMS) else [1, 4]


def ddim_like_add_noise(schedule: Schedule, sample: Array, noise: Array,
                        timestep: Array) -> Array:
    """`x_t = sqrt(ᾱ_t)·x₀ + sqrt(1-ᾱ_t)·ε` (DDIM/PNDM add_noise)."""
    t = jnp.clip(timestep.astype(jnp.int32), 0,
                 schedule.num_train_timesteps - 1)
    ap = schedule.alphas_cumprod[t]
    return (jnp.sqrt(ap) * sample +
            jnp.sqrt(1.0 - ap) * noise).astype(sample.dtype)


def karras_sigmas(sigma_min: float, sigma_max: float, steps: int,
                  rho: float = 7.0) -> np.ndarray:
    """Karras et al. (2022) σ spacing (descending, no terminal 0)."""
    ramp = np.linspace(0.0, 1.0, steps)
    inv_rho = 1.0 / rho
    return (sigma_max**inv_rho +
            ramp * (sigma_min**inv_rho - sigma_max**inv_rho))**rho


def sigmas_to_timesteps(sigmas: np.ndarray,
                        sig_full: np.ndarray) -> np.ndarray:
    """Invert σ(t) (monotonic in t) to fractional train timesteps."""
    return np.interp(sigmas, sig_full, np.arange(len(sig_full)))


def init_timestep_info(schedule: Schedule, strength: float,
                       steps: int) -> Tuple[int, int]:
    """img2img noise level: (init_timestep, t_start).

    Mirrors pipeline/flex.py:196-221: ``init_timestep = int(steps·strength)
    + offset`` clamped to ``steps``; ``t_start = max(steps - init_timestep
    + offset, 0)``.
    """
    offset = schedule.steps_offset
    init_timestep = min(int(steps * strength) + offset, steps)
    t_start = max(steps - init_timestep + offset, 0)
    return init_timestep, t_start
