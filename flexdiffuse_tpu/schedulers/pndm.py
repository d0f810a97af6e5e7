"""PNDM — PLMS mode (``skip_prk_steps=True``, SD v1.x's shipped scheduler)
and classic Runge–Kutta (PRK) warm-up mode (``skip_prk_steps=False``).

Scan-friendly redesign of the stateful diffusers PLMS stepper: the ε-history
deque becomes a fixed ``[4, ...]`` rolling buffer in the scheduler state, and
the order ramp-up (1st → 2nd → 3rd → 4th order Adams–Bashforth) becomes a
coefficient table indexed by the call counter — no Python branching, the
whole thing lives inside ``lax.scan``.

PLMS semantics mirrored from the reference's runtime behavior:
* ``timesteps`` has ``steps+1`` entries with the second-to-last duplicated
  (the PLMS warm-up), so ``FlexPipeline`` iterates steps+1 UNet calls.
* call 0 stashes the sample, call 1 re-uses it with the averaged ε and a
  shifted timestep pair; later calls use the multistep formula.

PRK mode (diffusers 0.3.0 PNDM with ``skip_prk_steps=False``) replaces the
pseudo warm-up with three exact RK4 transitions over the last three timestep
intervals — 12 UNet calls producing the 3-deep ε history — then runs plain
4th-order PLMS over the remaining ``steps-3`` timesteps (``steps+9`` UNet
calls total). All of diffusers' counter-modulo branching becomes
per-position coefficient tables (anchor/target timesteps, RK accumulator
gains, ε-combination weights, stash/push flags), so this mode scans exactly
like the others. Deliberate deviation, flagged: tables are indexed by the
*absolute* scan position, so an img2img ``t_start`` offset lands on a
position-consistent schedule rather than diffusers' incoherent
counter-vs-timestep drift (its ``self.counter`` restarts at 0 while the
pipeline feeds it mid-list timesteps).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flax import struct

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


class PNDMSchedule(Schedule):
    """Schedule with optional PRK-mode coefficient tables (all ``[L]`` or
    ``[L, 4]``, indexed by absolute scan position; unused in PLMS mode)."""

    prk: bool = struct.field(pytree_node=False, default=False)
    t_tr: Array = None       # transfer anchor timestep
    prev_tr: Array = None    # transfer target timestep
    eps_a: Array = None      # weight of the raw ε in ε_used
    eps_b: Array = None      # weight of the RK accumulator in ε_used
    eps_w: Array = None      # [L, 4] weights over the post-push ε buffer
    acc_g: Array = None      # accumulator gain on ε
    acc_keep: Array = None   # 0 resets the accumulator after its use
    push: Array = None       # push ε into the history buffer
    stash: Array = None      # stash the incoming sample
    use_stash: Array = None  # transfer from the stashed sample


def make_schedule(config: SchedulerConfig, steps: int) -> Schedule:
    if not config.skip_prk_steps:
        return _make_prk_schedule(config, steps)
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


def _make_prk_schedule(config: SchedulerConfig, steps: int) -> PNDMSchedule:
    """diffusers-0.3.0 ``skip_prk_steps=False``: 12 PRK positions (3 RK4
    groups over the last 3 intervals) then ``steps-3`` PLMS positions."""
    if steps < 4:
        raise ValueError('PRK warm-up needs steps >= 4')
    n = config.num_train_timesteps
    ratio = n // steps
    base = np.arange(steps) * ratio + config.steps_offset   # ascending
    half = ratio // 2
    # prk_timesteps construction, verbatim semantics (diffusers 0.3.0):
    # repeat last 4, add [0, ratio//2] alternating, drop-last, repeat,
    # trim ends, reverse → [A0, A0-h/2, A0-h/2, A0-r, A1, ...] feed order
    # where A0 > A1 > A2 are the three highest timesteps.
    pairs = np.repeat(base[-4:], 2) + np.tile([0, half], 4)
    prk_feed = np.repeat(pairs[:-1], 2)[1:-1][::-1].copy()  # [12]
    plms_feed = base[:-3][::-1].copy()                      # [steps-3]
    feed = np.concatenate([prk_feed, plms_feed]).astype(np.float64)
    L = len(feed)                                           # steps + 9

    t_tr = np.zeros(L)
    prev_tr = np.zeros(L)
    eps_a = np.zeros(L)
    eps_b = np.zeros(L)
    eps_w = np.zeros((L, 4))
    acc_g = np.zeros(L)
    acc_keep = np.ones(L)
    push = np.zeros(L, bool)
    stash = np.zeros(L, bool)
    use_stash = np.zeros(L, bool)
    for c in range(12):
        anchor = prk_feed[(c // 4) * 4]
        phase = c % 4
        t_tr[c] = anchor
        prev_tr[c] = anchor - (half if phase < 2 else ratio)
        eps_a[c] = 1.0 if phase < 3 else 1.0 / 6.0
        eps_b[c] = 0.0 if phase < 3 else 1.0
        acc_g[c] = (1.0 / 6.0, 1.0 / 3.0, 1.0 / 3.0, 0.0)[phase]
        acc_keep[c] = 0.0 if phase == 3 else 1.0
        push[c] = phase == 0
        stash[c] = phase == 0
        use_stash[c] = True
    for j, t in enumerate(plms_feed):
        c = 12 + j
        t_tr[c] = t
        prev_tr[c] = t - ratio
        eps_w[c] = _BUFFER_WEIGHTS[4]   # history is 3-deep + push → 4th order
        push[c] = True

    acp = alphas_cumprod(config)
    return PNDMSchedule(
        kind='pndm',
        num_steps=steps,
        num_train_timesteps=n,
        ratio=ratio,
        steps_offset=config.steps_offset,
        clip_sample=False,
        length=L,
        timesteps=jnp.asarray(feed, jnp.float32),
        alphas_cumprod=jnp.asarray(acp, jnp.float32),
        final_alpha_cumprod=jnp.float32(acp[0]),
        sigmas=jnp.zeros((1,), jnp.float32),
        lms_coeffs=jnp.zeros((1, 4), jnp.float32),
        prk=True,
        t_tr=jnp.asarray(t_tr, jnp.float32),
        prev_tr=jnp.asarray(prev_tr, jnp.float32),
        eps_a=jnp.asarray(eps_a, jnp.float32),
        eps_b=jnp.asarray(eps_b, jnp.float32),
        eps_w=jnp.asarray(eps_w, jnp.float32),
        acc_g=jnp.asarray(acc_g, jnp.float32),
        acc_keep=jnp.asarray(acc_keep, jnp.float32),
        push=jnp.asarray(push),
        stash=jnp.asarray(stash),
        use_stash=jnp.asarray(use_stash),
    )


def init_state(schedule: Schedule, latent_shape, dtype) -> tuple:
    ets = jnp.zeros((4,) + tuple(latent_shape), jnp.float32)
    cur_sample = jnp.zeros(latent_shape, jnp.float32)
    if getattr(schedule, 'prk', False):
        return (ets, cur_sample, jnp.zeros(latent_shape, jnp.float32))
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


def _step_prk(schedule: PNDMSchedule, state: tuple, eps: Array, i: Array,
              sample: Array) -> Tuple[tuple, Array]:
    """Table-driven PRK+PLMS step (absolute position ``i`` indexes tables)."""
    ets, cur_sample, acc = state
    eps32 = eps.astype(jnp.float32)
    sample32 = sample.astype(jnp.float32)

    cur_sample = jnp.where(schedule.stash[i], sample32, cur_sample)
    sample_used = jnp.where(schedule.use_stash[i], cur_sample, sample32)

    pushed = jnp.concatenate([eps32[None], ets[:-1]])
    ets = jnp.where(schedule.push[i], pushed, ets)

    eps_used = (schedule.eps_a[i] * eps32 + schedule.eps_b[i] * acc +
                jnp.tensordot(schedule.eps_w[i], ets, axes=1))
    acc = (acc + schedule.acc_g[i] * eps32) * schedule.acc_keep[i]

    prev = _transfer(schedule, sample_used,
                     schedule.t_tr[i].astype(jnp.int32),
                     schedule.prev_tr[i].astype(jnp.int32), eps_used)
    return (ets, cur_sample, acc), prev.astype(sample.dtype)


def step(schedule: Schedule, state: tuple, eps: Array, i: Array,
         counter: Array, sample: Array, key: Optional[Array],
         eta: Array) -> Tuple[tuple, Array]:
    del key, eta
    if getattr(schedule, 'prk', False):
        return _step_prk(schedule, state, eps, i, sample)
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
