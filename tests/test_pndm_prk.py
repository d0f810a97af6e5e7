"""PNDM PRK warm-up mode (skip_prk_steps=False) vs a diffusers-0.3.0 oracle.

The oracle below is a hand-written numpy re-expression of the diffusers
0.3.0 PNDMScheduler PRK algorithm (step_prk / step_plms counter branching,
scheduler.timesteps construction) — the same golden-fixture strategy as
tests/reference_oracle.py. The product implementation is table-driven and
scan-compiled (flexdiffuse_tpu/schedulers/pndm.py); this test proves the
tables reproduce the sequential algorithm exactly.
"""
import jax
import jax.numpy as jnp
import numpy as np

from flexdiffuse_tpu import schedulers
from flexdiffuse_tpu.schedulers import SchedulerConfig


class OraclePNDMPRK:
    """diffusers 0.3.0 PNDM, skip_prk_steps=False, float64."""

    def __init__(self, n=1000, steps=10, beta_start=0.00085, beta_end=0.012,
                 offset=1):
        betas = np.linspace(beta_start**0.5, beta_end**0.5, n,
                            dtype=np.float64)**2
        self.acp = np.cumprod(1.0 - betas)
        self.final_acp = self.acp[0]   # set_alpha_to_one=False
        self.ratio = n // steps
        base = np.arange(steps) * self.ratio + offset
        pairs = np.repeat(base[-4:], 2) + np.tile([0, self.ratio // 2], 4)
        self.prk_timesteps = np.repeat(pairs[:-1], 2)[1:-1][::-1].copy()
        self.plms_timesteps = base[:-3][::-1].copy()
        self.timesteps = np.concatenate(
            [self.prk_timesteps, self.plms_timesteps])
        self.ets = []
        self.counter = 0
        self.cur_model_output = 0.0
        self.cur_sample = None

    def _prev(self, sample, t, prev_t, eps):
        ap_t = self.acp[t]
        ap_prev = self.acp[prev_t] if prev_t >= 0 else self.final_acp
        coeff = (ap_prev / ap_t)**0.5
        denom = (ap_t * (1 - ap_prev)**0.5 +
                 (ap_t * (1 - ap_t) * ap_prev)**0.5)
        return coeff * sample - (ap_prev - ap_t) * eps / denom

    def step(self, eps, t, sample):
        if self.counter < len(self.prk_timesteps):
            return self._step_prk(eps, t, sample)
        return self._step_plms(eps, t, sample)

    def _step_prk(self, eps, t, sample):
        diff = 0 if self.counter % 2 else self.ratio // 2
        prev_t = t - diff
        t = self.prk_timesteps[self.counter // 4 * 4]
        if self.counter % 4 == 0:
            self.cur_model_output = self.cur_model_output + eps / 6
            self.ets.append(eps)
            self.cur_sample = sample
        elif self.counter % 4 in (1, 2):
            self.cur_model_output = self.cur_model_output + eps / 3
        else:
            eps = self.cur_model_output + eps / 6
            self.cur_model_output = 0.0
        self.counter += 1
        return self._prev(self.cur_sample, t, prev_t, eps)

    def _step_plms(self, eps, t, sample):
        prev_t = t - self.ratio
        self.ets.append(eps)
        e = (55 * self.ets[-1] - 59 * self.ets[-2] + 37 * self.ets[-3] -
             9 * self.ets[-4]) / 24
        self.counter += 1
        return self._prev(sample, t, prev_t, e)


def _fake_eps(x, t, pattern):
    return 0.15 * x + np.sin(t / 97.0) * pattern


def test_prk_feed_table_pins():
    sch = schedulers.make(
        'pndm', 10, SchedulerConfig(kind='pndm', skip_prk_steps=False))
    assert sch.length == 19   # 12 PRK + (10 - 3) PLMS
    ts = np.asarray(sch.timesteps)
    np.testing.assert_array_equal(ts[:12], [
        901, 851, 851, 801, 801, 751, 751, 701, 701, 651, 651, 601])
    np.testing.assert_array_equal(ts[12:], [601, 501, 401, 301, 201, 101, 1])
    oracle = OraclePNDMPRK(steps=10)
    np.testing.assert_array_equal(ts, oracle.timesteps)


def test_prk_trajectory_matches_diffusers_oracle():
    steps = 10
    sch = schedulers.make(
        'pndm', steps, SchedulerConfig(kind='pndm', skip_prk_steps=False))
    oracle = OraclePNDMPRK(steps=steps)
    rng = np.random.default_rng(0)
    shape = (2, 8)
    pattern = rng.normal(size=shape)
    x_ref = rng.normal(size=shape)
    x_got = jnp.asarray(x_ref.astype(np.float32))
    state = schedulers.init_state(sch, shape, jnp.float32)
    for i in range(sch.length):
        t = int(oracle.timesteps[i])
        x_ref = oracle.step(_fake_eps(x_ref, t, pattern), t, x_ref)
        eps = jnp.asarray(
            _fake_eps(np.asarray(x_got, np.float64), t, pattern).astype(
                np.float32))
        state, x_got = schedulers.step(sch, state, eps, jnp.int32(i),
                                       jnp.int32(i), x_got)
        np.testing.assert_allclose(np.asarray(x_got), x_ref, rtol=2e-4,
                                   atol=2e-5,
                                   err_msg=f'diverged at position {i}')


def test_prk_full_loop_finite_and_scan_compatible():
    """The PRK schedule must run under lax.scan (one compiled program)."""
    steps = 8
    sch = schedulers.make(
        'pndm', steps, SchedulerConfig(kind='pndm', skip_prk_steps=False))
    shape = (1, 4, 8, 8)
    x0 = jnp.asarray(
        np.random.default_rng(1).normal(size=shape).astype(np.float32))
    state0 = schedulers.init_state(sch, shape, jnp.float32)

    @jax.jit
    def run(x, state):
        def body(carry, i):
            x, state = carry
            eps = 0.1 * x
            state, x = schedulers.step(sch, state, eps, i, i, x)
            return (x, state), None

        (x, _), _ = jax.lax.scan(body, (x, state),
                                 jnp.arange(sch.length, dtype=jnp.int32))
        return x

    out = np.asarray(run(x0, state0))
    assert np.isfinite(out).all() and np.abs(out).max() < 100


def test_prk_requires_min_steps():
    import pytest
    with pytest.raises(ValueError):
        schedulers.make('pndm', 3,
                        SchedulerConfig(kind='pndm', skip_prk_steps=False))
