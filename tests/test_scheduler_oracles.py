"""Scheduler fidelity vs sequential diffusers-0.3.0 oracles (VERDICT r1 #3).

Each oracle is an independent, hand-written numpy/scipy re-expression of the
published diffusers-0.3.0 algorithm in its original *stateful, sequential*
form (counter branching, python deques, scipy quadrature). The product
schedulers are table-driven scan programs — matching these trajectories
exactly is evidence the redesign preserved the math, not just the intent.
"""
import jax
import jax.numpy as jnp
import numpy as np
import scipy.integrate as integrate

from flexdiffuse_tpu import schedulers
from flexdiffuse_tpu.schedulers import SchedulerConfig, alphas_cumprod
from flexdiffuse_tpu.schedulers.lms import lms_coefficient_table

N_TRAIN = 1000


def _acp():
    return np.cumprod(1.0 - np.linspace(0.00085**0.5, 0.012**0.5, N_TRAIN,
                                        dtype=np.float64)**2)


class OracleDDIM:
    """diffusers 0.3.0 DDIMScheduler.step, eta deterministic part."""

    def __init__(self, steps, offset=1, clip_sample=True,
                 set_alpha_to_one=True):
        self.acp = _acp()
        self.final = 1.0 if set_alpha_to_one else self.acp[0]
        self.ratio = N_TRAIN // steps
        self.timesteps = (np.arange(steps) * self.ratio)[::-1] + offset
        self.clip = clip_sample

    def step(self, eps, t, sample, eta=0.0):
        prev_t = t - self.ratio
        ap_t = self.acp[t]
        ap_prev = self.acp[prev_t] if prev_t >= 0 else self.final
        x0 = (sample - (1 - ap_t)**0.5 * eps) / ap_t**0.5
        if self.clip:
            x0 = np.clip(x0, -1, 1)
        var = (1 - ap_prev) / (1 - ap_t) * (1 - ap_t / ap_prev)
        std = eta * var**0.5
        direction = np.maximum(1 - ap_prev - std**2, 0.0)**0.5 * eps
        return ap_prev**0.5 * x0 + direction


class OraclePLMS:
    """diffusers 0.3.0 PNDMScheduler, skip_prk_steps=True."""

    def __init__(self, steps, offset=1):
        self.acp = _acp()
        self.final = self.acp[0]
        self.ratio = N_TRAIN // steps
        base = np.arange(steps) * self.ratio + offset
        self.timesteps = np.concatenate(
            [base[:-1], base[-2:-1], base[-1:]])[::-1].copy()
        self.ets = []
        self.counter = 0
        self.cur_sample = None

    def _prev(self, sample, t, prev_t, eps):
        ap_t = self.acp[t]
        ap_prev = self.acp[prev_t] if prev_t >= 0 else self.final
        coeff = (ap_prev / ap_t)**0.5
        denom = (ap_t * (1 - ap_prev)**0.5 +
                 (ap_t * (1 - ap_t) * ap_prev)**0.5)
        return coeff * sample - (ap_prev - ap_t) * eps / denom

    def step(self, eps, t, sample):
        prev_t = t - self.ratio
        if self.counter != 1:
            self.ets.append(eps)
        else:
            prev_t = t
            t = t + self.ratio
        if len(self.ets) == 1 and self.counter == 0:
            e = eps
            self.cur_sample = sample
        elif len(self.ets) == 1 and self.counter == 1:
            e = (eps + self.ets[-1]) / 2
            sample = self.cur_sample
            self.cur_sample = None
        elif len(self.ets) == 2:
            e = (3 * self.ets[-1] - self.ets[-2]) / 2
        elif len(self.ets) == 3:
            e = (23 * self.ets[-1] - 16 * self.ets[-2] +
                 5 * self.ets[-3]) / 12
        else:
            e = (55 * self.ets[-1] - 59 * self.ets[-2] + 37 * self.ets[-3] -
                 9 * self.ets[-4]) / 24
        self.counter += 1
        return self._prev(sample, t, prev_t, e)


def _fake(x, t, pattern):
    return 0.12 * x + np.sin(t / 89.0) * pattern


def _drive(kind, steps, oracle, eta=0.0):
    sch = schedulers.make(kind, steps)
    rng = np.random.default_rng(7)
    shape = (2, 6)
    pattern = rng.normal(size=shape)
    x_ref = rng.normal(size=shape)
    x_got = jnp.asarray(x_ref.astype(np.float32))
    state = schedulers.init_state(sch, shape, jnp.float32)
    for i in range(sch.length):
        t = int(oracle.timesteps[i])
        assert t == int(np.asarray(sch.timesteps)[i])
        if eta:
            x_ref = oracle.step(_fake(x_ref, t, pattern), t, x_ref, eta)
        else:
            x_ref = oracle.step(_fake(x_ref, t, pattern), t, x_ref)
        eps = jnp.asarray(_fake(np.asarray(x_got, np.float64), t,
                                pattern).astype(np.float32))
        state, x_got = schedulers.step(sch, state, eps, jnp.int32(i),
                                       jnp.int32(i), x_got, None, eta)
        np.testing.assert_allclose(np.asarray(x_got), x_ref, rtol=2e-4,
                                   atol=2e-5, err_msg=f'position {i}')


def test_ddim_matches_oracle():
    _drive('ddim', 10, OracleDDIM(10))


def test_ddim_eta_deterministic_part_matches_oracle():
    # key=None exercises exactly the oracle's deterministic component.
    _drive('ddim', 10, OracleDDIM(10), eta=0.7)


def test_plms_matches_oracle():
    _drive('pndm', 10, OraclePLMS(10))


def test_lms_coefficients_match_scipy_quadrature():
    """Our exact polynomial integrals vs diffusers' scipy.integrate.quad."""
    acp = _acp()
    sig_full = np.sqrt((1.0 - acp) / acp)
    steps = 10
    ts = np.linspace(N_TRAIN - 1, 0, steps, dtype=np.float64)
    low, high = np.floor(ts).astype(int), np.ceil(ts).astype(int)
    frac = np.mod(ts, 1.0)
    sigmas = (1.0 - frac) * sig_full[low] + frac * sig_full[high]
    sigmas = np.concatenate([sigmas, [0.0]])

    ours = lms_coefficient_table(sigmas, steps)

    def quad_coeff(order, t, j):
        def fn(tau):
            prod = 1.0
            for k in range(order):
                if j == k:
                    continue
                prod *= ((tau - sigmas[t - k]) /
                         (sigmas[t - j] - sigmas[t - k]))
            return prod

        return integrate.quad(fn, sigmas[t], sigmas[t + 1], epsrel=1e-10)[0]

    for i in range(steps):
        order = min(i + 1, 4)
        for j in range(order):
            ref = quad_coeff(order, i, j)
            np.testing.assert_allclose(ours[i, j], ref, rtol=1e-5,
                                       err_msg=f'coeff[{i},{j}]')


def test_schedule_tables_match_oracle_construction():
    """Timestep feeds pinned against the oracles' own construction."""
    for steps in (6, 10, 25):
        np.testing.assert_array_equal(
            np.asarray(schedulers.make('ddim', steps).timesteps),
            OracleDDIM(steps).timesteps)
        np.testing.assert_array_equal(
            np.asarray(schedulers.make('pndm', steps).timesteps),
            OraclePLMS(steps).timesteps)
