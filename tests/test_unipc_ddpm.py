"""UniPC and DDPM schedulers vs sequential diffusers-style oracles.

Same methodology as test_scheduler_oracles.py: each oracle is an
independent, list-based numpy transcription of the published diffusers
algorithm (UniPCMultistepScheduler with predict_x0/bh2/order-2/
lower_order_final/zero terminal sigma; DDPMScheduler with fixed_small
variance), stepped sequentially with per-step 2×2 solves. The product
schedulers are coefficient-table scan programs — exact trajectory agreement
is evidence the host-side folding (including the corrector's linear solve)
preserved the math.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdiffuse_tpu import schedulers

N_TRAIN = 1000


def _acp():
    return np.cumprod(1.0 - np.linspace(0.00085**0.5, 0.012**0.5, N_TRAIN,
                                        dtype=np.float64)**2)


class OracleUniPC:
    """diffusers UniPCMultistepScheduler: predict_x0, bh2, solver_order=2,
    lower_order_final=True, final_sigmas_type='zero'. Sequential form with
    python lists and per-step linear solves."""

    def __init__(self, steps):
        acp = _acp()
        ts = np.linspace(0, N_TRAIN - 1, steps + 1).round()[::-1][:-1]
        self.timesteps = ts.astype(int)
        sig_full = np.sqrt((1.0 - acp) / acp)
        sig = np.interp(ts, np.arange(N_TRAIN), sig_full)
        self.sigmas = np.concatenate([sig, [0.0]])  # karras-space, zero final
        self.model_outputs = []
        self.last_sample = None
        self.this_order = None
        self.lower_order_nums = 0
        self.steps = steps

    @staticmethod
    def _alpha_sigma(sig):
        alpha = 1.0 / np.sqrt(sig**2 + 1.0)
        return alpha, sig * alpha

    def _lam(self, sig):
        a, s = self._alpha_sigma(sig)
        with np.errstate(divide='ignore'):
            return np.log(a) - np.log(s)

    def _bh_coeffs(self, h, order, rks):
        hh = -h
        h_phi_1 = np.expm1(hh)
        B_h = np.expm1(hh)  # bh2
        R, b = [], []
        h_phi_k = h_phi_1 / hh - 1.0
        fact = 1.0
        for i in range(1, order + 1):
            R.append(np.power(rks, i - 1))
            b.append(h_phi_k * fact / B_h)
            fact *= i + 1
            h_phi_k = h_phi_k / hh - 1.0 / fact
        return np.array(R), np.array(b), h_phi_1, B_h

    def _uni_p(self, sample, idx, order):
        m0 = self.model_outputs[-1]
        sig_t, sig_s0 = self.sigmas[idx + 1], self.sigmas[idx]
        alpha_t, sigma_t = self._alpha_sigma(sig_t)
        _, sigma_s0 = self._alpha_sigma(sig_s0)
        h = self._lam(sig_t) - self._lam(sig_s0)
        rks, D1s = [], []
        for i in range(1, order):
            mi = self.model_outputs[-(i + 1)]
            rk = (self._lam(self.sigmas[idx - i]) - self._lam(sig_s0)) / h
            rks.append(rk)
            D1s.append((mi - m0) / rk)
        rks.append(1.0)
        _, _, h_phi_1, B_h = self._bh_coeffs(h, order, np.array(rks))
        x_t = sigma_t / sigma_s0 * sample - alpha_t * h_phi_1 * m0
        if D1s:
            rhos_p = np.array([0.5])  # order == 2 shortcut in diffusers
            x_t = x_t - alpha_t * B_h * sum(
                r * d for r, d in zip(rhos_p, D1s))
        return x_t

    def _uni_c(self, model_t, last_sample, this_sample, idx, order):
        m0 = self.model_outputs[-1]
        sig_t, sig_s0 = self.sigmas[idx], self.sigmas[idx - 1]
        alpha_t, sigma_t = self._alpha_sigma(sig_t)
        _, sigma_s0 = self._alpha_sigma(sig_s0)
        h = self._lam(sig_t) - self._lam(sig_s0)
        rks, D1s = [], []
        for i in range(1, order):
            mi = self.model_outputs[-(i + 1)]
            rk = (self._lam(self.sigmas[idx - (i + 1)]) -
                  self._lam(sig_s0)) / h
            rks.append(rk)
            D1s.append((mi - m0) / rk)
        rks.append(1.0)
        R, b, h_phi_1, B_h = self._bh_coeffs(h, order, np.array(rks))
        rhos_c = np.array([0.5]) if order == 1 else np.linalg.solve(R, b)
        x_t = sigma_t / sigma_s0 * last_sample - alpha_t * h_phi_1 * m0
        corr = sum(r * d for r, d in zip(rhos_c[:-1], D1s)) if D1s else 0.0
        return x_t - alpha_t * B_h * (corr + rhos_c[-1] * (model_t - m0))

    def step(self, eps, idx, sample):
        alpha, sigma = self._alpha_sigma(self.sigmas[idx])
        x0 = (sample - sigma * eps) / alpha
        if idx > 0 and self.last_sample is not None:
            sample = self._uni_c(x0, self.last_sample, sample, idx,
                                 self.this_order)
        self.model_outputs.append(x0)
        this_order = min(2, self.steps - idx, self.lower_order_nums + 1)
        self.this_order = this_order
        self.last_sample = sample
        prev = self._uni_p(sample, idx, this_order)
        self.lower_order_nums = min(self.lower_order_nums + 1, 2)
        return prev


class OracleDDPM:
    """diffusers DDPMScheduler.step, variance_type='fixed_small' (mean only;
    the noise term is keyed identically in the product step, gated on
    t > 0)."""

    def __init__(self, steps, clip_sample=True):
        self.acp = _acp()
        self.ratio = N_TRAIN // steps
        self.timesteps = (np.arange(steps) * self.ratio)[::-1]
        self.clip = clip_sample

    def step(self, eps, t, sample):
        prev_t = t - self.ratio
        ap_t = self.acp[t]
        ap_prev = self.acp[prev_t] if prev_t >= 0 else 1.0
        alpha_t = ap_t / ap_prev
        beta_t = 1.0 - alpha_t
        x0 = (sample - (1.0 - ap_t)**0.5 * eps) / ap_t**0.5
        if self.clip:
            x0 = np.clip(x0, -1.0, 1.0)
        c0 = ap_prev**0.5 * beta_t / (1.0 - ap_t)
        c1 = alpha_t**0.5 * (1.0 - ap_prev) / (1.0 - ap_t)
        return c0 * x0 + c1 * sample


def _drive(kind, steps, oracle, t_start=0, seed=0):
    """Step product scheduler and oracle on the same pseudo-model
    eps = 0.1·x + fixed_noise[i] (eps depends on the trajectory, so any
    divergence compounds instead of cancelling)."""
    rng = np.random.default_rng(seed)
    shape = (1, 4, 4, 3)
    noises = rng.normal(size=(steps,) + shape).astype(np.float32)
    x_o = rng.normal(size=shape).astype(np.float32)
    sch = schedulers.make(kind, steps)
    x_p = jnp.asarray(x_o)
    state = schedulers.init_state(sch, shape, jnp.float32)
    for i in range(t_start, sch.length):
        eps_o = 0.1 * x_o + noises[i]
        prev_o = oracle.step(eps_o, int(np.asarray(sch.timesteps)[i])
                             if kind == 'ddpm' else i, x_o)
        eps_p = 0.1 * x_p + jnp.asarray(noises[i])
        state, x_p = schedulers.step(sch, state, eps_p, jnp.int32(i),
                                     jnp.int32(i - t_start), x_p, None, 0.0)
        np.testing.assert_allclose(np.asarray(x_p), prev_o, rtol=2e-4,
                                   atol=2e-4)
        x_o = prev_o
    return np.asarray(x_p)


@pytest.mark.parametrize('steps', [1, 2, 3, 8, 20])
def test_unipc_matches_oracle(steps):
    _drive('unipc', steps, OracleUniPC(steps))


def test_unipc_img2img_counter_gating_matches_oracle():
    # Scan enters at position t_start with counter 0: the oracle sees a
    # shorter run whose order warm-up restarts — table gating must match.
    steps, t_start = 12, 5
    oracle = OracleUniPC(steps)
    # Oracle state machine: replay only the active suffix.
    rng = np.random.default_rng(7)
    shape = (1, 4, 4, 3)
    noises = rng.normal(size=(steps,) + shape).astype(np.float32)
    x_o = rng.normal(size=shape).astype(np.float32)
    sch = schedulers.make('unipc', steps)
    x_p = jnp.asarray(x_o)
    state = schedulers.init_state(sch, shape, jnp.float32)
    for i in range(t_start, steps):
        eps = (0.1 * x_o + noises[i]).astype(np.float32)
        prev_o = oracle.step(eps, i, x_o)
        state, x_p = schedulers.step(sch, state, jnp.asarray(eps),
                                     jnp.int32(i), jnp.int32(i - t_start),
                                     x_p, None, 0.0)
        np.testing.assert_allclose(np.asarray(x_p), prev_o, rtol=2e-4,
                                   atol=2e-4)
        x_o = prev_o
    # NOTE: the oracle's lower_order warm-up keys off its own call count,
    # which equals counter = i - t_start — exactly the product gating.


def test_unipc_perfect_model_recovers_x0():
    # eps consistent with a fixed x0 ⇒ m_i = x0 exactly, every D1 vanishes,
    # and the final (σ→0) step lands on x0.
    steps = 9
    sch = schedulers.make('unipc', steps)
    rng = np.random.default_rng(3)
    x0 = rng.normal(size=(1, 4, 4, 3)).astype(np.float32)
    a = np.asarray(sch.vp_alpha)
    s = np.asarray(sch.vp_sigma)
    x = jnp.asarray(a[0] * x0 + s[0] * rng.normal(size=x0.shape))
    state = schedulers.init_state(sch, x0.shape, jnp.float32)
    for i in range(steps):
        eps = (np.asarray(x) - a[i] * x0) / s[i]
        state, x = schedulers.step(sch, state, jnp.asarray(eps),
                                   jnp.int32(i), jnp.int32(i), x, None, 0.0)
    np.testing.assert_allclose(np.asarray(x), x0, rtol=1e-4, atol=1e-4)


def test_unipc_karras_tables_consistent():
    sch = schedulers.make(
        'unipc', 10,
        schedulers.SchedulerConfig(kind='unipc', use_karras_sigmas=True))
    sig = np.asarray(sch.sigmas)
    assert sig[0] > sig[1] > sig[-2] > sig[-1] == 0.0
    # vp tables match the karras sigmas: α = 1/√(σ²+1), σ_vp = σ·α.
    np.testing.assert_allclose(np.asarray(sch.vp_alpha),
                               1.0 / np.sqrt(sig[:-1]**2 + 1.0), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sch.vp_sigma),
        sig[:-1] / np.sqrt(sig[:-1]**2 + 1.0), rtol=1e-5)


def test_unipc_add_noise_and_anchor_noise_vp_branch():
    sch = schedulers.make('unipc', 10)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 3)).astype(np.float32))
    n = jnp.asarray(rng.normal(size=(1, 4, 4, 3)).astype(np.float32))
    init_timestep, t_start = schedulers.init_timestep_info(sch, 0.6, 10)
    noised = schedulers.add_noise(sch, x, n, init_timestep)
    idx = 10 - init_timestep
    a = float(np.asarray(sch.vp_alpha)[idx])
    s = float(np.asarray(sch.vp_sigma)[idx])
    np.testing.assert_allclose(np.asarray(noised),
                               a * np.asarray(x) + s * np.asarray(n),
                               rtol=1e-5)
    # anchor at the final position → clean.
    anchored = schedulers.anchor_noise(sch, x, n, jnp.int32(sch.length - 1),
                                       jnp.int32(5))
    np.testing.assert_allclose(np.asarray(anchored), np.asarray(x), rtol=1e-6)


def test_unipc_v_prediction_conversion():
    cfg = schedulers.SchedulerConfig(kind='unipc',
                                     prediction_type='v_prediction')
    sch = schedulers.make('unipc', 8, cfg)
    rng = np.random.default_rng(1)
    x0 = rng.normal(size=(1, 4, 4, 3)).astype(np.float32)
    eps = rng.normal(size=x0.shape).astype(np.float32)
    i = 3
    a = float(np.asarray(sch.vp_alpha)[i])
    s = float(np.asarray(sch.vp_sigma)[i])
    x = a * x0 + s * eps
    v = a * eps - s * x0
    got = schedulers.convert_v_prediction(sch, jnp.asarray(v), jnp.int32(i),
                                          jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), eps, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('steps', [5, 20, 50])
def test_ddpm_mean_matches_oracle(steps):
    _drive('ddpm', steps, OracleDDPM(steps))


def test_ddpm_noise_gating():
    sch = schedulers.make('ddpm', 10)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 3)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(1, 4, 4, 3)).astype(np.float32))
    k1, k2 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)
    # Early step: ancestral noise differs per key.
    _, a1 = schedulers.step(sch, (), eps, jnp.int32(0), jnp.int32(0), x, k1,
                            0.0)
    _, a2 = schedulers.step(sch, (), eps, jnp.int32(0), jnp.int32(0), x, k2,
                            0.0)
    assert float(jnp.abs(a1 - a2).max()) > 1e-4
    # Final step (t = 0): deterministic regardless of key.
    i_last = jnp.int32(sch.length - 1)
    _, b1 = schedulers.step(sch, (), eps, i_last, i_last, x, k1, 0.0)
    _, b2 = schedulers.step(sch, (), eps, i_last, i_last, x, k2, 0.0)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))


def test_ddpm_final_step_is_clipped_x0():
    sch = schedulers.make('ddpm', 10)
    rng = np.random.default_rng(2)
    x0 = np.clip(rng.normal(size=(1, 4, 4, 3)).astype(np.float32) * 0.4,
                 -1, 1)
    i = sch.length - 1
    t = int(np.asarray(sch.timesteps)[i])
    ap = float(np.asarray(sch.alphas_cumprod)[t])
    eps = rng.normal(size=x0.shape).astype(np.float32)
    x = np.sqrt(ap) * x0 + np.sqrt(1 - ap) * eps
    _, out = schedulers.step(sch, (), jnp.asarray(eps), jnp.int32(i),
                             jnp.int32(i), jnp.asarray(x), None, 0.0)
    np.testing.assert_allclose(np.asarray(out), x0, rtol=1e-4, atol=1e-5)


def test_scan_matches_python_loop():
    # The schedulers must produce identical trajectories under lax.scan
    # (the product pipeline) and the eager python loop used above.
    for kind in ('unipc', 'ddpm'):
        steps = 8
        sch = schedulers.make(kind, steps)
        rng = np.random.default_rng(4)
        shape = (1, 4, 4, 3)
        x0 = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        noises = jnp.asarray(
            rng.normal(size=(sch.length,) + shape).astype(np.float32))
        state0 = schedulers.init_state(sch, shape, jnp.float32)

        def body(carry, i, sch=sch, noises=noises):
            x, state = carry
            eps = 0.1 * x + noises[i]
            state, x = schedulers.step(sch, state, eps, i, i, x, None, 0.0)
            return (x, state), None

        (x_scan, _), _ = jax.lax.scan(body, (x0, state0),
                                      jnp.arange(sch.length))
        x = x0
        state = state0
        for i in range(sch.length):
            eps = 0.1 * x + noises[i]
            state, x = schedulers.step(sch, state, eps, jnp.int32(i),
                                       jnp.int32(i), x, None, 0.0)
        np.testing.assert_allclose(np.asarray(x_scan), np.asarray(x),
                                   rtol=1e-6, atol=1e-6)
