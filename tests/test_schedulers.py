"""Scheduler step-math unit tests (SURVEY.md §4: scheduler fidelity)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdiffuse_tpu import schedulers
from flexdiffuse_tpu.schedulers import SchedulerConfig

SHAPE = (1, 4, 8, 8)


def _denoise(kind, steps, t_start=0, eta=0.0, seed=0):
    """Drive a full denoise loop against a fake 'model' that predicts a
    fixed fraction of the sample (keeps trajectories bounded + nontrivial)."""
    sch = schedulers.make(kind, steps)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=SHAPE).astype(np.float32))
    if kind == 'lms':
        x = x * sch.sigmas[t_start]
    state = schedulers.init_state(sch, SHAPE, jnp.float32)
    key = jax.random.PRNGKey(seed)
    for c, i in enumerate(range(t_start, sch.length)):
        key, sub = jax.random.split(key)
        xin = schedulers.scale_model_input(sch, x, jnp.int32(i))
        eps = 0.1 * xin
        state, x = schedulers.step(sch, state, eps, jnp.int32(i),
                                   jnp.int32(c), x, sub, eta)
    return np.asarray(x)


@pytest.mark.parametrize('kind', ['ddim', 'pndm', 'lms'])
def test_full_loop_finite(kind):
    out = _denoise(kind, steps=8)
    assert np.isfinite(out).all()
    assert np.abs(out).max() < 100


@pytest.mark.parametrize('kind', ['ddim', 'pndm', 'lms'])
def test_deterministic(kind):
    a = _denoise(kind, steps=6, seed=3)
    b = _denoise(kind, steps=6, seed=3)
    np.testing.assert_array_equal(a, b)


def test_timestep_tables():
    ddim = schedulers.make('ddim', 10)
    assert ddim.length == 10
    ts = np.asarray(ddim.timesteps)
    assert ts[0] == 901 and ts[-1] == 1  # arange*100 reversed + offset 1
    assert (np.diff(ts) == -100).all()

    pndm = schedulers.make('pndm', 10)
    assert pndm.length == 11  # PLMS warm-up duplicates second-to-last
    ts = np.asarray(pndm.timesteps)
    assert ts[0] == 901 and ts[1] == 801 and ts[2] == 801

    lms = schedulers.make('lms', 10)
    ts = np.asarray(lms.timesteps)
    assert ts[0] == 999.0 and ts[-1] == 0.0
    sig = np.asarray(lms.sigmas)
    assert sig[-1] == 0.0 and (np.diff(sig) <= 0).all()  # descending + final 0


def test_ddim_eta_zero_ignores_key():
    """η=0 must be deterministic regardless of the PRNG key."""
    sch = schedulers.make('ddim', 8)
    x = jnp.ones(SHAPE)
    eps = jnp.full(SHAPE, 0.1)
    _, a = schedulers.step(sch, (), eps, jnp.int32(0), jnp.int32(0), x,
                           jax.random.PRNGKey(0), 0.0)
    _, b = schedulers.step(sch, (), eps, jnp.int32(0), jnp.int32(0), x,
                           jax.random.PRNGKey(99), 0.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ddim_eta_changes_result():
    sch = schedulers.make('ddim', 8)
    x = jnp.ones(SHAPE)
    eps = jnp.full(SHAPE, 0.1)
    _, a = schedulers.step(sch, (), eps, jnp.int32(3), jnp.int32(3), x,
                           jax.random.PRNGKey(0), 0.0)
    _, b = schedulers.step(sch, (), eps, jnp.int32(3), jnp.int32(3), x,
                           jax.random.PRNGKey(0), 1.0)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6


def test_ddim_perfect_model_recovers_x0():
    """With the exact ε that generated x_t, η=0 DDIM must walk back to x₀."""
    cfg = SchedulerConfig(kind='ddim', clip_sample=False)
    steps = 50
    sch = schedulers.make('ddim', steps, cfg)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, SHAPE).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=SHAPE).astype(np.float32))
    # Start from the highest-noise timestep.
    t0 = sch.timesteps[0]
    x = schedulers.base.ddim_like_add_noise(sch, x0, noise, t0) \
        if hasattr(schedulers, 'base') else None
    from flexdiffuse_tpu.schedulers.base import ddim_like_add_noise
    x = ddim_like_add_noise(sch, x0, noise, t0)
    for c, i in enumerate(range(steps)):
        t = sch.timesteps[i].astype(jnp.int32)
        ap = sch.alphas_cumprod[t]
        # Exact ε for the current x relative to the true x₀.
        eps = (x - jnp.sqrt(ap) * x0) / jnp.sqrt(1.0 - ap)
        _, x = schedulers.step(sch, (), eps, jnp.int32(i), jnp.int32(c), x,
                               None, 0.0)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=5e-3)


def test_pndm_warmup_reuses_stashed_sample():
    """Counter-1 must restore the counter-0 sample (PLMS warm-up)."""
    sch = schedulers.make('pndm', 8)
    state = schedulers.init_state(sch, SHAPE, jnp.float32)
    x0 = jnp.ones(SHAPE)
    eps = jnp.full(SHAPE, 0.1)
    state, x1 = schedulers.step(sch, state, eps, jnp.int32(0), jnp.int32(0),
                                x0)
    # Pass a garbage sample at counter 1 — result must not depend on it.
    state1, a = schedulers.step(sch, state, eps, jnp.int32(1), jnp.int32(1),
                                x1)
    state2, b = schedulers.step(sch, state, eps, jnp.int32(1), jnp.int32(1),
                                x1 * 1e6)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lms_coefficients_sum_to_sigma_delta():
    """Σ_j coeff_j = ∫ 1 dσ = σ_{i+1} − σ_i for every full-order step
    (Lagrange bases partition unity)."""
    sch = schedulers.make('lms', 12)
    sig = np.asarray(sch.sigmas)
    coeffs = np.asarray(sch.lms_coeffs)
    for i in range(12):
        np.testing.assert_allclose(coeffs[i].sum(), sig[i + 1] - sig[i],
                                   rtol=1e-4)


def test_lms_constant_eps_exact():
    """With constant ε the multistep update must integrate exactly:
    x_{i+1} = x_i + ε·(σ_{i+1} − σ_i)."""
    sch = schedulers.make('lms', 10)
    state = schedulers.init_state(sch, SHAPE, jnp.float32)
    x = jnp.zeros(SHAPE)
    eps = jnp.full(SHAPE, 2.0)
    sig = np.asarray(sch.sigmas)
    for c in range(10):
        state, x = schedulers.step(sch, state, eps, jnp.int32(c),
                                   jnp.int32(c), x)
        np.testing.assert_allclose(np.asarray(x)[0, 0, 0, 0],
                                   2.0 * (sig[c + 1] - sig[0]), rtol=1e-3,
                                   atol=1e-5)


def test_img2img_t_start_and_add_noise():
    steps = 30
    for kind in ('ddim', 'pndm', 'lms'):
        sch = schedulers.make(kind, steps)
        init_ts, t_start = schedulers.init_timestep_info(sch, 0.6, steps)
        offset = sch.steps_offset
        assert init_ts == min(int(steps * 0.6) + offset, steps)
        assert t_start == max(steps - init_ts + offset, 0)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=SHAPE).astype(np.float32))
        n = jnp.asarray(rng.normal(size=SHAPE).astype(np.float32))
        noisy = schedulers.add_noise(sch, x, n, init_ts)
        assert np.isfinite(np.asarray(noisy)).all()
        assert noisy.shape == SHAPE


def test_strength_one_runs_full_schedule():
    sch = schedulers.make('pndm', 30)
    init_ts, t_start = schedulers.init_timestep_info(sch, 1.0, 30)
    assert init_ts == 30
    assert t_start == 1  # offset pushes start by one (reference flex.py:221)
