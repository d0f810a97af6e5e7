"""Golden-latent regression tests (BASELINE.md parity style).

A fixed tiny UNet + PNDM/DDIM/LMS schedule with fixed seeds must keep
producing the same final latents (CPU fp32). Goldens are generated once and
committed; any numerical change in models/schedulers/pipeline trips this.

Also checks the BASELINE parity budget the driver cares about: a bf16 run of
the same program must stay within 1e-2 MSE of the fp32 reference.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdiffuse_tpu import schedulers
from flexdiffuse_tpu.models import TINY_UNET, UNet2DCondition

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), 'goldens')


def _run(kind: str, dtype=jnp.float32, steps: int = 4):
    unet = UNet2DCondition(TINY_UNET, dtype=dtype)
    k = jax.random.PRNGKey(42)
    lat = jax.random.normal(jax.random.PRNGKey(7), (1, 8, 8, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(8), (2, 77, 32), jnp.float32)
    params = unet.init(k, jnp.zeros((2, 8, 8, 4)), jnp.zeros((2,)),
                       ctx)
    sch = schedulers.make(kind, steps)
    if kind == 'lms':
        lat = lat * sch.sigmas[0]
    state = schedulers.init_state(sch, lat.shape, lat.dtype)
    for i in range(sch.length):
        xin = schedulers.scale_model_input(sch, lat, jnp.int32(i))
        lat2 = jnp.concatenate([xin, xin])
        t = jnp.broadcast_to(sch.timesteps[i], (2,))
        eps = unet.apply(params, lat2, t, ctx)
        eps_u, eps_c = jnp.split(eps, 2)
        eps = eps_u + 8.0 * (eps_c - eps_u)
        state, lat = schedulers.step(sch, state, eps, jnp.int32(i),
                                     jnp.int32(i), lat, None, 0.0)
    return np.asarray(lat)


@pytest.mark.parametrize('kind', ['ddim', 'pndm', 'lms'])
def test_golden_latents(kind):
    got = _run(kind)
    path = os.path.join(GOLDEN_DIR, f'latents_{kind}.npy')
    if not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.save(path, got)
        pytest.skip(f'golden generated at {path}; rerun to verify')
    ref = np.load(path)
    np.testing.assert_allclose(got, ref, atol=1e-5,
                               err_msg=f'{kind} latents drifted from golden')


def test_bf16_within_parity_budget():
    """bf16 latents within 1e-2 MSE of the fp32 reference (BASELINE.md)."""
    ref = _run('pndm', jnp.float32)
    got = _run('pndm', jnp.bfloat16)
    mse = float(np.mean((got - ref)**2))
    scale = float(np.mean(ref**2))
    assert mse / max(scale, 1e-9) < 1e-2, f'relative MSE {mse/scale:.3e}'
